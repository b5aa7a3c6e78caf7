"""dgraph_etl_spark: a PySpark-native graph-ETL and analytics engine.

From-scratch engine with the query and data-processing capabilities of
the reference Go pipeline (notion/dgraph-etl): extract a timestamped
relationship stream, enrich person nodes, transform to scored directed
edges with max-score dedup, emit RDF triples / upserts, and run graph
traversals -- all re-expressed as set-oriented Spark DataFrame plans,
plus an LLM-data-pipeline operator surface (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (AQE, UTC, sane shuffle partitions)
  catalog.py    fixture loading + temp views (Spark) / oracle CTEs (DuckDB)
  views.py      single-source SQL for reference-domain derived views
  registry.py   named query registry -> __spark_entry__ contract
  pipeline/     Tier A dataflow semantics (explode, dedup, max-merge, RDF)
  suites/       the named, oracle-checked queries (Tier A/B/C, graph, streaming)
  graph/        k-hop BFS traversal (G1-G5)
  functions/    Tier C: text analysis, similarity, dedup, multimodal
  streaming/    Structured Streaming sources/harness + stateful operators
  sources/      JDBC scan wrapper (B3)
  sinks/        live transactional mutation sink (A17/A19)
"""

from .catalog import load_tables, register_views  # noqa: F401
from .registry import oracle_sql, queries  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
