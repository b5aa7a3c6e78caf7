"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real code lives in dgraph_etl_spark/ (see SURVEY.md §2 for the
operator inventory each named query implements).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgraph_etl_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the whole offline (EP2)
    binary as one DAG -- scroll-source scan (pushed watermark) -> JSON
    decode -> dead-letter split -> persons/edges branches -> full RDF
    triple set -> N-Quads write -> read back (a28_bulk_pipeline_e2e).
    Driver checks rows > 0: every returned row is a serialized triple
    that round-tripped through the binary's actual sink format."""
    # Resolve through the registry (NOT a direct suite import) so suite
    # registration happens in registry._load_suites' canonical order even
    # when entry() runs before queries().
    return registry.queries()["a28_bulk_pipeline_e2e"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return registry.oracle_sql()
