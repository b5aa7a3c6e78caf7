"""Named-query registry backing the ``__spark_entry__.py`` contract.

Every implemented operator from SURVEY.md §2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
a DuckDB oracle SQL string producing the identical result (same column
names, same types, same values -- the driver hash-compares them).

Cross-engine determinism conventions used throughout the suites:
- double aggregations go through exact decimal sums:
  ``CAST(SUM(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)`` on both sides,
  so IEEE summation order can't flip the hash;
- averages are written as exact-sum / count, never engine AVG;
- timestamps are emitted as epoch microseconds
  (Spark ``unix_micros`` == DuckDB ``epoch_us``), never raw timestamps;
- doubles are never cast to strings (formatting differs);
- arrays emitted from aggregations are sorted (collect_list order is
  nondeterministic in any distributed engine).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_suites()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _load_suites()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _load_suites() -> None:
    """Import every suite module exactly once (import = registration).

    Import order IS registration order, and external consumers iterate the
    registry in insertion order -- so modules whose queries most need
    end-to-end certification are imported first.  (Round-1 certification
    covered graph_traversal, llm_extensions, and the head of
    pipeline_reference; this round front-loads the relational closure and
    streaming suites.)
    """
    global _LOADED
    if _LOADED:
        return
    from .suites import (  # noqa: F401
        relational_closure,
        streaming_suite,
        pipeline_reference,
        graph_traversal,
        llm_extensions,
    )

    _LOADED = True
