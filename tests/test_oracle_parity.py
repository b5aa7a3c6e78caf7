"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast) -- the local replica of the driver's
sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from dgraph_etl_spark.registry import REGISTRY, _load_suites

from .oracle_utils import check_query

_load_suites()
CASES = [(name, q) for name, q in REGISTRY.items() if q.oracle is not None]
ROWS_ONLY = [(name, q) for name, q in REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name,q", CASES, ids=[n for n, _ in CASES])
def test_oracle_parity(spark, sf_small, name, q):
    problems = check_query(spark, sf_small, name, q.fn, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name,q", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_runs(spark, sf_small, name, q):
    df = q.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    extra = set(e.oracle_sql()) - queries_keys()
    assert not extra, f"oracles without queries: {sorted(extra)}"


def queries_keys():
    import __spark_entry__ as e

    return set(e.queries().keys())
