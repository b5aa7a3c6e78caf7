"""JDBC source wrapper (SURVEY.md B3; reference mysql.go:17-82 +
shard routing cmd/bulk/main.go:222-269).

The reference hand-routes point lookups to one of two MySQL servers by
comparing a big.Int key against [Low, High] shard bounds, with
hand-tuned connection pools (250 conns/shard, 10s lifetime,
bulk/main.go:228-244). In Spark the same table is ONE logical source;
parallelism comes from partition predicates — ``predicates=[...]``
gives one JDBC connection per partition, each shipping its own WHERE
clause, so the scan is distributed without any router code.

``read_jdbc`` is exercised END-TO-END against Apache Derby (the
embedded database bundled with Spark): tests write a table over JDBC,
read it back through ``range_predicates`` partitions, and assert exact
row recovery + one connection-partition per predicate
(tests/test_sources_and_metrics.py). ``range_predicates`` (the part
that replaces the reference's shard router) is additionally
unit-tested pure, including the uint64 key space (2^63 splits exactly
like bulk/main.go:234-249).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def range_predicates(col: str, lo: int, hi: int, n: int) -> list[str]:
    """n non-overlapping WHERE fragments covering [lo, hi] exactly —
    the generalization of the reference's two hard-coded shard ranges.
    Plain Python ints: the uint64 key space (hi = 2^64-1) must not
    overflow, which is why the reference needed math/big."""
    if n <= 0 or hi < lo:
        raise ValueError("need n >= 1 and hi >= lo")
    span = hi - lo + 1
    step, rem = divmod(span, n)
    preds, start = [], lo
    for i in range(n):
        width = step + (1 if i < rem else 0)
        if width == 0:
            break
        end = start + width - 1
        preds.append(f"{col} >= {start} AND {col} <= {end}")
        start = end + 1
    return preds


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """B3: parallel JDBC scan. One partition (and connection) per
    predicate; Catalyst still pushes row filters/projections into each
    partition's query (spark.sql.jdbc pushdown)."""
    props = {"fetchsize": "5000", **(properties or {})}
    if predicates:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return spark.read.jdbc(url, table, properties=props)
