"""SparkSession factory tuned for both local testing and cluster scale.

Scale notes (100 TB design intent):
- AQE on: runtime coalescing, skew-join splitting, and plan re-opt
  replace the reference's hand-tuned goroutine counts
  (cmd/etl/etl.go:20, cmd/bulk/main.go:26 in the reference).
- ``spark.sql.shuffle.partitions`` is a *local* default; on a real
  cluster AQE's coalescePartitions makes the initial number mostly
  irrelevant as long as it is high enough (set ~2-3x total cores).
- Session timezone is pinned to UTC so event-time semantics are
  deterministic and identical to the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "dgraph_etl_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Settings chosen for the local[N] test harness; every one of them is
    either neutral or beneficial on a 1000-executor cluster.
    """
    n = str(cpus if cpus is not None else DEFAULT_CPUS)
    # '*' is a valid local-master spec (all cores); the shuffle
    # default must not int() it -- derive from the machine instead
    n_int = int(n) if n.isdigit() else (os.cpu_count() or 8)
    if n_int < 1:
        raise ValueError(f"cpus must be >= 1 or '*', got {cpus!r}")
    sp = shuffle_partitions if shuffle_partitions is not None else max(n_int, 8)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
