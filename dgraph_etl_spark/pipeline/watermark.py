"""Incremental extraction / watermark semantics (SURVEY.md A2, A3, A5).

The reference resumes its Elasticsearch scroll from a CLI-supplied
unix-seconds watermark, pushing ``last_update >= watermark`` into the
source (elastic.go:50-53) and printing the advancing watermark for
manual checkpointing (elastic.go:87-96).

Batch form here: a pushed-down range predicate plus a max-timestamp
bookmark -- Catalyst pushes the filter into the parquet scan (check
PushedFilters in explain), so at 100 TB only the new row groups are
read when data is laid out by time (partitioned/z-ordered by date).
Streaming form: Structured Streaming's offset log + withWatermark
(streaming/jobs.py) subsumes all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_scan(
    df: DataFrame, watermark_unix_s: int, ts_col: str = "last_update"
) -> DataFrame:
    """A2/A5: rows at-or-after the watermark. The predicate is a plain
    comparison so it reaches the source scan (predicate pushdown)."""
    return df.filter(F.col(ts_col) >= F.timestamp_seconds(F.lit(watermark_unix_s)))


def incremental_events_scan(spark, sf_dir: str, watermark_unix_s: int) -> DataFrame:
    """A2/A5 against the events source itself, with the predicate pushed
    all the way into the parquet scan.

    The fixture's physical ts type varies by generator round (see
    catalog.normalize_timestamps), and Catalyst cannot push a predicate
    THROUGH a type conversion (the filter would land post-projection
    and every row group gets read; caught by test_plan_shapes). So the
    watermark predicate is applied to the RAW column in its native
    type -- the conversions are strictly monotonic, so it transfers
    exactly: nanos-as-long compares against ``wm * 1e9``; TIMESTAMP_NTZ
    compares against a constant-folded NTZ literal (UTC session pinned,
    so NTZ wall time == the instant). Filter raw first, normalize
    after: explain shows the comparison in PushedFilters, and at 100 TB
    a time-partitioned table prunes to only the new row groups."""
    from ..catalog import normalize_timestamps, read_table_raw

    # the shared raw-read + unit-detection preamble (catalog owns it);
    # only the filter insertion point is this function's own
    raw, unit = read_table_raw(spark, sf_dir, "events")
    kind = dict(raw.dtypes).get("ts")
    if kind == "bigint":
        # the raw-column comparison constant must be in the column's
        # own unit for the pushdown to be exact
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        raw = raw.filter(F.col("ts") >= watermark_unix_s * per_s)
    elif kind == "timestamp_ntz":
        raw = raw.filter(
            F.col("ts")
            >= F.timestamp_seconds(F.lit(watermark_unix_s)).cast("timestamp_ntz")
        )
    else:
        raw = raw.filter(F.col("ts") >= F.timestamp_seconds(F.lit(watermark_unix_s)))
    return normalize_timestamps(raw, ts_unit=unit)


def next_watermark(df: DataFrame, ts_col: str = "last_update") -> DataFrame:
    """A5: the bookmark for the next run -- max event time seen, as
    unix seconds (reference prints `ur.LastUpdate.Unix()`)."""
    return df.agg(
        F.unix_timestamp(F.max(ts_col)).alias("next_watermark_s"),
        F.count(F.lit(1)).alias("rows_read"),
    )


def observed_scan(df: DataFrame, observation, ts_col: str = "last_update") -> DataFrame:
    """A25: progress metering. The reference prints '% complete' and the
    advancing watermark every 1000 docs (elastic.go:87-96) — a log line
    as the checkpoint mechanism. Here metrics ride the job itself:
    ``df.observe`` accumulates rows-read and max-event-time DURING the
    action with zero extra pass; the caller reads them from the
    Observation after the action (or a QueryExecutionListener in a
    long-running service)."""
    return df.observe(
        observation,
        F.count(F.lit(1)).alias("rows_read"),
        F.max(ts_col).alias("max_event_time"),
    )


def ordered_by_event_time(df: DataFrame, ts_col: str = "last_update") -> DataFrame:
    """A3: ascending event-time order (the reference sorts the scroll so
    its watermark advances monotonically). Only needed when a consumer
    requires ordered output -- it is a global sort (range exchange);
    don't pay for it otherwise."""
    return df.orderBy(ts_col)
