"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B41-B43 neighborhood; the engine's extension point for
stateful semantics Spark's built-ins don't cover).

The reference's only custom state is two mutex-guarded hashmaps
(cmd/bulk/main.go:29-53): unbounded, single-process, lost on crash.
Here the same shape — per-key accumulated profile over an unbounded
stream — is a keyed state store: partitioned by key across executors,
checkpointed, recoverable, with optional TTL via GroupStateTimeout.

Arrow moves each key-group to Python as pandas batches; the per-key
reducer below is order-insensitive (counts, min/max, distincts), so
results are deterministic under any partitioning/batching — the same
discipline the engine's SQL aggregates follow (registry.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_event_types", LongType()),
    ]
)

def _profile_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, mn, mx = 0, None, None
    types: set[str] = set()
    if state.exists:
        n, mn, mx, types_csv = state.get
        types = set(types_csv.split(",")) if types_csv else set()
    for pdf in pdfs:
        n += len(pdf)
        ts = pdf["ts_us"]
        lo, hi = int(ts.min()), int(ts.max())
        mn = lo if mn is None else min(mn, lo)
        mx = hi if mx is None else max(mx, hi)
        types.update(pdf["event_type"].unique().tolist())
    state.update((n, mn, mx, ",".join(sorted(types))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "first_ts_us": [mn],
            "last_ts_us": [mx],
            "n_event_types": [len(types)],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile over the (unbounded) event stream.
    One shuffle by user_id into the state store; per-batch output is
    the keys touched in that batch (update semantics)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("min_ts", LongType()),
            StructField("max_ts", LongType()),
            StructField("types_csv", StringType()),
        ]
    )
    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _profile_fn,
        outputStructType=_OUT,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
