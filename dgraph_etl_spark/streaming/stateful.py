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
        n, mn, mx, stored_types = state.get
        types = set(stored_types or [])
    for pdf in pdfs:
        n += len(pdf)
        # NULL ts arrives as NaN through Arrow; SQL MIN/MAX skip NULLs
        # while COUNT(*) includes them -- mirror that (int(NaN) on an
        # all-NULL chunk would otherwise kill the whole query)
        ts = pdf["ts_us"].dropna()
        if len(ts):
            lo, hi = int(ts.min()), int(ts.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        # drop NULL event types before set arithmetic: None is not a
        # type, and it breaks the sorted() below
        types.update(
            t for t in pdf["event_type"].unique().tolist() if t is not None
        )
    # list-typed state, NOT a joined CSV string: a comma inside an
    # event_type value would split into phantom types on restore
    state.update((n, mn, mx, sorted(types)))
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
    from pyspark.sql.types import ArrayType, StringType

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("min_ts", LongType()),
            StructField("max_ts", LongType()),
            StructField("types", ArrayType(StringType())),
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


def has_tws_runtime() -> bool:
    """transformWithState's Python driver worker speaks protobuf to
    the JVM state server; without the google.protobuf package the
    worker crashes at init. Gate, don't crash."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` --
    the arbitrary-state API that supersedes applyInPandasWithState
    (s08): typed named state handles instead of one row-tuple, plus
    timers and TTL the old API lacks. State here is one ValueState of
    two longs per user; each micro-batch folds its Arrow batches into
    the stored totals and emits the key's new running aggregate
    (update semantics). The per-key fold is integer and
    order-insensitive, so the accumulated stream result equals the
    batch GROUP BY exactly. Requires the RocksDB state store provider
    (the only backend the new API supports); callers pin it for the
    query's session.

    Runtime gate: the API's Python driver worker needs
    google.protobuf, which offline containers may lack -- there the
    SAME fold runs through applyInPandasWithState (identical
    semantics and output; the state handle shape is the only
    difference), so the operator stays certifiable everywhere while
    the new-API path is exercised wherever the runtime allows."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    def _fold_totals(pdfs, prev):
        """The ONE copy of the (n, total_fp, n_vals) fold both state
        APIs run -- which copy executes depends on the RUNTIME
        (has_tws_runtime gates on google.protobuf), so hand-kept twins
        would let the protobuf-equipped path silently diverge from the
        one certified in offline containers.

        n_vals tracks NON-NULL values: SQL SUM over zero non-NULL rows
        is NULL, while pandas' skipna sum of an all-NaN column is 0.0
        -- without the mask a user whose every value is NULL would
        emit total_fp=0 and diverge from the oracle's NULL.
        dropna().astype('int64'): an Arrow chunk holding any NULL
        arrives as float64, and a float summation loses exactness past
        2^53 -- the exact 64-bit SQL SUM must be matched
        integer-for-integer."""
        n, tot, nv = 0, 0, 0
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value_fp"].dropna().astype("int64")
            nv += int(len(vals))
            tot += int(vals.sum())
        if prev is not None:
            n += int(prev[0])
            tot += int(prev[1])
            nv += int(prev[2])
        return n, tot, nv

    def _emit(key, n, tot, nv):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_fp": [tot if nv else None],
            }
        )

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total_fp BIGINT, n_vals BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            n, tot, nv = _fold_totals(rows, self._totals.get())
            self._totals.update((n, tot, nv))
            yield _emit(key, n, tot, nv)

        def close(self):
            pass

    prepared = events.select(
        "user_id",
        F.expr("CAST(ROUND(value * 1000000, 0) AS BIGINT)").alias(
            "value_fp"
        ),
    )
    if has_tws_runtime():
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, total_fp BIGINT"
            ),
            outputMode="Update",
            timeMode="None",
        )

    # same fold, prior-generation API
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_fp", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total_fp", LongType()),
            StructField("n_vals", LongType()),
        ]
    )

    def fold(key, pdfs, state):
        # same _fold_totals, prior-generation state handle shape
        n, tot, nv = _fold_totals(
            pdfs, state.get if state.exists else None
        )
        state.update((n, tot, nv))
        yield _emit(key, n, tot, nv)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
