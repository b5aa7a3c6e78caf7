"""Multi-batch state-restore tests for the applyInPandasWithState
profile operator (s08's engine): the registered query replays a
single file (= one micro-batch), so the state RESTORE path -- where a
round-trip encoding bug would corrupt the profile -- needs its own
exercise. Pins the round-5-review finding: the old CSV-joined
event-type state split comma-containing values into phantom types and
crashed on NULLs."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dgraph_etl_spark.streaming.core import events_stream, run_to_memory
from dgraph_etl_spark.streaming.stateful import user_profiles


@pytest.fixture()
def comma_typed_source(tmp_path):
    """Two mtime-ordered micro-batches whose event_type values contain
    commas and NULLs -- state written by batch 1 must survive the
    restore in batch 2."""
    rows = {
        1: [  # batch 1
            (1, 1_000_000, 10, "add,to,cart", 1.0, "{}"),
            (2, 2_000_000, 10, "view", 1.0, "{}"),
            (3, 3_000_000, 20, None, 1.0, "{}"),
        ],
        2: [  # batch 2: same users again -> exercises state.get
            (4, 4_000_000, 10, "add,to,cart", 1.0, "{}"),
            (5, 5_000_000, 10, "purchase", 1.0, "{}"),
            (6, 6_000_000, 20, "view", 1.0, "{}"),
        ],
    }
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    d = tmp_path / "events_src"
    d.mkdir()
    for i, batch in rows.items():
        cols = list(zip(*batch))
        t = pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            },
            schema=schema,
        )
        p = str(d / f"batch{i}.parquet")
        pq.write_table(t, p)
        os.utime(p, (i * 1_000_000, i * 1_000_000))
    return str(d)


def test_profile_state_survives_commas_and_nulls(
    spark, sf_small, comma_typed_source
):
    ev = events_stream(spark, sf_small, path=comma_typed_source)
    out = run_to_memory(user_profiles(ev), "update", "t_restore")
    # update mode emits one row per touched key per batch; the final
    # emission per user carries the accumulated profile
    import pandas as pd

    pdf = out.toPandas().sort_values("n_events").groupby("user_id").last()
    u10 = pdf.loc[10]
    assert u10["n_events"] == 4
    # 'add,to,cart' must count as ONE type (CSV state split it into 3)
    assert u10["n_event_types"] == 3  # add,to,cart / view / purchase
    assert u10["first_ts_us"] == 1_000_000
    assert u10["last_ts_us"] == 5_000_000
    u20 = pdf.loc[20]
    assert u20["n_events"] == 2
    assert u20["n_event_types"] == 1  # NULL is not a type; view is
