"""Unit tests for the live mutation sink (A17/A19): retry budget,
batching, and atomic commit — no Spark session needed."""

from __future__ import annotations

import json
import os

import pytest

from dgraph_etl_spark.sinks.live import (
    FileMutationClient,
    TransientSinkError,
    write_partition,
)


class _Row(dict):
    def asDict(self):
        return dict(self)


def _rows(n):
    return [_Row(src=str(i), dst=str(i + 1), score=float(i)) for i in range(n)]


def test_retry_recovers_from_transient_abort(tmp_path):
    path = str(tmp_path / "part.ndjson")
    client = FileMutationClient(path, fail_first=True)
    write_partition(iter(_rows(7)), client, batch_size=3, backoff_s=0.0)
    lines = [json.loads(x) for x in open(path)]
    assert [r["src"] for r in lines] == [str(i) for i in range(7)]


def test_retry_budget_exhausts_and_reraises(tmp_path):
    class AlwaysAborts(FileMutationClient):
        def mutate(self, batch):
            raise TransientSinkError("abort")

    client = AlwaysAborts(str(tmp_path / "p.ndjson"))
    with pytest.raises(TransientSinkError):
        write_partition(iter(_rows(2)), client, max_retries=3, backoff_s=0.0)
    # nothing published: commit never ran, no atomic rename happened
    assert not os.path.exists(str(tmp_path / "p.ndjson"))


def test_commit_is_atomic_rename(tmp_path):
    path = str(tmp_path / "part.ndjson")
    client = FileMutationClient(path)
    client.mutate([{"src": "a"}])
    assert not os.path.exists(path)  # invisible until commit
    client.commit()
    assert os.path.exists(path)


def test_batching_flushes_every_batch_size(tmp_path):
    calls = []

    class Counting(FileMutationClient):
        def mutate(self, batch):
            calls.append(len(batch))
            super().mutate(batch)

    path = str(tmp_path / "part.ndjson")
    write_partition(iter(_rows(10)), Counting(path), batch_size=4)
    assert calls == [4, 4, 2]


# ---------------------------------------------------------------------------
# A13 MERGE adapter (sinks/lakehouse.py): the versioned-store fallback
# must implement exactly the lakehouse MERGE semantics the reference's
# live path has (dgraph.go:110-133) -- proven against a row-at-a-time
# simulation of MERGE INTO, and shown batch-order invariant (what makes
# concurrent-writer retry/reorder safe).
# ---------------------------------------------------------------------------


def _merge_into_simulation(batches):
    """Literal MERGE INTO ... WHEN MATCHED AND s.score > t.score THEN
    UPDATE WHEN NOT MATCHED THEN INSERT, row at a time (the reference's
    dgraph.go:110-133 loop)."""
    store = {}
    for batch in batches:
        for src, dst, score in batch:
            k = (src, dst)
            if k not in store or score > store[k]:
                store[k] = score
    return {(s, d, sc) for (s, d), sc in store.items()}


def _edge_batches(spark, sf_dir, n_batches=3):
    """Deterministic batch split of the exploded (pre-dedup) edge
    stream -- duplicates WITHIN and ACROSS batches are the point."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.pipeline.edges import explode_bidirectional

    register_views(spark, sf_dir)
    exploded = explode_bidirectional(spark.table("user_relationship"))
    return [
        exploded.filter(F.abs(F.xxhash64("src", "dst", "score")) % n_batches == i)
        for i in range(n_batches)
    ]


def test_merge_max_into_equals_merge_into_semantics(spark, tmp_path):
    from dgraph_etl_spark.sinks.lakehouse import merge_max_into

    sf = "/root/testdata/sf0.001"
    batches = _edge_batches(spark, sf)
    rows_per_batch = [
        [(r.src, r.dst, r.score) for r in b.collect()] for b in batches
    ]

    final = None
    for b in batches:
        final = merge_max_into(spark, str(tmp_path / "store"), b)
    got = {(r.src, r.dst, r.score) for r in final.collect()}
    assert got == _merge_into_simulation(rows_per_batch)


def test_merge_max_into_is_batch_order_invariant(spark, tmp_path):
    """Max-wins merge is commutative/associative/idempotent, so any
    interleaving of concurrent writers (including a replayed batch --
    at-least-once delivery) reaches the same fixed point."""
    from dgraph_etl_spark.sinks.lakehouse import merge_max_into

    sf = "/root/testdata/sf0.001"
    batches = _edge_batches(spark, sf)

    orders = {
        "fwd": batches,
        "rev": list(reversed(batches)),
        "replay": [batches[0], batches[1], batches[0], batches[2], batches[1]],
    }
    results = {}
    for tag, seq in orders.items():
        final = None
        for b in seq:
            final = merge_max_into(spark, str(tmp_path / tag), b)
        results[tag] = {(r.src, r.dst, r.score) for r in final.collect()}
    assert results["fwd"] == results["rev"] == results["replay"]


def test_merge_max_into_versions_are_monotone(spark, tmp_path):
    """Each merge publishes a NEW version (time travel for the store);
    scores per key never decrease across versions."""
    import os

    from dgraph_etl_spark.sinks.lakehouse import merge_max_into

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "store")
    batches = _edge_batches(spark, sf)
    for b in batches:
        merge_max_into(spark, root, b)
    versions = sorted(d for d in os.listdir(root) if d.startswith("v"))
    assert len(versions) == len(batches)
    prev = {}
    for v in versions:
        cur = {
            (r.src, r.dst): r.score
            for r in spark.read.parquet(os.path.join(root, v)).collect()
        }
        assert all(cur.get(k, s) >= s for k, s in prev.items()), v
        prev = cur
