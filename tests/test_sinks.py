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
