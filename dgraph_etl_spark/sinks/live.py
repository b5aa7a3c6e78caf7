"""Live transactional mutation sink (SURVEY.md A17 + A19 + A20).

Re-expresses the reference's live load path — per-record JSON mutations
committed in transactions over gRPC (dgraph.go:175-223), wrapped in a
retry-with-backoff loop on "Transaction has been aborted"
(dgraph.go:53-108) under a goroutine concurrency limiter (etl.go:52-64)
— as a ``foreachPartition`` writer:

- fan-out/concurrency limiting (A20) is Spark's task parallelism; the
  per-partition writer replaces 1000 goroutines with #partitions tasks;
- batching replaces the reference's one-record-per-transaction round
  trips (4-6 per record, etl.go:67-111) with one transaction per batch;
- the retry loop (A19) handles *transient* sink errors inside a task;
  anything beyond the budget re-raises so Spark's own task retry
  (`spark.task.maxFailures`) takes over — two nested at-least-once
  layers, which is why the client contract demands idempotent,
  all-or-nothing `mutate` + `commit` (the reference gets this from
  Dgraph transactions; the file client below gets it from
  write-to-temp + atomic rename).

The client is injected (``client_factory``) so the same writer drives a
real gRPC client in production and the file-backed client in tests/
the oracle harness. No row data ever passes through the driver.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable, Iterator

from pyspark import TaskContext
from pyspark.sql import DataFrame


class TransientSinkError(RuntimeError):
    """A retryable sink failure (the reference's 'Transaction has been
    aborted', dgraph.go:62)."""


class MutationClient:
    """Contract for live sinks: ``mutate(batch)`` is all-or-nothing
    (a transaction); ``commit()`` publishes atomically; a re-created
    client fully supersedes a previous attempt's work (idempotency
    under task retry). A ``TransientSinkError`` from EITHER call means
    re-invoking that same call on this client is safe and may succeed
    (the in-task A19 retry loop does exactly that); a client whose
    transaction is DEAD after a commit abort must raise a
    non-transient error instead, handing recovery to Spark's task
    retry, where a fresh client supersedes the attempt."""

    def mutate(self, batch: list[dict]) -> None:  # pragma: no cover
        raise NotImplementedError

    def commit(self) -> None:  # pragma: no cover
        raise NotImplementedError

    def abort(self) -> None:
        """Discard this attempt's uncommitted work and release its
        resources. Called by ``write_partition`` when the attempt dies
        before ``commit()`` (retry budget exhausted, mid-write task
        failure) -- without it every failed attempt strands its
        transaction/temp state. Must be safe to call on an already
        committed or already aborted client (no-op then). Default:
        nothing to release."""


class FileMutationClient(MutationClient):
    """File-backed stand-in for the gRPC client: one ndjson mutation
    log per partition, written to a temp file and atomically renamed on
    commit. ``fail_first`` injects a transient abort on the first
    transaction, exercising the A19 retry path on every run.

    sort_keys + a fixed float repr make the log byte-deterministic.
    """

    def __init__(self, path: str, fail_first: bool = False):
        self._path = path
        # attempt-unique temp name: a zombie task attempt (speculation,
        # presumed-lost executor) and its relaunch both open a client
        # for the SAME partition -- a shared path+'.tmp' would let the
        # second open truncate the first's in-progress log and commit
        # an interleaved file. Unique tmp + atomic os.replace keeps the
        # supersede contract: last committed attempt wins whole.
        self._tmp = f"{path}.tmp.{os.getpid()}_{uuid.uuid4().hex[:8]}"
        self._f = open(self._tmp, "w")
        self._fail = fail_first
        self._calls = 0
        self._done = False  # commit or abort already ran

    def mutate(self, batch: list[dict]) -> None:
        self._calls += 1
        if self._fail and self._calls == 1:
            raise TransientSinkError("injected: Transaction has been aborted")
        self._f.write(
            "".join(json.dumps(m, sort_keys=True) + "\n" for m in batch)
        )

    def commit(self) -> None:
        self._f.close()
        os.replace(self._tmp, self._path)
        self._done = True

    def abort(self) -> None:
        # attempt-unique tmp files are a per-attempt LEAK unless the
        # non-commit exits unlink them: a retry-budget-exhausted
        # attempt, a zombie attempt, or any mid-write failure would
        # otherwise strand a '.tmp.<pid>_<hex>' next to the sink output
        # (the old fixed-name tmp was self-overwriting; this one isn't)
        if self._done:
            return
        self._done = True
        try:
            self._f.close()
        finally:
            try:
                os.unlink(self._tmp)
            except FileNotFoundError:
                pass

    def __del__(self):  # zombie attempts that never reach either path
        try:
            self.abort()
        except Exception:  # noqa: BLE001  -- interpreter teardown
            pass


def write_partition(
    rows: Iterator,
    client: MutationClient,
    batch_size: int = 1000,
    max_retries: int = 4,
    backoff_s: float = 0.05,
) -> None:
    """Drain one partition into the client in batched transactions with
    bounded retry. Backoff is linear-deterministic (attempt * backoff_s)
    — the reference's 300ms * attempt * rand(1,30) randomization
    (dgraph.go:80-83) de-synchronized 6000 goroutines hammering one
    server; Spark tasks are already scheduler-staggered."""

    def with_retry(op: Callable[[], None]) -> None:
        for attempt in range(1, max_retries + 1):
            try:
                op()
                return
            except TransientSinkError:
                if attempt == max_retries:
                    raise  # hand over to Spark task retry
                time.sleep(backoff_s * attempt)

    # abort on ANY non-committed exit: the in-task retries reuse this
    # client (transient aborts are retryable on the same transaction),
    # but once the attempt itself dies -- retry budget exhausted, or a
    # non-transient failure mid-drain -- Spark's task retry opens a
    # FRESH client, and this one must release its uncommitted state
    # (for FileMutationClient: unlink its attempt-unique tmp file)
    try:
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict() if hasattr(row, "asDict") else dict(row))
            if len(batch) >= batch_size:
                with_retry(lambda b=batch: client.mutate(b))
                batch = []
        if batch:
            with_retry(lambda b=batch: client.mutate(b))
        # commit is INSIDE the retry envelope: Dgraph surfaces transaction
        # aborts at commit time too (dgraph.go:53-108 retries the whole
        # txn on them) -- an unretried transient commit abort would burn a
        # full Spark task retry (re-read + re-mutate the whole partition)
        # for a failure the in-task loop is designed to absorb
        with_retry(client.commit)
    except BaseException:
        try:
            client.abort()
        except Exception:  # noqa: BLE001 -- never mask the real failure
            pass
        raise


def write_edges_live(
    edges: DataFrame,
    client_factory: Callable[[int], MutationClient],
    batch_size: int = 1000,
) -> None:
    """A17: distributed live load. ``client_factory(partition_id)``
    runs on the executor — connections are per-task, never serialized
    from the driver (the reference shares one gRPC client across all
    goroutines, etl.go:44-50; real Spark sinks must not)."""

    def run(it: Iterator) -> None:
        pid = TaskContext.get().partitionId()
        write_partition(it, client_factory(pid), batch_size=batch_size)

    edges.foreachPartition(run)


def file_sink_factory(
    out_dir: str, fail_first: bool = False
) -> Callable[[int], MutationClient]:
    """Factory of FileMutationClients writing part-{pid}.ndjson into
    ``out_dir`` (created by the caller on the driver)."""

    def make(pid: int) -> MutationClient:
        return FileMutationClient(
            os.path.join(out_dir, f"part-{pid:05d}.ndjson"), fail_first
        )

    return make
