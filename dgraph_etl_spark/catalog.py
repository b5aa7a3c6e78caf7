"""Fixture catalog: load driver parquet tables and register temp views.

Scale note: on a real deployment these reads would be against
partitioned/bucketed lakehouse tables (or JDBC/ES sources, SURVEY.md §2
B1-B3); everything downstream is written against the view names, so the
storage layer swaps without touching operators. Scans stay columnar and
Catalyst pushes filters/projections into the parquet reader.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import SessionKeyedMap
from .views import SPARK_VIEW_SQL, VIEW_SQL

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Tables worth re-laying-out for parallel scans. The driver fixtures
# are written as ONE parquet row group per table, and a row group is
# the atomic split unit -- so every scan STAGE (including the map-side
# work fused into it: filters, partial aggs, shingle hashing) runs as
# a single task no matter how many cores exist. Re-layout is the
# standard table-service fix (row-group sizing / small-file compaction
# -- what OPTIMIZE does in lakehouse formats); at 100 TB it's the
# ingest layer's job, here it's a one-time session-scoped rewrite into
# scratch. `events` is excluded: it carries the TIMESTAMP(NANOS)
# special case and its queries are watermark-pruned scans anyway.
_COMPACT_TABLES = {"lineitem", "orders", "documents", "embeddings"}
_COMPACT_MIN_ROWS = 20_000
_LAYOUT_ROOT = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "dgraph_etl_layout"
)


def source_tag(sf_dir: str) -> str:
    """The ONE copy of the staged-artifact tag rule: a catalog-safe
    basename plus a hash of the ABSOLUTE fixture dir, so eviction
    scope always equals cache scope (graph_traversal._cached_edges'
    lesson: a basename-only tag let two fixtures with the same leaf
    dir name evict each other's live staged copies). Shared by the
    layout compactor, the bucketed-table suites, and the persisted
    IVF index -- three hand-kept copies of this rule would drift.

    NOTE: changing this naming orphans staged dirs built under any
    previous scheme (nothing sweeps them) -- acceptable once per
    scheme change, since /tmp staging is scratch; never change it
    casually."""
    import hashlib
    import re

    ident = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    return f"{base}_{ident}"


# Grace period before a superseded staged generation is rmtree'd:
# Spark scans are lazy, so a sibling process may still be mid-scan on
# the previous generation when this one lands. Deleting only dirs
# untouched for this long lets in-flight readers finish; the stale
# copy is then collected by a later load. 15 min covers any local
# query by orders of magnitude.
_EVICT_GRACE_SECONDS = 900


def _evict_stale_generations(
    root: str,
    prefix: str,
    keep_prefix: str | None = None,
    keep_name: str | None = None,
) -> None:
    """Delete superseded staged-dir generations under ``root``: dirs
    matching ``prefix`` but not the live generation -- ``keep_prefix``
    when the live dir name carries a trailing delimiter, ``keep_name``
    for an EXACT dir name (use this when the name has no trailing
    boundary: a stale '..._500' string-extends a live '..._50' prefix
    and would be wrongly retained). Skips in-progress ``.tmp.`` dirs
    and ``.lock`` files, and is age-gated on the dir's own mtime so a
    concurrent reader of the previous generation is never pulled out
    from under its scan."""
    import shutil
    import time

    if (keep_prefix is None) == (keep_name is None):
        raise ValueError("pass exactly one of keep_prefix / keep_name")
    now = time.time()
    try:
        sibs = os.listdir(root)
    except OSError:
        return
    for sib in sibs:
        p = os.path.join(root, sib)
        live = (
            sib.startswith(keep_prefix)
            if keep_prefix is not None
            else sib == keep_name
        )
        if (
            sib.startswith(prefix)
            and not live
            and ".tmp." not in sib
            and not sib.endswith(".lock")
            and os.path.isdir(p)
        ):
            try:
                if now - os.stat(p).st_mtime < _EVICT_GRACE_SECONDS:
                    continue
            except OSError:
                continue
            shutil.rmtree(p, ignore_errors=True)


def _compacted_source(spark: SparkSession, sf_dir: str, name: str) -> str | None:
    """Return the path of a parallel-layout copy of the table, creating
    it on first use (keyed by source identity + target file count, so
    stale copies are never reused and concurrent sf_dirs don't mix)."""
    if name not in _COMPACT_TABLES:
        return None
    src = table_path(sf_dir, name)
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(src).metadata
        n_cores = spark.sparkContext.defaultParallelism
        # documents/embeddings carry heavy PER-ROW map work (shingle
        # hashing, vector math), so they are worth splitting far below
        # the generic row threshold
        min_rows = 500 if name in ("documents", "embeddings") else _COMPACT_MIN_ROWS
        if meta.num_rows < min_rows:
            return None
        if meta.num_row_groups >= max(2, n_cores // 2):
            return None  # already split-friendly
        st = os.stat(src)
        # path-hashed tag (source_tag): eviction scope == cache scope
        tag = source_tag(sf_dir)
        key = f"{st.st_mtime_ns}_{st.st_size}"
        dest = os.path.join(_LAYOUT_ROOT, f"{tag}_{name}_{key}_{n_cores}")
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            # Concurrent sessions (bench + pytest, pytest-xdist) build
            # under the flock discipline every stager in this repo
            # uses (streaming/core._stage_atomic has the full
            # rationale: kernel-released on crash, no unlink, no
            # break-the-lock branch). Serializing here also means a
            # loser WAITS for the winner's copy instead of running a
            # duplicate full-table Spark job and discarding it at the
            # rename -- the pre-lock protocol's documented waste.
            import fcntl
            import shutil
            import uuid

            os.makedirs(_LAYOUT_ROOT, exist_ok=True)
            fd = os.open(f"{dest}.lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                if not os.path.exists(os.path.join(dest, "_SUCCESS")):
                    tmp = f"{dest}.tmp.{uuid.uuid4().hex[:8]}"
                    spark.read.parquet(src).repartition(n_cores).write.mode(
                        "overwrite"
                    ).parquet(tmp)
                    os.rename(tmp, dest)
            finally:
                os.close(fd)
        # generational eviction (the discipline of
        # traverse._CACHE_GENERATIONS), on EVERY load -- not only in
        # the build branch, or a generation still inside the grace
        # window at its successor's build time would never be
        # collected: copies of this table whose embedded source
        # identity no longer matches the CURRENT file can only serve
        # a fixture that has since been regenerated. AGE-GATED: only
        # generations older than the grace period go -- a concurrent
        # process may still be lazily scanning the previous generation
        # (Spark reads are lazy; a rmtree mid-scan is a
        # FileNotFoundException in someone else's query).
        _evict_stale_generations(
            _LAYOUT_ROOT, f"{tag}_{name}_", f"{tag}_{name}_{key}_"
        )
        return dest
    except Exception:
        return None  # any surprise -> fall back to the raw source


_TS_UNIT_TO_MICROS = {"s": 1_000_000, "ms": 1_000, "us": 1}


def ts_bigint_unit(path: str) -> str:
    """Decide the time unit of a fixture `ts` column that Spark surfaces
    as bigint, from the parquet FOOTER only (no data scan).

    Two physical forms land as bigint: TIMESTAMP(NANOS) under the
    nanosAsLong conf (the footer's arrow type says ``timestamp[ns]``
    -> 'ns'), and a plain INT64 column, whose unit is undeclared -- for
    that, infer from the magnitude of the footer min statistic
    (epoch seconds ~1e9, millis ~1e12, micros ~1e15, nanos ~1e18; the
    bands are 3 orders of magnitude apart, so any plausible event time
    in 2000-2200 classifies unambiguously). Raises on an implausible
    magnitude instead of silently misscaling by 1000x -- a new fixture
    encoding should fail loudly (see tests/test_fixture_contract.py)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    field = pf.schema_arrow.field("ts")
    unit = getattr(field.type, "unit", None)
    if unit is not None:  # a declared arrow timestamp type
        if unit in ("ns", "us", "ms", "s"):
            return unit
        raise ValueError(f"unsupported parquet timestamp unit {unit!r} in {path}")
    if pf.metadata.num_row_groups == 0:
        # zero rows = zero row groups = no stats: undecidable, and it
        # must say so with the path like every other branch here does
        raise ValueError(
            f"int64 ts column in an empty parquet file (no row groups,"
            f" so no footer statistics to infer the unit from): {path}"
        )
    # resolve the PARQUET LEAF index by path: the arrow top-level
    # field index diverges from leaf numbering as soon as any nested
    # (list/struct) column precedes ts -- the stats would then be read
    # from a different column and misclassify the unit
    rg = pf.metadata.row_group(0)
    idx = next(
        (
            i
            for i in range(rg.num_columns)
            if rg.column(i).path_in_schema.split(".")[0] == "ts"
        ),
        None,
    )
    if idx is None:
        raise ValueError(f"no parquet leaf column for ts in {path}")
    stats = rg.column(idx).statistics
    if stats is None or stats.min is None:
        raise ValueError(f"int64 ts column without footer statistics in {path}")
    mag = abs(int(stats.min))
    for lo, hi, u in (
        (10**8, 10**11, "s"),
        (10**11, 10**14, "ms"),
        (10**14, 10**17, "us"),
        (10**17, 10**20, "ns"),
    ):
        if lo <= mag < hi:
            return u
    raise ValueError(
        f"int64 ts magnitude {mag} in {path} matches no epoch unit band"
    )


def normalize_timestamps(df: DataFrame, ts_unit: str = "ns") -> DataFrame:
    """Fixture timestamps arrive in whatever physical form the
    generator chose that round -- TIMESTAMP(NANOS) (read nanos-as-long,
    truncate to micros: exactly DuckDB's TIMESTAMP_NS -> TIMESTAMP
    read) or naive TIMESTAMP(MICROS) (`isAdjustedToUTC=false`, which
    Spark 4 surfaces as TIMESTAMP_NTZ). Normalize both to TimestampType
    under the pinned-UTC session so `unix_micros`/watermarks work and
    both engines see identical instants: DuckDB reads naive micros
    verbatim as TIMESTAMP, and an NTZ->LTZ cast in a UTC session is
    that same identity on the stored value. Integer division (`div`) is
    required on the nanos path: double division of ~1e18 nanos loses
    the microsecond digit.

    ``ts_unit`` is the unit of a bigint `ts` column, as detected from
    the parquet footer by ts_bigint_unit (callers that read the fixture
    directly pass it through; default 'ns' matches the historical
    TIMESTAMP(NANOS) fixture rounds)."""
    for field in df.schema.fields:
        kind = field.dataType.simpleString()
        if field.name == "ts" and kind == "bigint":
            if ts_unit == "ns":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_unit in _TS_UNIT_TO_MICROS:
                df = df.withColumn(
                    "ts",
                    F.timestamp_micros(F.col("ts") * _TS_UNIT_TO_MICROS[ts_unit]),
                )
            else:
                raise ValueError(f"unknown ts_unit {ts_unit!r}")
        elif kind == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
        elif kind == "date" and field.name.endswith("date"):
            # a generator round that emits DATE32 for the *date columns
            # must still feed unix_micros: midnight-UTC instant in both
            # engines (DuckDB epoch_us(DATE) agrees)
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def embedding_dim(sf_dir: str) -> int:
    """The fixture embedding dimensionality, read driver-side from the
    first value of the parquet column (one tiny Arrow batch, no Spark
    job). Lets vector operators take ``dim`` as an explicit parameter
    -- their plans must not depend on a `.first()` action -- while
    staying robust to a fixture round changing the vector width."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(table_path(sf_dir, "embeddings"))
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch.column(0)[0])


def read_table_raw(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[DataFrame, str]:
    """Raw fixture read + ts-unit detection WITHOUT normalization --
    the shared preamble of load_table and the watermark scan
    (watermark.incremental_events_scan must push its range predicate
    on the RAW column type, so it filters between this and
    normalize_timestamps). One definition: the unit-detection protocol
    previously lived in two files and a fixture-encoding change had to
    be found in both."""
    pin_session_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = _compacted_source(spark, sf_dir, name) or table_path(sf_dir, name)
    df = spark.read.parquet(path)
    unit = "ns"
    if dict(df.dtypes).get("ts") == "bigint":
        # footer-detected unit (the original fixture file: tables that
        # carry `ts` are never compacted, see _COMPACT_TABLES)
        unit = ts_bigint_unit(table_path(sf_dir, name))
    return df, unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with normalized (UTC-instant) timestamps."""
    df, unit = read_table_raw(spark, sf_dir, name)
    return normalize_timestamps(df, ts_unit=unit)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in BASE_TABLES}


# session -> last (sf_dir, fingerprint) whose views are registered
# (temp views are overwrite-in-place, so only the most recent
# registration is live); weakref-pin/sweep/recycled-id discipline in
# session.SessionKeyedMap
_REGISTERED = SessionKeyedMap()

# registration is peek -> create views -> put: without mutual
# exclusion, a partial registration interleaved with a full one can
# overwrite views AFTER the full one cached its fingerprint, leaving a
# mixed catalog that later full calls no-op over (the hazard the
# partial-pop below defends against, but for sequential callers only).
# One process-wide lock: registrations are rare and cheap relative to
# queries, and thread pools share a session anyway (session.py).
_REGISTER_LOCK = threading.RLock()


def pin_session_confs(spark: SparkSession) -> None:
    """The driver runs queries in its own vanilla session: pin the confs
    our cross-engine determinism depends on (UTC event-time semantics)
    and sane local parallelism (AQE coalesces the rest)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass


def register_views(
    spark: SparkSession,
    sf_dir: str,
    force: bool = False,
    tables: tuple[str, ...] | None = None,
    views: tuple[str, ...] | None = None,
) -> None:
    """Register base tables and reference-domain derived views as temp
    views. Idempotent per (session, sf_dir); cheap to call per query.

    ``tables``/``views`` restrict registration to the named subset (a
    CLI command that reads two tables must not pay first-use
    compaction jobs for the other eight). Callers own view dependency
    order: a view whose SQL references an unloaded table fails at
    creation.

    The idempotence cache is COVERAGE-aware: the session-keyed entry
    records (sf_dir, fingerprint, names registered so far), and any
    call whose requested names are already covered for the same
    source no-ops. Partial registrations memoize like full ones --
    the first cut of this cache skipped (and worse, INVALIDATED) the
    entry on partial calls, so a suite calling a partial registration
    per query re-ran the view DDL every execution AND forced the next
    full caller to re-register everything: measured as g03_hop2's
    bench floor moving 0.14s -> 0.70s with the whole headline set
    interleaving behind it (round-10 A/B table, BASELINE.md). A
    partial call for a DIFFERENT source still replaces the entry
    outright -- its overwritten views make the old catalog mixed.

    Session keying via SessionKeyedMap (weakref pin: a new session
    allocated at a dead session's recycled id() must not be treated
    as registered -- its first spark.table() would raise
    TABLE_OR_VIEW_NOT_FOUND; dead entries are swept lazily). The
    SOURCE fingerprint (per-table mtime_ns+size) forces
    re-registration when a fixture is regenerated in place
    mid-session, or the views keep serving the previous round's
    mtime-keyed compacted copies -- the same stale-reuse class the
    content-keyed stagers below prevent."""
    sf_dir = os.path.abspath(sf_dir)
    fp = _source_fingerprint(sf_dir)
    want_tables = tuple(BASE_TABLES if tables is None else tables)
    want_views = tuple(VIEW_SQL if views is None else views)
    want = frozenset(want_tables) | frozenset(want_views)
    with _REGISTER_LOCK:
        hit = _REGISTERED.peek(spark)
        same_src = hit is not None and hit[0] == sf_dir and hit[1] == fp
        if same_src and not force and want <= hit[2]:
            return
        pin_session_confs(spark)
        for t in want_tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        for name, sql in VIEW_SQL.items():
            if name in want_views:
                # Spark-dialect override where one exists (identical
                # contents, parity-tested -- see views.SPARK_VIEW_SQL)
                spark_sql = SPARK_VIEW_SQL.get(name, sql)
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {spark_sql}"
                )
        # same source: names registered earlier are still live temp
        # views, so coverage is the union; different source: only the
        # names just written are trustworthy (the rest of the catalog
        # may still serve the previous sf_dir)
        covered = want | (hit[2] if same_src else frozenset())
        _REGISTERED.put(spark, (sf_dir, fp, covered))


def _source_fingerprint(sf_dir: str) -> tuple:
    """(mtime_ns, size) per base table file -- the registration-time
    identity of the fixture, cheap enough to re-stat per call."""
    parts = []
    for t in BASE_TABLES:
        try:
            st = os.stat(table_path(sf_dir, t))
            parts.append((st.st_mtime_ns, st.st_size))
        except OSError:
            parts.append((0, 0))
    return tuple(parts)


def view(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Return a DataFrame for a base table or derived view, registering
    the catalog for this sf_dir on the way."""
    register_views(spark, sf_dir)
    return spark.table(name)
