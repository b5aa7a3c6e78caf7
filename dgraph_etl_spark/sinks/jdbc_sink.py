"""Exactly-once JDBC streaming sink (foreachBatch + epoch ledger).

Structured Streaming's checkpoint gives every sink AT-LEAST-ONCE
delivery: a crash between the sink's write and the checkpoint commit
replays the whole micro-batch on restart. Sinks that cannot
deduplicate (plain INSERT over JDBC) therefore double-write on every
recovery. The standard recipe -- implemented here against a real
embedded database (Apache Derby, bundled with Spark) -- makes the
batch write IDEMPOTENT and tracks completion in an epoch ledger
inside the destination database itself:

  1. if the ledger already holds (query_name, batch_id): skip -- the
     batch fully committed before a later crash;
  2. DELETE the batch's rows (cleans any partial write a crash left);
  3. append the rows tagged with their batch_id (parallel
     ``df.write.jdbc``, one connection per partition);
  4. record (query_name, batch_id) in the ledger -- the commit marker.

A replay can crash at any step and re-run safely: before the marker
exists, steps 2-3 are a destructive-rewrite; after it exists, step 1
short-circuits. Exactly-once lands on an at-least-once substrate with
no distributed transaction -- the only atomicity needed is the
single-row marker insert. (The live mutation sink, sinks/live.py,
gets the same property from server-side conditional upserts instead;
this sink is for destinations that offer only INSERT/DELETE.)

At scale the DELETE hits an index on batch_id and the data append is
partition-parallel; the ledger stays one row per batch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Names that reach SQL text (table/ledger identifiers, the ledger's
# query_name value). The writer interpolates them into driver-side
# DDL/DML, so they are locked to a safe identifier alphabet at
# CONSTRUCTION time -- an exactly-once primitive others will reuse
# must not be breakable (or injectable) by a quote in a name.
_SAFE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _check_name(kind: str, value: str) -> str:
    if not _SAFE_NAME.match(value):
        raise ValueError(
            f"{kind} {value!r} must match [A-Za-z_][A-Za-z0-9_.]* "
            "(it is interpolated into SQL statements)"
        )
    return value


def jdbc_exec(spark: SparkSession, url: str, stmts: list[str]) -> None:
    """Run DDL/DML statements over one JDBC connection (driver-side;
    used for the tiny ledger/maintenance statements, never for data)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # type: ignore[union-attr]
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()


def jdbc_query_long(spark: SparkSession, url: str, sql: str) -> int:
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # type: ignore[union-attr]
    try:
        rs = conn.createStatement().executeQuery(sql)
        rs.next()
        return int(rs.getLong(1))
    finally:
        conn.close()


def ensure_sink_tables(
    spark: SparkSession, url: str, table: str, ledger: str, data_ddl: str
) -> None:
    """Create the data table (caller-supplied DDL body, which must
    include QUOTED ``"batch_id" BIGINT`` and ``"query_name"
    VARCHAR(128)`` columns -- Derby uppercases unquoted identifiers,
    while the writer's replay-DELETE and Spark's dialect-quoting
    INSERT both address the lowercase names; an unquoted DDL makes
    every micro-batch fail) and the epoch ledger if absent."""
    table = _check_name("table", table)
    ledger = _check_name("ledger", ledger)
    for name, ddl in [
        (table, f"CREATE TABLE {table} ({data_ddl})"),
        (
            ledger,
            f"CREATE TABLE {ledger} "
            "(query_name VARCHAR(128), batch_id BIGINT, "
            "PRIMARY KEY (query_name, batch_id))",
        ),
    ]:
        try:
            jdbc_exec(spark, url, [ddl])
        except Exception as ex:
            # Derby SQLState X0Y32 = object already exists. Match the
            # STATE CODE only, never free message text (lakehouse.py's
            # never-match-by-message rule): a creation that failed for
            # a real reason whose message merely mentions 'already
            # exists' must surface now, not as a confusing
            # table-not-found at the first write.
            if "X0Y32" not in str(ex):
                raise


def exactly_once_jdbc_writer(
    url: str,
    table: str,
    ledger: str,
    query_name: str,
    properties: dict[str, str] | None = None,
    fail_before_marker_once: dict | None = None,
):
    """Build the foreachBatch function. ``fail_before_marker_once`` is
    the test hook: a mutable dict {"armed": True} makes the writer
    raise AFTER the data append but BEFORE the commit marker exactly
    once -- the crash window that breaks naive sinks."""
    table = _check_name("table", table)
    ledger = _check_name("ledger", ledger)
    query_name = _check_name("query_name", query_name)
    props = dict(properties or {})

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        clash = {"batch_id", "query_name"} & set(batch_df.columns)
        if clash:
            # withColumn below would silently REPLACE the user's
            # columns (destroying their values in the sink) and the
            # replay-DELETE would then key on the overwritten value --
            # refuse loudly, BEFORE any round-trip to the database
            raise ValueError(
                f"exactly-once sink reserves column(s) {sorted(clash)}; "
                "rename them in the stream before writing"
            )
        spark = batch_df.sparkSession
        done = jdbc_query_long(
            spark,
            url,
            f"SELECT COUNT(*) FROM {ledger} "
            f"WHERE query_name = '{query_name}' AND batch_id = {batch_id}",
        )
        if done:
            return  # fully committed before a crash; replay is a no-op
        # destructive rewrite of THIS QUERY's rows for THIS batch
        # (partial-write clean). Scoped by query_name as well as
        # batch_id: the ledger keys on (query_name, batch_id) precisely
        # so multiple queries can share one data table, and a
        # batch_id-only DELETE would destroy a sibling query's already
        # committed batch of the same number. Columns are QUOTED:
        # Spark's JDBC writer creates quoted-lowercase columns while
        # Derby uppercases unquoted identifiers -- the same casing trap
        # the B3 source tests pin.
        jdbc_exec(
            spark,
            url,
            [
                f'DELETE FROM {table} WHERE "batch_id" = {batch_id} '
                f"AND \"query_name\" = '{query_name}'"
            ],
        )
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .withColumn("query_name", F.lit(query_name))
            .write.mode("append")
            .jdbc(url, table, properties=props)
        )
        if fail_before_marker_once and fail_before_marker_once.get("armed"):
            fail_before_marker_once["armed"] = False
            raise RuntimeError(
                "injected crash between data write and commit marker"
            )
        jdbc_exec(
            spark,
            url,
            [
                f"INSERT INTO {ledger} VALUES ('{query_name}', {batch_id})"
            ],
        )

    return write_batch
