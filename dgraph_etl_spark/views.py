"""Reference-domain derived views, single source of truth.

The reference pipeline's inputs (an Elasticsearch edge stream, a person
table, a MySQL team_member relation, and a sharded `user` existence
table -- reference structs at elastic.go:13-23, dgraph.go:15-32,
mysql.go:59-82, mysql.go:17-57) are modeled as deterministic SQL views
over the driver fixtures, per FIXTURES.md §2.

The SQL here is dialect-neutral: the exact same text is executed by
Spark (CREATE TEMP VIEW, catalog.register_views) and by DuckDB (as a
WITH prefix on every oracle query, oracle_with_views). That guarantees
both engines see bit-identical view contents.

Determinism notes (deviations from the FIXTURES.md sketch, on purpose):
- ``CAST(ROUND(value*100, 0) AS INT)`` instead of ``CAST(value*100 AS
  INTEGER)``: Spark's double->int cast truncates while DuckDB's rounds,
  so a value like 106.03*100 = 10602.999999999998 would diverge
  (10602 vs 10603). ROUND first (half-away-from-zero in both engines
  for these values) makes the cast exact and identical.
"""

from __future__ import annotations

# Order matters: later views may reference earlier ones.
VIEW_SQL: dict[str, str] = {
    # ES edge-stream analog (reference elastic.go:13-23): timestamped,
    # weighted, bidirectional records with duplicate (from,to) pairs.
    "user_relationship": """
        SELECT
          ts                                   AS last_update,
          CAST(user_id AS STRING)              AS from_person_id,
          CAST(event_id % 50 AS STRING)        AS to_person_id,
          CAST(ROUND(value * 100, 0) AS INT)   AS raw_score_in,
          CAST(ROUND(value * 37, 0) AS INT)    AS raw_score_out
        FROM events
    """,
    # node table analog (reference dgraph.go:15-22)
    "person": """
        SELECT CAST(c_custkey AS STRING) AS person_id, c_name AS name
        FROM customer
    """,
    # MySQL team_member analog (reference mysql.go:59-82)
    "team_member": """
        SELECT CAST(c_nationkey AS STRING) AS team_id,
               CAST(c_custkey   AS STRING) AS person_id
        FROM customer
    """,
    # sharded `user` existence-lookup analog (reference mysql.go:17-57)
    "trove_user": """
        SELECT CAST(c_custkey AS STRING) AS person_id_user
        FROM customer WHERE c_custkey % 2 = 0
    """,
    # post-pipeline directed weighted edges: A9 bidirectional explode +
    # A12 max-score dedup (reference dgraph.go:306-335,
    # cmd/bulk/main.go:178-212); input to traversals G1-G5.
    # r12 shape: the original UNION ALL of two projections scanned
    # user_relationship (and therefore the events fixture) TWICE in
    # every consumer's plan; the 2-row VALUES cross join doubles rows
    # off ONE scan instead (Spark plans it as a BroadcastNestedLoopJoin
    # over a 2-row local table, DuckDB as a tiny nested-loop). The row
    # multiset is identical: dir=0 emits the (from, to, raw_score_in)
    # record, dir=1 the flipped (to, from, raw_score_out) record,
    # exactly the two UNION ALL branches. Spark does NOT execute this
    # text -- see SPARK_VIEW_SQL["edges"] below (the BNLJ breaks the
    # scan's whole-stage-codegen span; the interleaved A/B measured
    # a18 +23% on this text vs the Generate-based override).
    "edges": """
        SELECT src, dst, MAX(score) AS score FROM (
          SELECT CASE WHEN d.dir = 0 THEN from_person_id
                      ELSE to_person_id END   AS src,
                 CASE WHEN d.dir = 0 THEN to_person_id
                      ELSE from_person_id END AS dst,
                 CAST(CASE WHEN d.dir = 0 THEN raw_score_in
                           ELSE raw_score_out END AS DOUBLE) AS score
          FROM user_relationship CROSS JOIN (VALUES (0), (1)) AS d(dir)
        ) both_directions
        GROUP BY src, dst
    """,
}

# Spark-dialect overrides, used by catalog.register_views in place of
# the dialect-neutral text above (DuckDB oracles always execute
# VIEW_SQL). An override must produce the IDENTICAL row multiset --
# tests/test_fixture_contract.py executes BOTH texts on Spark and
# asserts exceptAll-empty in both directions, so a drift between the
# two fails the suite, preserving the bit-identical-views guarantee
# the module docstring makes.
#
# edges (round 12): LATERAL VIEW inline() doubles rows off one scan
# INSIDE the scan's whole-stage-codegen span -- the dialect-neutral
# 2-row VALUES cross join plans as a BroadcastNestedLoopJoin, which
# breaks codegen and measured +0.04s on the bare view and +23% on
# a18_rdf_triples (interleaved A/B vs r11's two-scan UNION ALL); the
# Generate form is faster than BOTH (0.363s vs 0.380 union / 0.423
# BNLJ on the bare view at sf0.1) while keeping the single scan every
# graph/RDF consumer inherits.
#
# edges (round 13): the MAX-per-(src,dst) exchange carries the keys as
# STRINGS and the score as DOUBLE, and partial aggregation only
# collapses 2M exploded rows to ~1.1M distinct pairs at sf1 -- most of
# the doubled stream crosses the wire. Grouping on the NUMERIC
# pre-cast values (user_id / event_id % 50 are BIGINTs; INT -> STRING
# is injective, so the groups -- and MAX over the raw INT scores, cast
# to DOUBLE after -- are identical) shuffles two longs + an int
# instead of two strings + a double and hashes longs instead of UTF8:
# the bare view measured 1.13 -> 0.82 s and the a18 edge branch
# 1.13 -> 0.84 s at sf1 (interleaved min-of-7). Row-multiset parity
# with the dialect-neutral text stays pinned by
# tests/test_fixture_contract.py (exceptAll both directions).
SPARK_VIEW_SQL: dict[str, str] = {
    "edges": """
        SELECT CAST(src_n AS STRING) AS src, CAST(dst_n AS STRING) AS dst,
               CAST(MAX(raw) AS DOUBLE) AS score FROM (
          SELECT rec.s AS src_n, rec.d AS dst_n, rec.raw AS raw
          FROM events
          LATERAL VIEW inline(array(
            named_struct('s', user_id, 'd', event_id % 50,
                         'raw', CAST(ROUND(value * 100, 0) AS INT)),
            named_struct('s', event_id % 50, 'd', user_id,
                         'raw', CAST(ROUND(value * 37, 0) AS INT)))) rec
        ) both_directions
        GROUP BY src_n, dst_n
    """,
}


def derive_user_relationship(events):
    """The user_relationship view as DataFrame ops — the exact same
    expressions as VIEW_SQL['user_relationship'], usable on batch AND
    streaming events frames (temp views can't serve a stream)."""
    from pyspark.sql import functions as F

    return events.select(
        F.col("ts").alias("last_update"),
        F.col("user_id").cast("string").alias("from_person_id"),
        (F.col("event_id") % 50).cast("string").alias("to_person_id"),
        F.expr("CAST(ROUND(value * 100, 0) AS INT)").alias("raw_score_in"),
        F.expr("CAST(ROUND(value * 37, 0) AS INT)").alias("raw_score_out"),
    )

_CTE_BODY = ",\n".join(f"{name} AS ({sql})" for name, sql in VIEW_SQL.items())


def oracle_with_views(sql: str, recursive: bool = False) -> str:
    """Prefix a DuckDB oracle query with the derived-view CTEs.

    ``sql`` is normally a SELECT; it may instead start with "," to chain
    additional CTEs onto the prefix (``", extra AS (...) SELECT ..."``).

    ``recursive=True`` emits WITH RECURSIVE for oracles whose appended
    CTEs recurse (transitive closures). It is OPT-IN because DuckDB
    gives every UNION-topped CTE under WITH RECURSIVE initial/recursive
    -term treatment -- even with no self-reference -- which silently
    turns the UNION's dedup into concat semantics; a recursive oracle
    must therefore never rely on plain UNION dedup in its non-recursive
    CTEs (wrap in SELECT DISTINCT or aggregate downstream)."""
    body = sql.strip()
    head = "WITH RECURSIVE " if recursive else "WITH "
    return head + _CTE_BODY + "\n" + body
