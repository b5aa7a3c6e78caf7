"""Edge-side pipeline operators (SURVEY.md A9, A10, A12, A13, B19).

Reference behavior being re-expressed (not ported):
- A9/A10: one ElasticUserRelationship record becomes two directed
  scored edges (reference dgraph.go:306-335). Direction convention is
  the live path's: (from -> to) carries raw_score_in, (to -> from)
  carries raw_score_out. NOTE the reference's bulk binary reverses
  this (cmd/bulk/main.go:321-328) -- a quirk, the two binaries
  disagree; we standardize on the live path and parameterize the RDF
  writer.
- A12: keep MAX(score) per directed (src, dst) pair. The reference
  uses an unbounded in-RAM hashmap guarded by a mutex
  (cmd/bulk/main.go:29-53, 178-212); here it is a hash aggregation
  with map-side partial max, which spills and scales horizontally.
- A13: merge-with-existing ("update only if new score beats stored",
  reference dgraph.go:110-133) as union + re-aggregate -- the
  algebraic form a MERGE INTO would compile to anyway.

Scale notes:
- explode(array(struct,struct)) is a narrow transform: one scan, no
  shuffle, 2N rows out; a union-of-two-selects would scan the source
  twice.
- groupBy(src,dst).max is one shuffle with partial aggregation; skewed
  hub nodes are handled by AQE skew-join/partition splitting (session
  default) and, for pathological hubs, two-level salted aggregation
  (aggregate_max_salted below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_bidirectional(
    rel: DataFrame, bulk_convention: bool = False
) -> DataFrame:
    """A9+A10: relationship stream -> directed scored edge stream.

    Input schema: from_person_id, to_person_id, raw_score_in,
    raw_score_out (+ passthrough ignored). Output: src, dst, score.

    ``bulk_convention=True`` reproduces the bulk binary's REVERSED
    facet assignment ((from->to) carries raw_score_out,
    cmd/bulk/main.go:321-328) -- the two reference binaries genuinely
    disagree; default is the live path (dgraph.go:306-335).
    """
    in_score = F.col("raw_score_in").cast("double")
    out_score = F.col("raw_score_out").cast("double")
    fwd, bwd = (
        (out_score, in_score) if bulk_convention else (in_score, out_score)
    )
    edge = F.explode(
        F.array(
            F.struct(
                F.col("from_person_id").alias("src"),
                F.col("to_person_id").alias("dst"),
                fwd.alias("score"),
            ),
            F.struct(
                F.col("to_person_id").alias("src"),
                F.col("from_person_id").alias("dst"),
                bwd.alias("score"),
            ),
        )
    ).alias("e")
    return rel.select(edge).select("e.*")


def max_score_per_edge(edges: DataFrame) -> DataFrame:
    """A12: MAX(score) per directed (src, dst) pair.

    Hash aggregation with map-side combine; replaces the reference's
    mutex-guarded rMap (cmd/bulk/main.go:178-212) which grows
    unboundedly in RAM -- this form spills and distributes.
    """
    return edges.groupBy("src", "dst").agg(F.max("score").alias("score"))


def aggregate_max_salted(edges: DataFrame, buckets: int = 16) -> DataFrame:
    """A12 under heavy key skew: two-level (salted) max aggregation.

    Level 1 aggregates (src, dst, salt) partitions, shrinking hub keys
    by ``buckets`` before the final shuffle. MAX is associative and
    commutative so the re-aggregation is exact. Use when a handful of
    graph hubs dominate (power-law degree distributions) and AQE's
    skew handling isn't enough.

    The salt is a hash of the PAYLOAD columns (not
    monotonically_increasing_id, which is nondeterministic across stage
    retries): a recomputed task reproduces the same salt for every row,
    so shuffle partitioning is stable under speculative execution and
    fetch-failure recomputes.
    """
    salted = _with_payload_salt(edges, buckets)
    partial = salted.groupBy("src", "dst", "_salt").agg(F.max("score").alias("score"))
    return partial.groupBy("src", "dst").agg(F.max("score").alias("score"))


def merge_max_with_existing(new_edges: DataFrame, existing: DataFrame) -> DataFrame:
    """A13: conditional upsert semantics ("insert if absent, update if
    new score beats stored") as a pure-batch merge: union + re-max.

    Equivalent to ``MERGE INTO ... WHEN MATCHED AND s.score > t.score
    THEN UPDATE WHEN NOT MATCHED THEN INSERT`` against a lakehouse
    table; semantics (max-wins) are storage-independent.
    """
    cols = ["src", "dst", "score"]
    return max_score_per_edge(new_edges.select(cols).unionByName(existing.select(cols)))


def argmax_row_per_edge(
    edges: DataFrame,
    *extra_cols: str,
    keys: tuple[str, ...] = ("src", "dst"),
    score: str = "score",
) -> DataFrame:
    """B19: keep the whole winning row per key group, not just the max
    value -- window row_number over score desc. Ties broken
    deterministically by the extra columns. Defaults to the edge shape
    ((src, dst), score); ``keys``/``score`` generalize it to any
    argmax (b19_argmax_per_key routes here, so the registered B19
    surface IS this function, not an inline twin that could drift).

    Prefer max_score_per_edge when only the score is needed (hash agg
    beats a per-key sort at scale); use this when payload columns of
    the winning record must survive.

    When no ``extra_cols`` are given, ALL remaining columns break ties
    (in schema order): row_number over a non-total order would keep
    whichever tied row arrived first after the shuffle -- a different
    winner per run / stage retry, violating the engine's determinism
    contract.
    """
    tiebreak = list(extra_cols) or [
        c for c in edges.columns if c not in (*keys, score)
    ]
    order = [F.col(score).desc()] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _with_payload_salt(df: DataFrame, buckets: int) -> DataFrame:
    """The ONE deterministic payload-salt expression (stage-retry
    stable: a recomputed task reproduces the same salt per row, unlike
    monotonically_increasing_id), shared by aggregate_max_salted and
    salted_join -- two hand-kept copies previously had to stay in
    sync, and only one carried the collision guard."""
    if "_salt" in df.columns:
        raise ValueError("input already has a _salt column")
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)),
    )


# Join types for which salting is exact: the skewed row carries exactly
# one salt (so skewed-side multiplicity and unmatched-left semantics are
# preserved) and the dim side's multiplicity never reaches the output.
# right/full outer are WRONG here: an unmatched dim row would surface
# once per salt, i.e. `buckets` null-padded copies.
_SALTED_JOIN_SAFE = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "left_anti",
    "leftanti",
    # Spark accepts the bare aliases too; both are left-preserving
    "semi",
    "anti",
}


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the SKEWED side's key with a
    deterministic bucket and replicate the other side once per bucket
    (explode of a literal salt range), then join on (key, salt) -- a
    hub key's rows spread over ``buckets`` tasks instead of
    hot-spotting one. The salt is a hash of the skewed row's columns
    (deterministic under stage retries, unlike
    monotonically_increasing_id). Only left-preserving join types are
    accepted (see _SALTED_JOIN_SAFE): a right/full outer join would
    emit ``buckets`` null-padded copies of every unmatched dim row.
    Use when AQE's skew splitting can't help -- e.g. the skew is on the
    BUILD side of a shuffle join, or the join feeds a window that pins
    partitioning. Cost: dim side scans ``buckets`` x (bounded,
    broadcast-sized replication)."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTED_JOIN_SAFE
    }:
        raise ValueError(
            f"salted_join is only exact for left-preserving joins "
            f"{sorted(_SALTED_JOIN_SAFE)}; got how={how!r}"
        )
    if "_salt" in dim.columns:
        raise ValueError("dim input already has a _salt column")
    s = _with_payload_salt(skewed, buckets)
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return s.join(d, on=[key, "_salt"], how=how).drop("_salt")
