"""Embedding similarity search (SURVEY.md C3-C5, C9).

All hot-path math is JVM-side Catalyst expressions over
``array<double>`` (zip_with / aggregate / transform) -- no Python in
the per-row loop. Verified against DuckDB's list_cosine_similarity to
1 ulp.

Scale design:
- brute-force top-k is the exactness baseline: cosine expr +
  TakeOrderedAndProject (per-partition top-k, then merge of k-lists on
  the driver -- no global sort, scales linearly with rows/partitions).
- ivf_topk is the 100 TB path: partition the corpus into coarse cells
  (here: the label column as the cell id; at scale, k-means centroids
  refreshed offline), keep a tiny centroid table, probe only the
  nprobe nearest cells -> scanned fraction ~ nprobe/ncells. The
  centroid table is broadcast; cell assignment is a narrow map.
- all-pairs similarity join is blocked (by label / LSH bucket) before
  the quadratic step: never cross-join the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i, left-to-right fold (deterministic, matches DuckDB)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def with_query_similarity(
    emb: DataFrame, query: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Attach cosine(embedding, query vector). ``query`` is a 1-row
    DataFrame with column ``qvec`` -- broadcast cross join (a literal
    scalar at plan level; no shuffle)."""
    j = emb.crossJoin(F.broadcast(query))
    sim = cosine(as_double_array(vec_col), as_double_array("qvec"))
    return j.withColumn("sim", sim)


def brute_topk(
    emb: DataFrame, query: DataFrame, k: int, vec_col: str = "embedding"
) -> DataFrame:
    """C4 baseline: exact top-k by cosine. orderBy+limit compiles to
    TakeOrderedAndProject: O(rows) scan, O(k) state per partition."""
    return (
        with_query_similarity(emb, query, vec_col)
        .select("vec_id", F.round("sim", 4).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(k)
    )


def label_centroids(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantizer: elementwise-mean centroid per cell (cell =
    label here; k-means offline at scale). posexplode + per-(cell,pos)
    avg + re-assemble keeps everything JVM-side; the result is tiny
    (ncells rows) and broadcastable."""
    pos = emb.select(
        "label", F.posexplode(as_double_array(vec_col)).alias("pos", "x")
    )
    means = pos.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return means.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int,
    nprobe: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """C4 scale path: probe the nprobe cells whose centroids are most
    similar to the query, then exact re-rank inside those cells only.
    At 100 TB with the corpus PARTITIONED BY cell id, the unprobed
    cells are pruned at the scan (partition pruning) -- the whole query
    touches ~nprobe/ncells of the data."""
    cents = label_centroids(emb, vec_col)
    probed = (
        cents.crossJoin(F.broadcast(query))
        .withColumn(
            "csim", cosine(as_double_array("centroid"), as_double_array("qvec"))
        )
        .orderBy(F.desc("csim"), "label")
        .limit(nprobe)
        .select("label")
    )
    candidates = emb.join(F.broadcast(probed), "label", "left_semi")
    return brute_topk(candidates, query, k, vec_col)


def blocked_similarity_join(
    emb: DataFrame, threshold: float, block_col: str = "label"
) -> DataFrame:
    """C5: all pairs with cosine >= threshold, blocked on ``block_col``
    so the cross product is per-block, not global (LSH buckets play the
    same role when no natural block key exists). Threshold compares the
    ROUNDED similarity so the cut is reproducible across engines."""
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col(block_col).alias("blk"),
        F.col("embedding").alias("emb_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col(block_col).alias("blk"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = a.join(b, "blk").filter(F.col("vec_a") < F.col("vec_b"))
    sim = F.round(cosine(as_double_array("emb_a"), as_double_array("emb_b")), 4)
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "blk", "sim")
    )


def _srp_planes(n_planes: int, dim: int, seed: int):
    """The seeded Gaussian hyperplane matrix (n_planes x dim) -- the
    single source of truth for both signature implementations."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def srp_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Signed-random-projection (SRP / random hyperplane) LSH signature:
    bit p = sign(<v, r_p>) for n_planes Gaussian hyperplanes, the
    classic cosine-LSH family (collision probability 1 - theta/pi).
    The hyperplanes are generated ONCE on the driver from a fixed seed
    and shipped as a single broadcast 1-row array<array<double>> table
    (crossJoin against a broadcast single row is a BroadcastNestedLoop
    that adds the column without any shuffle), so the plan size is
    independent of dim and the per-row work is n_planes JVM-side
    higher-order-function dot products -- no Python, no shuffle, and
    the signature is deterministic across runs/engines for a given
    (seed, dim). This is the blocking key for near-dup search when NO
    natural block column exists (blocked_similarity_join's `label` at
    100 TB is exactly this signature).

    Pass ``dim`` explicitly in pipelines (it is schema metadata the
    caller owns); when None it is inferred with one driver single-row
    lookup, which is fine interactively but a needless job in a DAG.
    """
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0])
    planes = _srp_planes(n_planes, dim, seed)
    planes_df = emb.sparkSession.createDataFrame(
        [([[float(x) for x in row] for row in planes],)],
        "planes array<array<double>>",
    )
    base = emb.select("vec_id", vec_col, as_double_array(vec_col).alias("_v"))
    # sig = sum over plane index i of (sign bit i) << i, all inside one
    # codegen'd transform/aggregate chain over the broadcast planes col
    plane_bit = lambda pl, i: (  # noqa: E731
        F.when(
            F.aggregate(
                F.zip_with(F.col("_v"), pl, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            # call_function: the Python shiftleft wrapper only takes an
            # int literal for numBits, but the SQL function shifts by a
            # column -- here the plane index from transform()
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
    )
    sig = F.aggregate(
        F.transform(F.col("planes"), plane_bit),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        base.crossJoin(F.broadcast(planes_df))
        .select("vec_id", vec_col, sig.alias("srp_sig"))
    )


def _srp_signatures_literal(
    emb: DataFrame,
    n_planes: int,
    seed: int,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """The original literal-hyperplane form (n_planes x dim literals in
    the plan). Kept as the differential-test twin for srp_signatures:
    fine at dim 64, but at production dims (1536+) the plan blows up,
    which is why the broadcast form is the primary."""
    planes = _srp_planes(n_planes, dim, seed)
    base = emb.select("vec_id", vec_col, as_double_array(vec_col).alias("_v"))
    bits = []
    for p in range(n_planes):
        lits = F.array(*[F.lit(float(x)) for x in planes[p]])
        bits.append(
            F.when(dot(F.col("_v"), lits) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return base.select("vec_id", vec_col, sig.cast("long").alias("srp_sig"))


def srp_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_bands: int = 2,
    seed: int = 7,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs via SRP-LSH banding + exact
    re-rank: band the n_planes signature bits into n_bands chunks,
    bucket-join per (band, value), then keep candidates whose EXACT
    cosine clears the threshold. Precision is 1.0 by construction (the
    final filter is exact); recall is the LSH trade-off (1 - (1 -
    p^bits_per_band)^n_bands, p = 1 - theta/pi) -- tested empirically
    on the fixture. The quadratic step is confined to signature
    buckets: at 100 TB this replaces blocked_similarity_join's natural
    block key, and the band table feeds both join sides so it is
    materialized once (localCheckpoint)."""
    bits_per_band = n_planes // n_bands
    mask = (1 << bits_per_band) - 1
    sig = srp_signatures(emb, n_planes, seed, vec_col, dim=dim)
    bands = sig.select(
        "vec_id",
        vec_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("srp_sig", b * bits_per_band).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_val"),
    ).localCheckpoint()
    a = bands.alias("a")
    b = bands.alias("b")
    sim = F.round(
        cosine(as_double_array("a." + vec_col), as_double_array("b." + vec_col)), 4
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )


def build_ivf_index(emb: DataFrame, path: str) -> None:
    """C4 index build: persist the corpus PARTITIONED BY cell id (here
    the label column; k-means cell assignment slots in identically).
    Probing then prunes unprobed cells at the file listing -- the scan
    never opens them. Build once, probe many: the index is a plain
    partitioned table, no sidecar format.

    Concurrent builders race-safely: each writes a unique temp dir and
    atomically renames into ``path`` (first rename wins; losers discard),
    so a reader never observes a half-written index with _SUCCESS."""
    import os
    import shutil
    import uuid

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        emb.write.mode("overwrite").partitionBy("label").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise


def ivf_persisted_topk(
    spark,
    emb: DataFrame,
    query: DataFrame,
    k: int,
    path: str,
    nprobe: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """C4 scale path against the PERSISTED index: pick the nprobe most
    query-similar cells from the (tiny, collected) centroid table --
    index metadata, like any ANN library's -- then scan ONLY those
    partitions (`isin` over the partition column = partition pruning,
    asserted in tests/test_plan_shapes.py) and exact re-rank inside."""
    build_ivf_index(emb, path)
    index = spark.read.parquet(path)
    cents = label_centroids(index, vec_col)
    probed = [
        r["label"]
        for r in cents.crossJoin(F.broadcast(query))
        .withColumn(
            "csim", cosine(as_double_array("centroid"), as_double_array("qvec"))
        )
        .orderBy(F.desc("csim"), "label")
        .limit(nprobe)
        .select("label")
        .collect()
    ]
    candidates = index.filter(F.col("label").isin(probed))
    return brute_topk(candidates, query, k, vec_col)
