"""Deterministic sampling operators for training-data pipelines.

A 100 TB curation job can't use ``df.sample`` for holdouts or ablation
subsets: Spark's sampler is seeded per-partition, so the kept set
changes under repartitioning, task retries, or an input re-layout.
These operators sample by CONTENT HASH (md5 of a stable key), which
makes the sample a pure function of the data: stable across runs,
engines, partitionings, and cluster sizes -- and reproducible in any
SQL engine, so every query here is oracle-checked (the same guarantee
`hash_split` gives train/val/test assignment; see text.hash_split).

Mechanism: keep a row iff the first 8 hex chars of
``md5(seed || key)`` -- a uniform 32-bit integer in hex -- fall below
``rate * 16^8``. The threshold is computed once in Python and compared
LEXICOGRAPHICALLY on the fixed-width hex prefix, so no engine-specific
integer parsing is involved. Changing ``seed`` yields an independent
sample; the same seed always yields the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # 32 bits of the md5 -> rate granularity 1/2^32


def rate_threshold_hex(rate: float) -> str:
    """The 8-hex-char cut for a keep-rate in [0, 1].

    rate=1.0 (or a float rounding up to 16^8) must keep EVERYTHING:
    the naive format would emit the 9-char '100000000', which sorts
    BEFORE 'ffffffff' lexicographically and silently kept only the
    '0'-prefixed ~6% of rows. 'g' sorts after every hex character, so
    every 8-hex-char prefix passes `prefix < 'g'`."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    cut = int(rate * (16**_HEX_WIDTH))
    if cut >= 16**_HEX_WIDTH:
        return "g"
    return format(cut, f"0{_HEX_WIDTH}x")


def _bucket(key: Column, seed: str) -> Column:
    # null-safe: md5(concat(seed, NULL)) is NULL and `NULL < thr`
    # drops the row at EVERY rate, silently breaking the rate=1.0
    # keep-everything contract. A NULL key buckets via a NUL sentinel
    # (mirrored as COALESCE(..., chr(0)) in every consuming oracle).
    k = F.coalesce(key.cast("string"), F.lit("\x00"))
    return F.substring(F.md5(F.concat(F.lit(seed), k)), 1, _HEX_WIDTH)


def hash_sample(
    df: DataFrame, key: str = "doc_id", rate: float = 0.25, seed: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep ~rate of rows, selected by
    content hash of ``key``. Pure per-row expression -- no shuffle, no
    state, no RNG; the kept set is identical on any engine and any
    partitioning (oracle: the same md5 prefix comparison in SQL)."""
    thr = rate_threshold_hex(rate)
    return df.filter(_bucket(F.col(key), seed) < thr)


def mixture_epochs(
    df: DataFrame,
    strata_col: str = "source",
    weights: dict[str, float] | None = None,
    default_weight: float = 1.0,
    key: str = "doc_id",
    seed: str = "ep0",
) -> DataFrame:
    """Deterministic mixture upsampling: emit each row ``w`` times,
    where ``w`` is the (possibly fractional) epoch weight of its
    stratum -- the standard training-mixture knob ("2.5 epochs of
    Wikipedia, 0.5 epochs of CommonCrawl"). Every row gets
    ``floor(w)`` full copies plus one extra copy iff its content hash
    falls below ``frac(w)`` -- the SAME hash family as hash_sample, so
    the fractional epoch is a deterministic subset (stable across
    runs, partitionings, and engines) and nested across weights: the
    rows kept at w=1.25 are a subset of those kept at w=1.5.

    Narrow per-row explode of a tiny sequence -- no shuffle, no RNG,
    no state; output carries an ``epoch`` index (1-based) so a
    downstream packer can interleave epochs. At 100 TB the expansion
    is the intended output size; nothing materializes per-row beyond
    the emitted copies."""
    weights = weights or {}

    def parts(w: float) -> tuple[int, str]:
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w}")
        return int(w), rate_threshold_hex(w - int(w))

    d_full, d_thr = parts(default_weight)
    full_col, thr_col = F.lit(d_full), F.lit(d_thr)
    for value, w in sorted(weights.items()):
        fw, thr = parts(w)
        cond = F.col(strata_col) == value
        full_col = F.when(cond, F.lit(fw)).otherwise(full_col)
        thr_col = F.when(cond, F.lit(thr)).otherwise(thr_col)
    extra = F.when(_bucket(F.col(key), seed) < thr_col, 1).otherwise(0)
    n_copies = (full_col + extra).cast("int")
    copies = F.when(n_copies >= 1, F.sequence(F.lit(1), n_copies)).otherwise(
        F.array().cast("array<int>")
    )
    # rows stay WHOLE: a mixture that kept only (key, strata, epoch)
    # forced every consumer to join the output back onto the corpus by
    # key to recover the payload -- a full extra shuffle at 100 TB.
    # An input 'epoch' column (this function's own output being
    # re-mixed) is replaced, not duplicated: select('*', explode) with
    # a second 'epoch' would make the cast below AMBIGUOUS_REFERENCE
    base = df.drop("epoch")
    return base.select(
        "*",
        F.explode(copies).alias("epoch"),
    ).withColumn("epoch", F.col("epoch").cast("bigint"))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling -- downsample over-represented
    sources/languages to target rates in one narrow pass (the mixing
    knob of a training-data pipeline; pair with source_quota for hard
    caps). Each stratum gets its own threshold on the SAME hash, so
    nested rates are consistent: a 10% sample is a subset of the 20%
    sample of the same seed."""
    thr = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate_threshold_hex(rate))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(key), seed) < thr)
