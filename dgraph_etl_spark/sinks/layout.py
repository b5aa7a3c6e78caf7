"""Multi-dimensional data layout (Z-order clustering) for file-level
skipping.

A 100 TB fact table is usually range-clustered on ONE dimension (event
time); any predicate on a second dimension (customer, part, region)
then overlaps every file. Interleaving the bits of two (or more)
low-cardinality-projected keys into a single Z-address and
range-clustering files on it bounds EVERY interleaved dimension's
min/max span per file to ~sqrt of the keyspace -- parquet footer
stats (and any lakehouse manifest built on them) can then prune files
for predicates on either dimension. Delta/Iceberg `OPTIMIZE ZORDER BY`
is this exact operation; here it is plain DataFrame + parquet, engine
arithmetic only (the Z-address is a deterministic integer expression
both engines compute bit-identically -- see suites registration).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_address(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Z-order address: bit i of ``a`` lands at
    position 2i+1, bit i of ``b`` at 2i. Pure shift/and/or expression
    -- whole-stage codegen'd, no UDF; ~2*bits terms folded by Catalyst
    into one projection."""
    a = a.cast("long")
    b = b.cast("long")
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(one), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(one), 2 * i)
        )
    return z


def z_address_sql(a: str, b: str, bits: int = 16) -> str:
    """The DuckDB text of z_address (must mirror it exactly)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    zkey: str = "zkey",
    n_files: int = 16,
    key_bits: int = 32,
) -> None:
    """Cluster ``df`` into ``n_files`` parquet leaf files by Z-address
    range: each file covers one EXPLICIT, equal-width span of the
    ``key_bits``-bit address space (and therefore a bounded span in
    every interleaved dimension). Deliberately NOT repartitionByRange:
    its reservoir-sampled boundaries are seeded per run, so two
    builds of the same table would get different file spans -- this
    layout must be reproducible for incremental rebuilds and for the
    skipping contract tests. sortWithinPartitions tightens row-group
    stats inside each file; one hash shuffle on the bucket id, the
    same cost as the single-dimension sort the table would get
    anyway.

    ``key_bits`` is the WIDTH OF THE ADDRESS, i.e. 2*bits of the
    ``z_address`` that built ``zkey`` (defaults match: bits=16 ->
    key_bits=32). An undersized key_bits silently fans the write out
    to up to 2**(address_bits - key_bits) * n_files directories, so
    pass it explicitly when the address builder used non-default
    bits."""
    # CEILING division: a floored width puts the top sliver of the
    # address space (zkey in [n_files*width, 2^key_bits)) into an
    # n_files+1-th bucket whenever n_files doesn't divide 2^key_bits,
    # breaking the 'exactly n_files equal-width spans' contract by one
    # sliver file. Ceiling keeps every zkey < n_files * width.
    width = max(-((1 << key_bits) // -n_files), 1)
    (
        # integer `div`, not F.floor(col / width): `/` computes in
        # double, which misassigns boundary rows once zkey exceeds
        # 2^53 (key_bits up to 62 is supported)
        df.withColumn(
            "zbucket",
            F.expr(f"CAST(`{zkey}` AS BIGINT) div {int(width)}").cast(
                "int"
            ),
        )
        .repartition(n_files, F.col("zbucket"))
        # sort by (zbucket, zkey), not zkey alone: partitionBy requires
        # an ordering by zbucket, and a bare zkey sort leaves Spark to
        # insert its OWN zbucket sort on top -- the in-file zkey order
        # then survives only if that sort happens to be stable, an
        # implementation detail no version guarantees. The explicit
        # prefix satisfies the required ordering (no second sort) and
        # makes the row-group min/max tightening a contract.
        .sortWithinPartitions("zbucket", zkey)
        .write.partitionBy("zbucket")
        .mode("overwrite")
        .parquet(path)
    )
