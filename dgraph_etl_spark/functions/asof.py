"""As-of (point-in-time) join — a custom operator Spark's built-ins
lack (SURVEY.md §2 B44).

Semantics: for every left row, attach the single most recent right row
with the same key and ``right.ts <= left.ts`` (backward direction,
ties at equal ts match — identical to DuckDB's ``ASOF LEFT JOIN``,
which the oracle uses).

Scale design: the naive formulation is a range join (|L|x|R| expansion
then argmax) — quadratic per key and unusable on hub keys. This
implementation is the union-and-carry-forward pattern instead: tag both
sides, union, ONE shuffle keyed on the join key with a per-key sort by
(ts, tag), then ``last(value, ignorenulls=True)`` over an unbounded
preceding window carries the latest right payload into each left row.
Cost is linear in |L| + |R|, one exchange, one sort — the same plan a
1000-executor cluster wants at 100 TB (and skewed keys fall to AQE's
sort-spill, never to a row explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    matched_ts: str = "matched_ts",
    right_order: list[str] | None = None,
) -> DataFrame:
    """Backward as-of left join. ``left`` keeps all its columns;
    ``right`` contributes ``right_cols`` plus ``matched_ts`` (the ts of
    the matched right row; all NULL when no right row precedes).

    ``on`` is the equality key, ``ts`` the ordering column (any
    comparable type; epoch-micros longs keep oracles exact). Rows of
    ``right`` must be unique per (on, ts) — pre-aggregate, OR pass
    ``right_order``: extra right columns appended to the carry
    window's sort; among equal-(on, ts) right rows the LAST in
    ascending ``right_order`` is the one carried (ascending NULLS
    FIRST, so NULLs lose to values). These are ARGMAX semantics over
    the whole row: ALL ``right_cols`` are taken from that single
    winning row — equal to a ``GROUP BY on, ts`` MAX only for the
    ordered column itself, NOT a per-column MAX of the others (e.g.
    ``right_order=["v"]`` with right_cols ``[v, w]`` carries the
    winning row's ``w``, which need not be MAX(w)). The win over the
    explicit pre-aggregate: no full exchange of the right stream —
    the dedup rides the one exchange + sort the carry-forward already
    pays (round 12). The caller must pick columns that order
    duplicates deterministically (any column set whose struct payload
    is equal for still-tied rows qualifies).

    NULL semantics follow SQL/DuckDB ASOF: a right row with NULL ts or
    NULL key never matches anything (``r.ts <= l.ts`` and ``r.k = l.k``
    are never true for NULL), and a left row with NULL ts or NULL key
    matches nothing (all-NULL right fields). Without the explicit
    right-side filter below, Spark's NULLS FIRST ascending sort would
    place NULL-ts right rows at the window start and carry them into
    every left row of the partition — a silent divergence from the
    stated oracle semantics.
    """
    left_payload = [c for c in left.columns if c not in (on, ts)]
    clash = set(left_payload) & set(right_cols)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; "
            "rename one side before the as-of join (duplicate names "
            "would make the carry-forward references ambiguous)"
        )
    # the output carries left's on/ts plus right_cols: a right_col
    # named like on/ts duplicates an output column just as silently as
    # a left-payload clash, so reject it the same way. The internal
    # names are reserved too (a left column named _r/__asof_tag would
    # be shadowed by the carry struct / tag).
    bad = set(right_cols) & {on, ts}
    if bad:
        raise ValueError(
            f"right_cols {sorted(bad)} collide with the join's on/ts "
            "columns (both are emitted from the left side); alias the "
            "right column before the as-of join"
        )
    stray = set(right_order or []) - set(right_cols)
    if stray:
        raise ValueError(
            f"right_order columns {sorted(stray)} are not in right_cols; "
            "the window orders by the carried struct's fields, so every "
            "dedup key must be carried"
        )
    reserved = {_TAG, "_r"} & set(left.columns)
    if reserved:
        raise ValueError(
            f"left columns {sorted(reserved)} collide with asof_join "
            "internals; rename them before the join"
        )
    # matched_ts becomes a field of the carried struct AND an output
    # column; a name shared with right_cols gives the struct duplicate
    # field names (ambiguous _r.matched_ts resolution), and one shared
    # with left's columns duplicates an output column -- both produce
    # wrong output silently, so reject them as loudly as right clashes.
    if matched_ts in right_cols or matched_ts in left.columns:
        raise ValueError(
            f"matched_ts name {matched_ts!r} collides with "
            f"{'right_cols' if matched_ts in right_cols else 'a left column'};"
            " pick a distinct matched_ts output name"
        )
    ltypes = dict(left.dtypes)
    # the matched right row travels as ONE struct, so every carried
    # right field comes from the SAME row. Carrying fields separately
    # with last(ignorenulls) per column built franken-rows: a matched
    # right row with a NULL payload value was skipped for that column
    # only, pairing an older row's value with the newer matched_ts --
    # DuckDB ASOF (the stated semantics) returns the matched row's
    # NULL. The struct is non-NULL whenever a right row exists (its ts
    # field is), so last(ignorenulls) finds exactly the latest row.
    r_struct = F.struct(
        F.col(ts).alias(matched_ts), *[F.col(c) for c in right_cols]
    )
    l_tagged = left.select(
        on,
        ts,
        F.lit(1).alias(_TAG),
        *left_payload,
        F.lit(None)
        .cast(right.select(r_struct.alias("_r")).schema["_r"].dataType)
        .alias("_r"),
    )
    r_tagged = right.filter(
        F.col(ts).isNotNull() & F.col(on).isNotNull()
    ).select(
        on,
        ts,
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_payload],
        r_struct.alias("_r"),
    )
    combined = l_tagged.unionByName(r_tagged)
    # right rows (tag 0) sort before left rows (tag 1) at equal ts, so
    # an equal-timestamp right row is visible to the left row (ts >= ts).
    # right_order keys come AFTER the tag: they order right rows among
    # themselves only, and left rows' all-NULL _r fields never compare
    # against a right row's (the tag differs first).
    order = [F.col(ts), F.col(_TAG)] + [
        F.col(f"_r.{c}") for c in (right_order or [])
    ]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.select(
        on,
        ts,
        _TAG,
        *left_payload,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.filter(F.col(_TAG) == 1)
        .select(
            on,
            ts,
            *left_payload,
            *[F.col(f"_r.{c}") for c in right_cols],
            F.col(f"_r.{matched_ts}").alias(matched_ts),
        )
    )
