"""Differential fuzzing: random predicate/aggregation queries executed
as the SAME SQL text by Spark and DuckDB over the same parquet.

The 262 registered queries pin known shapes; this fuzzes the space
BETWEEN them -- arbitrary boolean trees over comparisons, integer
arithmetic (including % and integer division edge cases), IN lists,
BETWEEN, CASE and NULL-propagating expressions -- where ANSI-dialect
divergence would hide. The expression subset is restricted to
constructs both engines define identically (integer arithmetic, string
equality/ordering on ASCII, three-valued logic); floats are excluded
on purpose -- their formatting/rounding differences are covered by the
registered queries' fixed-point conventions instead.

Hypothesis is seeded deterministically (derandomize) so CI never
flakes; bump max_examples locally to fuzz harder.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

# default example counts keep CI fast; FUZZ_SCALE=5 multiplies every
# family for a deep local pass (python -m pytest ... with FUZZ_SCALE set)
_SCALE = int(os.environ.get("FUZZ_SCALE", "1"))

from dgraph_etl_spark.catalog import table_path

SF = "/root/testdata/sf0.001"

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F", "zz"]


def _int_atom(draw):
    c = draw(st.sampled_from(INT_COLS))
    form = draw(st.integers(0, 3))
    if form == 0:
        return c
    if form == 1:
        return f"({c} + {draw(st.integers(-100, 100))})"
    if form == 2:
        return f"({c} % {draw(st.integers(2, 97))})"
    return f"({c} * {draw(st.integers(1, 7))})"


@st.composite
def predicates(draw, depth: int = 0) -> str:
    if depth < 2 and draw(st.booleans()):
        op = draw(st.sampled_from(["AND", "OR"]))
        a = draw(predicates(depth + 1))
        b = draw(predicates(depth + 1))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{neg}(({a}) {op} ({b}))"
    kind = draw(st.integers(0, 3))
    if kind == 0:
        lhs = _int_atom(draw)
        cmp_ = draw(st.sampled_from(["<", "<=", "=", ">", ">=", "<>"]))
        return f"{lhs} {cmp_} {draw(st.integers(-10, 5000))}"
    if kind == 1:
        c = draw(st.sampled_from(STR_COLS))
        vals = draw(st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"{c} IN ({quoted})"
    if kind == 2:
        lhs = _int_atom(draw)
        lo = draw(st.integers(-10, 2000))
        return f"{lhs} BETWEEN {lo} AND {lo + draw(st.integers(0, 3000))}"
    c = draw(st.sampled_from(INT_COLS))
    return f"{c} % {draw(st.integers(2, 13))} = 0"


@st.composite
def queries(draw) -> str:
    pred = draw(predicates())
    case_pred = draw(predicates())
    return (
        "SELECT l_returnflag, l_linestatus, "
        "COUNT(*) AS n, "
        "SUM(l_orderkey % 997) AS s1, "
        f"SUM(CASE WHEN {case_pred} THEN 1 ELSE 0 END) AS s2 "
        f"FROM lineitem WHERE {pred} "
        "GROUP BY l_returnflag, l_linestatus"
    )


class _OracleCon:
    """DuckDB connection wrapper that survives ORACLE-side internal
    assertion failures. Observed on duckdb 1.0.0 under a deep fuzz
    pass: a long-lived connection can fail "Attempted to dereference
    unique_ptr that is NULL!" on a query that succeeds verbatim on a
    fresh connection (reproduced), and the error invalidates the whole
    in-memory database, poisoning every later example in the module.
    An oracle-infrastructure crash is not an engine divergence:
    rebuild the connection and replay the query ONCE. If the replay
    hits ANOTHER InternalException, the crash is reproducible -- a
    DuckDB bug on that query shape (found one: a duplicated OR branch
    with BETWEEN 0 AND 0 under ORDER BY ... LIMIT deterministically
    fails the assertion on 1.0.0 while Spark evaluates it fine) -- and
    the example is REJECTED as oracle-unevaluable rather than failing
    the engine's test. Non-internal errors (bad SQL) propagate."""

    def __init__(self, build):
        self._build = build
        self._con = build()

    def _rebuild(self):
        try:
            self._con.close()
        except Exception:
            pass
        self._con = self._build()

    def execute(self, sql):
        try:
            return self._con.execute(sql)
        except (
            duckdb.InternalException,
            duckdb.FatalException,
            duckdb.InvalidInputException,
        ):
            self._rebuild()
            try:
                return self._con.execute(sql)
            except duckdb.InternalException:
                # reproducible oracle assertion failure: not our bug,
                # and not evaluable -- skip this generated example
                from hypothesis import reject

                self._rebuild()
                reject()

    def close(self):
        self._con.close()


@pytest.fixture(scope="module")
def engines(spark):
    from dgraph_etl_spark.catalog import register_views

    register_views(spark, SF)

    def build():
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'"
            )
        return con

    con = _OracleCon(build)
    yield spark, con
    con.close()


@st.composite
def window_queries(draw) -> str:
    """Ranking/offset windows over a TOTAL order ((l_orderkey,
    l_linenumber) is unique), so results are deterministic in any
    engine; the partition key and frame function vary."""
    pred = draw(predicates())
    part = draw(st.sampled_from(STR_COLS))
    fn = draw(
        st.sampled_from(
            [
                "ROW_NUMBER()",
                "RANK()",
                "DENSE_RANK()",
                "LAG(l_orderkey, 1, -1)",
                "LEAD(l_linenumber, 2, 0)",
                "SUM(l_linenumber)",
                "MIN(l_orderkey)",
            ]
        )
    )
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"{fn} OVER (PARTITION BY {part} "
        f"ORDER BY l_orderkey, l_linenumber) AS w "
        f"FROM lineitem WHERE {pred}"
    )


@st.composite
def join_queries(draw) -> str:
    """Inner/left joins lineitem-orders with independent predicates on
    both sides; aggregates stay integer-exact."""
    jt = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    lpred = draw(predicates())
    opred = draw(st.sampled_from([
        "o_orderpriority IN ('1-URGENT', '2-HIGH')",
        "o_custkey % 3 = 0",
        "o_orderkey < 3000",
        "o_custkey BETWEEN 10 AND 900",
    ]))
    return (
        "SELECT l.l_returnflag, "
        "COUNT(*) AS n, "
        "COUNT(o.o_orderkey) AS n_matched, "
        "SUM(l.l_linenumber) AS s1, "
        "SUM(COALESCE(o.o_custkey % 101, -7)) AS s2 "
        f"FROM (SELECT * FROM lineitem WHERE {lpred}) l "
        f"{jt} (SELECT * FROM orders WHERE {opred}) o "
        "ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_returnflag"
    )


@settings(max_examples=_SCALE * 40, deadline=None, derandomize=True)
@given(sql=queries())
def test_random_query_matches_duckdb(engines, sql):
    spark, con = engines
    s = (
        spark.sql(sql)
        .toPandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    o = (
        con.execute(sql)
        .df()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    # empty results legitimately differ in dtype inference; compare as
    # value tuples with exact integer equality
    s_rows = [tuple(r) for r in s.itertuples(index=False, name=None)]
    o_rows = [tuple(r) for r in o.itertuples(index=False, name=None)]
    assert s_rows == o_rows, f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"


def _exact_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        # None passes a bare `v == v` NaN guard and int(None) raises:
        # a null cell must report as a divergence, not a TypeError
        tuple(
            int(v) if v is not None and v == v else None for v in rec
        )
        for rec in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda t: tuple((x is None, x) for x in t))
    return rows


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=window_queries())
def test_random_window_matches_duckdb(engines, sql):
    spark, con = engines
    assert _exact_rows(spark.sql(sql).toPandas()) == _exact_rows(
        con.execute(sql).df()
    ), f"divergence on:\n{sql}"


@st.composite
def setop_queries(draw) -> str:
    """Bag-vs-set semantics corner: UNION [ALL] / INTERSECT [ALL] /
    EXCEPT [ALL] between two filtered projections of the same table --
    multiplicity rules are where engines classically diverge."""
    op = draw(
        st.sampled_from(
            ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
             "EXCEPT", "EXCEPT ALL"]
        )
    )
    a = draw(predicates())
    b = draw(predicates())
    proj = draw(
        st.sampled_from(
            ["l_returnflag, l_linestatus", "l_linenumber % 4, l_returnflag"]
        )
    )
    return (
        f"SELECT {proj} FROM lineitem WHERE {a} "
        f"{op} "
        f"SELECT {proj} FROM lineitem WHERE {b}"
    )


@st.composite
def agg_queries(draw) -> str:
    """Aggregate-function battery over random predicates: MIN/MAX on
    ints and strings, COUNT(DISTINCT), FILTER clauses -- all
    integer/string-exact in both engines."""
    pred = draw(predicates())
    f1 = draw(predicates())
    return (
        "SELECT l_linestatus, "
        "MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx, "
        "MIN(l_returnflag) AS mns, MAX(l_returnflag) AS mxs, "
        "COUNT(DISTINCT l_suppkey) AS cd, "
        f"COUNT(*) FILTER (WHERE {f1}) AS cf "
        f"FROM lineitem WHERE {pred} GROUP BY l_linestatus"
    )


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=setop_queries())
def test_random_setop_matches_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas()
    o = con.execute(sql).df()
    s_rows = sorted(
        tuple(str(v) for v in r) for r in s.itertuples(index=False, name=None)
    )
    o_rows = sorted(
        tuple(str(v) for v in r) for r in o.itertuples(index=False, name=None)
    )
    assert s_rows == o_rows, f"divergence on:\n{sql}"


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=agg_queries())
def test_random_aggregates_match_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas().sort_values("l_linestatus").reset_index(drop=True)
    o = con.execute(sql).df().sort_values("l_linestatus").reset_index(drop=True)
    s_rows = [tuple(str(v) for v in r) for r in s.itertuples(index=False, name=None)]
    o_rows = [tuple(str(v) for v in r) for r in o.itertuples(index=False, name=None)]
    assert s_rows == o_rows, f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=join_queries())
def test_random_join_matches_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas().sort_values("l_returnflag").reset_index(drop=True)
    o = con.execute(sql).df().sort_values("l_returnflag").reset_index(drop=True)
    s_rows = [tuple(r) for r in s.itertuples(index=False, name=None)]
    o_rows = [tuple(r) for r in o.itertuples(index=False, name=None)]
    assert s_rows == o_rows, f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"


@st.composite
def subquery_queries(draw) -> str:
    """Correlated-subquery battery: EXISTS / NOT EXISTS / IN / scalar
    subquery against orders, with independent random predicates on both
    sides -- the decorrelation space (semi/anti-join rewrites, NULL
    semantics of IN) where ANSI engines classically diverge."""
    lpred = draw(predicates())
    opred = draw(
        st.sampled_from(
            [
                "o.o_custkey % 5 = 1",
                "o.o_orderkey < 2500",
                "o.o_orderpriority IN ('1-URGENT', '5-LOW')",
                "o.o_custkey BETWEEN 50 AND 700",
            ]
        )
    )
    form = draw(st.integers(0, 3))
    if form == 0:
        sub = (
            "EXISTS (SELECT 1 FROM orders o WHERE "
            f"o.o_orderkey = l.l_orderkey AND {opred})"
        )
    elif form == 1:
        sub = (
            "NOT EXISTS (SELECT 1 FROM orders o WHERE "
            f"o.o_orderkey = l.l_orderkey AND {opred})"
        )
    elif form == 2:
        sub = (
            "l.l_orderkey IN (SELECT o.o_orderkey FROM orders o "
            f"WHERE {opred})"
        )
    else:
        # scalar correlated subquery: COUNT is always defined (0 on
        # empty), stays integer-exact
        sub = (
            "(SELECT COUNT(*) FROM orders o WHERE "
            f"o.o_orderkey = l.l_orderkey AND {opred}) "
            f"> {draw(st.integers(0, 2))}"
        )
    return (
        "SELECT l.l_returnflag, COUNT(*) AS n, "
        "SUM(l.l_linenumber) AS s "
        f"FROM lineitem l WHERE ({lpred}) AND {sub} "
        "GROUP BY l.l_returnflag"
    )


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=subquery_queries())
def test_random_subquery_matches_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas().sort_values("l_returnflag").reset_index(drop=True)
    o = con.execute(sql).df().sort_values("l_returnflag").reset_index(drop=True)
    s_rows = [tuple(int(v) if not isinstance(v, str) else v for v in r)
              for r in s.itertuples(index=False, name=None)]
    o_rows = [tuple(int(v) if not isinstance(v, str) else v for v in r)
              for r in o.itertuples(index=False, name=None)]
    assert s_rows == o_rows, f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"


@st.composite
def grouping_queries(draw) -> str:
    """GROUPING SETS / ROLLUP / CUBE over random predicates: the Expand
    fan-out's NULL grouping markers and GROUPING() flags are a classic
    dialect-divergence corner; counts/sums stay integer-exact."""
    pred = draw(predicates())
    gset = draw(
        st.sampled_from(
            [
                "ROLLUP (l_returnflag, l_linestatus)",
                "CUBE (l_returnflag, l_linestatus)",
                "GROUPING SETS ((l_returnflag), (l_linestatus), ())",
                "GROUPING SETS ((l_returnflag, l_linestatus), ())",
            ]
        )
    )
    return (
        "SELECT l_returnflag, l_linestatus, "
        "GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2, "
        "COUNT(*) AS n, SUM(l_linenumber) AS s "
        f"FROM lineitem WHERE {pred} GROUP BY {gset}"
    )


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=grouping_queries())
def test_random_grouping_sets_match_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas()
    o = con.execute(sql).df()
    s_rows = sorted(
        tuple(_canon_nested(v) for v in r)
        for r in s.itertuples(index=False, name=None)
    )
    o_rows = sorted(
        tuple(_canon_nested(v) for v in r)
        for r in o.itertuples(index=False, name=None)
    )
    if not s_rows and o_rows and all(r[4] == "0" for r in o_rows):
        # KNOWN upstream divergence this fuzzer surfaced (kept as an
        # explicit carve-out, not silenced): on EMPTY input the SQL
        # standard says grouping sets containing the grand total ()
        # still emit one zero-count row (a global aggregate over no
        # rows), and DuckDB/PostgreSQL do; Spark's Expand-based
        # rollup/cube yields zero rows instead. Outside this empty-
        # input corner the two engines agree exactly (this family's
        # other examples), and every REGISTERED rollup/cube query
        # (b92) runs on non-empty fixtures where the divergence can't
        # bite. An engine user filtering to an empty set under ROLLUP
        # should expect Spark's behavior.
        return
    assert s_rows == o_rows, f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"


# ---------------------------------------------------------------------
# Families 8 + 9 (round-7): nested types and null-ordering / decimal
# edges. These two generate PAIRED SQL texts from one random spec --
# struct/array constructors and list functions have different names in
# the two engines (named_struct/array/element_at/array_sort/collect_list
# vs struct_pack/[..]/arr[i]/list_sort/list), so a shared text cannot
# reach this space; everything AFTER construction (field access,
# arithmetic, grouping, ordering) is the semantics under test.


@st.composite
def nested_specs(draw):
    """Struct + array round-trip through a shuffle: build nested values
    in a subquery, push them through GROUP BY (and optionally a join),
    extract scalars back out, and aggregate them integer-exactly. The
    corners this reaches: struct field access after Exchange, 1-based
    array indexing, array re-sorting of an aggregated list (order-
    insensitive by construction: collect_list order is nondeterministic,
    so both engines sort before comparing)."""
    pred = draw(predicates())
    a = draw(st.sampled_from(INT_COLS))
    b = draw(st.sampled_from(INT_COLS))
    k = draw(st.integers(2, 97))
    idx = draw(st.integers(1, 3))
    joined = draw(st.booleans())
    base = f"(SELECT * FROM lineitem WHERE {pred})"
    if joined:
        base = (
            f"(SELECT l.* FROM lineitem l JOIN orders o "
            f"ON l.l_orderkey = o.o_orderkey AND o.o_custkey % 7 <> "
            f"{draw(st.integers(0, 6))} WHERE {pred.replace('l_', 'l.l_')})"
        )
    spark_inner = (
        f"SELECT l_returnflag, "
        f"named_struct('a', {a} % {k}, 'b', {b} + 1) AS s, "
        f"array({a} % {k}, {b} % {k}, ({a} + {b}) % {k}) AS arr, "
        f"l_linenumber FROM {base} t"
    )
    duck_inner = (
        f"SELECT l_returnflag, "
        f"struct_pack(a := {a} % {k}, b := {b} + 1) AS s, "
        f"[{a} % {k}, {b} % {k}, ({a} + {b}) % {k}] AS arr, "
        f"l_linenumber FROM {base} t"
    )
    spark_sql = (
        "SELECT l_returnflag, COUNT(*) AS n, "
        "SUM(s.a) AS sa, SUM(s.b) AS sb, MIN(s.a) AS mna, "
        f"SUM(element_at(arr, {idx})) AS se, "
        "SUM(size(arr)) AS sz, "
        "array_sort(collect_list(s.a % 5)) AS lst "
        f"FROM ({spark_inner}) GROUP BY l_returnflag"
    )
    duck_sql = (
        "SELECT l_returnflag, COUNT(*) AS n, "
        "SUM(s.a) AS sa, SUM(s.b) AS sb, MIN(s.a) AS mna, "
        f"SUM(arr[{idx}]) AS se, "
        "SUM(len(arr)) AS sz, "
        "list_sort(list(s.a % 5)) AS lst "
        f"FROM ({duck_inner}) t2 GROUP BY l_returnflag"
    )
    return spark_sql, duck_sql


def _canon_nested(v) -> str:
    """THE cell canonicalizer for the fuzz families (scalar + nested):
    NULL-and-dtype-insensitive -- pandas renders NULL as None or NaN by
    dtype, DuckDB returns integer SUMs as int128 objects or floats
    where Spark returns int64, so str() alone would flag '960.0' !=
    '960'. The grouping-sets family shares this (a scalar-only twin
    had already started to diverge)."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "∅"
        if v.is_integer():
            return str(int(v))
        return str(v)
    # numpy array (Spark toPandas) or python list (DuckDB df)
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_nested(x) for x in v) + "]"
    return str(v)


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(spec=nested_specs())
def test_random_nested_matches_duckdb(engines, spec):
    spark, con = engines
    spark_sql, duck_sql = spec
    s = spark.sql(spark_sql).toPandas()
    o = con.execute(duck_sql).df()
    s_rows = sorted(
        tuple(_canon_nested(v) for v in r)
        for r in s.itertuples(index=False, name=None)
    )
    o_rows = sorted(
        tuple(_canon_nested(v) for v in r)
        for r in o.itertuples(index=False, name=None)
    )
    assert s_rows == o_rows, (
        f"divergence on:\n{spark_sql}\nvs\n{duck_sql}\n"
        f"spark={s_rows}\nduck={o_rows}"
    )


@st.composite
def null_order_specs(draw):
    """NULL ordering + decimal-edge battery (same SQL text for both
    engines). A CASE expression manufactures NULLs data-dependently;
    the ORDER BY exercises every ASC/DESC x NULLS FIRST/LAST corner
    with a unique tiebreak so the row ORDER (not a sorted multiset) is
    the assertion. The decimal column rides along: same-scale
    DECIMAL(18,2) sums and a ROUND at a coarser scale probe the
    half-up-vs-half-even and widening rules -- 2dp money values make
    .x5 rounding ties COMMON, so a divergence cannot hide."""
    pred = draw(predicates())
    nullpred = draw(predicates())
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    nulls = draw(st.sampled_from(["NULLS FIRST", "NULLS LAST"]))
    rscale = draw(st.integers(0, 1))
    lim = draw(st.integers(5, 40))
    sql = (
        "SELECT l_orderkey, l_linenumber, "
        f"CASE WHEN {nullpred} THEN l_suppkey % 19 END AS nk, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) + "
        "CAST(l_quantity AS DECIMAL(18,2)) AS dsum, "
        f"ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), {rscale}) AS dr "
        f"FROM lineitem WHERE {pred} "
        # tiebreak over EVERY projected column: the fixture's
        # (l_orderkey, l_linenumber) is not unique, and any tie left
        # under the LIMIT would flag engine-legal row swaps as
        # divergence; with all output columns in the sort, residual
        # ties are identical tuples and compare equal either way
        f"ORDER BY nk {direction} {nulls}, l_orderkey, l_linenumber, "
        f"dsum, dr LIMIT {lim}"
    )
    return sql


def _canon_ordered(v) -> str:
    """Decimal-safe canonicalization: engines hand back DECIMAL cells
    as decimal.Decimal or float depending on width; compare on the
    exact numeric value with trailing zeros dropped."""
    import decimal

    if v is None or (isinstance(v, float) and v != v):
        return "∅"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return str(decimal.Decimal(str(v)).normalize())
    return str(v)


@settings(max_examples=_SCALE * 30, deadline=None, derandomize=True)
@given(sql=null_order_specs())
def test_random_null_ordering_matches_duckdb(engines, sql):
    spark, con = engines
    s_rows = [
        tuple(_canon_ordered(v) for v in r)
        for r in spark.sql(sql).toPandas().itertuples(index=False, name=None)
    ]
    o_rows = [
        tuple(_canon_ordered(v) for v in r)
        for r in con.execute(sql).df().itertuples(index=False, name=None)
    ]
    # ORDER of rows is the assertion -- no sorting here
    assert s_rows == o_rows, (
        f"divergence on:\n{sql}\nspark={s_rows}\nduck={o_rows}"
    )


# ---------------------------------------------------------------------------
# Batch-boundary invariance: the foreachBatch replay discipline, fuzzed.
#
# The streaming twins each pin ONE operator against a fixed 3-batch
# split; this family covers the DISCIPLINE itself (the class where the
# round-7 s09/s23/jdbc-sink replay bugs lived): a random keyed stream
# is split at random micro-batch boundaries and delivered through the
# shared epoch-store primitives (streaming.core.earlier_epoch_dirs /
# write_epoch) under an adversarial at-least-once schedule -- every
# epoch may be preceded by crashed attempts that either ran the fold
# fully (crash after write, before the checkpoint commit) or left
# arbitrary garbage in the epoch's OWN directory (crash mid-write) --
# and the folded store must equal the one-shot batch result computed
# in plain Python, independent of boundaries and replays.
# ---------------------------------------------------------------------------

_REPLAY_AGREEMENTS = {"max_fold": 0, "dedup_screen": 0}


@pytest.fixture(scope="module", autouse=True)
def _report_replay_agreements():
    yield
    print(f"\nbatch-boundary invariance agreements: {_REPLAY_AGREEMENTS}")


@st.composite
def epoch_schedules(draw):
    """(batches, schedule): rows (uid, key, val) split at random
    boundaries (empty micro-batches allowed -- availableNow delivers
    them), plus a delivery schedule where each epoch's final delivery
    may be preceded by up to two crashed attempts, each optionally
    leaving drawn garbage rows in the epoch's own store dir."""
    n = draw(st.integers(4, 20))
    rows = [
        (uid, draw(st.integers(0, 5)), draw(st.integers(-9, 9)))
        for uid in range(n)
    ]
    n_batches = draw(st.integers(1, 4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, n),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0] + cuts + [n]
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:])]
    sched = []
    for e in range(len(batches)):
        for _ in range(draw(st.integers(0, 2))):
            kind = draw(st.sampled_from(["garbage_dir", "crashed_run"]))
            garbage = draw(
                st.lists(
                    st.tuples(
                        st.integers(900, 909),
                        st.integers(0, 5),
                        st.integers(-99, 99),
                    ),
                    max_size=3,
                )
            )
            sched.append((e, kind, garbage))
        sched.append((e, "deliver", []))
    return batches, sched


_ROW_SCHEMA = "uid bigint, key bigint, val bigint"


def _make_max_fold(root):
    """The s09 shape: versioned max-merge store (state = latest
    strictly-earlier version; write = own per-epoch overwrite dir)."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.streaming.core import (
        earlier_epoch_dirs,
        write_epoch,
    )

    def fold(batch_df, epoch_id):
        sp = batch_df.sparkSession
        batch_agg = batch_df.groupBy("key").agg(F.max("val").alias("val"))
        versions = earlier_epoch_dirs(root, epoch_id, prefix="v")
        if versions:
            prev = sp.read.parquet(versions[-1])
            batch_agg = (
                batch_agg.unionByName(prev)
                .groupBy("key")
                .agg(F.max("val").alias("val"))
            )
        write_epoch(batch_agg.coalesce(1), root, epoch_id, prefix="v")

    return fold, "v", "key bigint, val bigint"


def _make_dedup_screen(root):
    """The s10/s15 shape: admit keys unseen in strictly-earlier epochs;
    the store is the union of immutable per-epoch admission dirs."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.streaming.core import (
        earlier_epoch_dirs,
        write_epoch,
    )

    def fold(batch_df, epoch_id):
        sp = batch_df.sparkSession
        batch_min = batch_df.groupBy("key").agg(F.min("uid").alias("uid"))
        earlier = earlier_epoch_dirs(root, epoch_id)
        if earlier:
            seen = sp.read.parquet(*earlier).select("key")
            batch_min = batch_min.join(seen, "key", "left_anti")
        write_epoch(batch_min.select("key", "uid").coalesce(1), root, epoch_id)

    return fold, "e", "key bigint, uid bigint"


def _run_schedule(spark, batches, sched, make_fold):
    import shutil
    import tempfile

    from dgraph_etl_spark.streaming.core import write_epoch

    root = tempfile.mkdtemp(prefix="fuzz_epochs_")
    try:
        fold, prefix, out_schema = make_fold(root)
        for e, kind, garbage in sched:
            df = spark.createDataFrame(batches[e], _ROW_SCHEMA)
            if kind == "garbage_dir":
                # crash mid-write: the epoch's own dir exists with junk
                junk = [g[:2] for g in garbage] or [(901, 0)]
                write_epoch(
                    spark.createDataFrame(junk, out_schema),
                    root,
                    e,
                    prefix=prefix,
                )
            elif kind == "crashed_run":
                # crash after the write, before the checkpoint commit
                fold(df, e)
            else:
                fold(df, e)
        return root, prefix
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise


@settings(max_examples=_SCALE * 12, deadline=None, derandomize=True)
@given(case=epoch_schedules())
def test_replayed_max_fold_equals_one_shot(spark, case):
    import shutil

    from dgraph_etl_spark.streaming.core import earlier_epoch_dirs

    batches, sched = case
    root, prefix = _run_schedule(spark, batches, sched, _make_max_fold)
    try:
        final = earlier_epoch_dirs(root, 10**9, prefix=prefix)[-1]
        got = {
            (r["key"], r["val"])
            for r in spark.read.parquet(final).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    expected = {}
    for batch in batches:
        for _uid, key, val in batch:
            expected[key] = max(expected.get(key, val), val)
    assert got == set(expected.items()), (batches, sched)
    _REPLAY_AGREEMENTS["max_fold"] += 1


@settings(max_examples=_SCALE * 12, deadline=None, derandomize=True)
@given(case=epoch_schedules())
def test_replayed_dedup_screen_equals_one_shot(spark, case):
    import shutil

    from dgraph_etl_spark.streaming.core import earlier_epoch_dirs

    batches, sched = case
    root, prefix = _run_schedule(spark, batches, sched, _make_dedup_screen)
    try:
        dirs = earlier_epoch_dirs(root, 10**9, prefix=prefix)
        got = {
            (r["key"], r["uid"])
            for r in spark.read.parquet(*dirs).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    # expected: one admission per distinct key -- min uid within the
    # EARLIEST batch containing the key (the admitted-key SET is
    # boundary-invariant; the representative uid is boundary-determined
    # but must be replay-invariant)
    expected = {}
    for batch in batches:
        in_batch = {}
        for uid, key, _val in batch:
            if key not in in_batch or uid < in_batch[key]:
                in_batch[key] = uid
        for key, uid in in_batch.items():
            expected.setdefault(key, uid)
    one_shot_keys = {key for batch in batches for _u, key, _v in batch}
    assert {k for k, _ in got} == one_shot_keys, (batches, sched)
    assert got == set(expected.items()), (batches, sched)
    _REPLAY_AGREEMENTS["dedup_screen"] += 1
