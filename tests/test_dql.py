"""DQL front-end tests (EP3 verbatim parity): the parser must read the
reference binary's literal query text (cmd/query/main.go:29-43), reject
out-of-subset constructs loudly, and the evaluator must reproduce the
hand-built g01-g05 traversal exactly."""

from __future__ import annotations

import pytest

from dgraph_etl_spark.graph.dql import (
    DqlSyntaxError,
    parse_dql,
)
from dgraph_etl_spark.suites.graph_traversal import REFERENCE_DQL


def test_parses_the_reference_query_verbatim():
    blocks = parse_dql(REFERENCE_DQL)
    assert [b.name for b in blocks] == [
        "var",
        "var",
        "hop1_count",
        "hop2_count",
    ]
    b0, b1, b2, b3 = blocks
    assert b0.root_kind == "eq" and b0.root_args == ("team_id", "7")
    assert b0.steps[0].pred == "has_member"
    assert b0.steps[0].alias == "src"
    assert b0.steps[0].not_uids == []
    assert b1.root_kind == "uid" and b1.root_args == ("src",)
    assert b1.steps[0].alias == "hop1"
    assert b1.steps[0].not_uids == ["src"]
    # the commented-out '# person_id' line must NOT become a leaf attr
    assert b2.leaf_attrs == []
    assert b2.steps[0].alias == "hop2"
    assert b2.steps[0].not_uids == ["hop1", "src"]
    assert b3.root_args == ("hop2",)
    assert b3.steps == [] and b3.leaf_attrs == ["person_id"]


def test_eq_value_quoting_and_whitespace_are_tolerated():
    blocks = parse_dql(
        '{ var(func: eq(team_id, "42")) {\n x as has_member\n } }'
    )
    assert blocks[0].root_args == ("team_id", "42")


@pytest.mark.parametrize(
    "bad, why",
    [
        ("var(func: eq(a, 1)) { x as p }", "no outer braces"),
        ("{ var(func: someofterms(a, b)) { x as p } }",
         "unsupported root func (alloftext joined the subset round 12)"),
        ('{ var(func: alloftext(a, "the of")) { x as p } }',
         "fulltext query that is all stopwords"),
        ("{ var(func: uid(s)) { p @filter(uid(t)) } }",
         "filtered edge step without a 'VAR as' binding"),
        ('{ var(func: anyofterms(a, "...")) { x as p } }',
         "term search with no searchable terms"),
        ("{ var(func: uid(s)) { x as p @filter(regexp(a, b)) } }",
         "regexp pattern is not a /re/ literal"),
        ("{ var(func: uid(s)) { x as p @filter(regexp(a, /b c/)) } }",
         "whitespace inside the pattern breaks tokenization: refuse"),
        ("{ var(func: uid(s)) { x as p @filter(uid(t) and uid(u)) } }",
         "lowercase 'and' is not the DQL connective"),
        ("{ var(func: uid(s)) { x as p @filter(uid(t) AND) } }",
         "dangling connective"),
        ("{ var(func: uid(s), first: x) { x as p } }",
         "non-integer first:"),
        ("{ var(func: uid(s), first: -1) { x as p } }",
         "negative first:"),
        ("{ var(func: uid(s), sort: a) { x as p } }",
         "unknown root modifier"),
        ("{ var(func: uid(s), orderasc: a, orderdesc: b) { x as p } }",
         "duplicate order modifier"),
        ("{ }", "empty query"),
        ("{ var(func: uid(s)) { inner(func: uid(x)) { y } } }",
         "nested blocks"),
    ],
)
def test_out_of_subset_queries_fail_loudly(bad, why):
    with pytest.raises(DqlSyntaxError):
        parse_dql(bad)


def test_parses_extended_head_filter_and_count():
    blocks = parse_dql(
        "{\n"
        "  seeds(func: has(knows), orderasc: age, offset: 2, first: 5) "
        "@filter((ge(age, 30) OR NOT has(knows)) AND NOT uid(v)){\n"
        "    name\n"
        "    count(knows)\n"
        "  }\n"
        "}"
    )
    (b,) = blocks
    assert b.root_kind == "has" and b.root_args == ("knows",)
    assert b.order == ("age", True)
    assert b.offset == 2 and b.first == 5
    assert b.leaf_attrs == ["name"] and b.counts == ["knows"]
    assert b.root_filter == (
        "and",
        [
            ("or", [("cmp", "ge", "age", "30"), ("not", ("has", "knows"))]),
            ("not", ("uid", "v")),
        ],
    )


def test_edge_step_boolean_filter_parses():
    blocks = parse_dql(
        "{ var(func: uid(s)) { x as p @filter(NOT uid(t) OR eq(kind, a)) } }"
    )
    step = blocks[0].steps[0]
    assert step.filt == (
        "or", [("not", ("uid", "t")), ("eq", "kind", "a")]
    )
    # the reference-subset keyhole refuses to flatten a boolean algebra
    with pytest.raises(ValueError, match="pure NOT-uid conjunction"):
        step.not_uids


def test_unbound_references_fail_loudly(spark, sf_small):
    from dgraph_etl_spark.graph.dql import run_dql
    from dgraph_etl_spark.suites.graph_traversal import dql_fixture_graph

    g = dql_fixture_graph(spark, sf_small)
    with pytest.raises(DqlSyntaxError, match="unbound var"):
        run_dql("{ out(func: uid(nowhere)) { person_id } }", g)
    with pytest.raises(DqlSyntaxError, match="unbound edge predicate"):
        run_dql("{ var(func: eq(team_id, 7)) { x as knows } }", g)
    with pytest.raises(DqlSyntaxError, match="no eq-index"):
        run_dql("{ var(func: eq(color, red)) { x as has_member }\n"
                " out(func: uid(x)) { person_id } }", g)


def test_reference_query_matches_hand_built_traversal(spark, sf_small):
    """The literal reference text through run_dql == g04's hand-built
    hop_counts, value for value (the registered g30 query pins the
    same equivalence against the DuckDB oracle)."""
    from dgraph_etl_spark.graph import traverse as G
    from dgraph_etl_spark.graph.dql import run_dql
    from dgraph_etl_spark.suites.graph_traversal import (
        TEAM,
        _graph_inputs,
        dql_fixture_graph,
    )

    results = run_dql(REFERENCE_DQL, dql_fixture_graph(spark, sf_small))
    by_name = {r.name: r for r in results}
    assert set(by_name) == {"hop1_count", "hop2_count"}

    edges, team_member, _ = _graph_inputs(spark, sf_small)
    seeds = G.team_seed(team_member, TEAM)
    hop1, hop2 = G.k_hop(edges, seeds, k=2)
    assert by_name["hop1_count"].uids.count() == hop1.count()
    assert by_name["hop2_count"].uids.count() == hop2.count()
    # the hop-2 uid SET matches, not just the count ('p:' namespace)
    dql_ids = {
        r["id"] for r in by_name["hop2_count"].uids.collect()
    }
    hand_ids = {f"p:{r['id']}" for r in hop2.collect()}
    assert dql_ids == hand_ids
    # leaf projection resolves person_id for every hop-2 uid
    attrs = by_name["hop2_count"].attrs
    assert attrs is not None
    assert {r["person_id"] for r in attrs.collect()} == {
        r["id"] for r in hop2.collect()
    }


@pytest.fixture()
def toy_graph(spark):
    """Five people: ages 25/30/35/40/None, 'knows' edges out of a/b/c.
    Small enough to reason through every lane by hand."""
    from dgraph_etl_spark.graph.dql import DqlGraph

    people = [
        ("a", 25),
        ("b", 30),
        ("c", 35),
        ("d", 40),
        ("e", None),
    ]
    # e knows someone but has NO age row: the ordered lanes must DROP
    # it (Dgraph's sorted-query semantics), the unordered ones keep it.
    # The third column is the 'weight' FACET (@facets lanes filter on
    # it; plain traversals project it away).
    knows = [
        ("a", "b", 3),
        ("a", "c", 7),
        ("b", "c", 5),
        ("c", "a", 1),
        ("c", "d", 9),
        ("e", "a", 2),
    ]
    age = spark.createDataFrame(
        [(i, str(v)) for i, v in people if v is not None],
        "id string, value string",
    )
    return DqlGraph(
        edge_preds={
            "knows": spark.createDataFrame(
                knows, "src string, dst string, weight int"
            )
        },
        eq_index={"age": age},
        leaf_attrs={
            "age": spark.createDataFrame(
                [(i, v) for i, v in people if v is not None],
                "id string, age int",
            )
        },
        attr_types={"age": "int"},
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_root_funcs_and_boolean_filter(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # has(knows) = sources of knows edges
    (res,) = run_dql("{ out(func: has(knows)) { age } }", toy_graph)
    assert _ids(res.uids) == ["a", "b", "c", "e"]
    # ge root: numeric compare (30 <= age), 'e' (no age) excluded
    (res,) = run_dql("{ out(func: ge(age, 30)) { age } }", toy_graph)
    assert _ids(res.uids) == ["b", "c", "d"]
    # boolean algebra on the root filter: (lt OR NOT has) AND NOT eq
    (res,) = run_dql(
        "{ v(func: has(age)) "
        "@filter((lt(age, 30) OR NOT has(knows)) AND NOT eq(age, 40))"
        "{ age } }",
        toy_graph,
    )
    # lt(30) -> a; NOT has(knows) -> d; NOT eq(40) kills d -> {a}
    assert _ids(res.uids) == ["a"]


def test_edge_step_positive_filter(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # neighbors of a, kept only when they know someone themselves
    (res,) = run_dql(
        "{ var(func: eq(age, 25)) { n as knows @filter(has(knows)) }\n"
        "  out(func: uid(n)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["b", "c"]


def test_ordered_pagination_and_missing_attr_drop(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ page(func: has(age), orderdesc: age, offset: 1, first: 2)"
        " { age } }",
        toy_graph,
    )
    rows = {r["id"]: r["rn"] for r in res.uids.collect()}
    # desc order d(40) c(35) b(30) a(25); offset 1, first 2 -> c, b
    assert rows == {"c": 2, "b": 3}
    # attrs carry the rank through
    got = {(r["id"], r["rn"], r["age"]) for r in res.attrs.collect()}
    assert got == {("c", 2, 35), ("b", 3, 30)}
    # ordering by an attribute DROPS nodes missing it: e is in
    # has(knows) but carries no age row
    (res,) = run_dql(
        "{ page(func: has(knows), orderasc: age, first: 10) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["a", "b", "c"]


def test_pagination_without_order_pages_by_id(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ page(func: has(knows), offset: 1, first: 1) { age } }",
        toy_graph,
    )
    rows = [(r["id"], r["rn"]) for r in res.uids.collect()]
    assert rows == [("b", 2)]


def test_count_fanout_includes_zero(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ fanout(func: ge(age, 25)) { count(knows) } }", toy_graph
    )
    got = {
        (r["id"], r["count_knows"]) for r in res.attrs.collect()
    }
    assert got == {("a", 2), ("b", 1), ("c", 2), ("d", 0)}


def test_recurse_parse_and_constraints():
    (b,) = parse_dql(
        "{ r(func: uid(s)) @filter(NOT uid(t)) "
        "@recurse(depth: 3, loop: true) { knows\n age } }"
    )
    assert b.recurse == (3, True)
    assert b.root_filter == ("not", ("uid", "t"))
    assert b.leaf_attrs == ["knows", "age"]
    # directive order is free
    (b,) = parse_dql(
        "{ r(func: uid(s)) @recurse(depth: 2) @filter(uid(t)) { knows } }"
    )
    assert b.recurse == (2, False) and b.root_filter == ("uid", "t")
    for bad, why in [
        ("{ r(func: uid(s)) @recurse(loop: true) { p } }", "depth required"),
        ("{ r(func: uid(s)) @recurse(depth: 0) { p } }", "depth >= 1"),
        ("{ var(func: uid(s)) @recurse(depth: 2) { p } }",
         "var recurse binds nothing"),
        ("{ r(func: uid(s), first: 2) @recurse(depth: 2) { p } }",
         "pagination is per-level in Dgraph; flattened output refuses"),
        ("{ r(func: uid(s)) @recurse(depth: 2) { x as p } }",
         "recurse bodies take bare predicates"),
        ("{ r(func: uid(s)) @normalize { p } }", "unknown directive"),
    ]:
        with pytest.raises(DqlSyntaxError):
            parse_dql(bad)


def test_recurse_reach_set(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    def reach(depth):
        (res,) = run_dql(
            "{ r(func: eq(age, 25)) @recurse(depth: %d) { knows } }"
            % depth,
            toy_graph,
        )
        return _ids(res.uids)

    # a -> {b,c} -> {d} (c->a pruned by visited)
    assert reach(1) == ["a"]
    assert reach(2) == ["a", "b", "c"]
    assert reach(3) == ["a", "b", "c", "d"]
    assert reach(9) == ["a", "b", "c", "d"]  # fixpoint, early exit
    # leaf words that aren't edge predicates project over the reach
    # set (inner join: nodes without the attr drop from attrs only)
    (res,) = run_dql(
        "{ r(func: eq(age, 25)) @recurse(depth: 3) { knows\n age } }",
        toy_graph,
    )
    got = {(r["id"], r["age"]) for r in res.attrs.collect()}
    assert got == {("a", 25), ("b", 30), ("c", 35), ("d", 40)}


def test_root_function_trailing_content_rejected():
    # 'func: eq(a,1) AND eq(b,2)' must refuse, not silently run as
    # the first conjunct (root funcs don't compose; @filter does)
    with pytest.raises(DqlSyntaxError, match="trailing content after root"):
        parse_dql(
            "{ out(func: eq(team_id, 7) AND eq(score, 1)) { person_id } }"
        )
    with pytest.raises(DqlSyntaxError, match="trailing content after root"):
        parse_dql("{ out(func: uid(v) junk) { person_id } }")


def test_duplicate_projection_lines_rejected():
    with pytest.raises(DqlSyntaxError, match="duplicate field"):
        parse_dql("{ out(func: has(knows)) { age\n age } }")
    with pytest.raises(DqlSyntaxError, match="duplicate count"):
        parse_dql(
            "{ out(func: has(knows)) { count(knows)\n count(knows) } }"
        )


def test_eq_compares_by_declared_type(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # int-typed attribute: '25.0' and '025' are the same number, so
    # eq must agree with ge-AND-le (string eq would return nothing)
    (res,) = run_dql("{ v(func: eq(age, 25.0)) { age } }", toy_graph)
    assert _ids(res.uids) == ["a"]
    (res,) = run_dql("{ v(func: eq(age, 025)) { age } }", toy_graph)
    assert _ids(res.uids) == ["a"]


def test_leaf_projection_is_left_join(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # e has knows edges but no age: Dgraph returns the node with the
    # fields it has, so the projection keeps the row with a NULL age
    # (@cascade is the explicit opt-in to pruning)
    (res,) = run_dql("{ v(func: has(knows)) { age } }", toy_graph)
    got = {(r["id"], r["age"]) for r in res.attrs.collect()}
    assert got == {("a", 25), ("b", 30), ("c", 35), ("e", None)}


def test_cascade_parse_constraints():
    (b,) = parse_dql("{ v(func: has(knows)) @cascade { age } }")
    assert b.cascade and b.leaf_attrs == ["age"]
    for bad in [
        "{ v(func: has(knows)) @cascade(age) { age } }",  # no args
        "{ var(func: has(knows)) @cascade { age } }",  # var binds nothing
        "{ v(func: uid(s)) @cascade { x as knows\n age } }",  # steps
        "{ v(func: has(knows)) @cascade { } }",  # nothing to require
    ]:
        with pytest.raises(DqlSyntaxError):
            parse_dql(bad)


def test_cascade_prunes_after_pagination(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # e is in has(knows) but has no age: cascade drops it
    (res,) = run_dql(
        "{ v(func: has(knows)) @cascade { age } }", toy_graph
    )
    assert _ids(res.uids) == ["a", "b", "c"]
    # Dgraph's documented gotcha: cascade applies AFTER first: N, so
    # the page comes back short (e occupied the 4th slot, rank kept)
    (res,) = run_dql(
        "{ v(func: has(knows), first: 4) @cascade { age } }", toy_graph
    )
    rows = {r["id"]: r["rn"] for r in res.uids.collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}


def test_value_variable_binding_and_filters(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # attr bind: defined only where the attribute exists (e drops)
    (res,) = run_dql(
        "{ var(func: has(knows)) { a as age }\n"
        "  out(func: uid(a)) @filter(ge(val(a), 30)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["b", "c"]
    # count bind: defined (as 0) on every root uid
    (res,) = run_dql(
        "{ var(func: eq(age, 40)) { k as count(knows) }\n"
        "  z(func: uid(k)) @filter(eq(val(k), 0)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["d"]


def test_facet_filter_prunes_edges(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # a's edges: b (weight 3), c (weight 7) -- only c clears ge(5)
    (res,) = run_dql(
        "{ var(func: eq(age, 25)) { n as knows @facets(ge(weight, 5)) }\n"
        "  out(func: uid(n)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["c"]
    # boolean facet algebra composes
    (res,) = run_dql(
        "{ var(func: eq(age, 25)) "
        "{ n as knows @facets(ge(weight, 5) OR eq(weight, 3)) }\n"
        "  out(func: uid(n)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["b", "c"]
    # unknown facet name and uid-set terms fail loudly
    with pytest.raises(DqlSyntaxError, match="not present on edge"):
        run_dql(
            "{ var(func: eq(age, 25)) { n as knows @facets(ge(bogus, 1)) }\n"
            "  out(func: uid(n)) { age } }",
            toy_graph,
        )
    with pytest.raises(DqlSyntaxError, match="@facets supports"):
        parse_dql("{ var(func: uid(s)) { n as p @facets(uid(t)) } }")


def test_null_facet_never_matches_even_under_not(spark):
    from dgraph_etl_spark.graph.dql import DqlGraph, run_dql

    g = DqlGraph(
        edge_preds={
            "knows": spark.createDataFrame(
                [("a", "b", 3.0), ("a", "c", None)],
                "src string, dst string, weight double",
            )
        },
        eq_index={},
        leaf_attrs={},
    )
    # c's weight facet is NULL (absent): it fails the predicate even
    # NEGATED (SQL three-valued logic == Dgraph's facet-filter rule)
    (res,) = run_dql(
        "{ var(func: has(knows)) { n as knows @facets(NOT eq(weight, 4)) }"
        "\n  out(func: uid(n)) { }\n}",
        g,
    )
    assert _ids(res.uids) == ["b"]
    (res,) = run_dql(
        "{ var(func: has(knows)) { n as knows @facets(NOT eq(weight, 3)) }"
        "\n  out(func: uid(n)) { }\n}",
        g,
    )
    assert _ids(res.uids) == []
    # a facet on an attribute VALUE BIND refuses (it would otherwise
    # silently drop the predicate)
    g2 = DqlGraph(
        edge_preds={},
        eq_index={
            "age": spark.createDataFrame(
                [("a", "1")], "id string, value string"
            )
        },
        leaf_attrs={},
    )
    with pytest.raises(DqlSyntaxError, match="value bind"):
        run_dql(
            "{ var(func: has(age)) { x as age @facets(ge(weight, 1)) }\n"
            "  out(func: uid(x)) { }\n}",
            g2,
        )


def test_groupby_and_count_uid(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ g(func: has(age)) @groupby(age) { count(uid) } }", toy_graph
    )
    got = {(r["age"], r["count"]) for r in res.attrs.collect()}
    assert got == {(25.0, 1), (30.0, 1), (35.0, 1), (40.0, 1)}
    # uids lacking the grouped attribute drop (e has no age)
    (res,) = run_dql(
        "{ g(func: has(knows)) @groupby(age) { count(uid) } }", toy_graph
    )
    assert sum(r["count"] for r in res.attrs.collect()) == 3
    # plain count(uid): root cardinality as one row
    (res,) = run_dql(
        "{ c(func: has(knows)) { count(uid) } }", toy_graph
    )
    assert res.attrs.collect()[0]["count"] == 4
    for bad in [
        "{ g(func: has(age)) @groupby(age) { age } }",  # needs count(uid)
        "{ var(func: has(age)) @groupby(age) { count(uid) } }",
        "{ c(func: has(age)) { count(uid)\n age } }",  # no mixing
    ]:
        with pytest.raises(DqlSyntaxError):
            parse_dql(bad)


def test_value_variable_root_function(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # func: ge(val(x), N) roots directly over a value variable
    (res,) = run_dql(
        "{ var(func: has(knows)) { a as age }\n"
        "  out(func: ge(val(a), 30)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["b", "c"]
    (res,) = run_dql(
        "{ var(func: has(age)) { a as age }\n"
        "  out(func: eq(val(a), 40)) { age } }",
        toy_graph,
    )
    assert _ids(res.uids) == ["d"]


def test_value_bind_in_output_block_projects(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # a value bind in a NAMED block also projects the bound field
    # (Dgraph returns it with each node); attr binds stay NULL where
    # the attribute is absent
    (res,) = run_dql(
        "{ out(func: has(knows)) {\n"
        "    k as count(knows)\n    a as age\n  } }",
        toy_graph,
    )
    got = {
        (r["id"], r["k"], r["a"]) for r in res.attrs.collect()
    }
    assert got == {
        ("a", 2.0, 25.0),
        ("b", 1.0, 30.0),
        ("c", 2.0, 35.0),
        ("e", 1.0, None),
    }


def test_value_aggregation_block(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ var(func: has(age)) { s as age }\n"
        "  stats(func: uid(s)) {\n"
        "    min(val(s))\n    max(val(s))\n"
        "    sum(val(s))\n    avg(val(s))\n  } }",
        toy_graph,
    )
    (row,) = res.attrs.collect()
    assert (row["min_s"], row["max_s"]) == (25.0, 40.0)
    assert row["sum_s"] == 130.0
    assert row["avg_s"] == 32.5


def test_value_variable_misuse_fails_loudly(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    # val() over a uid var
    with pytest.raises(DqlSyntaxError, match="uid set, not a value"):
        run_dql(
            "{ var(func: eq(age, 25)) { u as knows }\n"
            "  out(func: uid(u)) @filter(gt(val(u), 1)) { age } }",
            toy_graph,
        )
    # aggregation blocks are outputs and take only agg lines
    with pytest.raises(DqlSyntaxError, match="is an output"):
        parse_dql("{ var(func: uid(x)) { min(val(x)) } }")
    with pytest.raises(DqlSyntaxError, match="ONLY min/max/sum/avg"):
        parse_dql("{ s(func: uid(x)) { min(val(x))\n age } }")
    with pytest.raises(DqlSyntaxError, match="duplicate aggregate"):
        parse_dql("{ s(func: uid(x)) { min(val(x))\n min(val(x)) } }")


def test_numeric_attr_with_nonnumeric_literal_fails_loudly(
    spark, toy_graph
):
    from dgraph_etl_spark.graph.dql import run_dql

    with pytest.raises(DqlSyntaxError, match="non-numeric literal"):
        run_dql("{ v(func: ge(age, old)) { age } }", toy_graph)


def test_duplicate_output_block_names_are_rejected():
    with pytest.raises(DqlSyntaxError, match="duplicate output block"):
        parse_dql(
            "{ a(func: eq(team_id, 7)) { x as has_member }\n"
            "  a(func: uid(x)) { person_id } }"
        )


# ---- round-11 additions: quoted-structural-char scanning, term/regexp
# search, has() multi-table union, output-name collisions, empty-root
# aggregate pinning.


def test_quoted_values_may_contain_structural_chars():
    # parens/braces/commas inside quoted literals are content, not
    # structure (round-10 advisory: the scanners must skip quoted
    # regions, not count through them)
    blocks = parse_dql(
        '{ v(func: eq(name, "a(b")) @filter(eq(name, "x,y(z{")) '
        "{ x as knows } }"
    )
    assert blocks[0].root_args == ("name", "a(b")
    assert blocks[0].root_filter == ("eq", "name", "x,y(z{")
    with pytest.raises(DqlSyntaxError, match="unterminated quote"):
        parse_dql('{ v(func: eq(name, "a(b)) { x as knows } }')


def test_term_and_regexp_parse():
    blocks = parse_dql(
        '{ v(func: anyofterms(bio, "Fast, RED-cars")) '
        '@filter(allofterms(bio, "slow boat") '
        "AND NOT regexp(bio, /ca[rt]s?/i)) { bio } }"
    )
    b = blocks[0]
    # query terms go through the same tokenizer as stored values:
    # lowercased, split on non-alphanumeric runs
    assert b.root_kind == "terms"
    assert b.root_args == ("any", "bio", ("fast", "red", "cars"))
    assert b.root_filter == (
        "and",
        [
            ("terms", "all", "bio", ("slow", "boat")),
            ("not", ("regexp", "bio", "ca[rt]s?", True)),
        ],
    )


@pytest.fixture()
def text_graph(spark):
    """Four people with a free-text 'bio' attribute (term/regexp
    lanes), plus the age index so mixed filters compose."""
    from dgraph_etl_spark.graph.dql import DqlGraph

    bios = [
        ("a", "Fast red cars; slow boats"),
        ("b", "slow RED boat"),
        ("c", "green bicycles only"),
        ("d", None),  # NULL bio: absent attribute, matches nothing
    ]
    return DqlGraph(
        edge_preds={},
        eq_index={
            "bio": spark.createDataFrame(bios, "id string, value string"),
            "age": spark.createDataFrame(
                [("a", "25"), ("b", "30"), ("c", "35")],
                "id string, value string",
            ),
        },
        leaf_attrs={},
        attr_types={"age": "int"},
    )


def test_anyofterms_allofterms_semantics(spark, text_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    def ids(q):
        (res,) = run_dql(q, text_graph)
        return sorted(r["id"] for r in res.uids.collect())

    # any: token-set intersection, case-insensitive, punctuation splits
    assert ids('{ v(func: anyofterms(bio, "CARS bicycles")) {} }') == [
        "a",
        "c",
    ]
    # all: every query term must appear (order-free)
    assert ids('{ v(func: allofterms(bio, "boat slow")) {} }') == ["b"]
    # 'boats' is a different term than 'boat' (no stemming)
    assert ids('{ v(func: allofterms(bio, "slow boats")) {} }') == ["a"]
    # filter form composes with the boolean algebra
    assert ids(
        '{ v(func: has(bio)) @filter(anyofterms(bio, "red") '
        'AND NOT allofterms(bio, "fast cars")) {} }'
    ) == ["b"]


def test_regexp_semantics(spark, text_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    def ids(q):
        (res,) = run_dql(q, text_graph)
        return sorted(r["id"] for r in res.uids.collect())

    # substring match on the RAW string, case-sensitive by default
    assert ids("{ v(func: regexp(bio, /red/)) {} }") == ["a"]
    assert ids("{ v(func: regexp(bio, /RED/)) {} }") == ["b"]
    assert ids("{ v(func: regexp(bio, /RED/i)) {} }") == ["a", "b"]
    assert ids("{ v(func: regexp(bio, /boats?;/)) {} }") == []
    assert ids("{ v(func: regexp(bio, /cars;/)) {} }") == ["a"]


def test_string_search_on_numeric_attr_fails_loudly(spark, text_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    with pytest.raises(DqlSyntaxError, match="string attribute"):
        run_dql('{ v(func: anyofterms(age, "25")) {} }', text_graph)
    with pytest.raises(DqlSyntaxError, match="string attribute"):
        run_dql("{ v(func: regexp(age, /2/)) {} }", text_graph)


def test_has_unions_leaf_and_eq_index(spark):
    # leaf and eq_index both bound for one predicate with DIFFERENT id
    # coverage: has(pred) must union them (round-10 advisory), and a
    # NULL stored value satisfies has() through neither table
    from dgraph_etl_spark.graph.dql import DqlGraph, run_dql

    g = DqlGraph(
        edge_preds={},
        eq_index={
            "tag": spark.createDataFrame(
                [("a", "x"), ("b", None)], "id string, value string"
            )
        },
        leaf_attrs={
            "tag": spark.createDataFrame(
                [("c", "y"), ("d", None)], "id string, tag string"
            )
        },
        attr_types={},
    )
    (res,) = run_dql("{ v(func: has(tag)) {} }", g)
    assert sorted(r["id"] for r in res.uids.collect()) == ["a", "c"]


def test_output_column_collisions_are_rejected_at_parse_time():
    # value-bind alias vs leaf projection (round-10 advisory)
    with pytest.raises(DqlSyntaxError, match="column name collision"):
        parse_dql("{ v(func: has(age)) { score as score\n score } }")
    # alias vs count projection
    with pytest.raises(DqlSyntaxError, match="column name collision"):
        parse_dql(
            "{ v(func: has(age)) { count_knows as age\n count(knows) } }"
        )
    # reserved executor columns
    with pytest.raises(DqlSyntaxError, match="column name collision"):
        parse_dql("{ v(func: has(age)) { id } }")
    # var blocks project nothing: no collision to refuse
    parse_dql("{ var(func: has(age)) { score as score } }")


def test_empty_root_aggregates_are_null(spark, toy_graph):
    # Pin the empty-root aggregate edge (round-10 advisory): an
    # aggregation block over an empty uid set emits ONE row with NULL
    # in every aggregate column (Spark's empty-input min/max/sum are
    # NULL; avg's NULL/0 division is NULL). Dgraph omits the aggregate
    # entirely -- a tabular output has no 'omitted' shape, so NULL is
    # this engine's pinned contract; a future change must fail here.
    from dgraph_etl_spark.graph.dql import run_dql

    (res,) = run_dql(
        "{ var(func: has(age)) { d as age }\n"
        "  s(func: uid(d)) @filter(gt(val(d), 1000)) "
        "{ min(val(d))\n max(val(d))\n sum(val(d))\n avg(val(d)) } }",
        toy_graph,
    )
    (row,) = res.attrs.collect()
    assert row["min_d"] is None
    assert row["max_d"] is None
    assert row["sum_d"] is None
    assert row["avg_d"] is None


def test_between_is_inclusive_and_typed(spark, toy_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    def ids(q):
        (res,) = run_dql(q, toy_graph)
        return sorted(r["id"] for r in res.uids.collect())

    # inclusive both ends, numeric compare (age is declared int)
    assert ids("{ v(func: between(age, 30, 40)) {} }") == ["b", "c", "d"]
    assert ids("{ v(func: between(age, 30, 30)) {} }") == ["b"]
    # empty range: no rows, not an error
    assert ids("{ v(func: between(age, 40, 30)) {} }") == []
    # filter-term form composes
    assert ids(
        "{ v(func: has(age)) @filter(NOT between(age, 26, 39)) {} }"
    ) == ["a", "d"]
    with pytest.raises(DqlSyntaxError, match="non-numeric"):
        run_dql("{ v(func: between(age, x, 30)) {} }", toy_graph)
    with pytest.raises(DqlSyntaxError, match="takes \\(attr, lo, hi\\)"):
        parse_dql("{ v(func: between(age, 30)) {} }")


def test_expand_all_parse_constraints():
    with pytest.raises(DqlSyntaxError, match="name the block"):
        parse_dql("{ var(func: has(age)) { expand(_all_) } }")
    with pytest.raises(DqlSyntaxError, match="outside the subset"):
        parse_dql(
            "{ v(func: has(age)) @recurse(depth: 2) "
            "{ knows\n expand(_all_) } }"
        )
    with pytest.raises(DqlSyntaxError, match="duplicate expand"):
        parse_dql("{ v(func: has(age)) { expand(_all_)\n expand(_all_) } }")
    with pytest.raises(DqlSyntaxError, match="ONLY the count"):
        parse_dql(
            "{ v(func: has(age)) @groupby(age) "
            "{ count(uid)\n expand(_all_) } }"
        )


def test_expand_all_projects_every_bound_leaf(spark):
    from dgraph_etl_spark.graph.dql import DqlGraph, run_dql

    g = DqlGraph(
        edge_preds={},
        eq_index={
            "age": spark.createDataFrame(
                [("a", "25"), ("b", "30")], "id string, value string"
            )
        },
        leaf_attrs={
            "age": spark.createDataFrame(
                [("a", 25), ("b", 30)], "id string, age int"
            ),
            # b has no city row: LEFT join keeps it with NULL
            "city": spark.createDataFrame(
                [("a", "rome")], "id string, city string"
            ),
        },
        attr_types={"age": "int"},
    )
    (res,) = run_dql("{ v(func: has(age)) { expand(_all_) } }", g)
    rows = {r["id"]: (r["age"], r["city"]) for r in res.attrs.collect()}
    assert rows == {"a": (25, "rome"), "b": (30, None)}
    # explicit leaf + expand: no duplicate column, explicit order kept
    (res,) = run_dql("{ v(func: has(age)) { city\n expand(_all_) } }", g)
    assert res.attrs.columns == ["id", "city", "age"]


# ---- round-12 additions: quote-aware comment stripping, targeted
# brace-in-pattern refusal (both round-11 advisories).


def test_comment_stripping_is_quote_aware():
    # '#' inside a quoted literal is content, not a comment opener --
    # the old line-truncating strip surfaced an unrelated
    # 'unterminated quote' error (round-11 advisory)
    blocks = parse_dql('{ v(func: eq(name, "a#b")) { name } }')
    assert blocks[0].root_args == ("name", "a#b")
    # a real trailing comment after the quoted value still strips
    blocks = parse_dql(
        '{ v(func: eq(name, "a#b")) { # trailing\n name } }'
    )
    assert blocks[0].leaf_attrs == ["name"]
    # unterminated quote: stripping backs off and the structural
    # scanner refuses the FULL fragment loudly
    with pytest.raises(DqlSyntaxError, match="unterminated quote"):
        parse_dql('{ v(func: eq(name, "a#b)) { name } }')


def test_brace_quantifier_in_pattern_refused_by_name():
    # /a{2}/: the '{' reads as the block-body opener; the refusal must
    # name the pattern problem, not surface unbalanced parens
    with pytest.raises(DqlSyntaxError, match="inside a /re/ pattern"):
        parse_dql("{ v(func: regexp(name, /a{2}/)) { name } }")
    with pytest.raises(DqlSyntaxError, match="inside a /re/ pattern"):
        parse_dql(
            "{ v(func: has(name)) @filter(regexp(name, /b{3}/)) "
            "{ name } }"
        )


# ---- round-12: @normalize (flattened nested-block output)


def test_normalize_parse_tree_and_constraints():
    q = """{
      flat(func: eq(team, "a")) @normalize {
        t: team
        has_member {
          member: name
          age
          knows {
            peer: name
          }
        }
      }
    }"""
    (b,) = parse_dql(q)
    assert b.normalize and b.norm_tree is not None
    assert b.norm_tree.leaves == [("t", "team")]
    (pred, child), = b.norm_tree.children
    assert pred == "has_member"
    assert child.leaves == [("member", "name"), (None, "age")]
    (pred2, gchild), = child.children
    assert pred2 == "knows" and gchild.leaves == [("peer", "name")]

    with pytest.raises(DqlSyntaxError, match="name the block"):
        parse_dql('{ var(func: eq(a, "1")) @normalize { x: a } }')
    with pytest.raises(DqlSyntaxError, match="aliases no predicate"):
        parse_dql('{ v(func: eq(a, "1")) @normalize { a\n b } }')
    with pytest.raises(DqlSyntaxError, match="alias collision"):
        parse_dql(
            '{ v(func: eq(a, "1")) @normalize { x: a\n p { x: b } } }'
        )
    with pytest.raises(DqlSyntaxError, match="bare predicate name"):
        parse_dql(
            '{ v(func: eq(a, "1")) @normalize '
            "{ x: a\n p @filter(eq(b, 1)) { y: b } } }"
        )
    with pytest.raises(DqlSyntaxError, match="outside the subset"):
        parse_dql(
            '{ v(func: eq(a, "1")) @recurse(depth: 2) @normalize '
            "{ x: a } }"
        )
    with pytest.raises(DqlSyntaxError, match="duplicate @normalize sub-block"):
        parse_dql(
            '{ v(func: eq(a, "1")) @normalize '
            "{ x: a\n p { y: b }\n p { z: c } } }"
        )
    # nested blocks WITHOUT @normalize still refuse
    with pytest.raises(DqlSyntaxError, match="nested blocks"):
        parse_dql('{ v(func: eq(a, "1")) { p { y: b } } }')


def test_normalize_flatten_semantics(spark):
    from dgraph_etl_spark.graph.dql import DqlGraph, run_dql

    g = DqlGraph(
        edge_preds={
            "has_member": spark.createDataFrame(
                [("T", "m1"), ("T", "m2"), ("T", "m3")],
                "src string, dst string",
            ),
            "knows": spark.createDataFrame(
                [("m1", "m2"), ("m1", "m3")], "src string, dst string"
            ),
        },
        eq_index={
            "team": spark.createDataFrame(
                [("T", "a")], "id string, value string"
            ),
        },
        leaf_attrs={
            "team": spark.createDataFrame(
                [("T", "a")], "id string, team string"
            ),
            "name": spark.createDataFrame(
                [("m1", "alice"), ("m2", "bob")], "id string, name string"
            ),
            "age": spark.createDataFrame([("m1", 30)], "id string, age int"),
        },
    )
    q = """{
      flat(func: eq(team, "a")) @normalize {
        t: team
        has_member {
          member: name
          age
          knows {
            peer: name
          }
        }
      }
    }"""
    (res,) = run_dql(q, g)
    # only aliased predicates project (age is fetched-but-omitted)
    assert res.attrs.columns == ["id", "t", "member", "peer"]
    rows = sorted(
        ((r["t"], r["member"], r["peer"]) for r in res.attrs.collect()),
        key=str,
    )
    # m1 knows m2 (named) and m3 (nameless -> NULL peer); m2 has no
    # knows edge (row kept, NULL subtree); m3 has no name (NULL member)
    assert rows == sorted(
        [
            ("a", "alice", "bob"),
            ("a", "alice", None),
            ("a", "bob", None),
            ("a", None, None),
        ],
        key=str,
    )


# ---- round-12: alloftext/anyoftext (fulltext analyzer)


def test_fulltext_parse_and_stopword_refusal():
    blocks = parse_dql(
        '{ v(func: alloftext(bio, "The Sorting of streams")) '
        '@filter(NOT anyoftext(bio, "customers")) { bio } }'
    )
    b = blocks[0]
    # query text runs the full analyzer: stopwords drop, tokens stem
    assert b.root_kind == "fulltext"
    assert b.root_args == ("all", "bio", ("sort", "stream"))
    assert b.root_filter == (
        "not", ("fulltext", "any", "bio", ("customer",))
    )
    with pytest.raises(DqlSyntaxError, match="no searchable terms"):
        parse_dql('{ v(func: alloftext(bio, "the of and")) { bio } }')


def test_fulltext_stemmer_python_matches_sql(spark):
    # the Python query-side stemmer and the engine-side SQL fragment
    # must agree token-for-token, or a query term could stem past its
    # own stored form
    import random

    from pyspark.sql import functions as F

    from dgraph_etl_spark.graph.dql import _stem_case_sql, fulltext_stem

    random.seed(12)
    base = [
        "sort", "sorting", "sorted", "sortly", "cross", "crosses",
        "ties", "ies", "s", "ss", "as", "cats", "miss", "misses",
        "sing", "string", "strings", "red", "speed", "freed", "fly",
        "slowly", "ly", "ed", "ing", "a", "", "queries", "classes",
    ]
    toks = base + [
        "".join(random.choice("abcdefgs") for _ in range(random.randint(1, 9)))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = [
        r["s"]
        for r in df.select(
            F.expr(_stem_case_sql("t")).alias("s")
        ).collect()
    ]
    assert got == [fulltext_stem(t) for t in toks]


def test_fulltext_semantics(spark, text_graph):
    from dgraph_etl_spark.graph.dql import run_dql

    def ids(q):
        (res,) = run_dql(q, text_graph)
        return sorted(r["id"] for r in res.uids.collect())

    # 'boats' stems to 'boat': matches a ("slow boats") and b ("boat")
    assert ids('{ v(func: alloftext(bio, "boats")) {} }') == ["a", "b"]
    # stopword 'the' drops; 'cars' stems to 'car'... but stored 'cars'
    # stems to 'car' too -> a matches
    assert ids('{ v(func: alloftext(bio, "the cars")) {} }') == ["a"]
    # allof requires EVERY stemmed term
    assert ids('{ v(func: alloftext(bio, "boats green")) {} }') == []
    assert ids('{ v(func: anyoftext(bio, "boats green")) {} }') == [
        "a", "b", "c",
    ]
