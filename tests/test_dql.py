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
        ("{ var(func: has(a)) { x as p } }", "unsupported root func"),
        ("{ var(func: uid(s)) { x as p @filter(uid(t)) } }",
         "positive uid filter is outside the subset"),
        ("{ var(func: uid(s)) { x as p @filter(NOT uid(t) OR NOT uid(u)) } }",
         "OR is outside the subset"),
        ("{ }", "empty query"),
        ("{ var(func: uid(s)) { inner(func: uid(x)) { y } } }",
         "nested blocks"),
    ],
)
def test_out_of_subset_queries_fail_loudly(bad, why):
    with pytest.raises(DqlSyntaxError):
        parse_dql(bad)


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


def test_duplicate_output_block_names_are_rejected():
    with pytest.raises(DqlSyntaxError, match="duplicate output block"):
        parse_dql(
            "{ a(func: eq(team_id, 7)) { x as has_member }\n"
            "  a(func: uid(x)) { person_id } }"
        )
