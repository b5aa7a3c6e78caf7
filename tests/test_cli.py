"""Smoke tests for the three reference-parity CLI entry points
(reference Makefile:3-10 -> cmd/etl, cmd/bulk, cmd/query).

Run in-process (main(argv)): get_spark getOrCreate reuses the test
session, so no per-command JVM spin-up.
"""

from __future__ import annotations

import json
import os

from dgraph_etl_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def _last_json_line(capsys) -> dict:
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(out[-1])


def test_cli_etl(spark, tmp_path, capsys):
    sink = str(tmp_path / "sink")
    assert main(["etl", "--source", SF, "--sink", sink, "--watermark", "0"]) == 0
    res = _last_json_line(capsys)
    assert res["rows_read"] > 0
    assert res["next_watermark_s"] > 0
    # logs land in the printed per-run subdir (replace-all semantics
    # per run; reruns with fewer partitions can't mix stale parts)
    run_dir = res["sink"]
    assert run_dir.startswith(sink)
    logs = [f for f in os.listdir(run_dir) if f.endswith(".ndjson")]
    assert logs, "live sink wrote no mutation logs"
    n_lines = sum(
        1
        for f in logs
        for ln in open(os.path.join(run_dir, f))
        if ln.strip() and "__commit__" not in ln
    )
    assert n_lines > 0


def test_cli_etl_empty_increment_keeps_watermark(spark, tmp_path, capsys):
    """A watermark at/past the newest event reads zero rows; the
    printed bookmark must echo the caller's resume point, not null
    (an orchestrator feeding it back would otherwise crash or restart
    the whole source from zero)."""
    sink = str(tmp_path / "sink2")
    far_future = 4102444800  # 2100-01-01
    assert (
        main(
            [
                "etl", "--source", SF, "--sink", sink,
                "--watermark", str(far_future),
            ]
        )
        == 0
    )
    res = _last_json_line(capsys)
    assert res["rows_read"] == 0
    assert res["next_watermark_s"] == far_future


def test_cli_bulk(spark, tmp_path, capsys):
    out = str(tmp_path / "triples.rdf")
    assert main(["bulk", "--source", SF, "--out", out, "--single-file"]) == 0
    res = _last_json_line(capsys)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1, "--single-file must coalesce to one part"
    n_lines = sum(1 for ln in open(os.path.join(out, parts[0])) if ln.strip())
    assert n_lines == res["triples"] > 0
    first = next(iter(open(os.path.join(out, parts[0]))))
    assert first.startswith("_:") and first.rstrip().endswith(".")


def test_cli_query(spark, capsys):
    # pick a team whose members fall inside the edge id domain so the
    # traversal has somewhere to go (sf0.001 edge ids span user_id's
    # range, which is narrower than custkey's)
    from dgraph_etl_spark.catalog import register_views

    register_views(spark, SF)
    team = (
        spark.sql(
            """
            SELECT tm.team_id FROM team_member tm
            JOIN edges e ON tm.person_id = e.src
            LIMIT 1
            """
        ).first()["team_id"]
    )
    assert main(["query", "--source", SF, "--team-id", team]) == 0
    res = _last_json_line(capsys)
    assert res["hop1_count"] > 0
    assert len(res["hop2_person_ids"]) == res["hop2_count"]


def test_cli_query_dql_verbatim(spark, capsys, tmp_path):
    """EP3 verbatim: the CLI consumes the reference binary's literal
    DQL text (via @file, as a user would paste it) and its counts
    agree with the hand-built --team-id traversal over the same
    fixture."""
    import json as _json

    from dgraph_etl_spark.suites.graph_traversal import REFERENCE_DQL, TEAM

    f = tmp_path / "ref.dql"
    f.write_text(REFERENCE_DQL)
    assert main(["query", "--source", SF, "--dql", f"@{f}"]) == 0
    dql = _last_json_line(capsys)
    assert set(dql) == {"hop1_count", "hop2_count"}
    assert main(["query", "--source", SF, "--team-id", TEAM]) == 0
    hand = _last_json_line(capsys)
    assert dql["hop1_count"]["count"] == hand["hop1_count"]
    assert dql["hop2_count"]["count"] == hand["hop2_count"]
    # the leaf projection rows resolve person_id for every hop-2 uid
    assert sorted(r[0] for r in dql["hop2_count"]["rows"]) == sorted(
        hand["hop2_person_ids"]
    )


def test_cli_query_dql_extended_syntax(capsys):
    """The widened subset flows through the CLI unchanged: one query
    using @recurse, @groupby and a facet-pruned binding end-to-end at
    sf0.001 -- a user pastes modern DQL, gets JSON back."""
    from dgraph_etl_spark.suites.graph_traversal import TEAM

    text = (
        "{\n"
        f"  var(func: eq(team_id, {TEAM})){{\n"
        "    src as has_member\n"
        "  }\n"
        "  var(func: uid(src)){\n"
        "    strong as has_connection @facets(ge(score, 1))\n"
        "  }\n"
        "  reach(func: uid(src)) @recurse(depth: 3){\n"
        "    has_connection\n"
        "  }\n"
        "  strong_count(func: uid(strong)){\n"
        "    count(uid)\n"
        "  }\n"
        "  by_nation(func: uid(src)) @groupby(nation_id){\n"
        "    count(uid)\n"
        "  }\n"
        "}"
    )
    assert main(["query", "--source", SF, "--dql", text]) == 0
    res = _last_json_line(capsys)
    assert set(res) == {"reach", "strong_count", "by_nation"}
    # the reach set contains at least the seeds
    assert res["reach"]["count"] > 0
    # groupby rows are (nation, count) pairs summing to the seed count
    groups = res["by_nation"]["rows"]
    assert all(len(r) == 2 for r in groups)
    assert sum(r[1] for r in groups) > 0
