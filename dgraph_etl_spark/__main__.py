"""CLI parity with the reference's three binaries (Makefile:3-10).

    python -m dgraph_etl_spark etl   --source DIR --sink DIR [--watermark N]
    python -m dgraph_etl_spark bulk  --source DIR [--out FILE] [--watermark N]
    python -m dgraph_etl_spark query --source DIR --team-id ID [--hops K]

Flag surfaces mirror the reference drivers:
- `etl` = cmd/etl/etl.go:16-24 (`-elastic` source addr -> --source,
  `-dgraph` sink addr -> --sink, `-watermark` unix-seconds resume
  point, `-max-threads` goroutine cap -> --cpus executor threads);
- `bulk` = cmd/bulk/main.go:19-27 (`-out ./triples.rdf` -> --out,
  same watermark; the MySQL shard addrs collapse into --source because
  sharding is partitioning here, SURVEY.md §1.6);
- `query` = cmd/query/main.go:14-17 (`-teamID` -> --team-id) running
  the 2-hop friend-of-friend traversal (main.go:29-43) and printing
  hop counts + hop-2 person ids as JSON, like the raw Dgraph response
  the reference prints (main.go:49).

The heavy lifting lives in the library modules (pipeline/, graph/,
sinks/); this file is argument parsing and printing only.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(app_name=f"dgraph_etl_spark_{args.cmd}", cpus=args.cpus)


def _edges_since(spark, source: str, watermark_s: int):
    """Shared EP1/EP2 front half: incremental edge-stream scan ->
    bidirectional explode -> max score per directed edge."""
    from .pipeline import edges as E
    from .pipeline import watermark as W
    from .views import derive_user_relationship

    rel = derive_user_relationship(
        W.incremental_events_scan(spark, source, watermark_s)
    )
    return rel, E.max_score_per_edge(E.explode_bidirectional(rel))


def cmd_etl(args) -> int:
    """EP1, the live pipeline (cmd/etl/etl.go:31-110): stream the edge
    source from the watermark, upsert deduped max-score edges through
    the batched retrying mutation sink, print the next watermark."""
    from pyspark.storagelevel import StorageLevel

    from .pipeline import watermark as W
    from .sinks.live import file_sink_factory, write_edges_live

    spark = _spark(args)
    rel, edges = _edges_since(spark, args.source, args.watermark)
    import os
    import shutil

    # the increment is materialized ONCE (disk-persisted) and feeds
    # both the sink write and the bookmark aggregate: re-scanning the
    # source for next_watermark would decode the increment twice and
    # could see files that arrived between the two jobs, printing a
    # watermark ahead of what was actually written. (df.observe can't
    # ride the write: foreachPartition is an RDD action, whose metrics
    # never resolve -- measured.)
    rel = rel.persist(StorageLevel.DISK_ONLY)
    try:
        # per-run subdir with replace-all semantics: writing part files
        # straight into --sink let a rerun that coalesced to fewer
        # partitions leave a silent mix of fresh and stale logs
        run_dir = os.path.join(args.sink, f"run_w{args.watermark}")
        if os.path.isdir(run_dir):
            shutil.rmtree(run_dir)
        os.makedirs(run_dir)
        write_edges_live(edges, file_sink_factory(run_dir))
        nw = W.next_watermark(rel, "last_update").first()
    finally:
        rel.unpersist()
    next_s = nw["next_watermark_s"]
    print(
        json.dumps(
            {
                "sink": run_dir,
                "rows_read": nw["rows_read"],
                # empty increment: max() is NULL -- keep the caller's
                # resume point instead of resetting its checkpoint loop
                "next_watermark_s": (
                    int(next_s) if next_s is not None else args.watermark
                ),
            }
        )
    )
    return 0


def cmd_bulk(args) -> int:
    """EP2, the offline pipeline (cmd/bulk/main.go:55-118): edge stream
    + person enrichment -> the full RDF N-Quads triple file for the
    bulk loader."""
    from pyspark.storagelevel import StorageLevel

    from .catalog import register_views
    from .pipeline import persons as P
    from .pipeline import rdf as R

    spark = _spark(args)
    # bulk reads customer-derived views only (events goes through the
    # incremental scan directly); registering all ten base tables would
    # pay first-use compaction jobs for tables this command never reads
    register_views(
        spark,
        args.source,
        tables=("customer",),
        views=("team_member", "trove_user"),
    )
    rel, edges = _edges_since(spark, args.source, args.watermark)
    # ONE materialization of the events increment (cmd_etl's pattern):
    # the persons branch (distinct ids) and the edges branch (explode +
    # max agg) of the all_triples union both start from rel, so without
    # the persist one write action decodes the full source increment
    # twice -- at the 100 TB design point a second full pass over the
    # largest input
    rel = rel.persist(StorageLevel.DISK_ONLY)
    try:
        flagged = P.enrich_is_trove(
            P.distinct_person_ids(rel), spark.table("trove_user")
        )
        triples = R.all_triples(spark.table("team_member"), flagged, edges)
        R.write_rdf(triples, args.out, single_file=args.single_file)
    finally:
        rel.unpersist()
    # count what was WRITTEN (one cheap job over the text files), not a
    # full second run of the triple pipeline -- and if the source
    # changed between jobs, a recomputed count wouldn't even match the
    # file contents
    n = spark.read.text(args.out).count()
    print(json.dumps({"out": args.out, "triples": n}))
    return 0


def cmd_query(args) -> int:
    """The 2-hop traversal (cmd/query/main.go:29-43): seed by team_id,
    expand twice with visited-set exclusion, print hop counts and the
    hop-2 person ids. With --dql, execute a DQL query text
    (graph/dql.py: the reference's var-block/eq/uid/@filter subset
    plus root @filter boolean algebra, has/ge/le/gt/lt funcs,
    orderasc/orderdesc + first/offset pagination and count(pred))
    against the same graph instead -- pass the text itself or
    @path/to/file; the literal string the reference binary sends
    works verbatim."""
    from .catalog import register_views
    from .graph.traverse import k_hop, team_seed

    if getattr(args, "dql", None):
        from .graph.dql import run_dql
        from .suites.graph_traversal import dql_fixture_graph

        text = args.dql
        if text.startswith("@"):
            with open(text[1:]) as f:
                text = f.read()
        spark = _spark(args)
        out = {}
        for res in run_dql(text, dql_fixture_graph(spark, args.source)):
            block = {"count": res.uids.count()}
            if res.attrs is not None:
                block["rows"] = sorted(
                    tuple(r) for r in res.attrs.drop("id").collect()
                )
            out[res.name] = block
        print(json.dumps(out, default=str))
        return 0
    if args.team_id is None:
        raise SystemExit("either --team-id or --dql is required")
    if args.hops < 1:
        raise SystemExit("--hops must be >= 1")
    spark = _spark(args)
    # only the traversal's own tables/views (customer + events chain)
    register_views(
        spark,
        args.source,
        tables=("customer", "events"),
        views=("user_relationship", "team_member", "edges"),
    )
    seeds = team_seed(spark.table("team_member"), args.team_id)
    hops = k_hop(spark.table("edges"), seeds, k=args.hops)
    counts = {f"hop{i}_count": h.count() for i, h in enumerate(hops, 1)}
    last = sorted(r["id"] for r in hops[-1].select("id").collect())
    print(json.dumps({**counts, f"hop{args.hops}_person_ids": last}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dgraph_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, source_required=True):
        sp.add_argument(
            "--source",
            required=source_required,
            help="fixture/table directory (the ES+MySQL source analog)",
        )
        sp.add_argument(
            "--cpus",
            default=None,
            help="executor threads (reference -max-threads analog)",
        )

    etl = sub.add_parser("etl", help="live pipeline (reference cmd/etl)")
    common(etl)
    etl.add_argument(
        "--sink", required=True, help="mutation-log output dir (Dgraph analog)"
    )
    etl.add_argument(
        "--watermark",
        type=int,
        default=0,
        help="resume point, unix seconds (reference -watermark)",
    )
    etl.set_defaults(fn=cmd_etl)

    bulk = sub.add_parser("bulk", help="offline RDF pipeline (reference cmd/bulk)")
    common(bulk)
    bulk.add_argument(
        "--out", default="./triples.rdf", help="RDF output path (reference -out)"
    )
    bulk.add_argument("--watermark", type=int, default=0)
    bulk.add_argument(
        "--single-file",
        action="store_true",
        help="coalesce to one part file like the reference's single .rdf",
    )
    bulk.set_defaults(fn=cmd_bulk)

    q = sub.add_parser("query", help="2-hop traversal (reference cmd/query)")
    common(q)
    q.add_argument("--team-id", help="reference -teamID")
    q.add_argument("--hops", type=int, default=2)
    q.add_argument(
        "--dql",
        help="DQL query text (or @file): the reference's "
        "var/eq/uid/@filter subset plus root filters, has/ge/le/"
        "gt/lt, orderasc/first/offset and count(pred); overrides "
        "--team-id/--hops",
    )
    q.set_defaults(fn=cmd_query)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
