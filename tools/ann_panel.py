#!/usr/bin/env python
"""ANN serving-lane panel at 5M vectors: where each C4 lane pays.

Round-5 measured the brute JVM lane, the Arrow/BLAS lane, and the
8-cell IVF at 5M x 64-dim (SCALE.md "ANN lanes at 5M vectors") and
found 8 coarse cells cannot beat brute force. This tool runs the
POST-5M design point the docstrings promise: the c51 k-means codebook
lane at cells ~ sqrt(N) (= 2,236 at 5M), sample-trained
(similarity.sampled_codebook), Arrow-assigned, persisted partitioned
by cell, probed with partition pruning
(similarity.ivf_kmeans_scale_topk). Records steady-state probe time
(min-of-3 after a warm run) at several nprobe settings plus recall@10
against the exact brute lane, and the one-time build cost.

Usage: python tools/ann_panel.py [--fixture /tmp/dgraph_etl_scale/emb5m]
Prints a markdown table to paste into SCALE.md's ANN section.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

# bare `md_sections`, the one module identity every tool uses -- a
# `tools.md_sections` twin would load a second module object
from md_sections import dir_size as _dir_size  # noqa: E402


def _emb_tag(fixture: str) -> str:
    """Content key of the fixture's embeddings data (mtime_ns+size):
    the persisted-index naming convention shared by main() and the
    bracket sweep."""
    src = os.path.join(fixture.rstrip("/"), "embeddings.parquet")
    if os.path.isfile(src):
        st = os.stat(src)
        return f"{st.st_mtime_ns}_{st.st_size}"
    mx = tot = 0
    for root_, _, files in os.walk(src):
        for fn in files:
            s_ = os.stat(os.path.join(root_, fn))
            mx, tot = max(mx, s_.st_mtime_ns), tot + s_.st_size
    return f"{mx}_{tot}"


def _bracket(args) -> None:
    """The honesty bracket for the compressed lanes: every headline
    panel row reads recall@10 = 1.00 because the exact top-1000 rerank
    absorbs all ADC misranking -- the accuracy/cost tradeoff is
    invisible. This sweep shrinks the rerank budget (topc 1000 -> 100
    -> 10) and finally removes the rerank entirely (raw ADC ranking),
    recording where recall falls off, so the table is a tuning
    artifact rather than a wall of 1.00s. Writes its own
    marker-delimited SCALE.md section."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions import similarity as S
    from dgraph_etl_spark.session import get_spark
    from md_sections import replace_section, steady_noop_time

    spark = get_spark(app_name="ann_bracket")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for fixture in args.fixtures.split(","):
        fixture = fixture.strip()
        emb = load_table(spark, fixture, "embeddings")
        n = emb.count()
        ncells = args.ncells or max(2, int(n**0.5))
        tag = _emb_tag(fixture)
        label = f"{n/1e6:g}M"
        query = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qvec")
        )
        truth = {r.vec_id for r in S.brute_topk(emb, query, 10).collect()}
        scratch = os.path.dirname(fixture.rstrip("/"))
        lanes = {
            "PQ flat": (os.path.join(scratch, f"pq_{n}_{tag}"), 1, {}),
            f"IVFPQ {ncells} cells, nprobe=32": (
                os.path.join(scratch, f"ivfpq_{n}_{ncells}_{tag}"),
                ncells,
                {"nprobe": 32},
            ),
        }
        for lane, (idx, ncl, probe_kw) in lanes.items():
            S.build_ivfpq_index(spark, emb, idx, ncells=ncl)
            for topc in [int(x) for x in args.topcs.split(",")] + [None]:
                kw = dict(probe_kw)
                if topc is None:
                    kw.update(topc=10, rerank_emb=None)
                    mode = "no rerank (raw ADC top-10)"
                else:
                    kw.update(topc=topc, rerank_emb=emb)
                    mode = f"topc={topc} + exact rerank"

                def probe():
                    return S.ivfpq_scale_topk(spark, query, 10, idx, **kw)

                best = steady_noop_time(probe)
                recall = len(truth & {r.vec_id for r in probe().collect()}) / 10
                rows.append((label, lane, mode, best, recall))
                print(
                    f"{label} {lane} {mode}: t={best:.3f}s "
                    f"recall@10={recall:.2f}",
                    flush=True,
                )
    start = "<!-- ann-bracket:start -->"
    end = "<!-- ann-bracket:end -->"
    lines = [
        start,
        "",
        "### Compressed-lane honesty bracket: recall vs rerank budget "
        "(tools/ann_panel.py --bracket)",
        "",
        "The headline rows above all read recall@10 = 1.00 because the "
        "exact top-1000 rerank absorbs every ADC misranking. Shrinking "
        "the rerank budget exposes the tradeoff -- where the cheap "
        "8-byte-code ranking actually starts costing accuracy on this "
        "corpus:",
        "",
        "| corpus | lane | rerank budget | t/probe | recall@10 |",
        "|---|---|---|---|---|",
    ]
    for label, lane, mode, best, recall in rows:
        lines.append(
            f"| {label} | {lane} | {mode} | {best:.2f} s | {recall:.2f} |"
        )
    # the operating-point sentences are DERIVED from the measured rows
    # (hand prose next to tool numbers goes stale; round-5 advice)
    reranked = [r for r in rows if r[2].startswith("topc=")]
    t_max = max(r[3] for r in reranked)
    t_min = min(r[3] for r in reranked)
    # per (corpus, LANE): the cheapest budget that still reads full
    # recall -- pooling lanes per corpus could cite a budget only the
    # exhaustive PQ scan achieves while the pruned IVFPQ lane needs a
    # bigger one, and a reader tuning IVFPQ to it would silently lose
    # recall. (Budget cost order: no-rerank < small topc < large topc.)
    cheapest = []
    for label, lane in dict.fromkeys((r[0], r[1]) for r in rows):
        full = [
            r[2]
            for r in rows
            if r[0] == label and r[1] == lane and r[4] >= 0.999
        ]
        ranked = sorted(
            full,
            key=lambda m: -1 if m.startswith("no rerank") else int(m.split("=")[1].split(" ")[0]),
        )
        cheapest.append(
            f"{label} {lane}: "
            f"{ranked[0] if ranked else 'NONE reaches full recall'}"
        )
    lines += [
        "",
        "Reading: recall holds while the rerank budget still covers the "
        "ADC rank of every true neighbor; the no-rerank rows are the raw "
        "8-bytes-per-vector ranking quality, the floor a serving tier "
        "pays if it skips the float fetch entirely. Cheapest budget "
        "reaching full recall@10, per corpus and lane -- "
        + "; ".join(cheapest)
        + ". Context for the cliff: this synthetic corpus stacks "
        "thousands of tiny-perturbation replicas of every base vector, "
        "so each query's exact ranking begins with a block of near-ties "
        "finer than 8 bytes of code can separate -- an adversarially "
        "hard tie structure for ADC (a real embedding corpus is rarely "
        "this degenerate, but dedup-heavy corpora approach it), and "
        "exactly the regime where only the exact rerank restores the "
        "true order. The rerank itself is a broadcast semi-join reading "
        "topc float rows, so its cost scales with topc, not with N -- "
        f"across this whole sweep the reranked probe times span "
        f"{t_min:.2f}-{t_max:.2f} s, so the budget is an accuracy knob, "
        "not a latency one: run the largest topc whose floats fit the "
        "broadcast.",
        "",
        end,
    ]
    replace_section(
        os.path.join(ROOT, "SCALE.md"), start, end, "\n".join(lines) + "\n"
    )
    print("updated SCALE.md ann-bracket section", flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/dgraph_etl_scale/emb5m")
    ap.add_argument("--ncells", type=int, default=0)  # 0 -> sqrt(N)
    ap.add_argument("--nprobes", default="8,32,64,128")
    ap.add_argument(
        "--lanes",
        default="ivf,pq,ivfpq",
        help="comma subset of ivf,pq,ivfpq",
    )
    ap.add_argument("--topc", type=int, default=1000)
    ap.add_argument("--bracket", action="store_true")
    ap.add_argument(
        "--fixtures",
        default="/tmp/dgraph_etl_scale/emb1m,/tmp/dgraph_etl_scale/emb5m",
        help="--bracket corpora (comma list)",
    )
    ap.add_argument("--topcs", default="1000,100,10", help="--bracket sweep")
    args = ap.parse_args()
    if args.bracket:
        _bracket(args)
        return
    lanes = set(args.lanes.split(","))

    from pyspark.sql import functions as F  # noqa: E402

    from dgraph_etl_spark.catalog import load_table  # noqa: E402
    from dgraph_etl_spark.functions import similarity as S  # noqa: E402
    from dgraph_etl_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="ann_panel")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.fixture, "embeddings")
    n = emb.count()
    ncells = args.ncells or max(2, int(n**0.5))
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    print(f"corpus {n:,} vectors, ncells={ncells}", flush=True)

    truth = {r.vec_id for r in S.brute_topk(emb, query, 10).collect()}

    # content-key the persisted index to the fixture's embeddings data
    # (mtime_ns+size), not just (row count, ncells): a rebuilt 5M
    # fixture with the same count must NOT reuse a stale index while
    # ground truth is computed on the fresh vectors -- the recall
    # table would be garbage with no error
    src = os.path.join(args.fixture.rstrip("/"), "embeddings.parquet")
    tag = _emb_tag(args.fixture)
    from md_sections import steady_noop_time as steady

    def recall_of(df) -> float:
        return len(truth & {r.vec_id for r in df.collect()}) / 10

    corpus_bytes = _dir_size(src) if os.path.isdir(src) else (
        os.path.getsize(src)
    )
    table_rows = []  # (lane, t, recall, size_note)
    builds = []

    if "ivf" in lanes:
        idx = os.path.join(
            os.path.dirname(args.fixture.rstrip("/")),
            f"ivf_kmeans_{n}_{ncells}_{tag}",
        )
        t0 = time.perf_counter()
        S.build_ivf_kmeans_index(spark, emb, idx, ncells)
        build_s = time.perf_counter() - t0
        builds.append(("IVF", build_s, _dir_size(idx)))
        print(f"IVF build (or load): {build_s:.1f}s at {idx}", flush=True)
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            t = steady(
                lambda: S.ivf_kmeans_scale_topk(spark, query, 10, idx, nprobe)
            )
            recall = recall_of(
                S.ivf_kmeans_scale_topk(spark, query, 10, idx, nprobe)
            )
            table_rows.append(
                (f"IVF k-means {ncells} cells, nprobe={nprobe} "
                 f"(c51 scale lane)", t, recall, "")
            )
            print(f"IVF nprobe={nprobe:4d}  t={t:.3f}s  "
                  f"recall@10={recall:.2f}", flush=True)

    if "pq" in lanes:
        idx = os.path.join(
            os.path.dirname(args.fixture.rstrip("/")),
            f"pq_{n}_{tag}",
        )
        t0 = time.perf_counter()
        S.build_ivfpq_index(spark, emb, idx, ncells=1)
        build_s = time.perf_counter() - t0
        sz = _dir_size(idx)
        builds.append(("PQ flat", build_s, sz))
        print(f"PQ build (or load): {build_s:.1f}s, index "
              f"{sz/1e6:.1f} MB vs corpus {corpus_bytes/1e6:.1f} MB "
              f"({corpus_bytes/max(sz,1):.1f}x smaller)", flush=True)
        t = steady(
            lambda: S.ivfpq_scale_topk(
                spark, query, 10, idx, topc=args.topc, rerank_emb=emb
            )
        )
        recall = recall_of(
            S.ivfpq_scale_topk(
                spark, query, 10, idx, topc=args.topc, rerank_emb=emb
            )
        )
        table_rows.append(
            (f"PQ flat ADC scan, topc={args.topc} + exact rerank "
             f"(c57 scale lane)", t, recall,
             f"{sz/1e6:.0f} MB codes")
        )
        print(f"PQ topc={args.topc}  t={t:.3f}s  recall@10={recall:.2f}",
              flush=True)

    if "ivfpq" in lanes:
        idx = os.path.join(
            os.path.dirname(args.fixture.rstrip("/")),
            f"ivfpq_{n}_{ncells}_{tag}",
        )
        t0 = time.perf_counter()
        S.build_ivfpq_index(spark, emb, idx, ncells=ncells)
        build_s = time.perf_counter() - t0
        sz = _dir_size(idx)
        builds.append(("IVFPQ", build_s, sz))
        print(f"IVFPQ build (or load): {build_s:.1f}s, index "
              f"{sz/1e6:.1f} MB", flush=True)
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            t = steady(
                lambda: S.ivfpq_scale_topk(
                    spark, query, 10, idx, nprobe=nprobe,
                    topc=args.topc, rerank_emb=emb,
                )
            )
            recall = recall_of(
                S.ivfpq_scale_topk(
                    spark, query, 10, idx, nprobe=nprobe,
                    topc=args.topc, rerank_emb=emb,
                )
            )
            table_rows.append(
                (f"IVFPQ {ncells} cells, nprobe={nprobe}, "
                 f"topc={args.topc} + exact rerank (c63 scale lane)",
                 t, recall, f"{sz/1e6:.0f} MB codes")
            )
            print(f"IVFPQ nprobe={nprobe:4d}  t={t:.3f}s  "
                  f"recall@10={recall:.2f}", flush=True)

    t_brute = steady(lambda: S.brute_topk(emb, query, 10))
    t_arrow = steady(lambda: S.brute_topk_arrow(emb, query, 10))
    print(f"brute JVM {t_brute:.3f}s, brute Arrow {t_arrow:.3f}s", flush=True)

    print(f"\n| lane | t at {n/1e6:g}M | recall@10 | index |")
    print("|---|---|---|---|")
    print(f"| brute cosine, JVM expressions | {t_brute:.2f} s | 1.00 | "
          f"{corpus_bytes/1e6:.0f} MB floats |")
    print(f"| brute cosine, Arrow+numpy | {t_arrow:.2f} s | 1.00 | "
          f"{corpus_bytes/1e6:.0f} MB floats |")
    for lane, t, recall, size_note in table_rows:
        print(f"| {lane} | {t:.2f} s | {recall:.2f} | {size_note} |")
    for name, b, sz in builds:
        print(f"\n{name} one-time build: {b:.1f}s, on-disk "
              f"{sz/1e6:.1f} MB ({corpus_bytes/max(sz,1):.1f}x vs floats)")

    # marker-delimited SCALE.md section (the tool-emits-the-numbers
    # discipline of scale_soak/graph_soak/--bracket: hand-pasted
    # stdout tables drift; this one is replaced atomically per run)
    from md_sections import replace_section

    label = f"{n/1e6:g}M"
    start = f"<!-- ann-panel-{label}:start -->"
    end = f"<!-- ann-panel-{label}:end -->"
    lines = [
        start,
        "",
        f"### Serving-lane panel at {label} vectors "
        f"(tools/ann_panel.py --lanes {args.lanes})",
        "",
        f"Steady-state probe (warm run then min-of-3), ncells={ncells}, "
        f"recall@10 vs exact brute; every probe goes through the "
        "persisted-index path (build_ivf_kmeans_index / "
        "build_ivfpq_index -> *_scale_topk, partition-pruned):",
        "",
        f"| lane | t/probe at {label} | recall@10 | index footprint |",
        "|---|---|---|---|",
        f"| brute cosine, JVM expressions | {t_brute:.2f} s | 1.00 | "
        f"{corpus_bytes/1e6:.0f} MB floats |",
        f"| brute cosine, Arrow+numpy | {t_arrow:.2f} s | 1.00 | "
        f"{corpus_bytes/1e6:.0f} MB floats |",
    ]
    for lane, t, recall, size_note in table_rows:
        lines.append(f"| {lane} | {t:.2f} s | {recall:.2f} | {size_note} |")
    if builds:
        lines += [
            "",
            "One-time builds, amortized across every later probe "
            "(build-or-load: ~0 s means this run reused the existing "
            "content-keyed index; historical cold-build costs are in "
            "the hand table above): "
            + "; ".join(
                f"{name} {b:.0f} s, {sz/1e6:.1f} MB on disk "
                f"({corpus_bytes/max(sz,1):.1f}x vs floats)"
                for name, b, sz in builds
            )
            + ".",
        ]
        fastest = min(table_rows, key=lambda r: r[1])
        # say what the winning lane actually does: IVF k-means rows
        # score exact floats over the probed cells (no rerank stage);
        # only the PQ/IVFPQ rows carry the ADC-then-exact-rerank shape
        rerank_note = (
            "with its exact rerank (the honesty bracket below shows "
            "where recall collapses as the rerank budget shrinks)"
            if "rerank" in fastest[0]
            else "scoring exact floats over the probed cells (no "
            "rerank stage; the compressed lanes' rerank tradeoff is "
            "bracketed below)"
        )
        lines += [
            "",
            f"Fastest probed lane this run: {fastest[0]} at "
            f"{fastest[1]:.2f} s vs {t_brute:.2f} s JVM brute "
            f"({t_brute / max(fastest[1], 1e-9):.1f}x) and "
            f"{t_arrow:.2f} s Arrow brute "
            f"({t_arrow / max(fastest[1], 1e-9):.1f}x); recall@10 "
            f"{fastest[2]:.2f}, {rerank_note}.",
        ]
    lines += ["", end]
    replace_section(
        os.path.join(ROOT, "SCALE.md"), start, end, "\n".join(lines) + "\n"
    )
    print(f"updated SCALE.md ann-panel-{label} section", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
