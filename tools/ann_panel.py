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
    args = ap.parse_args()
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
    if os.path.isfile(src):
        st = os.stat(src)
        tag = f"{st.st_mtime_ns}_{st.st_size}"
    else:
        mx = tot = 0
        for root_, _, files in os.walk(src):
            for fn in files:
                s_ = os.stat(os.path.join(root_, fn))
                mx, tot = max(mx, s_.st_mtime_ns), tot + s_.st_size
        tag = f"{mx}_{tot}"
    def steady(df_fn) -> float:
        df_fn().write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            df_fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t)
        return best

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
    spark.stop()


if __name__ == "__main__":
    main()
