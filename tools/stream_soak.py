#!/usr/bin/env python
"""Streaming scale soak: real Structured Streaming jobs at 10x/100x.

Round-5 measured four streaming jobs at 10x with an ad-hoc script;
this makes the probe reproducible and extends it to the 100x fixture.
Each registered s-query runs a REAL streaming job end-to-end (file
source staged by the suite, trigger(availableNow), memory sink), so
the measured time includes source staging -- it is the honest whole-
job number, not just the micro-batch loop. Watermarked/keyed state
is the thing being tested: jobs whose state is bounded (per-window,
per-key) should stay nearly flat as events grow; jobs whose OUTPUT
grows with the corpus (dedup emits every distinct row) should track
their output growth, never their input growth squared.

Usage: python tools/stream_soak.py [--replicas 10] [--jobs s01,...]
Appends/replaces the stream-soak section in SCALE.md (own markers,
coexists with the scale-soak/graph-soak markers).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

DEFAULT_JOBS = [
    "s01_tumbling_counts",      # state = fixed window count
    "s05_streaming_max_per_key",  # state = per-key max
    "s04_stream_dedup",         # output grows with distinct rows
    "s12_stream_span_dedup",    # output grows with docs
]

def _markers(replicas: int) -> tuple[str, str]:
    """Per-replicas markers so the 10x and 100x sections coexist and
    each re-run replaces only its own decade."""
    return (
        f"<!-- stream-soak-{replicas}x:start -->",
        f"<!-- stream-soak-{replicas}x:end -->",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--jobs", default=",".join(DEFAULT_JOBS))
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    jobs = [j.strip() for j in args.jobs.split(",") if j.strip()]

    from scale_soak import SRC_SF, build_fixture, fixture_dest  # noqa: E402

    from dgraph_etl_spark.registry import REGISTRY, _load_suites  # noqa: E402
    from dgraph_etl_spark.streaming.core import drop_memory_sinks  # noqa: E402
    from dgraph_etl_spark.session import get_spark  # noqa: E402

    # validate the job list BEFORE the (expensive) fixture build: a
    # typo'd name must fail in milliseconds, not after minutes of
    # 100x replication
    _load_suites()
    if not jobs:
        raise SystemExit("--jobs parsed to an empty list")
    unknown = [j for j in jobs if j not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown --jobs names: {', '.join(unknown)}")

    big = (
        build_fixture(args.replicas)
        if not args.skip_build
        else fixture_dest(args.replicas)
    )
    print(f"fixture: {big}", flush=True)
    spark = get_spark(app_name="stream_soak")
    spark.sparkContext.setLogLevel("ERROR")

    SRC = SRC_SF

    def run_job(name: str, sf_dir: str) -> float:
        # best of 2 full-job runs: a streaming job's first run also
        # pays codegen; the second is the steady number, but staging
        # is always included (it is part of the job)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            # the memory sink pins each job's full output on the
            # driver until its temp view is dropped; 4 jobs x 2
            # scales x 2 runs of 100x outputs held simultaneously is
            # a driver-OOM risk, so drop them as we go (by the sink
            # registry -- suite queries use per-job name prefixes, so
            # no catalog pattern match can find them reliably)
            drop_memory_sinks(spark)
        return best

    results = {}
    for name in jobs:
        t1 = run_job(name, SRC)
        t_big = run_job(name, big)
        results[name] = (t1, t_big)
        print(f"{name:28s} {t1:6.2f}s -> {t_big:6.2f}s  "
              f"ratio {t_big / max(t1, 1e-9):4.1f}", flush=True)
    spark.stop()

    SECTION_START, SECTION_END = _markers(args.replicas)
    lines = [
        SECTION_START,
        "",
        f"## Streaming jobs at {args.replicas}x (tools/stream_soak.py)",
        "",
        "Real Structured Streaming jobs (file source staged by the",
        "suite, trigger(availableNow), memory sink, full job runtime",
        "including source staging; best of 2):",
        "",
        f"| job | t(sf0.1) s | t({args.replicas}x) s | ratio |",
        "|---|---|---|---|",
    ]
    for name, (t1, t_big) in results.items():
        lines.append(
            f"| {name} | {t1:.2f} | {t_big:.2f} | "
            f"{t_big / max(t1, 1e-9):.1f} |"
        )
    lines += [
        "",
        "Watermarked/keyed state is bounded by construction, so jobs",
        "whose state is per-window or per-key barely move as events",
        "grow; jobs whose OUTPUT grows with the corpus (dedup emits",
        "every distinct row, span-dedup re-screens every doc) track",
        "their output growth and stay under their decade. Caveat on",
        "the output-bound rows: the probe's MEMORY sink materializes",
        "the full output on the driver, so at large scale a chunk of",
        "their time is sink collection, not operator cost -- a",
        "production file/Kafka sink writes distributed and the",
        "stateful operator's own cost is the bounded-state story the",
        "flat jobs show.",
        "",
        SECTION_END,
    ]

    from md_sections import replace_section

    replace_section(
        os.path.join(ROOT, "SCALE.md"),
        SECTION_START,
        SECTION_END,
        "\n".join(lines) + "\n",
    )
    print("updated SCALE.md stream-soak section", flush=True)


if __name__ == "__main__":
    main()
