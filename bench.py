#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Timing method: each query plan is executed to completion with the
``noop`` write format (runs every operator incl. projections, zero
sink cost — unlike ``count()``, which lets Spark prune work). A
trivial warm-up action keeps JVM/codegen startup out of per-query
numbers; startup is reported separately as "startup_sec".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgraph_etl_spark.catalog import register_views  # noqa: E402
from dgraph_etl_spark.registry import REGISTRY, _load_suites  # noqa: E402
from dgraph_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per operator family, weighted toward
# the heavy paths (shuffle joins, graph hops, explode-heavy text ops).
HEADLINE = [
    "b14_agg_tpch_q1",        # scan + hash agg (TPC-H Q1 shape)
    "b07_join_inner",         # shuffle equi-join
    # the layout twin of b07: both fact sides bucketed by orderkey, so
    # the join plans with zero exchanges (SelectedBucketsCount 32/32,
    # contract-tested in test_plan_shapes) -- benchmarked side by side
    # so every snapshot records shuffle lane vs bucketed lane; timing
    # is post-ingest steady state (the one-time bucketed write lands in
    # the warm-up/first sample, the recorded min is the recurring query)
    "b07_join_inner_bucketed",
    "b19_argmax_per_key",     # window / argmax
    "a12_max_score_per_edge", # pipeline: explode + groupBy.max
    "a18_rdf_triples",        # ETL sink formatting + union
    "g03_hop2",               # 2-hop traversal w/ anti-joins
    # g03's uncached control twin (round 13, graph-bench honesty): the
    # same traversal over the edges VIEW, so the view build runs inside
    # the timed region -- the g03/g07/g34 lanes time post-ingest steady
    # state against a session-persisted bucketed edge table (like
    # b07_bucketed); this lane records what ingest-included costs
    "g03_hop2_coldedges",
    "g07_top_connections",    # flagship multi-join + top-k
    "c01_exact_dedup",        # sha256 + hash agg
    "c02_minhash_lsh_pairs",  # MinHash + LSH bucket join
    "c04_topk_cosine",        # vector top-k
    "c07_term_stats",         # explode + two-level agg
    "b46_funnel_steps",       # event-sequence funnel, one exchange
    "c13_token_budget_pack",  # distributed prefix sum
    "b44_asof_join",          # as-of join (union carry-forward)
    "b45_sessionize",         # gap-based sessionization, one exchange
    "b51_tpch_q3",            # 3-table join + agg + top-k (TPC-H Q3)
    "b52_tpch_q5",            # 6-table join w/ broadcast dims (TPC-H Q5)
    "b67_tpch_q6",            # pure scan-filter-agg (TPC-H Q6, scan floor)
    "c27_span_dedup",         # passage-level dedup (span hash screen)
    "b87_tpch_q21",           # triple-EXISTS fold as two-level agg (Q21)
    # b87's layout twin (same pairing as b07/b07_bucketed): the 100x
    # profile put ~85% of Q21's compute in the lineitem-orders shuffle;
    # over the shared bucketed-by-orderkey layout the join and both agg
    # levels are bucket-local and the only exchange is the final
    # ~100-supplier rollup
    "b87_tpch_q21_bucketed",
    "b92_cube_rollup",        # CUBE margins: one Expand, one hash agg
    # the DQL front-end's per-round number (round-10 verdict #5): text
    # parse + @recurse BFS through graph/dql.py -- the only family that
    # had no headline representative. Added round 11; BASELINE.md notes
    # the set change so r11 stays comparable on the prior 23 queries.
    "g34_dql_recurse",
]

# The unfiltered list: consumers that need the FULL headline set
# regardless of environment (the PLAN_AUDIT lockfile test) read this,
# not HEADLINE -- otherwise a SPARK_GRAFT_BENCH_QUERIES left exported
# by a soak run would silently narrow their coverage.
HEADLINE_ALL = list(HEADLINE)

# Heavy lane (round-13, VERDICT r12 #1): the most expensive operator
# paths, meant to be run at sf1 (tools/bench_heavy.py builds the 10x
# key-remapped fixture) where plan-level wins resolve above the host's
# documented +-20% sub-second floor noise. Opt-in ONLY -- the default
# `python bench.py` contract (headline set, JSON line) is unchanged;
# select with SPARK_GRAFT_BENCH_PROFILE=heavy (or an explicit
# SPARK_GRAFT_BENCH_QUERIES, which takes precedence).
HEAVY_PROFILE = [
    "c02_minhash_lsh_pairs",   # most expensive headline (MinHash+LSH)
    "g34_dql_recurse",         # 2nd: per-level BFS checkpoints
    "b87_tpch_q21",            # r12 single fact exchange claim
    "b51_tpch_q3",             # fact join + agg floor
    "c27_span_dedup",          # r12 shared-h-exchange open question
    "c07_term_stats",          # analyzed-and-left two-level agg
    "g42_dql_normalize",       # residual 6-exchange/3-SMJ shape
    "a18_rdf_triples",         # widest union/format pipeline
    "c13_token_budget_pack",   # r12 checkpoint-tax crossover question
    "b44_asof_join",           # r12 2->1 exchange claim
    # round-13 additions (the sf1 sweep's biggest finds, so their
    # fixes stay measurable): SRP near-dup pair generation and the
    # blocked cosine self-join family
    "c20_srp_neardup",
    "c02_embedding_neardup",
]

_PROFILE = os.environ.get("SPARK_GRAFT_BENCH_PROFILE")
if _PROFILE and not os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    if _PROFILE != "heavy":
        raise SystemExit(
            f"unknown SPARK_GRAFT_BENCH_PROFILE {_PROFILE!r} "
            "(supported: 'heavy')"
        )
    HEADLINE = list(HEAVY_PROFILE)

# Optional subset filter (comma-separated names): lets the scale soak
# run only the heavy queries at large replication factors without
# changing what a bare `python bench.py` measures.
_SUBSET = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _SUBSET:
    wanted = [n.strip() for n in _SUBSET.split(",") if n.strip()]
    if not wanted:
        raise SystemExit(
            "SPARK_GRAFT_BENCH_QUERIES parsed to an empty subset: "
            f"{_SUBSET!r}"
        )
    extra = sorted(set(wanted) - set(HEADLINE))
    if extra:
        # a subset may name any REGISTERED query (the scale soak times
        # non-headline lanes, e.g. the keyed-merge bucketed twins);
        # only a name the registry doesn't know is an error
        _load_suites()
        unknown = sorted(set(extra) - set(REGISTRY))
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
    HEADLINE = [n for n in HEADLINE if n in wanted] + extra


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _cpu_ticks() -> tuple[int, int]:
    """(total_ticks, steal_ticks) from /proc/stat's aggregate cpu line;
    (0, 0) where unavailable. The delta across the run gives the steal
    fraction the host imposed on THIS snapshot -- the attributability
    marker that separates a real regression from a noisy-neighbor
    burst (documented envelope: identical builds measured 7.0-9.9 s
    under observed multi-second steal bursts)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals), steal
    except Exception:
        return 0, 0


def main() -> None:
    t0 = time.perf_counter()
    spark = get_spark(app_name="dgraph_etl_spark_bench")
    # ERROR-only logs for the bench run: the banded-prefix-sum queries
    # (functions/text.py) legitimately run tiny global windows over
    # B band-total rows, and WindowExec WARN-spams "No Partition
    # Defined" for each — hundreds of expected lines that bury any
    # real regression signal in the bench output.
    spark.sparkContext.setLogLevel("ERROR")
    _load_suites()
    # Warm-up: run every headline query once at the smallest sf so JVM
    # startup, codegen, and shuffle-service init land outside timings —
    # the numbers then measure the operators, not JIT warm-up. Warm-up
    # runs CONCURRENTLY (Spark's scheduler is thread-safe and the jobs
    # are tiny): only wall-clock startup changes, the timed section
    # still runs each query alone.
    warm_sf = "/root/testdata/sf0.001"
    from concurrent.futures import ThreadPoolExecutor

    def _warm(name: str) -> None:
        REGISTRY[name].fn(spark, warm_sf).write.mode("overwrite").format(
            "noop"
        ).save()

    # first query alone: register_views + layout compaction race-free
    _warm(HEADLINE[0])
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_warm, HEADLINE[1:]))
    register_views(spark, SF_DIR, force=True)
    startup = time.perf_counter() - t0

    # Two-phase timing. Phase 1, INTERLEAVED adaptive rounds (2 floor,
    # 4 cap, stop when a full round improves the summed mins <2%): runs
    # the whole set, then repeats, so a multi-second steal-time burst
    # poisons at most one sample of each query; also finishes JIT
    # tiering on the sf-target code paths (warm-up at sf0.001 compiles
    # different AQE-shaped codegen). Phase 2, per-query BACK-TO-BACK
    # min-of-3: consecutive executions of one plan keep its codegen and
    # data cache-resident and reach the C2 steady-state floor the
    # interleaved pattern structurally can't (measured: interleaved-only
    # converged to 10.5s while back-to-back min-of-3 after the same
    # warm rounds lands 7.0s on the same host -- the round-4
    # "contended host" readings were this harness effect). The recorded
    # min is taken across BOTH phases, so a burst during phase 2 is
    # backstopped by the phase-1 samples.
    # Per-phase minimums are recorded SEPARATELY so a snapshot is
    # self-attributing: back_to_back_sec far above interleaved_sec
    # means the steady-state phase ate a noise burst (phase-1 samples
    # backstop it); both phases slow together with a high steal delta
    # means the host, not the build.
    load_before = os.getloadavg()
    ticks0, steal0 = _cpu_ticks()
    phase1: dict[str, float] = {name: float("inf") for name in HEADLINE}
    phase2: dict[str, float] = {name: float("inf") for name in HEADLINE}

    def _sample(name: str, into: dict[str, float]) -> None:
        q = REGISTRY[name]
        t1 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        into[name] = min(into[name], time.perf_counter() - t1)

    rounds_run = 0
    for rnd in range(4):
        before = sum(phase1.values())
        for name in HEADLINE:
            _sample(name, phase1)
        rounds_run = rnd + 1
        after = sum(phase1.values())
        if rnd >= 1 and after > 0 and (before - after) / after < 0.02:
            break
    for name in HEADLINE:
        for _ in range(3):
            _sample(name, phase2)
    times = {
        name: round(min(phase1[name], phase2[name]), 3) for name in HEADLINE
    }
    ticks1, steal1 = _cpu_ticks()
    load_after = os.getloadavg()
    dticks = ticks1 - ticks0

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": _sf_label(SF_DIR),
                "startup_sec": round(startup, 3),
                "n_queries": len(times),
                "rounds": rounds_run,
                "phase_sums": {
                    "interleaved_sec": round(sum(phase1.values()), 3),
                    "back_to_back_sec": round(sum(phase2.values()), 3),
                },
                "host": {
                    "loadavg_before": [round(x, 2) for x in load_before],
                    "loadavg_after": [round(x, 2) for x in load_after],
                    "steal_pct": round(
                        100.0 * (steal1 - steal0) / dticks, 3
                    )
                    if dticks > 0
                    else None,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
