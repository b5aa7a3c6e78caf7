#!/usr/bin/env python
"""Multi-tree interleaved bisect bench: attribute a head-vs-control
bench delta to the specific commit that introduced it.

bench_ab answers "is HEAD slower than the control, same host, same
day?"; when the answer is yes, this tool answers "WHICH commit".
Every ref is checked out into the same scratch-worktree pool bench_ab
uses, and all trees are benched interleaved (tree1, tree2, ..., treeN,
repeat) so a host-noise burst lands on at most one sample of each
tree per cycle. Reports per-query best across runs for every tree
plus per-tree common-subset totals.

Usage:
    python tools/bench_bisect.py --refs r11=1e1eb8a,b1=a620d3a,head=WORKTREE \
                                 [--runs 3] [--subset q1,q2,...]

``WORKTREE`` is the literal word for the live repo tree.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
from bench_ab import control_worktree  # noqa: E402
from scale_soak import run_bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", required=True,
                    help="comma list of label=ref; ref WORKTREE = live tree")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--subset", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    subset = (
        [q.strip() for q in args.subset.split(",") if q.strip()]
        if args.subset
        else None
    )
    trees: list[tuple[str, str]] = []
    for item in args.refs.split(","):
        label, _, ref = item.partition("=")
        trees.append(
            (label, ROOT if ref == "WORKTREE" else control_worktree(ref))
        )

    best: dict[str, dict[str, float]] = {label: {} for label, _ in trees}
    for i in range(args.runs):
        for label, tree in trees:
            res = run_bench(
                args.sf_dir,
                subset=subset,
                tree=tree,
                strip_env=("SPARK_GRAFT_EXTRA_CONF",),
            )
            for q, t in res["queries"].items():
                prev = best[label].get(q)
                best[label][q] = t if prev is None else min(prev, t)
            print(
                f"run {i + 1}/{args.runs} {label}: total {res['value']}s "
                f"steal {res.get('host', {}).get('steal_pct', -1)}%",
                flush=True,
            )

    labels = [label for label, _ in trees]
    common = sorted(set.intersection(*(set(best[l]) for l in labels)))
    print()
    print("| query | " + " | ".join(labels) + " |")
    print("|---" * (len(labels) + 1) + "|")
    for q in common:
        print(
            f"| {q} | "
            + " | ".join(f"{best[l][q]:.3f}" for l in labels)
            + " |"
        )
    print(
        "| TOTAL | "
        + " | ".join(
            f"{sum(best[l][q] for q in common):.3f}" for l in labels
        )
        + " |"
    )


if __name__ == "__main__":
    main()
