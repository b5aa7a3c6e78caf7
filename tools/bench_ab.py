#!/usr/bin/env python
"""Same-day, same-host A/B bench: HEAD vs a control tree (usually the
prior round's artifact commit), interleaved.

The round-8/9 lesson made standing policy (VERDICT r9 #8): when a
round's driver snapshot inflates >10% round-over-round, the question
"code regression or host drift?" is only answerable with a controlled
experiment — the UNCHANGED prior tree benchmarked the same day on the
same host, interleaved with HEAD so neither tree monopolizes a quiet
or a noisy window. Round 9 ran this by hand (BASELINE.md round-9
addendum) and closed the round-8 question in an hour; this tool makes
it one command.

Usage:
    python tools/bench_ab.py --control <git-ref> [--runs 2]
                             [--subset q1,q2,...] [--sf-dir DIR]

Outputs a markdown attribution table (per-query best across the
interleaved runs for each tree, common-subset totals, steal% per run)
ready to paste into the round's BASELINE.md addendum.

The control tree is checked out read-only into a scratch git worktree
(reused across invocations of the same ref); its own bench.py and
registry run unmodified, so the comparison is tree-vs-tree, not
this-tree-replaying-old-queries. Queries present in only one tree are
reported separately, never silently dropped into the totals.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(os.environ.get("TMPDIR", "/tmp"), "dgraph_etl_ab")

sys.path.insert(0, os.path.join(ROOT, "tools"))
# the ONE copy of the bench-subprocess protocol (env hygiene + JSON
# scan) -- re-implementing it here is how the two tools drift
from scale_soak import run_bench as _run_bench  # noqa: E402


def control_worktree(ref: str) -> str:
    """Check the control ref out into a reusable detached worktree."""
    sha = subprocess.run(
        ["git", "rev-parse", "--verify", f"{ref}^{{commit}}"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    dest = os.path.join(SCRATCH, sha[:12])
    if os.path.isdir(os.path.join(dest, ".git")) or os.path.isfile(
        os.path.join(dest, ".git")
    ):
        # reuse, but verify it still points at the requested commit —
        # a stale dir from a force-moved ref would A/B the wrong tree
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=dest,
            capture_output=True,
            text=True,
        ).stdout.strip()
        if head == sha:
            return dest
        subprocess.run(
            ["git", "worktree", "remove", "--force", dest], cwd=ROOT
        )
    os.makedirs(SCRATCH, exist_ok=True)
    # recover from stale state before adding: a registered-but-missing
    # worktree (TMPDIR wiped on reboot) or a leftover partial dir
    # without .git makes `git worktree add` fail permanently otherwise
    subprocess.run(["git", "worktree", "prune"], cwd=ROOT)
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", dest, sha],
        cwd=ROOT,
        check=True,
    )
    return dest


def run_bench(tree: str, sf_dir: str, subset: list[str] | None) -> dict:
    # strip SPARK_GRAFT_EXTRA_CONF: only trees new enough to parse it
    # would honor it, so a forgotten export (e.g. the 1000x soak's
    # periodic-GC setting) would skew the A/B asymmetrically and the
    # tool would misattribute a pure config difference to code
    return _run_bench(
        sf_dir,
        subset=subset,
        tree=tree,
        strip_env=("SPARK_GRAFT_EXTRA_CONF",),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--control",
        required=True,
        help="git ref of the control tree (e.g. the prior round's "
        "artifact commit)",
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--subset", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    subset = (
        [q.strip() for q in args.subset.split(",") if q.strip()]
        if args.subset
        else None
    )

    ctrl = control_worktree(args.control)
    print(f"control tree: {ctrl} ({args.control})", flush=True)

    best: dict[str, dict[str, float]] = {"control": {}, "head": {}}
    steals: dict[str, list[float]] = {"control": [], "head": []}
    # interleaved: control, head, control, head ... so a noise burst
    # lands on at most one sample of each tree per cycle
    for i in range(args.runs):
        for label, tree in [("control", ctrl), ("head", ROOT)]:
            res = run_bench(tree, args.sf_dir, subset)
            steals[label].append(res.get("host", {}).get("steal_pct", -1))
            for q, t in res["queries"].items():
                prev = best[label].get(q)
                best[label][q] = t if prev is None else min(prev, t)
            print(
                f"run {i + 1}/{args.runs} {label}: total {res['value']}s "
                f"steal {steals[label][-1]}%",
                flush=True,
            )

    print()
    print(attribution(best, steals))


def attribution(
    best: dict[str, dict[str, float]], steals: dict[str, list[float]]
) -> str:
    """Markdown attribution table from per-tree best-per-query times.

    Pure so the table math (common-subset totals, min-across-runs
    inputs, one-tree-only reporting, the 2% verdict line) is unit-
    testable without benchmarking anything."""
    common = sorted(set(best["control"]) & set(best["head"]))
    if not common:
        raise ValueError(
            "no common queries between control and head benches -- "
            "nothing to attribute"
        )
    only_ctrl = sorted(set(best["control"]) - set(best["head"]))
    only_head = sorted(set(best["head"]) - set(best["control"]))

    lines = ["| query | control s | head s | head/control |", "|---|---|---|---|"]
    for q in sorted(
        common, key=lambda q: -(best["head"][q] / max(best["control"][q], 1e-9))
    ):
        c, h = best["control"][q], best["head"][q]
        lines.append(f"| {q} | {c:.3f} | {h:.3f} | {h / max(c, 1e-9):.2f} |")
    ct = sum(best["control"][q] for q in common)
    ht = sum(best["head"][q] for q in common)
    lines += [
        "",
        f"Common-subset ({len(common)} queries) best-per-query totals: "
        f"control {ct:.3f} s, head {ht:.3f} s, ratio {ht / ct:.3f}; "
        f"steal% per run: control {steals['control']}, head "
        f"{steals['head']}.",
    ]
    if only_ctrl:
        lines.append(f"Only in control tree: {', '.join(only_ctrl)}")
    if only_head:
        lines.append(f"Only in head tree: {', '.join(only_head)}")
    verdict = (
        "no code regression on the common subset (head <= control within "
        "2%)"
        if ht <= ct * 1.02
        else "head slower than the interleaved control -- bisect, this is "
        "not host noise"
    )
    lines.append(f"Attribution: {verdict}.")
    if min(len(steals["control"]), len(steals["head"])) < 2:
        # single-run best-per-query is one noisy sample, not a floor --
        # round 9 needed 2+ interleaved cycles before per-query minima
        # stabilized under this host's steal spikes
        lines.append(
            "Caveat: fewer than 2 runs per tree -- per-query minima are "
            "single samples; re-run with --runs 2+ before acting on the "
            "verdict."
        )
    return "\n".join(lines)


if __name__ == "__main__":
    main()
