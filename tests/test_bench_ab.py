"""Unit tests for tools/bench_ab.py's attribution math (no benching).

The A/B harness exists to answer "code regression or host drift?"
with numbers; if ITS arithmetic is wrong the answer poisons a round's
BASELINE attribution, so the table math is pinned here: common-subset
totals exclude one-tree-only queries, the verdict line flips at the
2% threshold, and asymmetric query sets are reported, never silently
summed.
"""

from __future__ import annotations

import pytest

from tools.bench_ab import attribution


def test_common_subset_totals_exclude_one_tree_queries():
    best = {
        "control": {"q1": 1.0, "q2": 2.0, "only_ctrl": 9.0},
        "head": {"q1": 0.9, "q2": 2.0, "only_head": 9.0},
    }
    out = attribution(best, {"control": [0.1], "head": [0.2]})
    # totals are over {q1, q2} only: 3.0 vs 2.9
    assert "control 3.000 s, head 2.900 s" in out
    assert "Only in control tree: only_ctrl" in out
    assert "Only in head tree: only_head" in out
    # head faster -> no-regression verdict
    assert "no code regression" in out


def test_verdict_flips_above_two_percent():
    best = {"control": {"q1": 1.0}, "head": {"q1": 1.03}}
    out = attribution(best, {"control": [0.0], "head": [0.0]})
    assert "bisect" in out
    # exactly at the threshold stays attributed to noise
    best = {"control": {"q1": 1.0}, "head": {"q1": 1.02}}
    out = attribution(best, {"control": [0.0], "head": [0.0]})
    assert "no code regression" in out


def test_rows_sorted_worst_ratio_first():
    best = {
        "control": {"fast": 1.0, "slow": 1.0},
        "head": {"fast": 0.5, "slow": 2.0},
    }
    out = attribution(best, {"control": [], "head": []})
    rows = [ln for ln in out.splitlines() if ln.startswith("| ")]
    # header row, then 'slow' (ratio 2.0) before 'fast' (0.5)
    assert rows[1].startswith("| slow ")
    assert rows[2].startswith("| fast ")


def test_empty_intersection_raises():
    with pytest.raises(ValueError, match="no common queries"):
        attribution(
            {"control": {"a": 1.0}, "head": {"b": 1.0}},
            {"control": [], "head": []},
        )


def test_single_run_verdict_carries_low_sample_caveat():
    best = {"control": {"q1": 1.0}, "head": {"q1": 1.5}}
    out = attribution(best, {"control": [0.1], "head": [0.1]})
    assert "Caveat: fewer than 2 runs" in out
    out = attribution(best, {"control": [0.1, 0.2], "head": [0.1, 0.2]})
    assert "Caveat" not in out
