"""Certification-priority ordering contract of registry._ordered().

The external driver certifies the FIRST ~50 entries of queries() each
round; these invariants are what make that window converge: pending
queries sort before certified ones, deferred newcomers never displace
longer-waiting pending queries, and expedited §2-parity lanes lead
their fairness group.
"""

from dgraph_etl_spark.registry import (
    REGISTRY,
    _certified_names,
    _load_suites,
    _ordered,
)


def test_pending_sort_before_certified():
    _load_suites()
    names = [q.name for q in _ordered()]
    done = _certified_names()
    pend_idx = [i for i, n in enumerate(names) if n not in done]
    cert_idx = [i for i, n in enumerate(names) if n in done]
    assert len(names) == len(set(names)) == len(REGISTRY)
    if pend_idx and cert_idx:
        assert max(pend_idx) < min(cert_idx)


def test_defer_groups_and_expedite_front():
    _load_suites()
    order = _ordered()
    done = _certified_names()
    pending = [q for q in order if q.name not in done]
    # within pending: all non-defer before all defer
    defer_flags = [q.defer for q in pending]
    if True in defer_flags and False in defer_flags:
        assert defer_flags.index(True) > max(
            i for i, d in enumerate(defer_flags) if not d
        )
    # within each defer group: expedited entries lead
    for flag in (False, True):
        grp = [q.expedite for q in pending if q.defer is flag]
        if True in grp and False in grp:
            assert grp.index(False) > max(
                i for i, e in enumerate(grp) if e
            ), "expedited query sorted behind a non-expedited one"


def test_expedited_a13_inside_certification_window():
    _load_suites()
    done = _certified_names()
    pending = [q.name for q in _ordered() if q.name not in done]
    if "a13_merge_versioned_store" in pending:
        assert pending.index("a13_merge_versioned_store") < 50


def test_certified_rotation_stalest_first():
    """Within the certified group, queries sort by ascending last
    driver-certified round (freshness rotation): each round's ~50-query
    window re-certifies the rows whose green evidence is OLDEST, so
    shared-code hardening in later rounds is continuously re-proven
    against the earliest-certified queries."""
    from dgraph_etl_spark.registry import _certified_rounds

    _load_suites()
    rounds = _certified_rounds()
    certified_rounds_in_order = [
        rounds[q.name] for q in _ordered() if q.name in rounds
    ]
    assert certified_rounds_in_order == sorted(certified_rounds_in_order)


def test_recertify_rounds_not_in_future():
    """RECERTIFY maps query name -> last round whose green rows are
    stale after a semantic rewrite. A round number beyond the latest
    recorded CORRECTNESS_r*.json would claim to invalidate runs that
    have not happened -- i.e. a rewrite shipped without re-entering
    the certification window. Pin: every entry names a registered
    query and a round <= the latest recorded one."""
    import glob
    import os
    import re

    from dgraph_etl_spark.registry import RECERTIFY, REGISTRY

    _load_suites()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"CORRECTNESS_r0*(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    latest = max(rounds) if rounds else 0
    for name, rnd in RECERTIFY.items():
        assert name in REGISTRY, f"RECERTIFY names unknown query {name}"
        assert rnd <= latest, (
            f"RECERTIFY[{name!r}] = {rnd} exceeds latest recorded round "
            f"{latest}: a semantic rewrite is shipping uncertified"
        )
