"""Scale-linearity invariants over the soak fixture builder.

tools/scale_soak.py measures TIME ratios at 10x; these tests pin the
RESULT relationships at 2x, which the key-remapped replication makes
exact: a linear operator's output on the 2-replica fixture must relate
to its 1x output algebraically (doubled counts, identical averages,
zero cross-replica near-dup pairs). This catches both a broken
replicator (key collisions, text transform leaking across replicas)
and a non-linear operator masquerading as linear.

Exactness notes: doubling a multiset doubles its DECIMAL sums exactly;
2s/2c == s/c holds bit-for-bit in IEEE (scaling num and den by 2 is
exact), so avg columns must be EQUAL, not just close.
"""

import os

import pytest

from dgraph_etl_spark.registry import REGISTRY, _load_suites

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def two_rep(tmp_path_factory):
    from tools.scale_soak import build_fixture

    dest = str(tmp_path_factory.mktemp("soak") / "x2")
    return build_fixture(2, src_sf=SRC, dest=dest)


@pytest.fixture(scope="module", autouse=True)
def _suites():
    _load_suites()


def _rows(spark, name, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_q1_groups_double_counts_preserve_avgs(spark, two_rep):
    base = {}
    for r in _rows(spark, "b14_agg_tpch_q1", SRC):
        d = r.asDict()
        base[(d["l_returnflag"], d["l_linestatus"])] = d
    doubled = {}
    for r in _rows(spark, "b14_agg_tpch_q1", two_rep):
        d = r.asDict()
        doubled[(d["l_returnflag"], d["l_linestatus"])] = d
    assert set(base) == set(doubled)
    for k, b in base.items():
        t = doubled[k]
        for col, v in b.items():
            if col in ("l_returnflag", "l_linestatus"):
                continue
            if col.startswith(("avg", "mean")):
                assert t[col] == v, f"{k}.{col}: avg must be exact-equal"
            elif col.startswith(("count", "n_", "sum")):
                assert t[col] == 2 * v, f"{k}.{col}: must double exactly"
            else:
                # exhaustive: a column matching no prefix would
                # silently shrink this test's coverage
                raise AssertionError(f"unclassified b14 column {col!r}")


def test_exact_dedup_groups_double_copies_preserved(spark, two_rep):
    base = sorted(r.n_copies for r in _rows(spark, "c01_exact_dedup", SRC))
    two = sorted(r.n_copies for r in _rows(spark, "c01_exact_dedup", two_rep))
    # per-replica text transforms are injective and replica-disjoint:
    # every 1x duplicate group appears twice, nothing merges across
    assert two == sorted(base + base)


def test_lsh_pairs_preserved_and_grown_under_replication(spark, two_rep):
    """Base docs are byte-identical in the replicated corpus, so their
    signatures and band keys are unchanged: every base pair MUST
    survive. The previous exact-2x + zero-cross-replica assertions
    were fixture coincidences, not invariants -- replica-1 shingle
    hashes are unrelated to their base twins (borderline band
    collisions can differ) and LSH collides dissimilar docs with
    nonzero probability, so a fixture regen could fail a CORRECT
    engine and misdiagnose the cause."""
    base = {(r.doc_a, r.doc_b) for r in _rows(spark, "c02_minhash_lsh_pairs", SRC)}
    two = {(r.doc_a, r.doc_b) for r in _rows(spark, "c02_minhash_lsh_pairs", two_rep)}
    assert base <= two, sorted(base - two)[:5]
    # the replica contributes additional pairs (its own near-dups)
    assert len(two) > len(base)


def test_q6_revenue_doubles_exactly(spark, two_rep):
    (b,) = _rows(spark, "b67_tpch_q6", SRC)
    (t,) = _rows(spark, "b67_tpch_q6", two_rep)
    assert t[0] == 2 * b[0]
    # the matched-ROW count must double too: revenue alone could pass
    # under a filter regression with compensating values
    assert t[1] == 2 * b[1]
