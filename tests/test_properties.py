"""Property-based tests (SURVEY.md §5 item 3): the engine's set-oriented
pipeline must agree with a sequential fold of the reference's
record-at-a-time semantics (rMap/uMap, cmd/bulk/main.go:29-53,178-212)
on arbitrary record streams — duplicates, interleavings, redelivery.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE, SF_SMALL
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraph_etl_spark.functions.similarity import brute_topk, ivf_topk
from dgraph_etl_spark.pipeline.edges import (
    explode_bidirectional,
    max_score_per_edge,
    merge_max_with_existing,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small id space => guaranteed duplicate (src,dst) pairs
_rec = st.tuples(
    st.integers(0, 5),  # from_person_id
    st.integers(0, 5),  # to_person_id
    st.integers(0, 100),  # raw_score_in
    st.integers(0, 100),  # raw_score_out
)
_streams = st.lists(_rec, min_size=1, max_size=40)

_COLS = ["from_person_id", "to_person_id", "raw_score_in", "raw_score_out"]


def _df(spark, recs):
    return spark.createDataFrame(
        [(str(a), str(b), i, o) for a, b, i, o in recs], _COLS
    )


def _sequential_rmap(recs):
    """The reference's consumer loop, verbatim semantics: two directed
    edges per record; keep an edge only if its score beats the stored
    one (cmd/bulk/main.go:178-212)."""
    rmap: dict[tuple[str, str], float] = {}
    for a, b, score_in, score_out in recs:
        for src, dst, sc in ((a, b, score_in), (b, a, score_out)):
            key = (str(src), str(dst))
            if key not in rmap or sc > rmap[key]:
                rmap[key] = float(sc)
    return rmap


@given(_streams)
@_settings
def test_a12_groupby_max_equals_sequential_rmap(spark, recs):
    out = max_score_per_edge(explode_bidirectional(_df(spark, recs)))
    got = {(r.src, r.dst): r.score for r in out.collect()}
    assert got == _sequential_rmap(recs)


@given(_streams)
@_settings
def test_a9_explode_yields_exactly_2n_edges(spark, recs):
    exploded = explode_bidirectional(_df(spark, recs))
    assert exploded.count() == 2 * len(recs)


@given(_streams)
@_settings
def test_a5_redelivery_is_idempotent(spark, recs):
    """At-least-once redelivery (the reference re-reads from the
    watermark, elastic.go:50-51): processing the stream twice must give
    the same edges as processing it once."""
    once = _df(spark, recs)
    twice = once.unionAll(once)
    a = max_score_per_edge(explode_bidirectional(once)).collect()
    b = max_score_per_edge(explode_bidirectional(twice)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@given(_streams, _streams)
@_settings
def test_a13_merge_is_associative_with_batching(spark, old, new):
    """Merging batch-by-batch == merging everything at once (the
    algebraic property that lets the batch pipeline replace per-record
    conditional upserts, dgraph.go:110-133)."""
    both = max_score_per_edge(explode_bidirectional(_df(spark, old + new)))
    staged = merge_max_with_existing(
        explode_bidirectional(_df(spark, new)),
        max_score_per_edge(explode_bidirectional(_df(spark, old))),
    )
    assert sorted(map(tuple, both.collect())) == sorted(
        map(tuple, staged.collect())
    )


def test_c04_ivf_recall_vs_brute_force(spark, sf_small):
    """IVF probes 3 of the label cells; its top-10 must substantially
    overlap the exact top-10 (the fixture's labels correlate with the
    embedding clusters, so recall should be high)."""
    from dgraph_etl_spark.catalog import register_views

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    qv = emb.filter("vec_id = 0").selectExpr("embedding AS qvec")
    exact = {r.vec_id for r in brute_topk(emb, qv, k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(emb, qv, k=10, nprobe=3).collect()}
    assert len(exact & approx) >= 5


# ---------------------------------------------------------------- C12

_edges = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=0,
    max_size=20,
)


def _sequential_components(n_nodes, pairs):
    """Union-find ground truth: component = min node id reachable."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@given(_edges)
@_settings
def test_c12_components_equal_union_find(spark, pairs):
    from dgraph_etl_spark.functions.dedup import neardup_components

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pdf = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs] or [(0, 0)],
        ["doc_a", "doc_b"],
    )
    if not pairs:
        pdf = pdf.filter("doc_a <> doc_b")  # empty edge set
    got = {
        r.doc_id: r.component
        for r in neardup_components(docs, pdf).collect()
    }
    want = _sequential_components(n, pairs)
    assert got == want


def test_g29_hits_closed_forms(spark):
    from dgraph_etl_spark.graph.traverse import hits

    # star (leaves -> center): leaves are pure equal hubs, the center
    # is the sole authority (L1-normalized: auth(c)=1, hub(l)=1/4)
    star = spark.createDataFrame(
        [(f"l{i}", "c", 1.0) for i in range(4)], ["src", "dst", "score"]
    )
    got = {r.node: (r.hub, r.auth) for r in hits(star, n_iter=3).collect()}
    assert got["c"] == (0.0, 1.0), got
    for i in range(4):
        assert got[f"l{i}"] == (0.25, 0.0), got

    # n_iter=0 degrades to the initial vectors (like pagerank), not a
    # crash: uniform 1.0 hub/auth for every node
    got0 = {r.node: (r.hub, r.auth) for r in hits(star, n_iter=0).collect()}
    assert all(v == (1.0, 1.0) for v in got0.values()), got0


def test_g10_pagerank_closed_forms(spark):
    from dgraph_etl_spark.graph.traverse import pagerank

    # cycle: symmetric => uniform 1/n
    cyc = spark.createDataFrame(
        [(str(i), str((i + 1) % 5), 1.0) for i in range(5)],
        ["src", "dst", "score"],
    )
    ranks = {r.node: r.rank for r in pagerank(cyc, n_iter=8).collect()}
    assert all(abs(v - 0.2) < 1e-9 for v in ranks.values()), ranks
    assert abs(sum(ranks.values()) - 1.0) < 1e-6

    # star (leaves -> center): center absorbs damped mass; leaves equal
    star = spark.createDataFrame(
        [(f"l{i}", "c", 1.0) for i in range(4)], ["src", "dst", "score"]
    )
    ranks = {r.node: r.rank for r in pagerank(star, n_iter=12).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    leaves = [v for k, v in ranks.items() if k != "c"]
    assert max(leaves) - min(leaves) < 1e-12
    assert ranks["c"] > 4 * max(leaves)


def test_c02_lsh_recall_of_true_neardups(spark):
    """LSH candidate pairs must contain every true near-duplicate
    (2-gram Jaccard >= 0.8) on the sf0.01 fixture -- the recall
    contract that makes the banding parameters (32 hashes / 8 bands)
    trustworthy. Precision is allowed to be < 1 (candidates get
    re-ranked); recall is not."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions import dedup as D

    docs = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(
            docs, n=2, block_col="lang", threshold=0.8
        ).collect()
    }
    assert truth, "fixture lost its planted near-duplicates"
    for portable in (False, True):
        lsh = {
            (r.doc_a, r.doc_b)
            for r in D.lsh_candidate_pairs(docs, portable=portable).collect()
        }
        assert truth <= lsh, (
            f"LSH (portable={portable}) missed true pairs: "
            f"{sorted(truth - lsh)}"
        )


def test_c02_simhash_hamming_pairs_exact(spark):
    """simhash_hamming_pairs must equal EXACTLY the brute-force
    Hamming<=r pair set over the signatures: pigeonhole banding
    guarantees recall 1.0 (a pair differing in <=r bits agrees on one
    of the r+1 chunks), and the bit_count(xor)<=r filter guarantees
    precision 1.0."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions import dedup as D

    docs = load_table(spark, SF_SMALL, "documents")
    sigs = {r.doc_id: r.simhash for r in D.simhash_signatures(docs).collect()}
    ids = sorted(sigs)
    r = 3
    mask = 0xFFFFFFFFFFFFFFFF
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & mask).count("1") <= r
    }
    got = {
        (p.doc_a, p.doc_b)
        for p in D.simhash_hamming_pairs(docs, r=r).collect()
    }
    assert truth, "fixture has no Hamming<=3 pairs -- test is vacuous"
    assert got == truth, (
        f"missing={sorted(truth - got)[:5]} extra={sorted(got - truth)[:5]}"
    )


def test_c12_components_raise_on_nonconvergence(spark):
    """A path graph's diameter exceeds a tiny max_iter: the propagation
    must FAIL LOUDLY, never return stale (under-deduped) labels."""
    import pytest

    from dgraph_etl_spark.functions.dedup import neardup_components

    n = 8
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(docs, chain, max_iter=2)
    labels = neardup_components(docs, chain, max_iter=n).collect()
    assert {r.component for r in labels} == {0}


_tri_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=80
)


@given(_tri_edges)
@_settings
def test_g09_degree_oriented_triangles_equal_lexicographic(spark, pairs):
    """Degree-based orientation must count exactly the triangles the
    lexicographic orientation counts, on arbitrary multigraphs with
    loops and duplicate/reversed edges."""
    from dgraph_etl_spark.graph.traverse import (
        triangle_count,
        triangle_count_degree_oriented,
    )

    edges = spark.createDataFrame(
        [(str(a), str(b), 1.0) for a, b in pairs], ["src", "dst", "score"]
    )
    lex = triangle_count(edges).first()["n_triangles"]
    deg = triangle_count_degree_oriented(edges).first()["n_triangles"]
    assert lex == deg


_winnow_tok = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=2), min_size=0, max_size=12
)


@given(_winnow_tok, _winnow_tok, _winnow_tok, _winnow_tok)
@_settings
def test_c22_winnowing_guarantee_on_shared_runs(spark, pre_a, post_a, pre_b, post_b):
    """Winnowing's core guarantee (k=3, w=4): two documents sharing a
    token run of length >= w+k-1 = 6 MUST share at least one
    fingerprint, whatever surrounds the run."""
    from dgraph_etl_spark.functions.text import winnowing_fingerprints

    shared = ["s1", "s2", "s3", "s4", "s5", "s6"]
    doc_a = " ".join(pre_a + shared + post_a)
    doc_b = " ".join(pre_b + shared + post_b)
    docs = spark.createDataFrame([(0, doc_a), (1, doc_b)], ["doc_id", "text"])
    fps = winnowing_fingerprints(docs, k=3, w=4).collect()
    a = {r.fp for r in fps if r.doc_id == 0}
    b = {r.fp for r in fps if r.doc_id == 1}
    assert a & b, f"no shared fingerprint:\nA={doc_a!r}\nB={doc_b!r}"


def test_c20_srp_lsh_precision_and_recall(spark):
    """SRP-LSH near-dup pairs: precision must be exactly 1.0 (the
    final cosine filter is exact), and recall vs the brute-force
    cosine>=0.9 pair set must clear a floor on the deterministic
    fixture (hyperplanes are seeded, so this is a fixed number, not a
    flaky sample)."""
    import numpy as np

    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.similarity import srp_neardup_pairs

    # sf0.01: the smallest fixture with planted embedding near-dups
    # (sf0.001's max off-diagonal cosine is 0.48)
    emb = load_table(spark, SF_ORACLE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b, s in zip(ids[iu[0]], ids[iu[1]], sims[iu])
        if round(s, 4) >= 0.4
    }
    got = {
        (p.vec_a, p.vec_b)
        for p in srp_neardup_pairs(
            emb, threshold=0.4, n_planes=16, n_bands=8, seed=7
        ).collect()
    }
    assert truth, "fixture has no cosine>=0.4 pairs -- test is vacuous"
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} below floor"

    # the registered (c20) form swaps Gaussian planes for the
    # md5-Rademacher family -- same precision guarantee, and its
    # recall must clear the same floor (measured 0.983 on the fixture)
    from dgraph_etl_spark.functions.similarity import (
        srp_neardup_pairs_portable,
    )

    got_p = {
        (p.vec_a, p.vec_b)
        for p in srp_neardup_pairs_portable(
            emb, threshold=0.4, n_planes=16, n_bands=8, dim=64
        ).collect()
    }
    assert got_p <= truth, f"false positives: {sorted(got_p - truth)[:5]}"
    recall_p = len(got_p & truth) / len(truth)
    assert recall_p >= 0.9, f"portable recall {recall_p:.3f} below floor"


def test_srp_broadcast_signature_equals_literal_form(spark):
    """The broadcast-planes SRP signature (plan size independent of
    dim, no driver action when dim is passed) must produce bit-for-bit
    the same signatures as the original literal-hyperplane form for
    the same (seed, n_planes, dim)."""
    from dgraph_etl_spark.catalog import embedding_dim, load_table
    from dgraph_etl_spark.functions.similarity import (
        _srp_signatures_literal,
        srp_signatures,
    )

    sf = SF_SMALL
    emb = load_table(spark, sf, "embeddings")
    dim = embedding_dim(sf)
    new = {
        r.vec_id: r.srp_sig
        for r in srp_signatures(emb, n_planes=16, seed=7, dim=dim).collect()
    }
    old = {
        r.vec_id: r.srp_sig
        for r in _srp_signatures_literal(emb, 16, 7, "embedding", dim).collect()
    }
    assert new == old
    # long-range sanity: 64 planes exercises the full bit width the
    # literal int form could not have represented safely
    wide = srp_signatures(emb, n_planes=64, seed=3, dim=dim)
    assert wide.schema["srp_sig"].dataType.simpleString() == "bigint"
    assert wide.limit(5).count() == 5


def test_c19_hash_samples_are_nested_and_partition_invariant(spark):
    """Hash sampling contracts: (a) the 25% sample is a SUBSET of the
    50% sample at the same seed (nested ablations), (b) the kept set is
    invariant under repartitioning (df.sample is not)."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.sampling import hash_sample

    docs = load_table(spark, SF_SMALL, "documents")
    s25 = {r.doc_id for r in hash_sample(docs, rate=0.25).select("doc_id").collect()}
    s50 = {r.doc_id for r in hash_sample(docs, rate=0.5).select("doc_id").collect()}
    assert s25 <= s50
    n = docs.count()
    assert abs(len(s25) / n - 0.25) < 0.08 and abs(len(s50) / n - 0.5) < 0.08
    rep = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), rate=0.25)
        .select("doc_id")
        .collect()
    }
    assert rep == s25


def test_c25_mixture_epochs_copy_counts_and_nesting(spark):
    """Mixture-upsampling contracts: (a) every row gets floor(w) or
    floor(w)+1 copies of its stratum weight and epoch indices are
    exactly 1..n, (b) the extra-copy set of a SMALLER fractional
    weight is a subset of a larger one at the same seed (fractional
    epochs nest like the samples they are built from)."""
    from collections import Counter

    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.sampling import mixture_epochs

    docs = load_table(spark, SF_SMALL, "documents")
    w = {"src0": 2.5, "src1": 0.25}
    out = mixture_epochs(docs, weights=w, default_weight=1.0).collect()
    per_doc = Counter(r.doc_id for r in out)
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    for doc_id, n in per_doc.items():
        base = int(w.get(src[doc_id], 1.0))
        assert n in (base, base + 1), (doc_id, n)
    epochs = {}
    for r in out:
        epochs.setdefault(r.doc_id, set()).add(r.epoch)
    assert all(e == set(range(1, len(e) + 1)) for e in epochs.values())
    # src1 rows absent at w=0.25 must also be absent at w=0.75
    kept_25 = {d for d, n in per_doc.items() if src[d] == "src1" and n >= 1}
    out75 = mixture_epochs(docs, weights={"src1": 0.75}).collect()
    kept_75 = {r.doc_id for r in out75 if src[r.doc_id] == "src1"}
    assert kept_25 <= kept_75


def test_c26_sequence_chunks_tile_every_document(spark):
    """Chunking contracts per document: chunk 0 starts at token 0,
    starts advance by exactly the stride, the final chunk ends at
    n_tokens, every chunk holds 1..seq_len tokens, and the chunk text
    re-slices the source tokens verbatim."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.text import sequence_chunks

    docs = load_table(spark, SF_SMALL, "documents")
    L, S = 64, 48
    rows = sequence_chunks(docs, seq_len=L, stride=S).collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs.select("doc_id", "text").collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        t = toks[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert chunks[0].start_tok == 0
        assert all(c.start_tok == i * S for i, c in enumerate(chunks))
        assert chunks[-1].end_tok == len(t)
        for c in chunks:
            assert 1 <= c.n_chunk_tokens <= L
            assert c.chunk_text == " ".join(t[c.start_tok : c.end_tok])


def test_c02_simhash_is_python_free(spark):
    """The SimHash vote must stay entirely JVM-side: no
    BatchEvalPython / ArrowEvalPython node may appear in the plan
    (the round-1 pandas-UDF FNV loop was the repo's only
    row-at-a-time Python hot path)."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions import dedup as D

    docs = load_table(spark, SF_SMALL, "documents")
    plan = D.simhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


_doclens = st.lists(st.integers(1, 500), min_size=1, max_size=60)


@given(_doclens, st.integers(1, 5000))
@_settings
def test_c13_banded_pack_equals_naive_global_window(spark, lens, budget):
    """token_budget_pack's banded distributed prefix sum must equal the
    naive single-partition global running sum for ANY length profile
    and budget (ties, empty bands, budget beyond the corpus, ...)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dgraph_etl_spark.functions.text import token_budget_pack

    rows = [
        (i, " ".join(["w"] * max(1, ln // 2)), ln)
        for i, ln in enumerate(lens)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in token_budget_pack(docs, budget).collect()
    }
    naive_w = W.orderBy(F.desc("n_chars"), "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    naive = {
        r.doc_id: (r.n_tokens, r.cum)
        for r in docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            "n_chars",
        )
        .withColumn("cum", F.sum("n_tokens").over(naive_w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == naive


_groups = st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 400)),  # (source, n_chars)
    min_size=2,
    max_size=40,
)


@given(_groups)
@_settings
def test_c14_integer_ztest_equals_reference(spark, rows):
    """The integer-exact z-test (n*x - s)^2 > 4*(n*ss - s^2) must equal
    the |z| > 2 outlier flag computed in exact arithmetic per group --
    including sigma=0 groups (all-equal values are never outliers)."""
    docs = spark.createDataFrame(
        [(i, f"src{g}", ln) for i, (g, ln) in enumerate(rows)],
        ["doc_id", "source", "n_chars"],
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("source")
    x = F.col("n_chars")
    n, s, ss = (
        F.count(F.lit(1)).over(w),
        F.sum(x).over(w),
        F.sum(x * x).over(w),
    )
    d = n * x - s
    got = {
        r.doc_id: r.is_outlier
        for r in docs.select(
            "doc_id", (d * d > 4 * (n * ss - s * s)).alias("is_outlier")
        ).collect()
    }

    # exact-fraction reference: |x - mean| > 2*sigma  <=>
    # (x - S/N)^2 > 4*(SS/N - (S/N)^2), scaled by N^2 to stay integral
    from collections import defaultdict

    by_src = defaultdict(list)
    for i, (g, ln) in enumerate(rows):
        by_src[g].append((i, ln))
    want = {}
    for g, members in by_src.items():
        N = len(members)
        S = sum(ln for _, ln in members)
        SS = sum(ln * ln for _, ln in members)
        for i, ln in members:
            want[i] = (N * ln - S) ** 2 > 4 * (N * SS - S * S)
    assert got == want


def test_kcore_clique_survives_pendant_peels(spark):
    """Closed form: K4 + a pendant vertex hanging off it. The 3-core is
    exactly the K4 (every clique vertex keeps degree 3 after the
    pendant is peeled); the pendant (degree 1) and its effect on its
    anchor's degree vanish."""
    from dgraph_etl_spark.graph.traverse import k_core

    k4 = [(a, b) for a in "1234" for b in "1234" if a < b]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in k4] + [("4", "9", 1.0)],
        ["src", "dst", "score"],
    )
    got = {
        (r["id"], r["core_degree"])
        for r in k_core(edges, k=3, n_rounds=10).collect()
    }
    assert got == {("1", 3), ("2", 3), ("3", 3), ("4", 3)}


def test_kcore_cycle_below_k_empties(spark):
    """A plain cycle is 2-regular: a 3-core peel removes everything."""
    from dgraph_etl_spark.graph.traverse import k_core

    cyc = [(str(i), str((i + 1) % 6), 1.0) for i in range(6)]
    edges = spark.createDataFrame(cyc, ["src", "dst", "score"])
    assert k_core(edges, k=3, n_rounds=10).count() == 0


def test_span_dup_whole_doc_copy_scores_one(spark):
    """Closed form for the passage screen: two identical docs have
    EVERY span duplicated (frac 1.0); a doc sharing nothing scores 0;
    a doc sharing exactly its first 8-token span with another doc
    scores 1/ceil(n_spans)."""
    from dgraph_etl_spark.functions.text import span_dup_stats

    shared = " ".join(f"s{i}" for i in range(8))
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + uniq_a),   # 2 spans, 1 shared
            (2, shared),                  # 1 span, shared
            (3, uniq_b),                  # 2 spans, none shared
            (4, uniq_b),                  # exact copy of 3
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_frac"])
        for r in span_dup_stats(docs, k=8).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (2, 2, 1.0)
    assert got[4] == (2, 2, 1.0)


def test_catalog_sf_dir_switch_mid_session(spark):
    """Harness probe (verify-skill gotcha): registering sf0.001 then
    sf0.01 in the SAME session must re-point every view -- the catalog
    caches the last registered dir per session and must invalidate on
    switch, never serve stale views."""
    from dgraph_etl_spark.catalog import register_views

    register_views(spark, SF_SMALL, force=True)
    n_small = spark.table("lineitem").count()
    register_views(spark, SF_ORACLE)
    n_big = spark.table("lineitem").count()
    assert n_big > n_small
    register_views(spark, SF_SMALL)
    assert spark.table("lineitem").count() == n_small


def test_approx_quantiles_within_rank_tolerance(spark, sf_small):
    """b59's sketch answers must sit within rank-error tolerance of the
    exact percentiles: GK with accuracy A guarantees rank error
    <= n/A, so with A=10000 and per-group n in the low thousands the
    approx answer must land between the exact neighbors of the target
    rank -- here we allow the value band [exact_p(q-eps), exact_p(q+eps)]
    with eps = 1% of rank: orders of magnitude wider than the sketch's
    n/A guarantee but tight enough to catch a broken sketch, and wide
    enough to absorb percentile()'s interpolation between rows (the
    sketch returns actual data values)."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.registry import REGISTRY, _load_suites

    _load_suites()
    rows = REGISTRY["b59_quantile_error_bound"].fn(spark, sf_small).collect()
    assert rows, "b59 returned no groups"
    for r in rows:
        assert r["p50_within"] == 1 and r["p95_within"] == 1, r
    # independent band check on the raw sketch values (the registered
    # query deliberately omits them -- re-derive here)
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    eps = 0.01
    for q, idx in ((0.5, 0), (0.95, 1)):
        exact_lo = {
            r["l_returnflag"]: r["v"]
            for r in li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile(l_extendedprice, {max(q - eps, 0)})").alias("v"))
            .collect()
        }
        exact_hi = {
            r["l_returnflag"]: r["v"]
            for r in li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile(l_extendedprice, {min(q + eps, 1)})").alias("v"))
            .collect()
        }
        for flag, vals in approx.items():
            assert exact_lo[flag] <= vals[idx] <= exact_hi[flag], (
                q, flag, vals[idx], exact_lo[flag], exact_hi[flag],
            )


def test_sketch_profile_within_hll_tolerance(spark, sf_small):
    """b69's per-column HLL estimates must sit within 5% of the exact
    distinct counts (rsd is configured at 1%; 5% leaves slack while
    still catching a broken sketch or a wrong column wiring)."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.registry import REGISTRY, _load_suites

    _load_suites()
    row = REGISTRY["b69_sketch_error_bound"].fn(spark, sf_small).collect()[0]
    for c in ["ok_orderkey", "ok_custkey", "ok_status", "ok_priority"]:
        assert row[c] == 1, (c, dict(row.asDict()))
    # independent re-derivation: the raw HLL estimates (omitted from
    # the registered output) must sit within 5% of the exact counts
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    both = o.agg(
        *[
            F.approx_count_distinct(c, 0.01).alias(f"a_{c}")
            for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
        ],
        *[
            F.countDistinct(c).alias(f"e_{c}")
            for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
        ],
    ).collect()[0]
    for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]:
        assert abs(both[f"a_{c}"] - both[f"e_{c}"]) <= max(
            1, 0.05 * both[f"e_{c}"]
        ), (c, both[f"a_{c}"], both[f"e_{c}"])


# --------------------------------------------------- k-means quantizer


def test_kmeans_assignment_is_partitioning_invariant(spark, sf_small):
    """The fixed-point design claim: integer distance/centroid math
    makes Lloyd's algorithm reproducible regardless of how the corpus
    is partitioned (float partial sums would not be)."""
    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.functions.similarity import kmeans_cells

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    a = {
        (r["vec_id"], r["cell"])
        for r in kmeans_cells(emb, k=4, n_iter=2).collect()
    }
    b = {
        (r["vec_id"], r["cell"])
        for r in kmeans_cells(emb.repartition(7), k=4, n_iter=2).collect()
    }
    assert a == b
    cells = {c for _, c in a}
    assert len(cells) >= 2  # the fixture is not degenerate


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_small):
    """Learned-quantizer ANN: probing 2 of 4 cells must recover a
    meaningful share of the true top-10 (and every returned id must be
    in the true corpus)."""
    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.functions.similarity import (
        brute_topk,
        ivf_kmeans_topk,
    )
    from pyspark.sql import functions as F

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    true = {r["vec_id"] for r in brute_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_kmeans_topk(
            emb, qv, k=10, ncells=4, n_iter=2, nprobe=2
        ).collect()
    }
    assert len(approx) == 10
    recall = len(true & approx) / 10
    assert recall >= 0.4, f"recall@10 {recall}"


def test_int8_topk_recall_vs_float_brute_force(spark, sf_small):
    """4x-compressed ANN: integer-dot ranking over the int8 grid must
    recover most of the true float top-10."""
    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.functions.similarity import brute_topk, int8_topk
    from pyspark.sql import functions as F

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    true = {r["vec_id"] for r in brute_topk(emb, qv, k=10).collect()}
    q8 = {r["vec_id"] for r in int8_topk(emb, qv, k=10).collect()}
    recall = len(true & q8) / 10
    assert recall >= 0.5, f"recall@10 {recall}"


def test_c57_pq_recall_vs_brute_force(spark, sf_small):
    """PQ-ADC keeps 30 candidates for a top-10 re-rank; the re-ranked
    result must substantially overlap the exact top-10 (8 subspaces x
    16 codes on 64-dim vectors loses little at this corpus size). The
    re-rank makes every returned similarity EXACT, so only membership
    can degrade -- never a reported score."""
    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.functions.similarity import pq_topk

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    qv = emb.filter("vec_id = 0").selectExpr("embedding AS qvec")
    exact = {r.vec_id for r in brute_topk(emb, qv, k=10).collect()}
    approx = {r.vec_id for r in pq_topk(emb, qv, k=10).collect()}
    assert len(exact & approx) >= 5


@given(
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
)
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_z_address_locality_and_bijection(spark, a1, b1, a2, b2):
    """Z-address invariants that make footer-stat skipping work:
    monotone in each dimension when the other is fixed (so a file's
    zkey range bounds each dimension's range), and bijective over the
    8-bit x 8-bit grid (no two cells collide)."""
    from dgraph_etl_spark.sinks.layout import z_address
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(a1, b1), (a2, b2)], "a long, b long"
    ).select(z_address(F.col("a"), F.col("b"), bits=8).alias("z"), "a", "b")
    rows = {(r.a, r.b): r.z for r in df.collect()}
    z1, z2 = rows[(a1, b1)], rows[(a2, b2)]
    if (a1, b1) == (a2, b2):
        assert z1 == z2
    else:
        assert z1 != z2  # bijection
    if b1 == b2 and a1 < a2:
        assert z1 < z2  # monotone in a with b fixed
    if a1 == a2 and b1 < b2:
        assert z1 < z2  # monotone in b with a fixed


def test_c63_ivfpq_recall_vs_brute_force(spark, sf_small):
    """IVFPQ prunes twice: the coarse probe bounds achievable recall
    (nprobe/ncells of the corpus is visible at all), and the PQ codes
    may lose a little more within it. Assert both halves separately:
    the composition recovers a meaningful share of the exact top-10,
    AND the PQ stage costs at most 2 hits versus IVF-only over the
    SAME probe (isolating what the codes add)."""
    from dgraph_etl_spark.catalog import register_views
    from dgraph_etl_spark.functions.similarity import (
        ivf_kmeans_topk,
        ivfpq_topk,
    )

    register_views(spark, sf_small)
    emb = spark.table("embeddings")
    qv = emb.filter("vec_id = 0").selectExpr("embedding AS qvec")
    exact = {r.vec_id for r in brute_topk(emb, qv, k=10).collect()}
    ivf_only = {
        r.vec_id for r in ivf_kmeans_topk(emb, qv, k=10).collect()
    }
    composed = {r.vec_id for r in ivfpq_topk(emb, qv, k=10).collect()}
    assert len(exact & composed) >= 3
    assert len(exact & composed) >= len(exact & ivf_only) - 2


def test_c40_srp_hard_negatives_quality_floors(spark):
    """The SRP-bucketed hard-negative miner (registered c40) against
    the all-pairs exactness baseline it replaced, on the deterministic
    fixture (md5-Rademacher planes: fixed numbers, not flaky samples).
    Two floors, matching the two regimes:

    1. Fixture regime (best cross-label sims ~0.37 -- SRP's worst
       case): every anchor still gets SOME negative (coverage 1.0),
       and for >=85% of anchors the mined negative sits in the hardest
       10% of that anchor's full cross-label candidate set (measured
       0.884 at 32 planes / 4 bands x 8 bits).
    2. Production regime (a planted cross-label near-copy, sim~0.99 --
       what hard-negative mining actually hunts): the miner must
       return the planted vector as THE top negative for >=90% of the
       planted anchors (collision prob ~0.99 at this banding).
    """
    import numpy as np

    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.similarity import (
        hard_negatives_exact,
        hard_negatives_srp,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        r.anchor_id: (r.negative_id, r.sim)
        for r in hard_negatives_exact(emb).collect()
    }
    mined = {
        r.anchor_id: (r.negative_id, r.sim)
        for r in hard_negatives_srp(emb, dim=64).collect()
    }
    assert set(mined) == set(exact), "coverage below 1.0 on the fixture"

    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 4)
    in_decile = 0
    for i, a in enumerate(ids):
        cross = sims[i][labels != labels[i]]
        cutoff = np.quantile(cross, 0.9)
        if mined[int(a)][1] >= cutoff:
            in_decile += 1
    share = in_decile / len(ids)
    assert share >= 0.85, f"hardest-decile share {share:.3f} below floor"

    # planted near-copies: clone 50 vectors with a tiny perturbation
    # and a DIFFERENT label -- the planted clone is each anchor's true
    # hard negative by a wide margin
    rng = np.random.RandomState(11)
    planted_rows, planted_truth = [], {}
    for i in range(0, 500, 10):
        v = m[i] + rng.normal(scale=0.02, size=m.shape[1]) * np.abs(m[i]).mean()
        new_id = 100000 + int(ids[i])
        planted_rows.append(
            (new_id, [float(x) for x in v], int((labels[i] + 1) % 10))
        )
        planted_truth[int(ids[i])] = new_id
    planted = spark.createDataFrame(
        planted_rows, "vec_id bigint, embedding array<float>, label int"
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    mined2 = {
        r.anchor_id: r.negative_id
        for r in hard_negatives_srp(corpus, dim=64).collect()
    }
    hits = sum(
        1 for a, neg in planted_truth.items() if mined2.get(a) == neg
    )
    assert hits / len(planted_truth) >= 0.90, (
        f"planted-near-dup recall {hits / len(planted_truth):.2f} below floor"
    )


def test_c04_arrow_lane_equals_jvm_lane(spark):
    """brute_topk_arrow (the large-N mapInPandas lane) must return the
    IDENTICAL (vec_id, sim) rows as brute_topk (the JVM expression
    lane) -- same round-4dp sims, same vec_id tiebreak -- on both
    small fixtures, so swapping lanes by corpus size never changes an
    answer."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions import similarity as S

    for sf in (SF_SMALL, SF_ORACLE):
        emb = load_table(spark, sf, "embeddings")
        query = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qvec")
        )
        jvm = [(r.vec_id, r.sim) for r in S.brute_topk(emb, query, 25).collect()]
        arrow = [
            (r.vec_id, r.sim)
            for r in S.brute_topk_arrow(emb, query, 25).collect()
        ]
        assert jvm == arrow


def test_c04_arrow_lane_edge_case_parity(spark):
    """The Arrow lane must agree with the JVM lane on degenerate
    inputs too: a zero-norm corpus vector scores NULL sim in BOTH
    lanes (cosine uses try_divide -- under ANSI mode a bare division
    would ERROR, under non-ANSI it would make NaN sort first; NULL
    sorts last under desc in both configs), and sims round HALF_UP
    like F.round, not numpy half-to-even. Guards the divergences
    flagged in round-5 advice: coercing zero norms to 1.0 (sim 0.0)
    or np.round (banker's rounding) would let a corpus-size-based
    lane swap change an answer."""
    import math

    from dgraph_etl_spark.functions import similarity as S

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # the query itself: sim 1.0
        (1, [0.0, 0.0, 0.0, 0.0]),   # zero norm: NULL in both lanes
        (2, [0.5, 0.5, 0.5, 0.5]),   # sim 0.5
        (3, [-1.0, 0.0, 0.0, 0.0]),  # sim -1.0
        # 4dp half-boundary: cos = 0.12345 -> HALF_UP gives 0.1235
        # (numpy half-to-even would give 0.1234)
        (4, [0.12345, math.sqrt(1 - 0.12345**2), 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    query = spark.createDataFrame([([1.0, 0.0, 0.0, 0.0],)], "qvec array<float>")

    jvm = [(r.vec_id, r.sim) for r in S.brute_topk(emb, query, 5).collect()]
    arrow = [
        (r.vec_id, r.sim) for r in S.brute_topk_arrow(emb, query, 5).collect()
    ]
    assert jvm == arrow
    assert jvm[-1] == (1, None)  # NULL sim sorts last under desc
    sims = dict(jvm)
    assert sims[4] == 0.1235  # HALF_UP at the boundary


def test_asof_join_null_payload_matches_duckdb_semantics(spark):
    """A matched right row whose PAYLOAD is NULL must be returned as-is
    (DuckDB ASOF semantics): the old per-column last(ignorenulls) carry
    skipped the NULL and paired an OLDER row's value with the newer
    matched_ts -- a franken-row. The struct carry pins the fix."""
    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame([("k", 3, "L")], "k string, ts int, lval string")
    right = spark.createDataFrame(
        [("k", 1, 5), ("k", 2, None)], "k string, ts int, v int"
    )
    row = asof_join(left, right, on="k", ts="ts", right_cols=["v"]).first()
    assert row.matched_ts == 2  # ts=2 row is the as-of match...
    assert row.v is None  # ...and its NULL value comes with it


def test_asof_join_rejects_colliding_right_cols(spark):
    import pytest as _pytest

    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame([("k", 1, 1.0)], "k string, ts int, v double")
    right = spark.createDataFrame([("k", 1, 2.0)], "k string, ts int, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", ts="ts", right_cols=["v"])


def test_c04_arrow_lane_zero_norm_query_parity(spark):
    """A zero-norm QUERY vector must produce NULL sims in BOTH lanes
    (the JVM lane's try_divide does; the Arrow lane previously scored
    everything 0.0 and returned a fake top-k)."""
    from dgraph_etl_spark.functions import similarity as S

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id bigint, embedding array<float>"
    )
    query = spark.createDataFrame([([0.0, 0.0],)], "qvec array<float>")
    jvm = [(r.vec_id, r.sim) for r in S.brute_topk(emb, query, 2).collect()]
    arrow = [
        (r.vec_id, r.sim) for r in S.brute_topk_arrow(emb, query, 2).collect()
    ]
    assert jvm == arrow
    assert all(sim is None for _, sim in jvm)


def test_hash_sample_boundary_rates(spark, sf_small):
    """rate=1.0 must keep EVERY row and rate=0.0 none: the naive hex
    threshold for 1.0 is the 9-char '100000000', which sorts before
    'ffffffff' and silently kept only the '0'-prefixed ~6% of rows."""
    from dgraph_etl_spark.catalog import load_table
    from dgraph_etl_spark.functions.sampling import hash_sample

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    assert hash_sample(docs, rate=1.0).count() == n
    assert hash_sample(docs, rate=0.0).count() == 0
    kept = hash_sample(docs, rate=0.5).count()
    assert 0 < kept < n


def test_c01_exact_dedup_null_text_singletons(spark):
    """sha2(NULL) is NULL and groupBy treats NULLs as equal, which
    would merge every NULL-text doc into one "duplicate" cluster whose
    losers a winners-only pipeline silently drops. Each NULL-text doc
    must stay its own singleton; real duplicates still merge."""
    from dgraph_etl_spark.functions.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None)],
        "doc_id bigint, text string",
    )
    rows = exact_dedup(docs).collect()
    null_rows = [r for r in rows if r.content_hash is None]
    assert len(null_rows) == 2, rows
    assert all(r.n_copies == 1 for r in null_rows), rows
    dup = [r for r in rows if r.content_hash is not None]
    assert len(dup) == 1 and dup[0].doc_id == 1 and dup[0].n_copies == 2


def test_c02_simhash_r0_exact_signature_pairs(spark):
    """r=0 (exact-signature pairs) is legal: one 64-bit chunk, whose
    all-ones mask cannot be the (1<<64)-1 literal (exceeds Long range)
    -- it must plan and return exactly the equal-signature pairs."""
    from dgraph_etl_spark.functions.dedup import simhash_hamming_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "something else entirely here")],
        "doc_id bigint, text string",
    )
    pairs = simhash_hamming_pairs(docs, r=0).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_c02_lsh_rejects_nondivisible_bands(spark):
    """num_hashes % num_bands != 0 silently dropped the trailing
    hashes from every band key (paid for, never banded -- recall
    quietly below the requested parameters); it must raise instead."""
    import pytest

    from dgraph_etl_spark.functions.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="num_bands"):
        lsh_candidate_pairs(docs, num_hashes=32, num_bands=5)


def test_asof_join_null_ts_right_rows_never_match(spark):
    """DuckDB ASOF semantics: r.ts <= l.ts is never true for NULL, so
    a NULL-ts right row must not be carried (Spark's NULLS FIRST
    ascending sort would otherwise place it at the window start and
    hand its payload to every left row of the key)."""
    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k int, ts int, lv string")
    right = spark.createDataFrame(
        [(1, None, 9.0), (None, 50, 7.0)], "k int, ts int, v double"
    )
    row = asof_join(left, right, on="k", ts="ts", right_cols=["v"]).first()
    assert row.v is None and row.matched_ts is None, row


def test_asof_join_rejects_on_ts_in_right_cols(spark):
    """right_cols naming the join's on/ts columns would silently emit
    duplicate output columns (the guard previously only checked left
    payload, which excludes on/ts)."""
    import pytest

    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k int, ts int, lv string")
    right = spark.createDataFrame([(1, 50, 7.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="on/ts"):
        asof_join(left, right, on="k", ts="ts", right_cols=["v", "ts"])


def test_asof_join_right_order_dedup_equals_max_preagg(spark):
    """right_order (round 12): equal-(key, ts) right duplicates are
    resolved inside the carry-forward window's sort instead of a
    pre-aggregation exchange -- the carried row must be EXACTLY the one
    a GROUP BY k, ts AGG MAX(v) pre-pass would have produced, including
    NULL v losing to any value (MAX ignores NULLs) and an all-NULL
    group carrying NULL."""
    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [
            # k=1, ts=10: duplicates 3.0 / 9.0 / NULL -> max 9.0
            (1, 10, 3.0),
            (1, 10, 9.0),
            (1, 10, None),
            # k=1, ts=15: single row, later match for the ts=20 left row
            (1, 15, 5.0),
            # k=2, ts=10: ALL-NULL duplicate group -> carried NULL
            (2, 10, None),
            (2, 10, None),
        ],
        "k int, ts int, v double",
    )
    out = {
        (r.k, r.ts): (r.v, r.matched_ts)
        for r in asof_join(
            left, right, on="k", ts="ts", right_cols=["v"],
            right_order=["v"],
        ).collect()
    }
    assert out[(1, 10)] == (9.0, 10)  # max of the equal-ts duplicates
    assert out[(1, 20)] == (5.0, 15)  # later row still wins over dups
    assert out[(2, 10)] == (None, 10)  # all-NULL group: row kept, v NULL


def test_asof_join_right_order_must_be_carried(spark):
    """right_order columns order the carried struct's fields, so a
    column not in right_cols cannot be sorted on -- reject loudly."""
    import pytest

    from dgraph_etl_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k int, ts int, lv string")
    right = spark.createDataFrame(
        [(1, 50, 7.0, 1.0)], "k int, ts int, v double, w double"
    )
    with pytest.raises(ValueError, match="right_order"):
        asof_join(
            left, right, on="k", ts="ts", right_cols=["v"],
            right_order=["w"],
        )


def test_c06_quality_score_empty_text_is_null_not_error(spark):
    """text='' has n_chars=0; under ANSI mode a plain division would
    abort the whole job -- the empty doc must score NULL
    non_alpha_ratio instead (empty docs are routine in crawl data)."""
    from dgraph_etl_spark.functions.text import quality_score

    docs = spark.createDataFrame(
        [(1, ""), (2, "the cat sat on the mat ok yes")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in quality_score(docs).collect()}
    assert rows[1].non_alpha_ratio is None
    assert rows[2].non_alpha_ratio is not None


def test_c26_sequence_chunks_gap_stride_no_phantom_chunk(spark):
    """stride > seq_len (gap sampling) must not emit a chunk starting
    past the last token (previously: negative n_chunk_tokens, empty
    text)."""
    from dgraph_etl_spark.functions.text import sequence_chunks

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4")], "doc_id bigint, text string"
    )
    rows = sequence_chunks(docs, seq_len=4, stride=10).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.start_tok, r.end_tok, r.n_chunk_tokens) == (0, 4, 4)
    assert r.chunk_text == "t0 t1 t2 t3"
    # a longer doc still gets its gap-sampled second chunk
    docs2 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25)))],
        "doc_id bigint, text string",
    )
    rows2 = sorted(
        sequence_chunks(docs2, seq_len=4, stride=10).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.start_tok, r.n_chunk_tokens) for r in rows2] == [
        (0, 4), (10, 4), (20, 4),
    ]


def test_c19_hash_sample_null_key_respects_rate(spark):
    """A NULL key must bucket deterministically (NUL sentinel), not be
    silently dropped at every rate: rate=1.0 keeps EVERYTHING
    including the null-key row, rate=0.0 keeps nothing."""
    from dgraph_etl_spark.functions.sampling import hash_sample

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id bigint, text string"
    )
    assert hash_sample(df, rate=1.0).count() == 3
    assert hash_sample(df, rate=0.0).count() == 0


def test_g10_pagerank_empty_graph_fails_loudly(spark):
    """An empty edge table must raise a named ValueError, not a bare
    ZeroDivisionError from 1.0 / n before any Spark job runs."""
    import pytest

    from dgraph_etl_spark.graph.traverse import pagerank, weighted_pagerank

    empty = spark.createDataFrame([], "src string, dst string, score double")
    with pytest.raises(ValueError, match="empty edge table"):
        pagerank(empty)
    with pytest.raises(ValueError, match="empty edge table"):
        weighted_pagerank(empty)


def test_c02_null_text_singletons_across_shingle_lanes(spark):
    """The NULL-text singleton contract holds in the SHINGLE lanes too:
    token_ngrams must not fabricate the [""] shingle (concat_ws over a
    NULL slice) and rolled_ngram_hashes must not fabricate the constant
    [0] shingle -- either one pairs every NULL-text doc with its
    NULL-text peers (LSH: the full quadratic clique). NULL-text docs
    must emit NO candidate pairs from either lane."""
    from dgraph_etl_spark.functions.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        rolled_ngram_hashes,
        token_hashes,
        token_ngrams,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, None, "en"), (2, None, "en"), (3, "a b c d", "en"),
         (4, "a b c d", "en")],
        "doc_id bigint, text string, lang string",
    )
    g = docs.select(token_ngrams("text").alias("g")).collect()
    assert g[0].g is None and g[1].g is None, g
    rh = (
        docs.withColumn("th", token_hashes("text"))
        .select(rolled_ngram_hashes(F.col("th")).alias("r"))
        .collect()
    )
    assert rh[0].r is None and rh[1].r is None, rh

    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r.doc_a, r.doc_b) for r in jac} == {(3, 4)}, jac
    lsh = lsh_candidate_pairs(docs).collect()
    assert all({r.doc_a, r.doc_b} == {3, 4} for r in lsh), lsh


def test_c06_language_id_null_text_is_und(spark):
    """All stopword-hit counts are NULL for NULL text, so every when()
    equality evaluates NULL and control fell through to the otherwise
    -- confidently labeling an unknown document 'de'. NULL text must
    be 'und'."""
    from dgraph_etl_spark.functions.text import language_id

    docs = spark.createDataFrame(
        [(1, None), (2, "the and of with that this")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.lang_guess for r in language_id(docs).collect()}
    assert got == {1: "und", 2: "en"}, got


def test_c52_int8_topk_zero_norm_vector_sorts_last(spark):
    """A vector whose every component quantizes to 0 has zero int norm:
    the quantized cosine must be NULL (try_divide; sorts last under
    desc), never a DIVIDE_BY_ZERO abort under ANSI or a NaN that
    displaces a real neighbor at rank 1."""
    from dgraph_etl_spark.functions.similarity import int8_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1e-9, 1e-9])],
        "vec_id bigint, embedding array<double>",
    )
    query = spark.createDataFrame([([1.0, 0.0],)], "qvec array<double>")
    got = int8_topk(emb, query, k=2)
    ids = [r.vec_id for r in got.collect()]
    assert 2 not in ids, ids  # degenerate row never wins the top-k


def test_srp_rejects_nondivisible_bands(spark):
    """The SRP family must refuse n_planes % n_bands != 0 the way
    lsh_candidate_pairs does -- trailing signature bits computed but
    never banded silently lower recall."""
    import pytest as _pytest

    from dgraph_etl_spark.functions.similarity import (
        srp_bands_fixedpoint,
        srp_neardup_pairs,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="not divisible"):
        srp_neardup_pairs(emb, n_planes=16, n_bands=3)
    with _pytest.raises(ValueError, match="not divisible"):
        srp_bands_fixedpoint(emb, n_planes=32, n_bands=5)


def test_g04_hop_counts_rejects_k0(spark):
    """k=0 previously crashed with AttributeError on None.select --
    fail loudly with a named error instead."""
    import pytest as _pytest

    from dgraph_etl_spark.graph.traverse import hop_counts

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,)], "node bigint")
    with _pytest.raises(ValueError, match="hop_counts"):
        hop_counts(edges, seeds, k=0)


def test_khop_null_dst_never_enters_frontier(spark):
    """NULL dst must not become a phantom frontier node: the oracle's
    NOT IN exclusion drops NULLs, and a left_anti on id would keep a
    NULL id in EVERY hop (it never matches the visited set)."""
    from dgraph_etl_spark.graph.traverse import k_hop

    edges = spark.createDataFrame(
        [(1, 2), (2, None), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "id bigint")
    hop1, hop2 = k_hop(edges, seeds, k=2)
    assert [r.id for r in hop1.collect()] == [2]
    assert [r.id for r in hop2.collect()] == [3], (
        "hop2 must be {3}, with no NULL phantom"
    )


def test_mixture_epochs_output_can_be_remixed(spark):
    """mixture_epochs' own output re-mixed must REPLACE the epoch
    column, not die on AMBIGUOUS_REFERENCE from a duplicate alias."""
    from dgraph_etl_spark.functions.sampling import mixture_epochs

    docs = spark.createDataFrame(
        [(i, "s") for i in range(20)], "doc_id bigint, source string"
    )
    once = mixture_epochs(docs, strata_col="source", weights={"s": 2.0})
    twice = mixture_epochs(once, strata_col="source", weights={"s": 1.0})
    assert twice.columns.count("epoch") == 1
    assert twice.count() == docs.count() * 2, (
        "re-mix at weight 1.0 keeps one copy per input row"
    )


def test_hits_empty_graph_fails_loudly(spark):
    """hits follows the ranking family's convention (pagerank /
    weighted_pagerank): empty input raises a named error instead of
    silently returning zero hubs."""
    import pytest

    from dgraph_etl_spark.graph.traverse import hits

    empty = spark.createDataFrame([], "src string, dst string, score double")
    with pytest.raises(ValueError, match="empty edge table"):
        hits(empty)


def test_relaxation_rounds_semirings_closed_form(spark):
    """relaxation_rounds (the shared g24/g27 loop) on a hand-checkable
    path graph: widest (max-min) and cheapest (min-plus) path values
    within 3 hops, including a better-2-hop-than-1-hop alternative."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.graph.traverse import relaxation_rounds

    # s -> a (10) -> b (5); s -> b (2); s -> c via nothing
    edges = spark.createDataFrame(
        [("s", "a", 10.0), ("a", "b", 5.0), ("s", "b", 2.0)],
        ["src", "dst", "score"],
    )
    seeds = spark.createDataFrame([("s",)], ["id"])
    widest = {
        r.nid: r.val
        for r in relaxation_rounds(seeds, edges, F.max, F.least, 3).collect()
    }
    # b via a: min(10,5)=5 beats direct 2
    assert widest == {"a": 10.0, "b": 5.0}
    cheapest = {
        r.nid: r.val
        for r in relaxation_rounds(
            seeds, edges, F.min, lambda v, s: v + s, 3
        ).collect()
    }
    # b direct: 2 beats via a (15)
    assert cheapest == {"a": 10.0, "b": 2.0}

    import pytest

    with pytest.raises(ValueError, match="rounds must be >= 1"):
        relaxation_rounds(seeds, edges, F.max, F.least, 0)


def test_null_text_contract_fingerprint_winnow_chunk_split(spark):
    """The family-wide NULL-text/NULL-key contract across the round-10
    sweep: NULL text yields a NULL fingerprint (never md5('') shared
    with empty docs), zero winnowing fingerprints, zero sequence
    chunks; a NULL split key buckets via the chr(0) sentinel instead
    of falling through to 'train' with a NULL bucket."""
    from pyspark.sql import functions as F

    from dgraph_etl_spark.functions.text import (
        fingerprint,
        hash_split,
        sequence_chunks,
        winnowing_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, None), (3, "")],
        ["doc_id", "text"],
    )
    fp = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
    assert fp[2] is None, "NULL text must yield a NULL fingerprint"
    assert fp[3] is not None and fp[2] != fp[3]

    win = winnowing_fingerprints(docs).groupBy("doc_id").count().collect()
    by_id = {r.doc_id: r["count"] for r in win}
    assert 2 not in by_id, "NULL text fabricated a winnowing fingerprint"
    assert by_id.get(1, 0) >= 1

    chunks = sequence_chunks(docs, seq_len=4, stride=3).collect()
    assert all(r.doc_id != 2 for r in chunks), "phantom chunk for NULL text"
    assert any(r.doc_id == 1 for r in chunks)

    nulled = spark.createDataFrame(
        [(None, "x"), (7, "y")], ["doc_id", "text"]
    )
    split = {r.asDict()["doc_id"]: r for r in hash_split(nulled).collect()}
    null_row = split[None]
    assert null_row.bucket is not None, "NULL key must bucket via sentinel"
    # the sentinel bucket is md5('\x00')[:2] on every engine
    import hashlib

    assert null_row.bucket == hashlib.md5(b"\x00").hexdigest()[:2]


def test_pinned_state_lane_matches_small_lane(spark, monkeypatch):
    """Round-12 pinned-state loops (pagerank family + hash-to-min):
    forcing the >= PER_ROUND_BCAST_CEILING_ROWS lane at toy scale must
    reproduce the small lane's results exactly, leave the session
    adaptive, and leak no DataFrame cache (the loops swap per-round
    caches and must unpersist every one)."""
    import dgraph_etl_spark.session as S
    from pyspark.sql import functions as F
    from dgraph_etl_spark.graph.traverse import (
        pagerank,
        weakly_connected_components,
    )

    # cache-leak probe: only assert emptiness afterwards if OTHER
    # tests' session-scoped caches aren't already present (suite
    # order independence)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cache_mgr.isEmpty()

    # two cycles + a dangling tail + an isolated pair: exercises
    # dangling mass, multiple components, and convergence
    edge_rows = (
        [(str(i), str((i + 1) % 6), 1.0) for i in range(6)]
        + [(str(10 + i), str(10 + (i + 1) % 4), 1.0) for i in range(4)]
        + [("5", "20", 1.0), ("21", "22", 1.0)]
    )
    edges = spark.createDataFrame(edge_rows, ["src", "dst", "score"])

    small_pr = {r.node: r.rank for r in pagerank(edges, n_iter=6).collect()}
    small_cc = {
        r.node: r.component
        for r in weakly_connected_components(edges).collect()
    }

    monkeypatch.setattr(S, "PER_ROUND_BCAST_CEILING_ROWS", 1)
    big_pr = {r.node: r.rank for r in pagerank(edges, n_iter=6).collect()}
    big_cc = {
        r.node: r.component
        for r in weakly_connected_components(edges).collect()
    }

    assert set(big_pr) == set(small_pr)
    # ranks are rounded to 6 dp inside pagerank; the lanes regroup the
    # same per-dst sums, so values agree to an ulp before rounding
    assert all(
        abs(big_pr[k] - small_pr[k]) < 1e-9 for k in small_pr
    ), sorted(
        (k, big_pr[k], small_pr[k])
        for k in small_pr
        if abs(big_pr[k] - small_pr[k]) >= 1e-9
    )[:5]
    assert big_cc == small_cc

    # session left adaptive, and the per-round cache swaps dropped
    # every DataFrame cache (localCheckpoint blocks are not caches)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    if was_empty:
        assert cache_mgr.isEmpty()
