"""Deduplication operators (SURVEY.md C1, C2 + the north star's
MinHash / SimHash / n-gram-Jaccard surface).

Scale design:
- exact dedup: hash-groupBy on a content digest -- one shuffle keyed by
  the digest, min-id winner; never a window sort when only the winner
  id is needed.
- MinHash+LSH: shingle -> NUM_HASHES seeded min-hashes -> band to
  NUM_BANDS buckets -> candidate pairs only within a bucket. The
  quadratic step is confined to bucket-local joins; at 100 TB bucket
  sizes stay bounded because the band hash spreads uniformly.
- SimHash: 64-bit signature entirely JVM-side -- one xxhash64 per
  token, per-bit majority vote as 64 codegen'd conditional sums;
  candidate pairs = exact-signature buckets, or Hamming<=r via
  pigeonhole banding (r+1 chunks, bucket-local join, exact
  bit_count(xor) filter).
- n-gram Jaccard: exact set similarity on blocked candidate pairs;
  SQL-expressible, so fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

NUM_HASHES = 32
NUM_BANDS = 8  # 4 hashes per band


def exact_dedup(docs: DataFrame) -> DataFrame:
    """C1: exact dedup by sha256(text); winner = min doc_id. Returns
    (content_hash, doc_id, n_copies). sha2(NULL) is NULL and groupBy
    treats NULLs as equal, which would silently merge every NULL-text
    document into one "duplicate" cluster whose losers a curation
    pipeline then drops -- contents that were never compared. A
    secondary null-only group key keeps each NULL-text doc its own
    singleton (mirrored in the SQL oracle)."""
    return (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))
        .groupBy(
            "content_hash",
            F.when(F.col("content_hash").isNull(), F.col("doc_id")).alias(
                "_null_key"
            ),
        )
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("content_hash", "doc_id", "n_copies")
    )


def prefix_key_dedup(docs: DataFrame, n_tokens: int = 3) -> DataFrame:
    """C1 variant exercising real collisions on the fixture: dedup key =
    first n tokens. Winner = min doc_id per key (hash agg, no window).

    NULL text yields a NULL prefix_key kept as a SINGLETON (same
    null-key contract as exact_dedup; concat_ws over a NULL array
    previously produced '', silently merging NULL-text docs with each
    other AND with genuinely-empty docs while the oracle's
    array_to_string(NULL) stayed NULL)."""
    key = F.concat_ws(" ", F.slice(tokens(), 1, n_tokens))
    pk = F.when(F.col("text").isNull(), F.lit(None).cast("string")).otherwise(
        F.md5(key)
    )
    return (
        docs.select(pk.alias("prefix_key"), "doc_id")
        .groupBy(
            "prefix_key",
            F.when(F.col("prefix_key").isNull(), F.col("doc_id")).alias(
                "_null_key"
            ),
        )
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .select("prefix_key", "doc_id", "n_docs")
    )


def token_ngrams(col: Column | str = "text", n: int = 3) -> Column:
    """n-token shingles (word n-grams) as an array of strings.

    NULL text yields NULL (not the single shingle [""] that concat_ws
    over a NULL slice would fabricate): a NULL-text doc must stay a
    SINGLETON through every dedup/containment/contamination lane --
    the family-wide contract exact_dedup/prefix_key_dedup already
    honor -- and the DuckDB oracles agree (array_to_string(NULL) is
    NULL there, which never equi-joins)."""
    t = tokens(col)
    cnt = F.size(t) - (n - 1)
    return F.when(
        t.isNotNull(),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        ),
    )


# Mersenne prime 2^31-1: universal-hash family (a*h + b) mod P stays
# within 62 bits for a,b,h < P, so no long overflow under ANSI mode.
_MERSENNE31 = 2_147_483_647


def token_hashes(col: Column | str = "text", portable: bool = False) -> Column:
    """Per-token hash array reduced mod P: one xxhash64 per token by
    default; ``portable=True`` swaps in the md5-derived 60-bit hash
    (_portable_token_hash) so a SQL oracle can replay every downstream
    MinHash value bit-for-bit."""
    hash_fn = _portable_token_hash if portable else F.xxhash64
    return F.transform(
        tokens(col), lambda x: F.pmod(hash_fn(x), F.lit(_MERSENNE31))
    )


def rolled_ngram_hashes(th: Column, n: int = 3) -> Column:
    """n-token shingle *hashes* from an already-materialized token-hash
    array column -- no per-ngram string allocation (which dominates the
    string-shingle path's cost). ``th`` MUST be a plain column
    reference: embedding the token-hash transform expression here would
    re-evaluate the whole array per position (O(tokens^2)). Out-of-range
    positions (docs shorter than n tokens) contribute 0 via
    try_element_at, yielding one shorter-tail shingle like the string
    path."""
    cnt = F.size(th) - (n - 1)

    def _roll(i: Column) -> Column:
        acc = F.coalesce(F.try_element_at(th, i), F.lit(0))
        for j in range(1, n):
            nxt = F.coalesce(F.try_element_at(th, i + F.lit(j)), F.lit(0))
            acc = F.pmod(acc * F.lit(1_000_003) + nxt, F.lit(_MERSENNE31))
        return acc

    # NULL token-hash array (NULL text) yields NULL, NOT the constant
    # all-zero shingle [0] -- that constant gave every NULL-text doc an
    # identical MinHash signature, so N such docs agreed on every LSH
    # band and emitted the full N*(N-1)/2 candidate clique (quadratic
    # at scale, and "duplicates" of contents never compared). NULL
    # keeps them singletons, the family contract.
    return F.when(
        th.isNotNull(),
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))), _roll)
        ),
    )


def minhash_mix_constants(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    """The deterministic (a_i, b_i) universal-hash seeds shared by the
    Spark mixes AND the DuckDB oracle SQL (which interpolates them as
    literals) -- single source of truth so the two engines compute the
    identical (a*h + b) mod P family."""
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame, num_hashes: int = NUM_HASHES, portable: bool = False
) -> DataFrame:
    """C2: MinHash signature per document. ONE hash per shingle
    (xxhash64 by default; md5-derived when ``portable`` so SQL oracles
    replay it), then num_hashes affine re-mixes (universal hashing mod
    2^31-1) min-folded ENTIRELY IN-ROW: each h_i is
    ``array_min(transform(shingle_hashes, x -> (a_i*x+b_i) mod P))``
    over the per-doc shingle-hash array -- a narrow projection inside
    the scan's codegen span.

    r12 shape: the previous form exploded the shingle array and
    min-aggregated under groupBy(doc_id) -- the same arithmetic, plus
    an explode, a per-task partial-agg hash table, an Exchange, and
    the final agg, ALL removable because the shingle set is already
    in-row. Per-doc signatures are a row-local function of the text,
    so no shuffle is fundamental to this operator; the in-row fold
    makes the whole signature stage exchange-free at any scale.
    Equivalence: min over the exploded multiset == array_min over the
    array (same elements); docs whose shingle array is NULL (NULL
    text) were dropped by explode and are dropped by the filter here;
    non-NULL texts always yield >= 1 shingle (greatest(cnt, 1)), so
    no empty-array case exists. Duplicate doc_ids would no longer be
    merged -- doc_id is the fixture's primary key (asserted unique at
    every sf; the oracle's GROUP BY doc_id defines the same contract).
    """
    sh = docs.select(
        "doc_id", token_hashes(portable=portable).alias("th")
    ).select(
        # rolled_ngram_hashes needs the materialized array column (see
        # its docstring); hbs in turn materializes the shingle array so
        # each of the 32 folds below is one pass over it, not a
        # re-evaluation of the shingle pipeline
        "doc_id",
        rolled_ngram_hashes(F.col("th")).alias("hbs"),
    )
    def _fold(a: int, b: int) -> Column:
        # one-arg lambda via closure (PySpark reads the lambda's arity
        # to decide the higher-order function's parameter list)
        return F.array_min(
            F.transform(
                F.col("hbs"),
                lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE31)),
            )
        )

    mixes = [
        _fold(a, b).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_mix_constants(num_hashes))
    ]
    return sh.filter(F.col("hbs").isNotNull()).select("doc_id", *mixes)


def band_table(
    docs: DataFrame,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, band, band_hash): the banded-signature relation whose
    (band, band_hash) key drives the LSH bucket join's shuffle — the
    single definition shared by lsh_candidate_pairs (which self-joins
    it) and the skew soak (tools/scale_soak.py --dedup-skew, which
    measures its partition-size spread)."""
    if num_hashes % num_bands:
        raise ValueError(
            f"num_hashes={num_hashes} does not divide into "
            f"num_bands={num_bands}: the {num_hashes % num_bands} "
            "trailing hashes would be min-aggregated but never banded, "
            "silently lowering recall below what the parameters imply"
        )
    sig = minhash_signatures(docs, num_hashes, portable=portable)
    per_band = num_hashes // num_bands

    def _band_key(b: int) -> Column:
        cols = [F.col(f"h{b * per_band + j}") for j in range(per_band)]
        if portable:
            return F.concat_ws(":", *[c.cast("string") for c in cols])
        return F.xxhash64(*cols)

    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[_band_key(b) for b in range(num_bands)])
        ).alias("band", "band_hash"),
    )


def ordered_pairs(ids: Column) -> Column:
    """All strictly-ordered element pairs of a SORTED array, as an
    array of (_1, _2) structs: for sorted [a, b, c] ->
    [(a,b), (a,c), (b,c)]. The in-row form of a bucket-local
    ``a.key < b.key`` self-join: a consumer that groups rows into
    sorted per-bucket arrays and explodes this expression gets the
    identical pair multiset while consuming the bucket relation ONCE
    (no checkpoint materialization for join reuse, no join, one fewer
    shuffle). Shared by the LSH/SimHash candidate generators and the
    c30 source-overlap matrix."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                # 1-based slice: later elements start at position i+2
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("_1"), y.alias("_2")),
            ),
        )
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    portable: bool = False,
) -> DataFrame:
    """C2: LSH banding -> candidate duplicate pairs. Documents agreeing
    on ALL hashes of any band collide in that band's bucket; the
    quadratic step is bucket-local by construction -- no global
    all-pairs step.

    r12 shape: per-bucket sorted doc-id collect + in-row ordered-pair
    explode (ordered_pairs) instead of the band-table self-join. The
    pair set is identical (sort_array ascending ==
    ``a.doc_id < b.doc_id``; band rows are unique per (doc, band), so
    no self-pairs), but the band relation is consumed ONCE in a
    linear pipeline: the old shape had to localCheckpoint the band
    table (a full materialization pass) because it fed both self-join
    sides, then paid the join and its exchanges on top. Now: one
    bucket-keyed exchange + the pair dedup's -- and the skew bound is
    unchanged (a hot bucket concentrated in one join task before, one
    collect task now; soak-measured spread 1.02, hottest key 27 rows).

    Band bucket key: xxhash64 over the band's hash tuple by default (8
    bytes/row shuffled); ``portable=True`` keys on the ':'-joined
    decimal tuple instead -- a wider key, but one a SQL oracle can
    rebuild verbatim, which upgrades the query from rows-only to
    hash-exact certification."""
    bands = band_table(docs, num_hashes, num_bands, portable)
    buckets = bands.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    return (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(ordered_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p._1").alias("doc_a"), F.col("p._2").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, block_col: str = "lang", threshold: float = 0.0
) -> DataFrame:
    """n-gram Jaccard similarity on blocked pairs (exact; the oracle
    reproduces it in SQL). Jaccard = |A∩B| / (|A|+|B|-|A∩B|) computed
    from exploded shingle sets via a grouped equi-join -- set sizes and
    intersection counts are exact integers, the final division is one
    IEEE op.

    Round-12 shape: each doc's set size is ``size(token_ngrams(...))``
    computed IN-ROW before the explode (token_ngrams is already
    distinct, so the array length IS the old post-explode
    count-per-doc), carried on every shingle row, and grouped through
    the intersection agg -- (doc_a, doc_b) determines (sz_a, sz_b), so
    the extended grouping key changes nothing. That removes the sizes
    aggregate (a full shingle-stream shuffle) and both size joins, and
    leaves ``sh`` with one consumer per self-join side -- the
    checkpoint shrinks to join-reuse only. The self-join itself stays
    a streamed equi-join (NOT the in-row ordered_pairs form the LSH
    lanes use): raw gram buckets are unbounded -- a stopword bigram
    shared by k docs would flatten k^2 pair structs into ONE row --
    while LSH band buckets are soak-bounded (hottest key 27 rows)."""
    base = docs.select(
        "doc_id",
        F.col(block_col).alias("blk"),
        token_ngrams(n=n).alias("gs"),
    )
    sh = base.select(
        "doc_id",
        "blk",
        F.size("gs").alias("sz"),
        F.explode("gs").alias("g"),
    ).localCheckpoint()
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
            4,
        ),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def neardup_components(
    docs: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """C2 final step: cluster near-duplicate pairs into connected
    components (doc_id -> component = min doc_id reachable), so a
    curation pipeline can keep one canonical doc per cluster.

    Iterative hash-to-min label propagation: each round every node
    takes the min label among itself and its neighbors -- converges in
    O(graph diameter) rounds; near-dup graphs are unions of small
    cliques, so 2-3 rounds in practice. Per round: one shuffle join
    (labels onto edges) + one groupBy min + a left join back.
    ``localCheckpoint`` truncates lineage each round so plans don't
    grow; the convergence test rides the same pass (max of per-row
    change flags), not a separate join. At 100 TB the edge list is the
    LSH/jaccard pair output (linear in docs, not quadratic), labels are
    2 longs per doc, and every round is shuffle-partitioned by doc_id.

    The symmetrized edge table is materialized ONCE via
    session.iterative_loop_side keyed on ``u``: under the broadcast
    ceiling the 2-long-per-doc label table broadcasts and a cheap
    serialized checkpoint of the edges suffices; past it the edges
    become a partition+order pinned cache (a checkpoint loses its
    partitioning under AQE, see pinned_partition_cache's docstring),
    so every round's labels-onto-edges join still exchanges only the
    label table, never the edge table -- at WCC scale (110M+ edges
    when this backs weakly_connected_components) the per-round edge
    re-shuffle was the loop's dominant cost."""
    from ..session import (
        PER_ROUND_BCAST_CEILING_ROWS,
        iterative_loop_side,
    )

    n_docs = docs.count()
    edges = iterative_loop_side(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))),
        "u",
        small_side_rows=n_docs,
        # round 12: the pinned-state loop stops broadcasting the label
        # side already at the per-round ceiling, so the edge side must
        # be pinned from the same boundary (see _hash_to_min_rounds)
        pin_at_rows=PER_ROUND_BCAST_CEILING_ROWS,
    )
    try:
        labels = _hash_to_min_rounds(edges, docs, max_iter, n_docs=n_docs)
    finally:
        edges.unpersist()
    return labels


def _hash_to_min_rounds(
    edges: DataFrame, docs: DataFrame, max_iter: int, n_docs: int | None = None
) -> DataFrame:
    from ..session import (
        PER_ROUND_BCAST_CEILING_ROWS,
        pinned_partition_cache,
        pinned_state_cache,
    )

    if n_docs is None:
        n_docs = docs.count()
    # Lane boundary (round 12, the pagerank loop's restructure in
    # traverse._pagerank_rounds): under the per-round broadcast
    # ceiling, BOTH node-table sides broadcast EXPLICITLY (checkpointed
    # frames carry no size stats, so the static planner never
    # broadcasts them unaided, and AQE's runtime conversion still
    # writes the other side's map-side shuffle files first) -- the
    # label side protects the O(edges) join, the nbr_min side the step
    # join. At or past it, per-round broadcast builds are the measured
    # regression (session.py's PER_ROUND_BCAST_CEILING_ROWS note), so
    # the loop rides co-partitioning instead: edges pinned by u ONCE,
    # the label state re-pinned hash(doc_id, N) each round
    # (session.pinned_state_cache -- the per-round localCheckpoint
    # erased the partitioning the step join's output already had).
    # Round plan past the ceiling: labels-onto-edges is a
    # zero-exchange zero-sort SMJ, groupBy(v) is the ONE O(nodes)
    # exchange, and the step left-join re-uses hash(doc_id,N) ==
    # hash(v,N) on both sides. The old lane shuffled the labels and
    # the nbr_min side every round on top of it.
    pinned_state = n_docs >= PER_ROUND_BCAST_CEILING_ROWS

    def node_side_hint(df):
        return df if pinned_state else F.broadcast(df)

    labels = docs.select("doc_id", F.col("doc_id").alias("component"))
    if pinned_state:
        labels = pinned_partition_cache(labels, "doc_id")
    state_cache = labels if pinned_state else None
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    node_side_hint(labels), edges["u"] == labels["doc_id"]
                )
                .groupBy("v")
                .agg(F.min("component").alias("nbr_component"))
            )
            stepped = labels.join(
                node_side_hint(nbr_min),
                labels["doc_id"] == nbr_min["v"],
                "left",
            ).select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_component"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
            if pinned_state:
                # materialize the new state BEFORE dropping the old
                # cache it reads from, then swap
                stepped = pinned_state_cache(stepped, "doc_id")
                state_cache.unpersist()
                state_cache = stepped
            else:
                stepped = stepped.localCheckpoint()
            labels = stepped.select("doc_id", "component")
            if stepped.agg(F.max("changed")).first()[0] is not True:
                break
        else:
            # Exhausting max_iter with changes still flowing means some
            # component's diameter exceeds max_iter: the stale labels
            # would silently under-dedup downstream (canonical-doc
            # filters keep extra near-duplicates with no signal). Fail
            # loudly instead.
            raise RuntimeError(
                f"neardup_components did not converge within {max_iter} "
                f"iterations -- a component's diameter exceeds max_iter; "
                f"raise max_iter (propagation moves the min label one "
                f"hop per round)"
            )
        if pinned_state:
            # eager copy OFF the final round's cache: the return value
            # must not depend on a cache the finally below drops
            labels = labels.localCheckpoint()
        return labels
    finally:
        if state_cache is not None:
            state_cache.unpersist()


def contamination_screen(
    train: DataFrame, eval_set: DataFrame, n: int = 5
) -> DataFrame:
    """Benchmark-contamination screen: flag training documents sharing
    at least one n-token shingle with any eval/benchmark document --
    the decontamination step every LLM training pipeline runs before
    a data release. Exact (set intersection on shingles), so fully
    oracle-checkable.

    Scale shape: the eval side is tiny relative to the corpus (benchmarks
    are thousands of docs, the corpus is billions), so its distinct
    shingle set is BROADCAST; the train side streams through one
    broadcast hash join + one doc_id-keyed count-distinct agg -- no
    all-pairs step, no shuffle of the corpus by shingle."""
    t = train.select("doc_id", F.explode(token_ngrams(n=n)).alias("g"))
    e = (
        eval_set.select(F.explode(token_ngrams(n=n)).alias("g"))
        .dropDuplicates(["g"])
    )
    # token_ngrams is array_distinct'd and e is deduped, so the join
    # output is already unique per (doc_id, g): a plain count IS the
    # distinct count, without forcing the two-phase distinct-aggregate
    # exchange on the corpus-sized side
    return (
        t.join(F.broadcast(e), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def _portable_token_hash(t):
    """60-bit integer token hash both engines compute identically:
    the first 15 hex digits of md5, parsed as an integer (Spark:
    conv(_, 16, 10); DuckDB: CAST('0x'||substr(md5(t),1,15) AS
    BIGINT)). Slower per token than xxhash64 (crypto vs xx) but
    engine-portable, which is what lets the SimHash queries carry a
    hash-exact SQL oracle instead of a rows-only check."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_bits(portable: bool) -> int:
    return 60 if portable else 64


def simhash_signatures(docs: DataFrame, portable: bool = False) -> DataFrame:
    """SimHash signatures, fully JVM-side (no Python anywhere): one
    hash per token, then the per-bit majority vote as n_bits codegen'd
    conditional sums over the exploded (doc_id, token_hash) relation.
    Map-side partial aggregation means the shuffle carries n_bits
    small longs per *document*, nothing per-token -- at 100 TB the
    vote is a single hash-aggregate keyed by doc_id.  Bit i is set iff
    tokens with bit i set strictly outnumber those without (the classic
    Charikar sum(+/-1) > 0 vote; ties -> 0).

    Default family: xxhash64, 64 bits; bit 63 contributes the signed
    long MIN_VALUE so the assembled signature is the two's-complement
    view of the 64-bit pattern (exact, no overflow: partial sums of
    distinct powers 2^0..2^62 stay below 2^63).  ``portable=True``
    swaps in the md5-derived 60-bit hash (_portable_token_hash) --
    4 fewer signature bits, but bit-identical in any engine with md5,
    so downstream queries are oracle-checkable value-for-value."""
    n_bits = simhash_bits(portable)
    hash_fn = _portable_token_hash if portable else F.xxhash64
    # inner explode, not explode_outer: a NULL-text doc has no tokens
    # and therefore NO signature (SQL unnest semantics -- the oracle
    # drops it). explode_outer kept it with signature 0, silently
    # pairing every NULL-text doc as a Hamming-0 "near-dup" and
    # diverging from the hash-exact oracle. (Non-null text always
    # tokenizes to >= 1 token, so no real doc is lost.)
    th = docs.select(
        "doc_id",
        F.explode(F.transform(tokens(), lambda t: hash_fn(t))).alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(n_bits)
    ]
    agg = th.groupBy("doc_id").agg(*votes)
    contrib = [
        F.when(
            F.col(f"v{i}") > 0,
            F.lit((1 << i) if i < 63 else -(1 << 63)),
        ).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    sig = contrib[0]
    for c in contrib[1:]:
        sig = sig + c
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_buckets(docs: DataFrame, portable: bool = False) -> DataFrame:
    """Exact-signature SimHash buckets -> candidate groups.  doc_ids is
    emitted as a sorted comma-joined string (scalar column) so results
    stay canonicalizable by flat row-sorting harnesses."""
    sig = simhash_signatures(docs, portable=portable)
    return sig.groupBy("simhash").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("doc_ids"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def simhash_hamming_pairs(
    docs: DataFrame, r: int = 3, portable: bool = False
) -> DataFrame:
    """Hamming<=r SimHash candidate pairs via pigeonhole banding: split
    the n_bits signature into r+1 contiguous chunks -- any pair within
    Hamming distance r differs in at most r chunks, so it agrees
    EXACTLY on at least one chunk (pigeonhole) and the per-chunk bucket
    equi-join has recall 1.0.  The exact ``bit_count(a XOR b) <= r``
    filter then removes false positives, so the output is precisely the
    Hamming<=r pair set.  Same scale shape as minhash LSH: the
    quadratic step is confined to (chunk, value) buckets, generated
    per bucket by the sorted (doc_id, simhash) collect + in-row
    ordered-pair explode (ordered_pairs; sort_array on the structs
    orders by doc_id -- ids are unique -- so the pair set equals the
    old ``a.doc_id < b.doc_id`` self-join's, with the signature
    pipeline consumed once and no checkpoint materialization)."""
    chunks = r + 1
    n_bits = simhash_bits(portable)
    bounds = [i * n_bits // chunks for i in range(chunks + 1)]
    sig = simhash_signatures(docs, portable=portable)

    def _mask(width: int) -> Column:
        # (1 << 64) - 1 exceeds Long.MaxValue and cannot be a Catalyst
        # long literal (r=0, non-portable: ONE 64-bit chunk); the
        # all-ones 64-bit mask is -1 in two's complement
        if width == 64:
            return F.lit(-1).cast("long")
        return F.lit((1 << width) - 1)

    chunk_cols = [
        F.shiftrightunsigned("simhash", bounds[i]).bitwiseAND(
            _mask(bounds[i + 1] - bounds[i])
        )
        for i in range(chunks)
    ]
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*chunk_cols)).alias("chunk", "chunk_val"),
    )
    buckets = bands.groupBy("chunk", "chunk_val").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias(
            "ms"
        )
    )
    return (
        buckets.filter(F.size("ms") >= 2)
        .select(F.explode(ordered_pairs(F.col("ms"))).alias("p"))
        .select(
            F.col("p._1.doc_id").alias("doc_a"),
            F.col("p._2.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("p._1.simhash").bitwiseXOR(F.col("p._2.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= r)
        .dropDuplicates(["doc_a", "doc_b"])
    )
