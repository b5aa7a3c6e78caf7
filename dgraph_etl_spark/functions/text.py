"""Text analysis operators (SURVEY.md C6-C8 + langid / quality /
token-count / fingerprint from the north star).

Everything is built-in expression work (split / explode / groupBy) --
whole-stage codegen'd, no Python UDFs. Regexes are kept to the
Java-regex ∩ RE2 common subset so the DuckDB oracles match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# words / numbers / single punctuation -- a BPE-ish pre-tokenization
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "por", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
}


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokenization (the documents fixture is space-joined)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def tokenized(docs: DataFrame) -> DataFrame:
    """C6: doc_id -> exploded (doc_id, token) relation."""
    return docs.select("doc_id", F.explode(tokens()).alias("token"))


def token_stats(docs: DataFrame) -> DataFrame:
    """C6: per-document token statistics."""
    t = tokens()
    return docs.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


def term_stats(docs: DataFrame) -> DataFrame:
    """C7: corpus term statistics -- document frequency and total term
    frequency per token. The tf-idf weight is a pure function of these
    plus the corpus size (exact integers; the idf double is derived
    downstream to keep the oracle exact)."""
    t = tokenized(docs)
    return t.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf_total"),
    )


def facet_stats(docs: DataFrame) -> DataFrame:
    """C8: per-(lang, source) corpus facets (exact integer sums)."""
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def _stopword_hits(lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(), lambda tok: F.array_contains(arr, tok))
    ).cast("bigint")


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: stopword-hit counts per candidate
    language; argmax with deterministic tie order en > es > de >
    'und' (unknown when zero hits). n-gram heuristics slot in the same
    shape; this stays expression-only and oracle-checkable."""
    en, es, de = (_stopword_hits(lg) for lg in ("en", "es", "de"))
    best = F.greatest(en, es, de)
    guess = (
        # NULL text first: every hit count is NULL there, so all the
        # equality conditions below evaluate NULL (not true) and
        # control would fall through to the otherwise -- confidently
        # labeling an unknown document 'de'. NULL text is 'und'.
        F.when(best.isNull(), "und")
        .when(best == 0, "und")
        .when(en == best, "en")
        .when(es == best, "es")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        en.alias("hits_en"),
        es.alias("hits_es"),
        de.alias("hits_de"),
        guess.alias("lang_guess"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality signals: length, mean token length, stopword ratio,
    non-alpha ratio. Single-division doubles over exact ints (IEEE
    deterministic); the composite gate is a boolean."""
    t = tokens()
    n_tok = F.size(t).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    sw = _stopword_hits("en")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", ""))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        ((n_chars - n_tok + 1) / n_tok).alias("mean_token_len"),
        (sw / n_tok).alias("stopword_ratio"),
        # try_divide: text='' has n_chars=0 and a plain division would
        # abort the whole job under ANSI mode -- empty docs are routine
        # in crawl curation and must score NULL, not kill the query.
        # (n_tok is safe: split('') yields [''] so size >= 1.)
        F.try_divide(n_chars - alpha, n_chars).alias("non_alpha_ratio"),
        # >= 0.05: a real fluency floor. The earlier >= 0.0 was
        # vacuously true (sw and n_tok are non-negative), which made
        # the stopword criterion dead code and the "quality gate"
        # length-only
        ((n_tok >= 5) & (sw / n_tok >= 0.05)).alias("passes_gate"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    pre-tokenizer (words / numbers / punctuation)."""
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
    )


# PII-shaped patterns, kept to the Java-regex ∩ RE2 common subset so
# the DuckDB oracle can run the identical pattern text.
EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
ID_RUN_REGEX = "[0-9]{3,}"


def pii_scrub(
    df: DataFrame, col: str = "name", id_col: str = "person_id"
) -> DataFrame:
    """Curation op: redact email addresses and long digit runs
    (account-number-shaped tokens) and count redactions per row.
    Pure ``regexp_replace``/``regexp_count`` expressions -- JVM-side,
    whole-stage codegen'd, embarrassingly parallel at 100 TB (no
    shuffle: the scrub is a map over the scan)."""
    c = F.col(col)
    email_scrubbed = F.regexp_replace(c, EMAIL_REGEX, "<EMAIL>")
    scrubbed = F.regexp_replace(email_scrubbed, ID_RUN_REGEX, "<ID>")
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        F.regexp_count(c, F.lit(EMAIL_REGEX)).cast("bigint").alias("n_emails"),
        # count ID runs on the EMAIL-SCRUBBED string -- the same string
        # the <ID> replace runs over -- so n_ids equals the number of
        # <ID> tokens actually emitted; counting on the original
        # double-counted digit runs inside redacted emails
        F.regexp_count(email_scrubbed, F.lit(ID_RUN_REGEX))
        .cast("bigint")
        .alias("n_ids"),
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of
    duplicate 2-grams and the most-frequent-token share. The 2-gram
    fraction is expression-only (array ops inside the row -- no
    shuffle); the top-token share is relational (explode -> two-level
    hash agg) so it stays linear in corpus size at scale instead of
    quadratic in document length."""
    t = tokens()
    n2 = F.size(t) - 1
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
    )
    # n_tokens rides along in the gram branch: a third doc-keyed branch
    # would re-plan the tokenize subtree and add one more join exchange
    # (the duplicated-subtree cost span_dup_stats measured at 100x)
    gram_stats = docs.select(
        "doc_id",
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_grams"),
        F.size(t).cast("bigint").alias("n_tokens"),
    )
    tok_counts = (
        docs.select("doc_id", F.explode(t).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.max("cnt").alias("top_cnt"), F.count(F.lit(1)).alias("n_distinct_toks")
    )
    return (
        gram_stats.join(tok_stats, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.lit(1.0) - F.col("n_distinct_grams") / F.col("n_grams"), 6
            ).alias("dup_2gram_frac"),
            F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """C7: top-k characteristic terms per document by a rational tf-idf
    weight ``tf * n_docs / df`` (exact-integer numerator, one IEEE
    division -- bit-identical across engines, unlike log-idf whose libm
    last-ulp differs). Ranking window is per-document (partitioned --
    no global sort); ties broken by token so results are total-ordered
    and oracle-checkable.

    One tokenize pass (round 12): df is COUNT(DISTINCT doc_id) over
    the token stream, which is exactly COUNT(*) over tf (one row per
    (doc, token)) -- so dfreq derives from tf instead of re-scanning
    and re-exploding the corpus, and tf is materialized once (lazy
    localCheckpoint) because it feeds both dfreq and the weight join.
    Only n_docs still reads the base table (a doc with zero tokens is
    absent from tf but must count), and that scan is pruned to the
    doc_id column."""
    tf = (
        tokenized(docs)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    weighted = (
        tf.join(dfreq, "token")
        .crossJoin(n_docs)
        .withColumn(
            "weight", F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6)
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("weight"), "token")
    return (
        weighted.withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "token", "tf", "weight", "rnk")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (normalized bag-of-words identity -- catches reordered/duplicated
    token soup that exact text hashing misses).

    NULL-text contract (family-wide; token_ngrams/doc_span_hashes'
    guard): a NULL text yields a NULL fingerprint -- concat_ws over
    the NULL token array would otherwise fabricate md5(''), merging
    every NULL-text doc with each other AND with genuinely-empty docs
    in any fingerprint-keyed dedup, and diverging from the oracle's
    NULL (DuckDB array_to_string(NULL) is NULL)."""
    t = tokens()
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(t)))
    return docs.select(
        "doc_id",
        F.when(t.isNotNull(), F.md5(canon)).alias("fingerprint"),
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS algorithm): hash every
    k-token shingle, slide a w-position window over the hash sequence,
    keep each window's MINIMUM hash; the distinct kept hashes are the
    document's fingerprints. Guarantees every shared substring of at
    least w+k-1 tokens between two documents yields a shared
    fingerprint, while storing only ~2/(w+1) of the shingles -- the
    position-robust overlap detector (plagiarism / quote / boilerplate)
    that whole-document hashing misses.

    Fully relational: posexplode(shingles) -> md5 per shingle -> a
    per-document ROWS window MIN -> distinct. The window partitions by
    doc_id (never global), so at 100 TB it is one shuffle keyed by
    document with bounded per-task state; md5-as-hex keeps the hash
    (and its lexicographic MIN) engine-portable, so the whole operator
    oracle-checks against plain SQL window functions."""
    t = tokens()
    cnt = F.size(t) - (k - 1)
    # NULL-text guard (fingerprint's contract): greatest() skips NULLs,
    # so a NULL token array would otherwise build the [''] gram list
    # and emit md5('') as a fingerprint shared by every NULL-text and
    # empty-text doc; a NULL gram array posexplodes to NO rows, which
    # is what the oracle computes too
    grams = F.when(
        t.isNotNull(),
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        ),
    )
    pos = docs.select(
        "doc_id",
        F.greatest(cnt, F.lit(1)).alias("n_grams"),
        F.posexplode(grams).alias("pos", "g"),
    )
    h = pos.select("doc_id", "n_grams", "pos", F.md5(F.col("g")).alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # classic winnowing selects from FULL windows only (pos+w <= n);
    # docs with fewer than w shingles keep one whole-doc window so every
    # document gets at least one fingerprint
    full = (F.col("pos") <= F.col("n_grams") - w) | (
        (F.col("n_grams") < w) & (F.col("pos") == 0)
    )
    return (
        h.select("doc_id", F.min("h").over(win).alias("fp"), "pos", "n_grams")
        .filter(full)
        .select("doc_id", "fp")
        .dropDuplicates(["doc_id", "fp"])
    )


def sequence_chunks(
    docs: DataFrame, seq_len: int = 64, stride: int = 48
) -> DataFrame:
    """Context-window preparation: cut each document's token stream
    into fixed-length training sequences of ``seq_len`` tokens with a
    ``stride``-token hop (so consecutive chunks overlap by
    ``seq_len - stride`` tokens -- the standard sliding-window LM
    chunking). Every document yields at least one chunk; the last
    chunk is short iff the document doesn't fill it.

    Narrow op: tokens are materialized ONCE per row (never rebuilt
    per chunk -- a transform/slice over a re-evaluated split would be
    O(n^2) per doc), then a tiny chunk-index sequence explodes and
    each chunk slices the shared array. No shuffle; output size is
    the intended training-set size. Oracle: identical arithmetic over
    DuckDB list_slice/generate_series."""
    base = docs.select("doc_id", tokens().alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("bigint")
    )
    # coverage count (enough chunks that the last one reaches the end)
    # capped by the start-position count (no chunk may START past the
    # last token): for stride <= seq_len the cap is never the minimum
    # (old behavior unchanged), but gap-sampling strides > seq_len
    # previously emitted a phantom chunk starting past the end with
    # negative n_chunk_tokens and empty text
    n_chunks = F.least(
        1
        + F.floor(
            (F.greatest(F.col("n_tokens") - seq_len, F.lit(0)) + (stride - 1))
            / stride
        ),
        1 + F.floor((F.col("n_tokens") - 1) / stride),
    )
    # NULL-text guard (the family's no-fabricated-rows contract):
    # greatest/least SKIP NULLs, so a NULL n_tokens would otherwise
    # compute n_chunks=1 and emit one phantom chunk claiming seq_len
    # tokens for a tokenless doc -- a downstream token-budget packer
    # then overcounts by seq_len per NULL-text doc. NULL n_chunks ->
    # NULL sequence -> explode yields no rows (matching the oracle's
    # empty generate_series over NULL).
    n_chunks = F.when(F.col("n_tokens").isNotNull(), n_chunks)
    exploded = base.withColumn("n_chunks", n_chunks.cast("int")).select(
        "doc_id",
        "toks",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id").cast("bigint") * stride
    end = F.least(start + seq_len, F.col("n_tokens"))
    chunk_text = F.array_join(
        F.slice(F.col("toks"), (F.col("chunk_id") * stride + 1), seq_len), " "
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.alias("start_tok"),
        end.alias("end_tok"),
        (end - start).alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
    )


def top_bigrams(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide frequent-phrase detection: exact counts of every
    token bigram, top-k by count (ties broken by bigram text so the
    result is total-ordered). The workhorse behind boilerplate-phrase
    discovery ("click here to subscribe") in web-scale curation.

    Shape at 100 TB: explode is map-side; the count is a partial-agg
    shuffle keyed by bigram; the top-k compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Exact, not sketched -- the count-min/``freqItems`` variant slots
    into the same shape when the bigram vocabulary stops fitting."""
    base = docs.select(tokens().alias("toks")).filter(F.size("toks") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 2)),
    )
    return (
        base.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "bigram")
        .limit(k)
    )


def split_bucket(key: Column) -> Column:
    """The ONE definition of the split-bucket expression (first 2 hex
    chars of md5(key)): hash_split and the pipelines that attach a
    split label inline (c24's release gate) must bucket identically or
    holdout docs leak between pipeline stages.

    NULL keys bucket via the chr(0) sentinel INSIDE the hash
    (sampling._bucket's convention, mirrored as COALESCE(...) in the
    consuming oracles): a raw md5(NULL) bucket is NULL, both when()
    arms fall through, and every NULL-keyed record silently lands in
    'train' with no bucket -- never eligible for test/val."""
    return F.substring(
        F.md5(F.coalesce(key.cast("string"), F.lit("\x00"))), 1, 2
    )


def hash_split(
    docs: DataFrame,
    key: Column | str = "doc_id",
    test_hi: str = "0d",
    val_hi: str = "1a",
) -> DataFrame:
    """Deterministic train/val/test split: bucket = first 2 hex chars of
    md5(key) -- 256 buckets, identical in every engine that lowercases
    md5 hex (so the split is stable across runs, re-partitions, and
    engines; the property a training pipeline needs so holdout docs
    never leak into train between pipeline versions). Default ranges:
    bucket < '0d' -> test (~5%), < '1a' -> val (~5%), rest train.
    Pure per-row expression: no shuffle, no state, scales linearly."""
    k = F.col(key) if isinstance(key, str) else key
    bucket = split_bucket(k)
    # emit the split keyed by the ACTUAL key column (aliased to its own
    # name), not a hardcoded doc_id -- a non-default key on a DataFrame
    # without doc_id must still work and must pair the split with the
    # right id
    id_col = k.alias(key) if isinstance(key, str) else k
    return docs.select(
        id_col,
        bucket.alias("bucket"),
        F.when(bucket < test_hi, "test")
        .when(bucket < val_hi, "val")
        .otherwise("train")
        .alias("split"),
    )


def source_quota(docs: DataFrame, n_per_source: int = 50) -> DataFrame:
    """Per-source quota balancing: keep the top-N docs per source by
    length (ties by doc_id) so no single crawl/source dominates the
    training mix. One shuffle keyed by source; rank via row_number.
    At 100 TB, skewed sources are exactly the AQE-skew / salting case
    -- but the window must see each source whole, so the partition key
    stays `source` and executor memory is bounded by truncating with
    rank early (filter directly on the row_number, no full sort of the
    table)."""
    win = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= n_per_source)
    )


def token_budget_pack(docs: DataFrame, budget: int) -> DataFrame:
    """Token-budget packing: walk docs in priority order (longest first,
    doc_id ties) and keep those that fit a cumulative token budget --
    "fill a 1M-token training mix with the best documents first".

    The running sum is a DISTRIBUTED prefix sum, not a single-partition
    global window (which serializes the whole table through one task at
    100 TB): docs are bucketed by coarse length band; within a bucket
    the cumsum is a window partitioned BY the bucket (parallel across
    buckets); cross-bucket offsets come from a tiny per-bucket-totals
    aggregate (B rows) window-summed and broadcast-joined back. The
    only global ordering pass touches B bucket totals, never the docs.

    ``base`` -- the narrow (doc_id, n_tokens, len, bkt) relation -- is
    localCheckpoint'd because it feeds BOTH the window branch and the
    totals branch: the previous shape planned the scan + tokenize
    twice (per-branch column pruning projects the two subtrees
    differently, so Catalyst cannot reuse one exchange across them),
    re-reading and re-splitting every text byte for a branch that
    only needs two longs per doc. The checkpoint trades one narrow
    materialization (~4 words/doc) for the second full pass over the
    text -- the c02/c30 multi-consumer discipline (r12 plan diff:
    the duplicated scan+split subtree is gone; exchanges unchanged,
    all three now carry only the narrow relation)."""
    nt = F.size(tokens()).cast("bigint")
    base = (
        docs.select(
            "doc_id", nt.alias("n_tokens"), F.col("n_chars").alias("len")
        )
        .withColumn("bkt", F.floor(F.col("len") / F.lit(64)))
        .localCheckpoint(eager=False)
    )

    within = Window.partitionBy("bkt").orderBy(
        F.desc("len"), F.col("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_in = base.withColumn("cum_within", F.sum("n_tokens").over(within))

    totals = base.groupBy("bkt").agg(F.sum("n_tokens").alias("bkt_total"))
    off_w = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "offset", F.sum("bkt_total").over(off_w) - F.col("bkt_total")
    ).select("bkt", "offset")

    packed = (
        cum_in.join(F.broadcast(offsets), "bkt")
        .withColumn("cum_tokens", F.col("offset") + F.col("cum_within"))
        .filter(F.col("cum_tokens") <= budget)
    )
    return packed.select("doc_id", "n_tokens", "cum_tokens")


def doc_span_hashes(
    docs: DataFrame, k: int = 8, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id[, *carry], span_id, span, h): each consecutive
    non-overlapping ``k``-token span with its md5. Narrow op -- one
    materialized token array per row, sliced per span index. ``carry``
    names extra input columns replicated onto every span row (e.g.
    ``source``) so consumers that need them avoid a join-back onto the
    corpus by doc_id."""
    t = tokens()
    n_spans = F.greatest(
        F.ceil(F.size(t) / F.lit(float(k))).cast("int"), F.lit(1)
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(t, i * k + 1, k), " "),
    )
    # NULL text has NO spans (posexplode of NULL emits no rows) -- the
    # fabricated single (span=NULL, h=NULL) row previously re-counted
    # as "novel" on every streaming batch (NULL never joins the seen
    # set) and diverged from the oracles, whose NULL span hashes drop
    # at their joins. Same NULL-singleton discipline as token_ngrams.
    spans = F.when(t.isNotNull(), spans)
    pos = docs.select(
        "doc_id", *carry, F.posexplode(spans).alias("span_id", "span")
    )
    return pos.select(
        "doc_id", *carry, "span_id", "span", F.md5("span").alias("h")
    )


def boilerplate_removal(
    docs: DataFrame, k: int = 8, min_docs: int = 3
) -> DataFrame:
    """The cleaning TRANSFORM on top of the span screen: drop every
    k-token span that occurs in >= ``min_docs`` distinct documents
    (site chrome, license headers, navigation text -- content repeated
    verbatim across many docs) and reassemble the surviving spans in
    position order. Returns (doc_id, n_kept, n_removed, cleaned_text);
    docs whose every span is boilerplate disappear (fully-boilerplate
    docs ARE the removal target).

    Scale shape: one h-keyed exchange of the span rows, then BOTH the
    distinct-doc count and the per-span flag ride that partitioning as
    windows -- no join-back, no second planning of the span subtree.
    (The previous per_hash-aggregate + join-on-h formulation planned
    the scan+explode+md5 subtree TWICE -- the agg branch and the join
    branch need differently-projected exchanges, so Catalyst cannot
    reuse one -- the exact duplicated-subtree cost span_dup_stats'
    docstring measured at 2.8x on 100x data; r12 plan diff: 2 scans /
    2 Generate / 3 Exchange -> 1 scan / 1 Generate / 2 Exchange.)
    "Occurs in >= min_docs distinct docs" without count-distinct:
    row_number over (h, doc_id) marks one span row per (hash, doc)
    pair, and the per-h window-sum of those marks is the distinct-doc
    count -- both windows share the h clustering and one sort. The
    reassembly collects each doc's kept spans and sorts WITHIN the
    row (array_sort over (span_id, span) structs -- per-doc data,
    never a global sort)."""
    spans = doc_span_hashes(docs, k).repartition("h")
    marked = spans.withColumn(
        "_first_in_pair",
        F.row_number().over(
            Window.partitionBy("h", "doc_id").orderBy("span_id")
        )
        == 1,
    )
    n_docs = F.sum(
        F.when(F.col("_first_in_pair"), 1).otherwise(0)
    ).over(Window.partitionBy("h"))
    flagged = marked.withColumn("is_boiler", n_docs >= F.lit(min_docs))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_boiler"),
                                F.struct("span_id", "span"),
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .filter(F.col("n_kept") > 0)
    )


def span_doc_counts(
    docs: DataFrame, k: int = 8, h_partitioned: bool = False
) -> DataFrame:
    """(h, doc_id, n): the span-hash x document pre-aggregation — the
    relation that flows through the span screen's h-keyed exchanges
    (span_dup_stats' window, the boilerplate screen's count). The
    single definition shared by those operators and the skew soak
    (tools/scale_soak.py --dedup-skew, which measures the h-keyed
    exchange's partition-size spread).

    ``h_partitioned=True`` moves the exchange BELOW the agg (one
    repartition by h; the (h, doc_id) groupBy then needs no exchange
    of its own — HashPartitioning(h) satisfies its clustering), so a
    consumer whose next operator is h-keyed (span_dup_stats' window)
    rides the same partitioning exchange-free. The default keeps the
    map-side partial agg ahead of the shuffle for consumers that stop
    at the pair relation (the soak's spread measurement)."""
    spans = doc_span_hashes(docs, k).select("doc_id", "h")
    if h_partitioned:
        spans = spans.repartition("h")
    return spans.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("n"))


def source_span_sets(
    docs: DataFrame, k: int = 8, h_partitioned: bool = False
) -> DataFrame:
    """DISTINCT (source, h): each source's k-token span-hash set — the
    self-join relation of the cross-source contamination matrix (c30);
    its h key drives that join's shuffle. Shared by the suite query
    and the skew soak. Caller decides on materialization (c30
    localCheckpoints it because it feeds both self-join sides)."""
    spans = doc_span_hashes(
        docs.select("doc_id", "source", "text"), k, carry=("source",)
    ).select("source", "h")
    # source rides the span rows (doc_span_hashes' carry) instead of
    # joining back onto the corpus by doc_id -- at scale that join was
    # a full shuffle of every span row AND of the corpus (r12: the
    # c30 plan drops its join + one scan)
    if h_partitioned:
        # the (source, h) dedup then needs no exchange of its own
        # (HashPartitioning(h) satisfies its clustering) and an
        # h-keyed consumer (c30's per-hash source-set collect) rides
        # the same partitioning exchange-free
        spans = spans.repartition("h")
    return spans.dropDuplicates(["source", "h"])


def span_dup_stats(docs: DataFrame, k: int = 8) -> DataFrame:
    """Passage-level duplication audit (the RefinedWeb/CCNet-style
    sub-document screen exact dedup misses): cut each document into
    consecutive non-overlapping ``k``-token spans, hash every span, and
    flag spans whose hash occurs in >= 2 DISTINCT documents; report the
    per-document duplicated-span fraction. A doc that shares half its
    passages with the corpus scores 0.5 even when no whole-doc copy
    exists.

    Scale shape: span construction is narrow (one materialized token
    array per row, sliced per span -- no per-span re-tokenization) and
    is computed EXACTLY ONCE: (doc, hash) pairs are pre-aggregated,
    then "occurs in >= 2 distinct docs" is a count over a span-hash
    window on the pair relation -- a linear pipeline with no join-back.
    The previous groupBy-then-join-on-h formulation planned the
    explode+md5 subtree TWICE (the agg branch and the join branch
    require differently-projected exchanges, so Catalyst cannot reuse
    one), which measured 2.8x slower on 100x data (3.47 s vs 1.24 s,
    50M spans) -- the duplicated span materialization, not the
    shuffles, was the superlinear term in the 100x soak. md5-as-hex
    keeps span identity engine-portable, so the whole operator
    hash-checks against plain SQL.

    The pair relation is built h-partitioned (span_doc_counts'
    ``h_partitioned``): one repartition-by-h ahead of the (h, doc_id)
    agg replaces BOTH that agg's exchange and the window's -- the r12
    plan diff is 3 Exchange -> 2, and the exchange that disappears
    carried every (h, doc) pair a second time (spans are near-unique
    within a doc, so the old map-side partial agg bought ~nothing)."""
    pair = span_doc_counts(docs, k, h_partitioned=True)
    # pair is distinct per (h, doc), so a plain count over the h window
    # IS the distinct-doc count -- no count-distinct Expand, and a hot
    # boilerplate hash lands in one window partition exactly as it
    # would land in one groupBy(h) reduce task
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        pair.withColumn("is_dup", n_docs >= 2)
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_spans"),
            F.sum(
                F.when(F.col("is_dup"), F.col("n")).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_frac",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
        )
    )


def token_commonness(docs: DataFrame) -> DataFrame:
    """Unigram-LM fluency proxy without libm: a document built from
    frequent corpus tokens has HIGH mean corpus frequency; rare-token
    gibberish scores low (the integer-exact stand-in for the CCNet
    perplexity screen -- avg corpus count replaces avg -log p, keeping
    every aggregate an exact int sum so the score is bit-identical
    across engines; one IEEE division at the end).

    Scale shape: per-(doc, token) term frequencies FIRST (keyed by
    doc+token -- spreads evenly), so the token-keyed stages move one
    row per distinct term per doc instead of one per instance. The
    corpus count is then a map-side-combinable sum over tf, and the
    tf-to-count join is the only token-keyed stage; stopword-grade hot
    tokens skew it, which AQE's skew-join splitting absorbs (the rows
    per key are already collapsed to one per doc).

    tf feeds BOTH the corpus-count agg and the score join, so it is
    materialized once (lazy localCheckpoint, round 12) -- without it
    Catalyst plans the scan+explode+agg subtree per consumer and the
    corpus is tokenized twice."""
    tf = (
        tokenized(docs)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    counts = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    return (
        tf.join(counts, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("cnt")).alias("sum_freq"),
            F.min("cnt").alias("rarest_freq"),
        )
        .withColumn(
            "mean_token_freq",
            F.round(F.col("sum_freq") / F.col("n_tokens"), 6),
        )
    )


def length_bucketed_batches(
    docs: DataFrame, batch_size: int = 32, band_width: int = 64
) -> DataFrame:
    """Padding-efficient training batch assembly: band documents by
    token length, order each band longest-first (doc_id tiebreak), cut
    into fixed-size batches WITHIN the band, and report each batch's
    padding waste (docs * batch-max-length - total tokens -- the dead
    compute a naive random batching pays). Length-sorted bucketing is
    the standard dataloader trick; banding makes it distributed: the
    only window is per-band (parallel across bands), never a global
    sort, and the per-batch summary is one hash agg on (band, batch).
    All arithmetic is integer-exact."""
    base = docs.select(
        "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    ).withColumn("band", F.floor(F.col("n_tokens") / band_width))
    w = Window.partitionBy("band").orderBy(F.desc("n_tokens"), "doc_id")
    assigned = base.withColumn(
        "batch_in_band",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("bigint"),
    )
    return assigned.groupBy("band", "batch_in_band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("sum_tokens"),
        (
            F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
        ).alias("padding_waste"),
    )


def vocab_coverage(docs: DataFrame, num: int = 19, den: int = 20) -> DataFrame:
    """Tokenizer-vocabulary construction by frequency coverage: the
    minimal most-frequent-first token set whose cumulative corpus
    share reaches ``num/den`` (default 95%). The keep test is exact
    integer arithmetic -- (cumsum - cnt) * den < num * total -- so the
    cut never flips on float rounding.

    Scale shape (same device as token_budget_pack): the cumulative sum
    over the vocabulary runs as per-band windows -- bands are the
    count's digit length, so band order IS count order -- plus a
    broadcast offset table of per-band totals; the only unpartitioned
    window touches B <= 20 band totals, never the vocabulary.

    counts feeds THREE consumers (the banded cumsum, the band totals,
    and the grand total), so it is materialized once (lazy
    localCheckpoint, round 12): the vocabulary is tiny next to the
    token stream, and without the checkpoint Catalyst plans the
    scan+explode+agg subtree per consumer -- three full corpus
    tokenize passes for one vocabulary."""
    counts = (
        tokenized(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    banded = counts.withColumn("band", F.length(F.col("cnt").cast("string")))
    within = Window.partitionBy("band").orderBy(
        F.desc("cnt"), "token"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_in = banded.withColumn("cum_within", F.sum("cnt").over(within))

    totals = banded.groupBy("band").agg(F.sum("cnt").alias("band_total"))
    off_w = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "offset", F.sum("band_total").over(off_w) - F.col("band_total")
    ).select("band", "offset")
    grand = counts.agg(F.sum("cnt").alias("total"))

    cum = (
        cum_in.join(F.broadcast(offsets), "band")
        .withColumn("cum_tokens", F.col("offset") + F.col("cum_within"))
        .crossJoin(F.broadcast(grand))
    )
    kept = cum.filter(
        (F.col("cum_tokens") - F.col("cnt")) * den < num * F.col("total")
    )
    return kept.select(
        "token",
        "cnt",
        "cum_tokens",
        F.round(F.col("cum_tokens") / F.col("total"), 6).alias("cum_share"),
    )


def bigram_plausibility(docs: DataFrame) -> DataFrame:
    """Per-document bigram-LM plausibility score: the average corpus
    conditional probability P(next|prev) over the doc's token
    transitions. The doc-level companion to the c33 conditional table
    -- low scores flag machine-garbled / shuffled / boilerplate text,
    the cheap stand-in for model-perplexity filtering when no LM fits
    in the pipeline.

    Determinism contract: each transition's probability is
    round(cnt/total, 6) (identical integer-ratio doubles on any
    engine), doc sums are fixed-point longs, and the final average is
    the same double division on both sides -- hash-stable without any
    float summation order dependence. Deliberately NOT log-perplexity:
    ln() is not correctly-rounded in either engine, so a log-based
    score could differ in the last ulp cross-engine; the probability
    mass ranks documents identically for the filter's purpose.

    Shape at 100 TB: the bigram explode is map-side; the conditional
    table is one (prev,next) hash agg; prev totals reuse that output
    (one more tiny agg, NOT a second corpus pass); the score join is
    keyed by the token pair with partial aggregation before the final
    doc_id shuffle. Docs with <2 tokens have no transitions and are
    excluded (score undefined)."""
    base = docs.select("doc_id", tokens().alias("toks")).filter(
        F.size("toks") >= 2
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(
            F.element_at("toks", i).alias("prev_tok"),
            F.element_at("toks", i + 1).alias("next_tok"),
        ),
    )
    transitions = base.select(
        "doc_id", F.explode(grams).alias("g")
    ).select("doc_id", "g.prev_tok", "g.next_tok")
    # cond feeds BOTH totals and the probs join: uncheckpointed,
    # Catalyst re-plans the whole corpus explode + (prev,next) exchange
    # per consumer (audited: 3 corpus scans, the model exchange paid
    # twice). The conditional table is distinct-bigram-sized --
    # vocabulary-scale, not corpus-scale -- so materializing it once is
    # the cheap side of that trade (round 12). The transitions relation
    # itself is one row per corpus token and is deliberately NOT
    # checkpointed: its second consumer (the score join) pays only a
    # re-scan + map-side explode, cheaper at any scale than storing it.
    cond = (
        transitions.groupBy("prev_tok", "next_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    totals = cond.groupBy("prev_tok").agg(F.sum("cnt").alias("total"))
    probs = cond.join(totals, "prev_tok").select(
        "prev_tok",
        "next_tok",
        F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("p"),
    )
    scored = transitions.join(probs, ["prev_tok", "next_tok"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.expr("CAST(ROUND(p * 1000000, 0) AS BIGINT)")).alias(
            "p_mass_6dp"
        ),
        (
            F.sum(F.expr("CAST(ROUND(p * 1000000, 0) AS BIGINT)")).cast(
                "double"
            )
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("avg_cond_prob"),
    )


def zipf_curve(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus rank-frequency (Zipf) curve: the top-k terms with rank,
    count, frequency relative to the top term, and the rank*count
    product (constant under a perfect Zipf law -- drift across ranks
    quantifies how far the corpus deviates, a standard
    natural-vs-synthetic / crawl-health audit).

    Integer-exact by construction: every emitted number derives from
    counts and ranks (the one double is an integer ratio rounded to
    6dp), so the curve hash-matches cross-engine -- a log-log OLS
    slope would hinge on ln() ulp agreement, see bigram_plausibility.

    Shape at 100 TB: one token hash agg (map-side partials), top-k via
    TakeOrderedAndProject, then ranking ON THE K-ROW RESULT coalesced
    to one partition -- the global window never sees the full
    vocabulary."""
    counts = (
        docs.select(F.explode(tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "tok").limit(k).coalesce(1)
    w = Window.orderBy(F.desc("cnt"), "tok")
    mx = top.agg(F.max("cnt").alias("mc"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            "rnk",
            "tok",
            "cnt",
            (F.col("rnk") * F.col("cnt")).cast("bigint").alias(
                "zipf_product"
            ),
            F.round(F.col("cnt").cast("double") / F.col("mc"), 6).alias(
                "rel_freq"
            ),
        )
    )
