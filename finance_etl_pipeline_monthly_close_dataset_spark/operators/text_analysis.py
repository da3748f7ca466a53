"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All built-in expressions (split/filter/size/aggregate/md5) -- one scan
per operator, trivially parallel over a partitioned documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Tiny per-language stopword seed lists for the n-gram/stopword-hit
# heuristic. Deliberately small and public-knowledge; the operator's
# contract is deterministic scoring, not SOTA accuracy.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "zh": ["的", "了", "是", "我", "在", "他", "有", "这", "不", "就"],
}


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit counts + predicted language (argmax,
    ties broken by language code order).

    Scope note: tokenization is whitespace-based, so unsegmented
    scripts (zh/ja/th) only score when the text is pre-segmented; the
    zh seed list exists for segmented input. A production language ID
    would add char-n-gram profiles (see ``text.char_ngrams``) -- the
    operator contract here is deterministic scoring."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(F.col(text_col), lang))
    # argmax via greatest + chained when (bounded tiny domain)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.lit(None).cast("string")
    for lang in sorted(STOPWORDS):
        pred = F.coalesce(pred, F.when(F.col(f"hits_{lang}") == best, F.lit(lang)))
    return out.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality-scoring features per document:

    * n_tokens, n_chars
    * mean token length
    * punctuation ratio (non-alnum, non-space chars / chars)
    * stopword ratio (English seed list; reported as a feature, not
      part of the score)
    * quality_score: (length_score + punct_score) / 2 in [0, 1] --
      favors longer docs (saturating at 100 tokens) with low
      punctuation noise.

    The token array is projected ONCE into a staging column: the three
    token-consuming features would otherwise each re-inline the
    split+filter (higher-order subexpressions do not CSE) -- measured
    26% faster at sf0.1.
    """
    text = F.col(text_col)
    staged = df.withColumn("_toks", tokens(text))
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    # unicode letter/digit classes: non-Latin scripts are text, not noise
    punct_chars = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    stopword_ratio = F.when(n_tokens > 0, sw_hits.cast("double") / n_tokens).otherwise(F.lit(0.0))

    length_score = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - punct_ratio * 5.0, F.lit(0.0))
    quality = F.round((length_score + punct_score) / 2.0, 4)

    return staged.select(
        *df.columns,
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set, plus a 64-bit content hash of the raw text.

    The sorted-token digest is robust to token reordering (catches
    shuffled near-copies); the xxhash64 is the cheap exact-content key.
    """
    toks = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("token_fingerprint"),
        F.xxhash64(F.col(text_col)).alias("content_hash"),
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition statistics per document: type-token
    ratio and the share of the document occupied by its most frequent
    bigram (boilerplate / degenerate-generation filter; Rae et al.'s
    'fraction of characters in most common n-gram' family).

    Fully map-side: the per-document mode is a sorted-run fold --
    ``array_sort`` the bigram array, then one ``aggregate`` pass finds
    the longest run (equal counts break to the lexicographically
    smallest gram, because the first maximal run in ascending order IS
    the smallest). Zero shuffles, zero joins, ONE corpus scan; the
    round-5 form (explode -> per-(doc,gram) counts -> window argmax ->
    join back to a second scan) shuffled the (doc, gram) grid and read
    the corpus twice. O(n log n) per document for the sort.
    """
    from .text import ngrams_of

    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    run = lambda acc, g: F.when(g == acc["prev"], acc["run"] + F.lit(1)).otherwise(  # noqa: E731
        F.lit(1)
    )
    best = F.aggregate(
        F.array_sort(ngrams_of(F.col("_toks"), 2)),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_n"),
            F.lit(None).cast("string").alias("best_g"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            run(acc, g).alias("run"),
            F.greatest(run(acc, g), acc["best_n"]).alias("best_n"),
            F.when(run(acc, g) > acc["best_n"], g)
            .otherwise(acc["best_g"])
            .alias("best_g"),
        ),
    )
    safe_tokens = F.greatest(F.col("n_tokens"), F.lit(1))
    return staged.select(
        F.col(id_col),
        F.size(F.col("_toks")).alias("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).alias("n_distinct"),
        best.alias("_best"),
    ).select(
        id_col,
        "n_tokens",
        F.round(F.col("n_distinct") / safe_tokens.cast("double"), 6).alias(
            "distinct_ratio"
        ),
        F.col("_best.best_g").alias("top_bigram"),
        F.col("_best.best_n").cast("int").alias("top_bigram_n"),
        F.round(
            F.col("_best.best_n")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1)).cast("double"),
            6,
        ).alias("top_bigram_frac"),
    )


def feature_hash_embedding(
    df: DataFrame,
    dim: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic feature-hashing document embedding: each token is
    hashed to a dimension (``hash % dim``) with a +/-1 sign from the
    next hash bit, and the signed counts form a dense integer vector
    (Weinberger et al.'s hashing trick). The cheap, model-free
    'vectorize text' step that bridges the documents table to the
    ANN/quantization operators when no learned embedder is available.

    Uses the portable 60-bit md5 hash so any engine reproduces the
    vector exactly. One explode + one groupBy(id) with ``dim``
    conditional sums -- a single shuffle on the id key, same scale
    shape as simhash. Emits the vector as ``dim`` integer columns
    (f0..f{dim-1}) plus the token count; exact integers, so the result
    is hash-safe cross-engine.
    """
    from .dedup import portable_token_hash

    if dim & (dim - 1):
        raise ValueError("dim must be a power of two (bucket = low hash bits)")
    shift = dim.bit_length() - 1
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = portable_token_hash(F.col("tok"))
    # bucket from the low bits, sign from the next bit -- bit ops stay
    # exact on the 60-bit hash (float division would lose precision)
    bucket = h.bitwiseAND(F.lit(dim - 1))
    sign = F.when(
        F.shiftright(h, shift).bitwiseAND(F.lit(1)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    sums = [
        F.sum(F.when(bucket == d, sign).otherwise(F.lit(0))).alias(f"f{d}")
        for d in range(dim)
    ]
    return tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"), *sums)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    One explode -> (doc, term) counts (single shuffle), PERSISTED so
    the corpus text is scanned exactly once: document frequency is a
    term-partitioned window over the unique (doc, term) rows (no join,
    no recompute) and the doc count reads the cache. idf =
    ln((N+1)/(df+1)) -- no floor, so terms present in every document
    score 0 -- ranked per doc with deterministic tie-breaks. All
    built-ins; the (doc, term) grid -- not the corpus text -- is the
    only shuffled (and cached: MEMORY_AND_DISK, spillable) data.
    """
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if persist_intermediates:
        tf = tf.persist()
    # N counts ALL documents, including ones that tokenize to zero
    # tokens (empty/whitespace text) -- the (doc, term) grid would
    # silently drop those and shift every idf value. The extra pass
    # over df is a cheap id-only distinct, not a second corpus scan
    # of the tokenizer. Materializing it also primes the tf cache's
    # input scan ordering deterministically.
    n_docs = df.select(id_col).distinct().count()
    # (doc, term) rows are unique post-aggregate, so a plain count
    # over the term partition IS the document frequency
    w_term = Window.partitionBy("term")
    idf_df = F.count(F.lit(1)).over(w_term)
    idf = F.log(F.lit(float(n_docs + 1)) / (idf_df + 1))
    scored = tf.withColumn("tfidf", F.col("tf") * idf)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


# Order matters: emails first (their local part can contain digits a
# phone pattern would half-match), then phones, then bare IPv4s.
# canonical PII module: the pattern table and both redaction surfaces
# live in operators/pii.py; re-exported here for back-compat (the
# corpus CLI and earlier tests import them from text_analysis)
from .pii import PII_PATTERNS, redact_pii  # noqa: F401  (re-export)


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Mean per-token surprisal under the corpus's own add-one-smoothed
    unigram language model -- the model-free stand-in for perplexity
    filtering (documents the corpus itself finds surprising are
    gibberish/noise candidates; very low surprisal flags boilerplate).

    p(t) = (c_t + 1) / (N + V); each token contributes -ln p(t).

    Determinism: ln yields doubles whose summation order would differ
    between engines, so each token's surprisal is rounded to 9 dp and
    accumulated as exact DECIMAL (order-independent); the per-doc mean
    divides doubles and rounds to 6 dp, so a last-ulp ln disagreement
    (<=1e-9 after the 9 dp round, <=1e-11 of the mean) cannot move the
    reported value.

    Scale shape: one explode -> token-frequency aggregate (vocab-sized),
    joined back to the (doc, token) stream on token (shuffle hash join;
    only hashes/counts shuffle beyond the first explode), one keyed
    aggregate. N and V are a bounded 1-row driver scalar, same pattern
    as ``tfidf_top_terms``'s ``n_docs``.
    """
    # persisted: the (doc, token) stream feeds both the LM counts and
    # the per-doc join-back -- without the cache the corpus tokenizes
    # twice (plan_lint multi_scan). Spillable; the sweep/bench harness
    # clears caches between queries.
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    if persist_intermediates:
        terms = terms.persist()
    freq = terms.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freq.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    ).first()
    denom = float(int(totals["n_total"]) + int(totals["vocab"]))
    neg_logp = F.round(-F.log((F.col("cnt") + 1.0) / F.lit(denom)), 9).cast(
        "decimal(18,9)"
    )
    lm = freq.select("token", neg_logp.alias("neg_logp"))
    return (
        terms.join(lm, on="token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("neg_logp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_neg_logprob"),
        )
    )


def bigram_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Collocation mining: top-k bigrams by lift (the log-free PMI
    core), ``lift = P(ab) / (P(a)·P(b)) = c_ab · N / (c_a · c_b)`` --
    the phrase-detection pass (word2vec-style phrase merging, vocab
    augmentation) a training-data pipeline runs before tokenization.

    Scale shape: ONE corpus scan -- unigrams and bigrams ride the same
    explode as (kind, gram) structs (kind disambiguates a 1-token
    doc's degenerate "bigram" from a real unigram occurrence), so one
    groupBy counts both vocabularies in one shuffle. The grouped
    counts (vocabulary-sized, orders of magnitude below the corpus)
    persist; the unigram side, the bigram side, and the global token
    total all derive from that cache -- the round-5 form exploded the
    corpus twice. All counts are exact integers; the only float op is
    one double division, so the ranking is portable across engines.
    Ties break on count then on the bigram string (total order).
    """
    from .text import ngrams_of, tokens

    staged = df.select(tokens(F.col(text_col)).alias("_toks"))
    grams = staged.select(
        F.explode(
            F.concat(
                F.transform(
                    F.col("_toks"),
                    lambda t: F.struct(F.lit(0).alias("kind"), t.alias("g")),
                ),
                F.transform(
                    ngrams_of(F.col("_toks"), 2),
                    lambda b: F.struct(F.lit(1).alias("kind"), b.alias("g")),
                ),
            )
        ).alias("e")
    ).select(F.col("e.kind").alias("kind"), F.col("e.g").alias("g"))
    # persisted vocabulary-sized aggregate: every downstream branch
    # (unigram join sides, bigram candidates, global token count)
    # reads this cache instead of re-scanning the corpus
    counts = grams.groupBy("kind", "g").agg(F.count(F.lit(1)).alias("c"))
    if persist_intermediates:
        counts = counts.persist()
    uni = counts.filter(F.col("kind") == 0).select(
        F.col("g").alias("token"), F.col("c").alias("c_tok")
    )
    n_total = uni.agg(F.sum("c_tok").alias("n")).first()["n"]

    bi = (
        counts.filter((F.col("kind") == 1) & F.col("g").contains(" "))
        .select(F.col("g").alias("bigram"), F.col("c").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bigram"), " ").getItem(1))
    )
    # c_ab * N and c_a * c_b stay exact in BIGINT; the single double
    # division is bit-identical across engines
    joined = (
        bi.join(uni.withColumnRenamed("token", "w1").withColumnRenamed("c_tok", "c_a"), on="w1")
        .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("c_tok", "c_b"), on="w2")
        .withColumn(
            "lift",
            F.round(
                (F.col("c_ab") * F.lit(n_total)).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double"),
                6,
            ),
        )
    )
    return (
        joined.select("bigram", "c_ab", "c_a", "c_b", "lift")
        .orderBy(F.col("lift").desc(), F.col("c_ab").desc(), F.col("bigram").asc())
        .limit(k)
    )
