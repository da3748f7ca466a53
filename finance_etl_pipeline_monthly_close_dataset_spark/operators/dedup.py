"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed with built-in DataFrame ops so they scale
to a 1000-executor cluster:

* exact_dedup / exact_dup_groups -- hash group-by on a content digest.
* minhash_signatures + lsh_candidate_pairs -- MinHash + banded LSH:
  shingle -> H minhashes (array ops, one pass) -> band buckets ->
  shuffle only on (band, bucket) -- the classic near-dup pipeline
  (Broder's MinHash; used by most LLM-corpus dedup stacks).
* simhash_signatures -- 64-bit SimHash via per-token hashing and
  bitwise majority vote (one explode + one groupBy).
* ngram_jaccard_pairs -- exact Jaccard over shingle sets for candidate
  pairs (used to verify LSH candidates).

Skew note: banding hashes never concentrate on one reducer unless the
corpus contains millions of identical bands (true mass-duplication);
AQE skew-join handles the residual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles_of, tokens


def content_digest(text: Column) -> Column:
    """Stable content hash for exact dedup (md5 of the raw text)."""
    return F.md5(text.cast("string"))


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Digest groups appearing more than once -> (digest, n_docs)."""
    return (
        df.select(content_digest(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_k: int = 8,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Inter-document duplicated-SPAN profile -- the substring-dedup
    quality metric (the relational re-expression of the measurement
    behind Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): for each document, how many of its
    distinct ``span_k``-token spans also occur in at least one OTHER
    document.  Near-dup finds document pairs; this finds the
    boilerplate/quotation SPANS shared across otherwise-distinct
    documents -- the metric you compute BEFORE deciding what to dedup.

    Spans are keyed by a 60-bit md5-derived hash (the engine's
    portable hash identity, so an external SQL oracle reproduces the
    exact counts); a cross-engine-identical collision merges two spans
    identically on both sides.  Returns ``(id, n_spans,
    n_dup_spans)`` -- exact integers; the dup fraction is the caller's
    division.

    Scale shape: tokens stage once (shingles_of is O(n) per doc over a
    staged token array), spans shuffle ONCE on the hash key with
    map-side partial counts, and the join back is a second key
    shuffle.  No pairwise comparison anywhere -- cost is linear in
    total span volume, never O(docs^2)."""
    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    span_hash = F.array_distinct(
        F.transform(
            shingles_of(F.col("_toks"), span_k),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    spans = toks.select("_id", F.explode(span_hash).alias("h"))
    if persist_intermediates:
        # the count side and the join-back side both read the span
        # stage; without the cache the tokenize+shingle+hash scan runs
        # twice (same trade as semantic_dedup's staged persist)
        spans = spans.persist()
    counts = spans.groupBy("h").agg(F.countDistinct("_id").alias("_nd"))
    return (
        spans.join(counts, "h")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .select(F.col("_id").alias(id_col), "n_spans", "n_dup_spans")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per distinct content digest.

    min-by-key via groupBy (deterministic), not dropDuplicates (which
    keeps an arbitrary row per key).
    """
    return (
        df.withColumn("_digest", content_digest(F.col(text_col)))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .drop("_digest")
    )


def spread_partitions(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input has fewer partitions.

    Compute-bound per-row operators (minhash/simhash/decode) otherwise
    run serially when the source is a single small parquet file; at
    real scale the input already has enough partitions and this is a
    no-op. The row shuffle is trivial next to the per-row compute.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature array<long>[num_hashes]).

    Single pass per row: the shingle array is traversed once by an
    ``aggregate`` whose accumulator is the length-``num_hashes`` vector
    of running minima, updated with ``zip_with(..., least)``. Seeding
    uses multi-argument ``xxhash64(seed, shingle)`` -- no per-hash
    string concatenation, and the shingle expression is not re-inlined
    per hash function (which is what makes the naive
    one-column-per-hash formulation ~30x slower). Tokens are staged
    through a projection so the shingle build is O(n) per document
    (see ``text.shingles_of``).
    """
    staged = spread_partitions(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    sig = _minhash_sig(shingles_of(F.col("_toks"), shingle_k), num_hashes)
    return staged.select(F.col(id_col), sig.alias("signature"))


def _minhash_sig(sh: Column, num_hashes: int) -> Column:
    """Signature expression over an already-built shingle array."""
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(i, s)),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    bucket_pairs: str = "join",
    max_bucket_ids: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs: ids sharing >=1 identical band.

    Explodes each signature into ``num_bands`` (band, bucket) keys,
    then emits the within-bucket pairs.  Returns distinct (id_a, id_b)
    with id_a < id_b.

    ``bucket_pairs`` picks how a bucket's pairs are generated -- both
    forms produce the IDENTICAL pair set (A/B'd at both scales, r15):

    * ``"join"`` (default): self-join on (band, bucket) -- streams
      even mass-duplication buckets through the sort-merge iterator
      without materializing an id list, and its fixed cost is lower
      (5k-doc corpus: 1.0 s vs explode's 1.4 s).
    * ``"explode"``: groupBy (band, bucket) -> sorted id list -> one
      combination explode.  ONE shuffle of the banded keys instead of
      the self-join's two plus the join itself (optimization guide
      SS2.4) -- measured 3.3 -> 2.0 s on the 100k synthdocs volume
      gate, and the gap grows with corpus size.  A bucket's ids must
      fit one task (fine up to ~10M ids/bucket); quadratic OUTPUT
      volume is the same in both forms, but the explode MATERIALIZES
      one bucket's whole pair array in task memory (n^2/2 structs)
      where the join streams it.  Pick this for big corpora whose
      bucket sizes are bounded (true near-dup groups), the regime the
      100 TB text-dedup pass runs in.

    ``max_bucket_ids`` (opt-in, explode mode only, r16): buckets with
    more ids than the cap are routed through the streaming JOIN form
    instead of the combination explode, so one pathological bucket (a
    boilerplate page duplicated millions of times) cannot OOM a task
    by materializing an n^2 pair array -- pair-set equality between
    the routes is already pinned by the strategy-equality test.  The
    split adds a second consumer of the grouped aggregate (the shuffle
    is reused; the reduce-side collect_list is evaluated per branch),
    so it is opt-in rather than default; a 100 TB corpus with unknown
    duplication mass should set it (e.g. 8192: ~0.5 GB of pair structs
    per worst-case task).  The cap bounds the PAIR materialization;
    the linear collect_list bound (~10M ids/bucket/task) remains.
    """
    sig_len_expr = F.size(F.col("signature"))
    rows_per_band = F.floor(sig_len_expr / num_bands).cast("int")

    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    if bucket_pairs == "explode":
        grouped = (
            banded.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        ids = F.col("ids")
        # (x at i) pairs with every later y: slice(ids, i+2, n) is the
        # 1-based tail after position i -- ids are pre-sorted so
        # id_a < id_b holds by construction
        pair_structs = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + F.lit(2), F.size(ids)),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        small = grouped
        if max_bucket_ids is not None:
            small = grouped.filter(F.size(ids) <= int(max_bucket_ids))
        pairs = (
            small.select(F.explode(pair_structs).alias("p"))
            .select("p.id_a", "p.id_b")
        )
        if max_bucket_ids is not None:
            # oversized-bucket fallback: re-explode the id list and run
            # the streaming self-join WITHIN those buckets only -- the
            # pair set is identical (both routes enumerate all within-
            # bucket ordered pairs), the n^2 array never materializes
            big = grouped.filter(F.size(ids) > int(max_bucket_ids)).select(
                "band", "bucket", F.explode(ids).alias(id_col)
            )
            bl, br = big.alias("bl"), big.alias("br")
            big_pairs = bl.join(
                br,
                on=[
                    F.col("bl.band") == F.col("br.band"),
                    F.col("bl.bucket") == F.col("br.bucket"),
                    F.col(f"bl.{id_col}") < F.col(f"br.{id_col}"),
                ],
            ).select(
                F.col(f"bl.{id_col}").alias("id_a"),
                F.col(f"br.{id_col}").alias("id_b"),
            )
            pairs = pairs.unionByName(big_pairs)
        return pairs.distinct()

    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs with
    jaccard >= threshold. Two broadcast-or-shuffle hash joins against
    the (id, shingle-set) projection -- never an O(n^2) cross join."""
    sets_df = (
        spread_partitions(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), shingle_k).alias("sh"))
    )
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = (inter.cast("double") / union.cast("double")).alias("jaccard")
    return (
        candidate_pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", jac)
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_index_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Inverted-shingle-index candidate pairs: explode each document's
    shingle set and self-join on the shingle. GUARANTEED recall for any
    pair with Jaccard > 0 (they share >= 1 shingle by definition), so
    this is the exact ground-truth generator that LSH recall is
    measured against -- the same role the brute-force scan plays for
    ``embedding_lsh_recall``.

    Scale shape: the shuffle is on shingle values, and cost is
    sum-over-shingles of (docs containing it)^2 -- fine while shingles
    are selective, quadratic on stop-shingle buckets. Production
    candidate generation is banded LSH (``lsh_candidate_pairs``), whose
    cost tracks true-duplicate density instead; this index exists for
    ground truth and for small/medium corpora."""
    sets_df = (
        spread_partitions(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), shingle_k).alias("sh"))
    )
    inv = sets_df.select(F.col(id_col), F.explode("sh").alias("g"))
    a = inv.select(F.col(id_col).alias("id_a"), "g")
    b = inv.select(F.col(id_col).alias("id_b"), "g")
    return (
        a.join(b, on=[a["g"] == b["g"], F.col("id_a") < F.col("id_b")])
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_index_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    a_predicate=None,
) -> DataFrame:
    """Exact n-gram Jaccard for EVERY pair with Jaccard >= threshold,
    computed entirely from the inverted shingle index: shingle sets
    are distinct (``shingles_of``), so the index self-join's per-pair
    match count IS |A ∩ B|, and |A ∪ B| = |A| + |B| - |A ∩ B| from two
    per-doc set-size joins. Guaranteed recall like
    ``shingle_index_candidates`` (a qualifying pair shares >= 1
    shingle) but with NO per-pair array intersect/union -- the
    candidates+verify form re-materialized both full shingle arrays
    per candidate and array-scanned them, which dominated the recall
    measurement (11 s of a 31 s bench tier at sf0.1).

    ``a_predicate`` (optional, ``Column -> Column`` over the id) is
    applied to the a-side (smaller id) BEFORE the self-join -- the
    sampled-recall hook: anchoring on a deterministic md5 doc-sample
    cuts the quadratic by the sample fraction on one side without
    trusting the optimizer to push the filter.

    Scale shape: one explode per doc, shuffle on shingle values, the
    per-shingle quadratic of ``shingle_index_candidates``, then a
    (pair-count)-sized aggregate and two id-keyed size joins.
    """
    sets_df = (
        spread_partitions(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), shingle_k).alias("sh"))
    )
    inv = sets_df.select(F.col(id_col), F.explode("sh").alias("g"))
    sizes = sets_df.select(F.col(id_col), F.size("sh").alias("n"))
    a = inv.select(F.col(id_col).alias("id_a"), "g")
    if a_predicate is not None:
        a = a.filter(a_predicate(F.col("id_a")))
    b = inv.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        a.join(b, on=[a["g"] == b["g"], F.col("id_a") < F.col("id_b")])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")), on="id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")), on="id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.8,
    persist_intermediates: bool = True,
    bucket_pairs: str = "join",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded LSH
    candidates -> exact Jaccard verification.  ``bucket_pairs`` passes
    through to ``lsh_candidate_pairs`` (volume corpora want
    ``"explode"``; see there).

    The shingle sets and signatures each feed multiple plan branches
    (LSH self-join left+right, Jaccard a+b sides); without persistence
    Spark re-tokenizes and re-hashes the corpus once per branch (~5x
    the work -- measured 2.3s -> 0.4s at sf0.1). MEMORY_AND_DISK so an
    oversized corpus spills instead of OOMing; pass
    ``persist_intermediates=False`` to trade recompute for zero cache
    footprint (e.g. a one-shot 100 TB run where the cluster's disk is
    better spent on the shuffle).
    """
    from pyspark import StorageLevel

    base = (
        spread_partitions(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), shingle_k).alias("sh"))
    )
    if persist_intermediates:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)

    sigs = base.select(F.col(id_col), _minhash_sig(F.col("sh"), num_hashes).alias("signature"))
    if persist_intermediates:
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    cands = lsh_candidate_pairs(sigs, id_col, num_bands, bucket_pairs=bucket_pairs)

    a = base.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = (inter.cast("double") / union.cast("double")).alias("jaccard")
    return (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", jac)
        .filter(F.col("jaccard") >= threshold)
    )


def portable_token_hash(col: Column) -> Column:
    """60-bit token hash both Spark and DuckDB compute identically:
    the first 15 hex digits of md5, read as an integer. xxhash64 is
    faster but engine-specific; this variant exists so simhash outputs
    can sit under a cross-engine SQL oracle (contract.py)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """SimHash: per-token hash, bitwise +/-1 majority vote.

    One explode + one groupBy(id) with ``bits`` conditional sums --
    a single shuffle on the id key. ``hash_fn`` defaults to the fast
    engine-native ``xxhash64``; pass :func:`portable_token_hash` (with
    ``bits=60``) when the signatures must be reproducible by another
    engine.
    """
    tok = spread_partitions(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h = (hash_fn or F.xxhash64)(F.col("tok"))
    votes = [
        F.sum(
            F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(bits):
        bit = F.when(
            F.col(f"_b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return voted.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit signature into (max_hamming+1) chunks --
    by pigeonhole, any pair within the distance shares at least one
    exact chunk, so the join is equality on (chunk_idx, chunk_value),
    never a cross product.

    A DERIVED (id, simhash) projection is persisted (never the
    caller's frame in place): both self-join sides read it, and
    without the cache the signature aggregate -- a full corpus
    tokenize + 64 conditional sums -- computes twice (plan_lint
    multi_scan). The cache is doc-count rows of two columns, the
    cheapest thing in the pipeline. ``persist_intermediates=False``
    opts out for callers that manage caching themselves; the cache
    otherwise lives until the session clears it (the sweep/bench
    harness clears caches per query).
    """
    signatures = signatures.select(F.col(id_col), F.col("simhash"))
    if persist_intermediates:
        signatures = signatures.persist()
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def chunk(col: Column, i: int) -> Column:
        shifted = F.shiftrightunsigned(col, i * chunk_bits)
        return shifted.bitwiseAND(F.lit((1 << chunk_bits) - 1).cast("long"))

    chunked = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("ci"), chunk(F.col("simhash"), i).alias("cv")) for i in range(n_chunks)])
        ).alias("c"),
    ).select(id_col, "simhash", "c.ci", "c.cv")

    l, r = chunked.alias("l"), chunked.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.ci") == F.col("r.ci"),
                F.col("l.cv") == F.col("r.cv"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each corpus document, the number
    of distinct k-shingles it shares with ANY benchmark document --
    the screen a training pipeline runs before shipping a corpus
    (docs with overlap above a threshold get dropped or audited).

    The benchmark shingle set is deduped and broadcast (benchmarks are
    small next to the corpus); the corpus side is one explode + one
    broadcast semi-ish join + one groupBy on the id. The corpus text
    never shuffles -- only (id, shingle) hits do.
    """
    bench_sh = (
        benchmark.select(tokens(F.col(text_col)).alias("_toks"))
        .select(F.explode(shingles_of(F.col("_toks"), shingle_k)).alias("g"))
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), F.explode(shingles_of(F.col("_toks"), shingle_k)).alias("g"))
    return (
        corpus_sh.join(F.broadcast(bench_sh), on="g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping_shingles"))
    )


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (id, component)
    where component = min id reachable through pairs.

    Iterative min-label propagation in plain DataFrame ops (no graph
    library): each round every node adopts the smallest label among
    itself and its neighbors; converges in O(log(max component
    diameter)) rounds -- near-dup graphs are collections of small
    dense clusters, so typically 2-4. Each round is one join + one
    groupBy (two shuffles on the id key); ``localCheckpoint`` truncates
    the growing lineage so round N does not replay rounds 1..N-1.

    Raises after ``max_iter`` rounds without convergence rather than
    silently returning partial components.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias(id_col), "component")
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_near_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min id) per near-dup component; docs
    with no near-dup pair survive untouched. Composes with
    near_dup_minhash / simhash_near_pairs / embedding pair sources."""
    ids = df.select(id_col).distinct()
    comps = connected_components(ids, pairs, id_col)
    keep = comps.groupBy("component").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")
