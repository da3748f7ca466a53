"""Corpus-level CLI operations: dedup, quality filtering, and
deterministic splits over a documents table.

Thin orchestration over the operators package; reads parquet or JSONL
(by extension), writes parquet. Each op is a single lazy plan ending
in one write -- no driver-side row handling, so the same commands run
unchanged against a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators import dedup, text_analysis


def _read(spark: SparkSession, path: str, id_col: str, text_col: str) -> DataFrame:
    if path.endswith((".jsonl", ".json")):
        schema = T.StructType(
            [T.StructField(id_col, T.StringType()), T.StructField(text_col, T.StringType())]
        )
        return spark.read.schema(schema).json(path)
    return spark.read.parquet(path)


def _hash_bucket(id_col: str) -> F.Column:
    """The shared 16-bit md5 bucket every deterministic sampler keys
    on. One definition: the samplers are documented to agree on
    membership for the same id, so the hash scheme must never drift
    between them (the SQL oracles encode this exact scheme)."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")


def sample_by_hash(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fraction sample: keep rows whose 16-bit md5
    bucket falls below ``fraction`` of the bucket space. Reproducible
    across engines, runs, and partitionings (unlike ``df.sample``,
    whose output depends on partitioning), and consistent across
    tables sharing the id -- the reproducible-subset op every corpus
    experiment needs."""
    return df.filter(_hash_bucket(id_col) < int(fraction * 65536))


def stratified_sample_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of the 16-bit md5 bucket space (downsample the dominant
    language, keep all of a rare one -- the standard rebalancing move
    for a training mix). Same reproducibility guarantees as
    ``sample_by_hash``; a narrow map-side filter, no shuffle."""
    cutoff = F.lit(int(default_fraction * 65536))
    for value, fraction in sorted(fractions.items()):
        cutoff = F.when(F.col(strata_col) == value, int(fraction * 65536)).otherwise(cutoff)
    return df.filter(_hash_bucket(id_col) < cutoff)


def weighted_sample_by_hash(
    df: DataFrame,
    weight: "F.Column | str",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling: each row is kept with
    probability equal to its weight in [0, 1] (values outside are
    clamped), decided by the same 16-bit md5 bucket as
    ``sample_by_hash`` -- so membership is reproducible across
    engines, runs, and partitionings, and a row's fate is stable as
    long as its weight doesn't cross its bucket. Upweight high-quality
    documents, downweight boilerplate -- the quality-mix curation step
    between hard filtering and uniform sampling."""
    w = F.col(weight) if isinstance(weight, str) else weight
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(_hash_bucket(id_col) < w * 65536.0)


def leakage_free_split(
    df: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Train/val/test assignment keyed on the CONTENT fingerprint, not
    the document id: every exact copy of the same text lands in the
    same split, so duplicates can never straddle train and eval (the
    benchmark-leakage failure mode an id-hash split silently allows
    whenever dedup is imperfect or intentionally deferred). For
    near-dup-level isolation, split on the duplicate-cluster
    representative (``dedup.connected_components`` ->
    ``docs_cluster_best``) with the same bucket rule -- the fingerprint
    form is the zero-extra-shuffle default.

    Same md5-bucket determinism as the samplers: membership is
    reproducible across engines, runs, and partitionings; map-side
    expression, no shuffle."""
    bucket = F.conv(
        F.substring(F.md5(F.md5(F.col(text_col))), 1, 2), 16, 10
    ).cast("int")
    train_hi = int(256 * train_pct / 100)
    val_hi = train_hi + int(256 * val_pct / 100)
    split = (
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def epoch_shards(
    df: DataFrame,
    n_workers: int,
    n_epochs: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-epoch data ordering for N data-parallel
    trainer workers -- the reproducible-shuffle step between a curated
    corpus and a training run.

    Every (epoch, doc) pair gets an ``order_key`` =
    md5("<seed>:<epoch>:<id>") and a ``worker`` = 16-bit key prefix mod
    ``n_workers``.  Properties a 100 TB training job needs, all pure
    functions of (seed, epoch, id):

    * each epoch contains the full corpus exactly once, re-shuffled
      independently per epoch (the key mixes the epoch in);
    * any worker's read order is ``ORDER BY order_key`` within its
      shard -- reproducible on any cluster size or partitioning, and
      resumable mid-epoch from the last consumed key;
    * assignment is engine-portable (the md5 scheme the deterministic
      samplers share), so a different stack can re-derive byte-for-byte
      the same schedule.

    DELIBERATELY no dense position column: row_number over
    (epoch, worker) would sort each worker's whole shard in one window
    partition (a scale-killer at corpus size / few workers); the
    order_key IS the order, and the physical materialization for a
    trainer is ``repartitionByRange("epoch", "worker", "order_key")``
    + ``sortWithinPartitions`` -- a distributed range sort, not a
    per-worker single-partition window.  The epoch fan-out is an
    explode of an ``n_epochs``-element literal array -- a per-row
    generate, zero join and zero shuffle (a broadcast cross join here
    would put a nested-loop node in every downstream plan)."""
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(str(seed)),
            F.col("epoch").cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    worker = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % F.lit(n_workers)
    ).cast("int")
    return (
        df.select(id_col)
        .withColumn(
            "epoch", F.explode(F.array(*[F.lit(i) for i in range(n_epochs)]))
        )
        .select(
            "epoch",
            worker.alias("worker"),
            F.col(id_col),
            key.alias("order_key"),
        )
    )


def materialize_epoch_shards(
    shards: DataFrame,
    out_dir: str,
    n_epochs: int,
    n_workers: int,
    files_per_shard: int = 1,
) -> None:
    """Materialize an ``epoch_shards`` schedule as trainer-consumable
    parquet: partitioned by (epoch, worker) on disk, rows within each
    shard's files stored in ``order_key`` order, so a worker's epoch
    read is ``read(epoch=E/worker=W)`` in file/row order with no sort
    at training time, and a mid-epoch resume is a pushed-down
    ``order_key > <last consumed>`` filter on that same scan (pinned
    by the ``docs_epoch_resume`` oracle).

    This is the exact physical plan the ``epoch_shards`` docstring
    prescribes and the scale shape it exists to protect:
    ``repartitionByRange(epoch, worker, order_key)`` --- a distributed
    RANGE sort whose parallelism is ``n_epochs x n_workers x
    files_per_shard`` --- followed by ``sortWithinPartitions``, NEVER a
    ``row_number`` window per (epoch, worker) (which would sort each
    worker's entire shard in one task).  ``files_per_shard > 1``
    splits each shard across that many range-partitioned files for
    corpora where one shard exceeds a sensible file size; order across
    a shard's files is still global because the range partitioner
    splits on order_key.  ``n_epochs``/``n_workers`` are taken as
    arguments rather than derived with a ``distinct().count()`` --
    deriving them would burn a full corpus scan at 100 TB to learn two
    numbers the schedule's producer already knows."""
    n_parts = max(1, files_per_shard * n_epochs * n_workers)
    (
        shards.repartitionByRange(n_parts, "epoch", "worker", "order_key")
        .sortWithinPartitions("epoch", "worker", "order_key")
        .write.mode("overwrite")
        .partitionBy("epoch", "worker")
        .parquet(out_dir)
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget-aware corpus mixing: sample each source down to
    ~``budgets[source]`` whitespace tokens (sources already under
    budget keep everything). The keep-fraction per source is
    budget / actual_tokens, computed with ONE aggregate over a narrow
    projection and broadcast back; membership then reuses the
    deterministic md5 bucket, so the mix is reproducible and
    per-document stable as long as its source's fraction doesn't cross
    its bucket. This is the "2 epochs of Wikipedia, 0.3 of CommonCrawl"
    mixing step expressed as data, with the caveat that hash sampling
    hits the budget in expectation, not exactly (exact-cut ordering
    costs a global sort; the expectation form is the 100 TB default)."""
    from .operators.text import tokens

    totals = (
        df.select(F.col(source_col).alias("__src"), tokens(F.col(text_col)).alias("_t"))
        .select("__src", F.size("_t").alias("_n"))
        .groupBy("__src")
        .agg(F.sum("_n").alias("_total_tokens"))
    )
    budget_rows = [(s, int(b)) for s, b in sorted(budgets.items())]
    spark = df.sparkSession
    bdf = spark.createDataFrame(budget_rows, "__src string, _budget long")
    fractions = totals.join(F.broadcast(bdf), on="__src").select(
        "__src",
        F.least(
            F.lit(1.0), F.col("_budget") / F.col("_total_tokens").cast("double")
        ).alias("_keep"),
    )
    out = df.join(
        F.broadcast(fractions),
        df[source_col] == fractions["__src"],
        "left",
    )
    keep = F.coalesce(F.col("_keep"), F.lit(0.0))  # unlisted sources drop
    return out.filter(_hash_bucket(id_col) < keep * 65536.0).drop("__src", "_keep")


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-resampled domain mixture: sample each domain at a
    rate proportional to ``n_d**alpha`` (alpha < 1 flattens the mix --
    the standard multilingual/multi-domain LM rebalancing, e.g. mBERT
    and XLM-R exponent-smoothed sampling) under a total budget of
    ``budget_frac`` of the corpus. Per-domain weight
    ``w_d = n_d**alpha / sum_d n_d**alpha``; quota
    ``budget_frac * total * w_d``; keep rate ``min(1, quota / n_d)``;
    membership is the shared deterministic md5 bucket
    (``sample_by_hash``), so the mix is reproducible across engines,
    runs, and partitionings.

    Engine-portability of the float math: ``alpha == 0.5`` (the
    common default) is computed with ``sqrt`` -- correctly rounded
    per IEEE 754 in both the JVM and C libm, so the rates are
    bit-identical across engines; other alphas use ``pow`` (1-ulp
    bound, close but not contractually exact). The weight denominator
    is a LEFT FOLD over the domain-name-sorted rate list in both this
    plan and the SQL oracle, pinning the summation order doubles need
    for bitwise-equal results.

    Scale shape: ONE narrow count aggregate over the corpus (domain
    cardinality is tiny), a single-row pack to compute the fold-left
    denominator, and a broadcast join of the per-domain rates back --
    the corpus text never shuffles, and the keep predicate is
    map-side."""
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    packed = counts.agg(
        F.expr("array_sort(collect_list(struct(__src, _n)))").alias("_all")
    )
    if alpha == 0.5:
        s_expr = "sqrt(cast(x._n as double))"
        s_col = F.sqrt(F.col("_n").cast("double"))
    else:
        s_expr = f"pow(cast(x._n as double), {alpha!r})"
        s_col = F.pow(F.col("_n").cast("double"), F.lit(alpha))
    rates = (
        packed.select(
            F.expr(
                "aggregate(_all, cast(0 as bigint), (a, x) -> a + x._n)"
            ).alias("_total"),
            F.expr(
                f"aggregate(_all, cast(0.0 as double), (a, x) -> a + {s_expr})"
            ).alias("_S"),
            F.explode("_all").alias("_e"),
        )
        .select(
            F.col("_e.__src").alias("__src"),
            F.col("_e._n").alias("_n"),
            "_total",
            "_S",
        )
        .select(
            "__src",
            F.least(
                F.lit(1.0),
                (
                    (F.lit(budget_frac) * F.col("_total").cast("double"))
                    * (s_col / F.col("_S"))
                )
                / F.col("_n").cast("double"),
            ).alias("_keep"),
        )
    )
    out = df.join(
        F.broadcast(rates), df[source_col] == rates["__src"], "left"
    )
    keep = F.coalesce(F.col("_keep"), F.lit(0.0))
    return out.filter(_hash_bucket(id_col) < keep * 65536.0).drop("__src", "_keep")


def incremental_ingest(
    spark: SparkSession,
    new_docs: DataFrame,
    lake_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append a new batch to a corpus lake, exact-deduped both within
    the batch and against everything already published -- the
    continuous-crawl ingest loop (each day's crawl is mostly re-crawls
    of yesterday's pages).

    Within-batch: keep the min-id representative per md5(text)
    fingerprint. Cross-batch: anti-join the batch's fingerprints
    against the lake's. The lake read projects ONLY the fingerprint
    column, so column pruning keeps the history pass cheap (at 100 TB
    the fingerprint column is ~1/1000 of the table bytes); the
    fingerprint is persisted with each row precisely so later ingests
    never re-read text. Returns the number of rows appended."""
    import os

    fp = F.md5(F.col(text_col)).alias("fingerprint")
    batch = new_docs.select(F.col(id_col), F.col(text_col), fp)
    best = batch.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    batch = batch.join(best, on=["fingerprint", id_col], how="left_semi")
    if os.path.exists(lake_dir):
        published = spark.read.parquet(lake_dir).select("fingerprint")
        batch = batch.join(published, on="fingerprint", how="left_anti")
    # localCheckpoint severs the lineage BEFORE the append: the plan
    # above lazily reads lake_dir (the anti-join), and a mere persist()
    # can be evicted / recomputed by executor loss mid-append, which
    # would re-scan the lake while it is being written to. After the
    # checkpoint the deduped batch is materialized rows with no
    # reference to the lake path, so the append cannot race its own
    # input. (On a real cluster with unreliable executors, a
    # reliable checkpoint() to HDFS/S3 is the same call.)
    batch = batch.localCheckpoint(eager=True)
    appended = batch.count()
    batch.write.mode("append").parquet(lake_dir)
    return appended


def run(spark: SparkSession, args) -> tuple[int, int]:
    df = _read(spark, args.in_path, args.id_col, args.text_col)
    n_in = df.count()

    if args.op == "ingest":
        # append-dedup into the lake at --out; reports rows actually added
        appended = incremental_ingest(
            spark, df, args.out_path, args.id_col, args.text_col
        )
        return n_in, appended

    if args.op == "zorder":
        # layout maintenance: rewrite along the z-curve of two columns
        # so parquet min/max stats prune box predicates on either one
        from .operators.layout import write_zordered

        by = [c.strip() for c in (getattr(args, "by", None) or "").split(",") if c.strip()]
        if len(by) < 2:
            raise SystemExit("corpus zorder requires --by colA,colB[,colC...]")
        write_zordered(
            df, args.out_path, cols=by,
            num_files=getattr(args, "num_files", None),
        )
        return n_in, spark.read.parquet(args.out_path).count()

    if args.op == "epoch-shards":
        # deterministic training schedule, materialized in the
        # trainer-consumable layout (partitioned by epoch/worker, rows
        # in order_key order; see materialize_epoch_shards)
        n_epochs = max(1, getattr(args, "epochs", 1))
        n_workers = max(1, getattr(args, "workers", 1))
        sh = epoch_shards(
            df, n_workers=n_workers, n_epochs=n_epochs,
            id_col=args.id_col, seed=getattr(args, "seed", 42),
        )
        materialize_epoch_shards(
            sh, args.out_path, n_epochs=n_epochs, n_workers=n_workers,
            files_per_shard=max(1, getattr(args, "files_per_shard", 1)),
        )
        return n_in, spark.read.parquet(args.out_path).count()

    if args.op == "curate":
        bench = (
            _read(spark, args.benchmark_path, args.id_col, args.text_col)
            if getattr(args, "benchmark_path", None)
            else None
        )
        out, counts = curate(
            spark, df,
            id_col=args.id_col, text_col=args.text_col,
            quality_threshold=getattr(args, "quality_threshold", 0.3),
            benchmark=bench,
            max_overlap=getattr(args, "max_overlap", 1),
            train_pct=args.train_pct, val_pct=args.val_pct,
        )
        out.write.mode("overwrite").partitionBy("split").parquet(args.out_path)
        print("curate stages: " + " -> ".join(f"{k}:{v}" for k, v in counts.items()))
        return n_in, spark.read.parquet(args.out_path).count()

    if args.op == "dedup":
        if args.method == "exact":
            keep = dedup.exact_dedup(df, args.id_col, args.text_col)
            out = df.join(keep.select(args.id_col), on=args.id_col, how="left_semi")
        else:
            if args.method == "minhash":
                pairs = dedup.near_dup_minhash(
                    df, args.id_col, args.text_col, threshold=args.threshold
                )
            else:
                sigs = dedup.simhash_signatures(df, args.id_col, args.text_col)
                pairs = dedup.simhash_near_pairs(sigs, args.id_col, args.max_hamming)
            out = dedup.dedup_near_representatives(df, pairs, args.id_col)
    elif args.op == "quality-filter":
        scored = text_analysis.quality_features(df, args.text_col)
        out = scored.filter(F.col("quality_score") >= args.threshold).select(*df.columns)
    elif args.op == "sample":
        if getattr(args, "stratify", None):
            col, _, spec = args.stratify.partition(":")
            if not spec:
                raise SystemExit("--stratify wants 'column:value=frac,value=frac'")
            fractions = {}
            for pair in spec.split(","):
                value, eq, frac = pair.partition("=")
                try:
                    if not (value and eq):
                        raise ValueError
                    fractions[value] = float(frac)
                except ValueError:
                    raise SystemExit(
                        f"--stratify: bad pair {pair!r} (want value=fraction)"
                    ) from None
            out = stratified_sample_by_hash(
                df, fractions, strata_col=col,
                default_fraction=args.fraction, id_col=args.id_col,
            )
        else:
            out = sample_by_hash(df, args.fraction, args.id_col)
    elif args.op == "redact":
        out = text_analysis.redact_pii(df, args.text_col)
    elif args.op == "pack":
        from .operators.packing import pack_documents

        packed = pack_documents(
            df,
            budget_tokens=args.budget_tokens,
            n_buckets=args.n_buckets,
            id_col=args.id_col,
            text_col=args.text_col,
        )
        out = df.join(packed, on=args.id_col)
    elif args.op == "decontaminate":
        if not args.benchmark_path:
            raise SystemExit("corpus decontaminate requires --benchmark <docs path>")
        bench = _read(spark, args.benchmark_path, args.id_col, args.text_col)
        hits = dedup.contamination_overlap(df, bench, args.id_col, args.text_col)
        contaminated = hits.filter(
            F.col("n_overlapping_shingles") >= args.max_overlap
        ).select(args.id_col)
        out = df.join(contaminated, on=args.id_col, how="left_anti")
    elif args.op == "split":
        if getattr(args, "by_content", False):
            out = leakage_free_split(
                df, args.train_pct, args.val_pct, args.text_col
            )
        else:
            bucket = F.conv(
                F.substring(F.md5(F.col(args.id_col).cast("string")), 1, 2), 16, 10
            ).cast("int")
            train_hi = int(256 * args.train_pct / 100)
            val_hi = train_hi + int(256 * args.val_pct / 100)
            split = (
                F.when(bucket < train_hi, F.lit("train"))
                .when(bucket < val_hi, F.lit("val"))
                .otherwise(F.lit("test"))
            )
            out = df.withColumn("split", split)
    elif args.op == "mix":
        spec = getattr(args, "budgets", None)
        if not spec:
            raise SystemExit("corpus mix requires --budgets source=tokens[,source=tokens...]")
        budgets = {}
        for pair in spec.split(","):
            src, eq, n = pair.partition("=")
            if not (src and eq and n.isdigit()):
                raise SystemExit(f"--budgets: bad pair {pair!r} (want source=tokens)")
            budgets[src.strip()] = int(n)
        out = token_budget_mix(
            df, budgets,
            source_col=getattr(args, "source_col", "source"),
            id_col=args.id_col, text_col=args.text_col,
        )
    elif args.op == "temperature-mix":
        out = temperature_mix(
            df,
            alpha=getattr(args, "alpha", 0.5),
            budget_frac=getattr(args, "budget_frac", 0.5),
            source_col=getattr(args, "source_col", "source"),
            id_col=args.id_col,
        )
    elif args.op == "drift":
        if not getattr(args, "baseline_path", None):
            raise SystemExit("corpus drift requires --baseline <docs path>")
        from .operators.drift import histogram_drift

        base = _read(spark, args.baseline_path, args.id_col, args.text_col)
        out = histogram_drift(
            base, df,
            value_col=getattr(args, "value_col", "n_chars"),
            group_col=getattr(args, "source_col", "source"),
            bucket_width=getattr(args, "bucket_width", 200),
        )
        for r in out.orderBy(out.columns[0]).collect():
            print("drift: " + ", ".join(f"{c}={r[c]}" for c in out.columns))
    elif args.op == "embed":
        out = text_analysis.feature_hash_embedding(
            df,
            dim=getattr(args, "dim", 8),
            id_col=args.id_col,
            text_col=args.text_col,
        )
    elif args.op == "chunk":
        from .operators.chunking import chunk_documents

        out = chunk_documents(
            df,
            chunk_size=getattr(args, "chunk_size", 64),
            stride=getattr(args, "stride", 48),
            id_col=args.id_col,
            text_col=args.text_col,
        )
    elif args.op == "collocations":
        out = text_analysis.bigram_lift(
            df,
            args.text_col,
            min_count=getattr(args, "min_count", 5),
            k=getattr(args, "top_k", 100),
        )
    elif args.op == "retrieve":
        from .operators.retrieval import chunk_retrieval_topk

        query = getattr(args, "query", None)
        if not query:
            raise SystemExit("corpus retrieve requires --query <text>")
        out = chunk_retrieval_topk(
            df,
            query,
            k=getattr(args, "top_k", 100),
            dim=getattr(args, "dim", 8),
            chunk_size=getattr(args, "chunk_size", 64),
            stride=getattr(args, "stride", 48),
            id_col=args.id_col,
            text_col=args.text_col,
        )
    elif args.op == "semdedup":
        # input is an embeddings table (id + array<float/double> vector)
        from .operators.kmeans import lloyd_kmeans
        from .operators.similarity import semantic_dedup

        vec_col = getattr(args, "vec_col", "embedding")
        cents = lloyd_kmeans(
            df, k=getattr(args, "k_cells", 4), n_iters=2,
            id_col=args.id_col, vec_col=vec_col,
        )
        dropped = semantic_dedup(
            df, cents, threshold=args.threshold,
            id_col=args.id_col, vec_col=vec_col,
            arrow_assign=getattr(args, "arrow_assign", False),
            arrow_pairs=getattr(args, "arrow_pairs", False),
        )
        out = df.join(dropped.select(args.id_col), on=args.id_col, how="left_anti")
    elif args.op == "dup-spans":
        # per-document duplicated-span profile (the substring-dedup
        # quality metric) -- a MEASUREMENT op: writes the profile table,
        # it does not drop documents
        out = dedup.duplicate_spans(
            df, args.id_col, args.text_col, span_k=getattr(args, "span_k", 8)
        )
    else:  # pragma: no cover
        raise ValueError(args.op)

    if args.op == "split":
        out.write.mode("overwrite").partitionBy("split").parquet(args.out_path)
    else:
        out.write.mode("overwrite").parquet(args.out_path)
    return n_in, spark.read.parquet(args.out_path).count()


def curate(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.3,
    jaccard_threshold: float = 0.8,
    benchmark: DataFrame | None = None,
    max_overlap: int = 1,
    train_pct: int = 80,
    val_pct: int = 10,
) -> tuple[DataFrame, dict[str, int]]:
    """The standard curation recipe as ONE composed run -- what a user
    otherwise chains through five CLI invocations (five reads, five
    writes):

    1. exact dedup (md5 fingerprint, keep min id);
    2. MinHash/LSH near-dedup (keep cluster representative);
    3. optional benchmark decontamination (shingle overlap anti-join);
    4. quality filter (``quality_features`` score >= threshold);
    5. leakage-free train/val/test split (content-keyed buckets).

    Returns the curated, split-labeled corpus plus per-stage surviving
    counts. Stages compose as plans on one scan wherever possible; the
    two places that genuinely need a materialization barrier (the
    near-dup pair mining and the per-stage counts) are bounded by the
    deduped corpus, not the raw input. Stage counts cost one action
    each -- acceptable for an interactive curation run; drop the dict
    for a fire-and-forget job and it is lazy end to end."""
    from .operators.text_analysis import quality_features

    counts: dict[str, int] = {"input": df.count()}
    keep = dedup.exact_dedup(df, id_col, text_col)
    stage = df.join(keep.select(id_col), on=id_col, how="left_semi")
    counts["exact_dedup"] = stage.count()

    pairs = dedup.near_dup_minhash(
        stage, id_col, text_col, threshold=jaccard_threshold
    )
    stage = dedup.dedup_near_representatives(stage, pairs, id_col)
    counts["near_dedup"] = stage.count()

    if benchmark is not None:
        hits = dedup.contamination_overlap(stage, benchmark, id_col, text_col)
        contaminated = hits.filter(
            F.col("n_overlapping_shingles") >= max_overlap
        ).select(id_col)
        stage = stage.join(contaminated, on=id_col, how="left_anti")
        counts["decontaminated"] = stage.count()

    scored = quality_features(stage, text_col)
    stage = scored.filter(F.col("quality_score") >= quality_threshold).select(
        *stage.columns
    )
    counts["quality_filtered"] = stage.count()

    out = leakage_free_split(stage, train_pct, val_pct, text_col)
    return out, counts
