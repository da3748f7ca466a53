"""Physical-plan lint over every contract query.

Sweeps `contract.QUERIES`, renders each query's formatted physical
plan, and flags the patterns that kill a plan at 100x scale:

* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` -- a join that
  degenerated to all-pairs.
* ``BatchEvalPython`` -- row-at-a-time Python in the plan (Arrow
  ``mapInPandas`` nodes are allowed where declared).
* Single-partition windows -- a ``Window`` whose required child
  distribution is ``SinglePartition`` (global sort of the full input).
* ``Exchange SinglePartition`` feeding anything other than a final
  scalar aggregate / limit collect.
* Multi-scans -- the same source table scanned more than once in one
  query plan (the round-4 hand-audit regression class, mechanized:
  every physical ``Scan parquet`` node's file is counted per table;
  persisted intermediates appear as ``InMemoryTableScan`` and count
  zero, which is exactly the point of the persist).

Known-and-justified sites are allowlisted EXPLICITLY with the reason,
so a new offender fails loudly instead of hiding in the noise.
Multi-scan allows use the key ``multi_scan:<table>``; a justified
reason is one of: self-join/self-union shapes where the two scans push
DIFFERENT filters (each scan reads less than a shared scan would),
probe-vs-corpus ANN shapes, recall measurements (found vs truth),
two-snapshot CDC, and bounded dimension rescans.

Usage: python tools/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_pipeline_monthly_close_dataset_spark import contract
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark

# query -> {flag: reason}. Every entry is a documented design decision.
ALLOW: dict[str, dict[str, str]] = {
    # pandas-API migration showcase: the merge-BACK-of-a-groupby port
    # idiom (reference transform.py builds a lookup then merges it onto
    # the fact) -- the second fact scan IS the documented pandas-port
    # shape being pinned; the Spark-native rewrite is a window function
    # (see q_lineitem_above_avg_pandas_merge's docstring), and showing
    # that trade-off is the query's purpose
    "lineitem_above_avg_pandas_merge": {
        "multi_scan:lineitem": "pandas merge-back idiom scans the fact "
        "on both sides of the self-join by construction; the query "
        "documents exactly this porting trap (native form: one scan + "
        "window)"
    },
    # dimension-bounded global windows (SURVEY O4): inputs are dimension
    # tables (nation = 25 rows), never facts
    "surrogate_keys": {
        "single_partition_window": "surrogate keys over a 25-row dimension"
    },
    # oracle-parity form retained deliberately; engine path is
    # operators/ranking.distributed_ntile (see PLANS.md crossover table)
    "docs_quality_deciles": {
        "exchange_single": "distributed_ntile offsets join is metadata-sized"
    },
    # broadcast nested-loop joins whose broadcast side is bounded by
    # construction (probe sets, literal scaffolds, sliced baselines):
    "dq_summary_status": {
        "nested_loop": "five-row literal dataset scaffold joins the summary"
    },
    # share-of-total via broadcast 1-row global sum (replaces the
    # SUM() OVER () empty-frame window that single-partitions the data)
    "revenue_share": {
        "nested_loop": "1-row global-total broadcast; exchange reuse "
        "keeps it one scan + one shuffle"
    },
    "lineitem_heavy_hitters": {
        "nested_loop": "1-row total broadcast derived from the grouped "
        "counts; exchange reuse keeps it one lineitem scan",
        "multi_scan:lineitem": "static-plan artifact: AQE defers reuse "
        "to runtime, where the total branch is a ReusedExchange over "
        "the grouped shuffle (post-execution plan asserted by "
        "test_heavy_hitters_exchange_reuse_fires) -- one scan executes",
    },
    "orders_benford": {
        "nested_loop": "1-row total broadcast for the share "
        "denominator, derived from the persisted 9-row digit counts",
    },
    "parts_cross_sell": {
        "nested_loop": "1-row global order-count broadcast for the "
        "lift denominator; all branches read the persisted basket "
        "(one lineitem scan)",
    },
    "events_interpolated": {
        "nested_loop": "dense-spine scaffold: the 1-row bounds "
        "explode cross-joins the broadcast event-type dimension "
        "(5 rows) -- bounded by calendar x types, never data",
    },
    "orders_kmv_customers": {
        "nested_loop": "two 1-row broadcasts: the per-half sketch "
        "pivot row and the exact-intersection count",
        "multi_scan:orders": "measurement shape x2 (same adjudication "
        "as lineitem_cms_hot_suppliers): the direct-sketch branch "
        "exists to CHECK the merge theorem against the monthly path, "
        "and the exact-intersection branch is the truth the estimate "
        "is judged against; the production path (monthly sketches -> "
        "rollup -> intersect) is one scan",
    },
    "lineitem_cms_hot_suppliers": {
        "nested_loop": "two 1-row broadcasts: the heavy-hitter "
        "threshold total and the merged CMS counter state",
        "exchange_single": "the same single-row aggregates (global "
        "total; rollup of monthly states to one global CMS row)",
        "multi_scan:lineitem": "measurement shape (same adjudication "
        "as orders_quantile_sketch): the exact-count probe side the "
        "never_undercounts flag is defined against is a separate scan "
        "by definition; the sketch path itself is one scan",
    },
    "embedding_kmeans_centroids": {
        "nested_loop": "k=4 trained centroids broadcast for the "
        "assignment argmin -- the k-way expansion collapses map-side "
        "via min_by before any shuffle"
    },
    "lineitem_bloom_semijoin": {
        "nested_loop": "1-row broadcasts: the 256-long bloom bitmap "
        "plus three single-row stat aggregates",
        "exchange_single": "the same single-row stat aggregates",
    },
    "docs_semantic_contamination": {
        "nested_loop": "bounded benchmark slice (doc_id < 10) broadcasts "
        "as dim-wide integer rows against the corpus embeddings",
        "multi_scan:documents": "the second scan is the benchmark "
        "slice with doc_id < 10 PUSHED to parquet (row-group pruning "
        "makes it metadata-cheap at any corpus size); persisting the "
        "full embed to save it would cost more than it saves. "
        "Rounds 1-7 hid this scan behind another query's cached plan "
        "(InMemoryTableScan) purely by registry execution order -- "
        "the r8 window rotation exposed the standalone plan, which "
        "was always 2 scans",
    },
    "events_max_concurrent": {
        "nested_loop": "cross-midnight carry: sessions range-join the "
        "broadcast DAY dimension (~31 rows) -- bounded by calendar "
        "days, not data",
    },
    "embedding_semantic_dedup": {
        "nested_loop": "k=4 trained centroids broadcast for the cell "
        "assignment argmin (same pattern as the kmeans queries); the "
        "pair compare itself is a cell-equality hash join",
    },
    # TPC-H scalar-subquery shapes (round-4 second batch): the HAVING /
    # threshold scalar is a 1-row aggregate broadcast against the
    # grouped intermediate -- the standard decorrelation plan
    "important_parts_value": {
        "nested_loop": "1-row regional-total broadcast for the Q11 "
        "HAVING-fraction threshold",
        "exchange_single": "the same single-row total aggregate",
    },
    "excess_stock_suppliers": {
        "nested_loop": "1-row (total, n_suppliers) broadcast for the Q20 "
        "1.5x-average threshold",
        "exchange_single": "the same single-row global aggregate",
    },
    # ---- multi_scan adjudication (round 6): every remaining >1-scan
    # plan is a documented design decision. Categories: two-snapshot
    # (CDC/SCD compare two versions by definition), probe-vs-corpus
    # (a bounded probe slice scans beside the corpus it searches),
    # measurement (recall/contamination joins a found set against an
    # independently-derived truth set), disjoint-slice (self-join /
    # self-union branches push DIFFERENT filters, so the scans
    # together read each row once -- splitting beats one unfiltered
    # scan feeding both), two-role-dim (a bounded dimension joins the
    # same fact under two roles), derived-threshold (pass 1 computes
    # the tiny aggregate that parametrizes pass 2's filter; sharing
    # would persist a corpus-sized intermediate), iterative (each
    # round re-reads its bounded input by design).
    "snapshot_cdc_diff": {
        "multi_scan:orders": "two-snapshot CDC: the diff of two "
        "versioned slices IS two scans with different snapshot filters"
    },
    "customer_scd2": {
        "multi_scan:customer": "two-snapshot SCD2: current dimension "
        "vs incoming snapshot are distinct slices of the same table "
        "in this test harness; production reads two real tables"
    },
    "part_fuzzy_pairs": {
        "multi_scan:part": "blocked self-join: both sides push the "
        "block-key projection; a self-join's two sides are one "
        "logical scan each"
    },
    "events_asof_last_purchase": {
        "multi_scan:events": "disjoint-slice self-join: purchase "
        "rows as-of-join view rows; each scan pushes its own "
        "event_type filter, together reading each row once"
    },
    "events_range_join": {
        "multi_scan:events": "disjoint-slice self-join: session "
        "windows range-join point events, each side with its own "
        "pushed event_type filter"
    },
    "set_operations": {
        "multi_scan:orders": "disjoint-slice self-union: the 1996 and "
        "1997 cohorts push different year filters (persisted "
        "customer-cardinality sets stop EXCEPT+INTERSECT doubling it)"
    },
    "hot_keys_join_revenue": {
        "multi_scan:lineitem": "hybrid skew routing: hot and tail "
        "branches push complementary key filters, so the two scans "
        "together read each fact row exactly once",
        "multi_scan:orders": "same routing on the build side: "
        "broadcast slice for hot keys, shuffle slice for the tail",
    },
    "idle_rich_customers": {
        "multi_scan:customer": "TPC-H Q22 decorrelation: the "
        "above-average threshold is a 1-row aggregate over a "
        "different (positive-balance) slice than the main filter scan",
        "nested_loop": "1-row positive-balance (sum, count) broadcast for "
        "the Q22 above-average filter",
        "exchange_single": "the same single-row global aggregate"
    },
    "docs_contamination": {
        "multi_scan:documents": "measurement shape: the bounded "
        "benchmark slice broadcasts against the corpus it is "
        "checked for leakage into",
        "exchange_single": "broadcast benchmark side is tiny"
    },
    "docs_leakage_split": {
        "multi_scan:documents": "measurement shape: train and test "
        "split slices (different md5-cutoff filters) join on "
        "fingerprints to count leaks",
        "nested_loop": "1-row global leaky-fingerprint count broadcast "
        "onto the 3-row per-split summary"
    },
    "docs_ngram_jaccard": {
        "multi_scan:documents": "labeled quadratic BASELINE: truth-set "
        "generation joins shingle projections of a bounded slice "
        "against itself",
        "nested_loop": "pair generation over a bounded doc_id<120 slice; "
        "production path takes candidate pairs from LSH banding"
    },
    "docs_ngram_jaccard_recall": {
        "multi_scan:documents": "recall measurement: the LSH found "
        "set and the sampled exact truth set derive from separate "
        "scans by definition (found vs independent ground truth)",
        "nested_loop": "two 1-row global counts (n_found, n_truth) "
        "broadcast together for the recall ratio",
        "exchange_single": "the same two single-row count aggregates"
    },
    "docs_token_budget_mix": {
        "multi_scan:documents": "derived-threshold two-pass: pass 1 "
        "aggregates per-source token totals (tiny), pass 2 filters "
        "the corpus by the derived keep-fraction; sharing the scan "
        "would persist a corpus-sized tokenized intermediate -- "
        "rescanning is the 100 TB-correct choice",
    },
    "docs_ols_outliers": {
        "multi_scan:documents": "derived-threshold two-pass (same "
        "adjudication as docs_token_budget_mix): pass 1 is the "
        "integer-moment aggregate to one row, pass 2 re-scans the "
        "features to score residuals against the broadcast "
        "coefficients; persisting corpus-sized features to save the "
        "scan is the wrong trade at 100 TB",
        "nested_loop": "two 1-row broadcasts: the coefficient frame "
        "onto the residual scan, and the rounded-coefficient columns "
        "onto the 10-row outlier result",
    },
    "docs_temperature_mix": {
        "multi_scan:documents": "derived-threshold two-pass (same "
        "adjudication as docs_token_budget_mix): pass 1 counts per "
        "language (tiny), pass 2 filters the corpus by the derived "
        "temperature rate; rescanning beats persisting a corpus-sized "
        "intermediate at 100 TB",
    },
    "docs_snapshot_drift": {
        "multi_scan:documents": "snapshot-vs-snapshot measurement "
        "shape: the two sides ARE two snapshot roles of the table "
        "(in production, different lake partitions); each side is "
        "one narrow count aggregate",
    },
    "embedding_pq_adc_topk": {
        "multi_scan:embeddings": "probe-vs-corpus: the bounded probe "
        "slice precomputes its distance tables beside the corpus "
        "code scan; PQ codebooks are driver literals (a bounded "
        "16-row build-time collect, not a plan scan)",
        "nested_loop": "probe set broadcasts (bounded, vec_id % 97); "
        "the codes side never shuffles -- the ADC scan shape",
    },
    "embedding_cosine_topk": {
        "multi_scan:embeddings": "probe-vs-corpus: the bounded probe "
        "slice (vec_id filter pushed) broadcasts against the corpus "
        "scan it searches",
        "nested_loop": "probe set broadcasts (bounded); corpus never shuffles"
    },
    "embedding_lsh_topk": {
        "multi_scan:embeddings": "probe-vs-corpus: bounded probe "
        "slice beside the bucketed corpus scan"
    },
    "embedding_ivf_topk": {
        "multi_scan:embeddings": "probe-vs-corpus plus the "
        "deterministic sampled-centroid slice (vec_id-bounded): "
        "corpus assignment, probe assignment, and quantizer are "
        "separate bounded roles of one table",
        "nested_loop": "probe set broadcasts; cells equality-join the corpus"
    },
    "embedding_ivf_trained_topk": {
        "multi_scan:embeddings": "probe-vs-corpus: corpus cell "
        "assignment + bounded probe slice; the trained centroids "
        "are driver literals (build-time jobs, not plan scans)",
        "nested_loop": "same k=4 centroid broadcast (assignment + "
        "probe-cell ranking); search join is cell-equality"
    },
    "embedding_lsh_recall": {
        "multi_scan:embeddings": "recall measurement: LSH found set "
        "vs brute-force truth set over probe and corpus roles -- the "
        "metric is DEFINED as a join of independently-derived sets",
        "nested_loop": "the exact side IS the bounded probe-broadcast scan "
        "the recall metric is defined against; LSH side equality-joins"
    },
    "embedding_near_dup": {
        "multi_scan:embeddings": "labeled all-pairs BASELINE the "
        "bucketed paths are measured against",
        "nested_loop": "exact all-pairs BASELINE the LSH/MinHash paths are "
        "measured against (docstring); 100 TB path is bucketed"
    },
    "nation_market_share": {
        "multi_scan:nation": "two-role dimension: customer-nation vs "
        "supplier-nation join the same 25-row broadcast dim under "
        "two roles (TPC-H Q8 shape)"
    },
    "nation_pair_trade": {
        "multi_scan:nation": "two-role dimension: supplier-nation vs "
        "customer-nation pair (TPC-H Q7 shape), 25-row broadcast dim"
    },
    "orders_incremental_state": {
        "multi_scan:orders": "incremental-maintenance simulation: "
        "three disjoint hash-batch filters model three arriving "
        "partitions; production aggregates only the new partition "
        "per close and merges into persisted state"
    },
    "orders_quantile_sketch": {
        "multi_scan:orders": "incremental simulation (two disjoint "
        "hash batches -> merged histogram state) PLUS measurement: "
        "the exact-percentile side the within_bound flag is defined "
        "against is a separate scan by definition"
    },
    "events_type_pagerank": {
        "multi_scan:events": "iterative graph algorithm: the edge "
        "aggregate and the node universe are two bounded projections "
        "of the stream; ranks iterate over the 5-node type graph",
        "nested_loop": "1-row node-count broadcast crossed with the "
        "type-cardinality (5-node) rank table each iteration"
    },
    # global scalar outputs: one-row results legitimately coalesce
    "global_extremes": {"exchange_single": "single-row global aggregate"},
    "events_funnel": {"exchange_single": "single-row funnel summary"},
    "distinct_counts": {"exchange_single": "single-row global aggregate"},
    "group_stats_exact": {"exchange_single": "grand-total row in the output"},
}

FLAG_PATTERNS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "nested_loop": re.compile(r"BroadcastNestedLoopJoin"),
    "python_row": re.compile(r"BatchEvalPython"),
}

# one per physical Scan node in the formatted detail section
_SCAN_RE = re.compile(
    r"Location: InMemoryFileIndex(?:\(\d+ paths?\))? \[[^\]]*?/([A-Za-z_0-9]+)\.parquet"
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_counts(plan: str) -> dict[str, int]:
    """Physical parquet scans per source table (ReusedExchange shares
    don't re-list a Location; InMemoryTableScan hides cached builds)."""
    counts: dict[str, int] = {}
    for m in _SCAN_RE.finditer(plan):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def lint_plan(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    allow = ALLOW.get(name, {})
    for key, pat in FLAG_PATTERNS.items():
        if pat.search(plan) and key not in allow:
            flags.append(key)
    for table, n in sorted(scan_counts(plan).items()):
        if n > 1 and f"multi_scan:{table}" not in allow:
            flags.append(f"multi_scan:{table}x{n}")
    # single-partition window: the Window node's child Sort has a
    # global=true sort or the Exchange above it is SinglePartition
    if "single_partition_window" not in allow:
        for m in re.finditer(r"\(\d+\) Window", plan):
            seg = plan[max(0, m.start() - 600): m.start()]
            if "Exchange SinglePartition" in seg:
                flags.append("single_partition_window")
                break
    if "exchange_single" not in allow:
        n_single = plan.count("Exchange SinglePartition")
        # a trailing single-partition exchange for a LIMIT/scalar result
        # is fine; more than one, or one over a Window, is not
        if n_single > 1:
            flags.append("exchange_single")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(contract.QUERIES)
    spark = get_spark()
    bad = 0
    for name in names:
        try:
            plan = formatted_plan(contract.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - surfaced to the user
            print(f"ERR   {name}: {exc}")
            bad += 1
            continue
        flags = lint_plan(name, plan)
        scans = " ".join(f"{t}={n}" for t, n in sorted(scan_counts(plan).items()))
        if flags:
            bad += 1
            print(f"FLAG  {name}: {', '.join(sorted(set(flags)))}  [scans: {scans}]")
        else:
            print(f"ok    {name}  [scans: {scans}]")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
