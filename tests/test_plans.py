"""Plan-regression tests: pin the physical-plan properties the engine
relies on at scale (SCALE.md). These catch silent regressions that
correctness tests cannot — a filter that stops pushing down or a join
that degrades to a cartesian product still returns the right rows on
test data while becoming unrunnable at 100 TB.
"""

from __future__ import annotations

from blockchain_indexer_spark.plans import REGISTRY

# Queries whose first input is a parquet scan with a row filter — the
# filter must reach the scan (PushedFilters non-empty).
PUSHDOWN_QUERIES = ("filtered_projection", "broadcast_join_agg", "embedding_topk_mips")

# Every headline bench query: none may plan a cartesian product.
HEADLINE = (
    "pricing_summary",
    "broadcast_join_agg",
    "multi_join_revenue",
    "union_activity_timeline",
    "latest_event_per_user",
    "topk_per_group",
    "gap_detection",
    "tumbling_window_stats",
    "event_sessionization",
    "asof_latest_purchase",
    "range_join_active_sessions",
    "doc_fingerprint_dedup",
    "ngram_jaccard_near_dups",
    "minhash_lsh_candidates",
    "embedding_topk_mips",
    "embedding_lsh_topk",
)


def _plan(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filters_reach_parquet_scans(spark, sf_dir):
    for name in PUSHDOWN_QUERIES:
        p = _plan(spark, sf_dir, name)
        assert "PushedFilters: [" in p and "PushedFilters: []" not in p, (
            f"{name}: no pushed filters in scan"
        )


def test_small_dimension_joins_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "broadcast_join_agg")
    assert "BroadcastHashJoin" in p, "dimension join lost its broadcast"


def test_brute_force_topk_broadcasts_queries(spark, sf_dir):
    # the inequality join is a BroadcastNestedLoopJoin (queries side
    # broadcast, corpus scanned once) — NOT a cartesian product
    p = _plan(spark, sf_dir, "embedding_topk_mips")
    assert "BroadcastNestedLoop" in p
    assert "CartesianProduct" not in p


def test_no_cartesian_products_in_headline_plans(spark, sf_dir):
    for name in HEADLINE:
        p = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in p, f"{name}: cartesian product in plan"


def test_sessionization_rides_one_shuffle(spark, sf_dir):
    # lag, the running session counter, and the per-session agg must
    # all reuse the single user_id exchange — a second exchange here
    # would re-shuffle the full corpus at scale for no reason
    p = _plan(spark, sf_dir, "event_sessionization")
    assert p.count("Exchange") - p.count("ReusedExchange") == 1, (
        f"expected exactly one shuffle:\n{p}"
    )


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    # the eval shingle set must broadcast: at corpus scale the training
    # shingle frame may be 100 TB-derived and must not shuffle for the
    # contamination probe
    p = _plan(spark, sf_dir, "doc_decontamination")
    assert "BroadcastHashJoin" in p, "eval shingle set lost its broadcast"


def test_quota_sample_is_one_window_shuffle(spark, sf_dir):
    # per-group quota = one hash exchange on the group + one window
    # sort; anything more would re-shuffle the corpus
    p = _plan(spark, sf_dir, "doc_quota_sample")
    assert p.count("Window") >= 1
    assert p.count("Exchange") - p.count("ReusedExchange") == 1, (
        f"expected exactly one shuffle:\n{p}"
    )


def test_repetition_line_metrics_stay_in_scan_projection(spark, sf_dir):
    # duplicate-line fractions and mean word length are pure array
    # expressions: the only shuffles are the bigram groupBys + the
    # doc_id join back. A shuffle regression here means the projection
    # metrics started exploding rows.
    p = _plan(spark, sf_dir, "doc_repetition_stats")
    assert "CartesianProduct" not in p
    assert p.count("Generate") == 1, "only the bigram explode may Generate"


def test_pii_scrub_is_pure_projection(spark, sf_dir):
    # three chained regexp projections over the scan — any Exchange
    # means the redaction pass started shuffling the corpus
    p = _plan(spark, sf_dir, "doc_pii_scrub")
    assert p.count("Exchange") == 0, f"PII scrub must not shuffle:\n{p}"


def test_chunk_packing_is_one_window_shuffle(spark, sf_dir):
    # the prefix sum rides a single (group) exchange locally; its
    # cluster twin is the two-phase distributed prefix sum (SCALE.md)
    p = _plan(spark, sf_dir, "doc_chunk_packing")
    assert p.count("Exchange") - p.count("ReusedExchange") == 1, (
        f"expected exactly one shuffle:\n{p}"
    )


def test_mixture_rebalance_broadcasts_rates_back(spark, sf_dir):
    # the per-group counts (tiny) broadcast back over the corpus; the
    # corpus side itself must not shuffle for the acceptance filter
    p = _plan(spark, sf_dir, "corpus_mixture_rebalance")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_pq_lut_join_broadcasts_and_no_cartesian(spark, sf_dir):
    # codes x LUT is a broadcast equi-join on (subspace, code); the
    # code table must never shuffle its vectors for ADC
    p = _plan(spark, sf_dir, "embedding_pq_topk")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_rollup_is_single_shuffle_expand(spark, sf_dir):
    # grouping sets expand BEFORE partial aggregation: one Expand node
    # and exactly one agg exchange (plus AQE reads), not one per level
    p = _plan(spark, sf_dir, "rollup_revenue_hierarchy")
    assert "Expand" in p
    shuffles = p.count("Exchange") - p.count("BroadcastExchange") - p.count("ReusedExchange")
    assert shuffles == 1, f"rollup re-shuffles per level:\n{p}"


def test_kmeans_assignment_is_arrow_not_interpreted(spark, sf_dir):
    # final assignment: one ArrowEvalPython stage (numpy matmul per
    # batch), no row-at-a-time BatchEvalPython, no join at all — the
    # centroids ride the UDF closure
    p = _plan(spark, sf_dir, "embedding_kmeans_clusters")
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_semantic_dedup_pairs_join_on_cell(spark, sf_dir):
    # the pairwise stage must be an equi-join keyed on the cell id
    # (SortMergeJoin or broadcast), never a nested-loop over the corpus
    p = _plan(spark, sf_dir, "embedding_semantic_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
