"""Pins the driver-facing registry iteration order.

Round 1's driver correctness run recorded exactly the first 50
registered queries and dropped the rest (VERDICT.md "Next round" #1),
so dict order is load-bearing: the reference-semantics chain/mm gates
must come first and the oracle-less rows-only variants last.
"""

from blockchain_indexer_spark.plans import PRIORITY, REGISTRY
from blockchain_indexer_spark.plans.registry import oracles


def test_every_registered_query_is_ranked():
    assert set(REGISTRY) == set(PRIORITY)
    assert len(PRIORITY) == len(set(PRIORITY))


def test_registry_iterates_in_priority_order():
    assert list(REGISTRY) == list(PRIORITY)


# Round-4 rotation (VERDICT r3 "Next round" #4): the two r3-red rows
# post-fix, the three queries whose only driver row is round 1, and
# the new round-4 PNG gate lead the window.
TIER_A_R4 = (
    "doc_chunk_packing",
    "embedding_pca_project",
    "corpus_token_cardinality",
    "doc_length_quantiles",
    "scalar_total",
    "mm_real_png",
    "doc_boilerplate_scrub",
    "doc_bm25_topk",
    "doc_token_budget_sample",
    "mm_image_ahash",
    "graph_supplier_pagerank",
)

# Regression canaries for round-4 code churn: the Jaccard density
# escape, decontaminate_exact id-type fix, connected-components
# self-loop contract, and the decode_image_real PNG dispatch.
CHURN_CANARIES_R4 = (
    "ngram_jaccard_near_dups",
    "doc_exact_decontamination",
    "doc_dedup_clusters",
    "mm_real_decode",
)

# Operators added mid-round-4 after the rotation landed: never
# driver-verified, so they take window slots ahead of r2-verified
# entries (which keep their round-2 evidence below the fold).
NEW_GATES_R4 = (
    "doc_bigram_fluency",
    "corpus_cms_heavy_hitters",
    "mm_real_gif",
    "corpus_perceptron_weights",
    "doc_perceptron_margin",
    "doc_intra_dedup",
    "doc_cluster_best",
    "doc_shard_plan",
    "embedding_knn_triangles",
    "doc_cross_repeat_spans",
    "doc_winnowing",
    "ngram_containment_near_dups",
    # second wave (same round): corpus monitors, codecs, event
    # analytics, graph/tree learners — never driver-verified either
    "doc_dsir_weights",
    "corpus_source_ks_drift",
    "corpus_source_pair_jaccard",
    "mm_real_jpeg",
    "doc_cdc_chunks",
    "embedding_hard_negatives",
    "event_funnel_conversion",
    "event_cohort_retention",
    "doc_hybrid_rrf",
    "corpus_quality_stump",
    "event_decayed_engagement",
    "event_type_transitions",
    "embedding_label_propagation",
    "corpus_source_distinctive_terms",
    "event_funnel_windowed",
    "embedding_ann_recall",
    "event_volume_trend",
    "event_cusum_changepoint",
    "event_conversion_attribution",
    "mm_real_jpeg_color",
)


def test_round4_tier_a_leads():
    assert list(REGISTRY)[: len(TIER_A_R4)] == list(TIER_A_R4)


def test_round4_window_refreshes_stale_evidence():
    """The ~50-row driver window must hold: the tier-A rows (red-row
    fixes + round-1-only evidence + the new PNG gate), the churn
    canaries, and otherwise only entries whose NEWEST driver row is
    round 2 (rotating their evidence forward). Everything with a green
    round-3 row is the freshest already and sits below the fold —
    except the canaries, whose code changed this round."""
    names = list(REGISTRY)
    head, tail = set(names[:50]), names[50:]
    assert set(TIER_A_R4) <= head
    assert set(CHURN_CANARIES_R4) <= head
    # head slots beyond tier A + canaries go to r2-verified entries
    for n in names[:50]:
        if n in TIER_A_R4 or n in CHURN_CANARIES_R4 or n in NEW_GATES_R4:
            continue
        assert n in _R2_VERIFIED, f"{n} spends a window slot without need"
    # every below-fold entry either has a green r3 row, keeps an r2
    # row (at most one round stale), or is a rows-only production
    # twin whose algorithm is oracle-covered elsewhere
    rows_only_twins = {
        "corpus_token_cardinality_approx",
        "minhash_lsh_candidates",
        "minhash_incremental",
        "simhash_signatures",
        "simhash_near_dups",
    }
    for n in tail:
        assert n in _R3_GREEN or n in _R2_VERIFIED or n in rows_only_twins, n


# The 48 green rows of CORRECTNESS_r03.json (round-3 driver window
# minus the two red rows fixed this round).
_R3_GREEN = frozenset(
    {
        "minhash_incremental_md5", "embedding_pq_topk", "embedding_ivfpq_topk",
        "embedding_lsh_near_dups", "embedding_kmeans_clusters",
        "embedding_semantic_dedup", "doc_unigram_stats", "corpus_mixture_rebalance",
        "doc_pii_scrub", "corpus_token_cardinality_bound",
        "doc_length_quantiles_approx_bound", "mm_real_decode", "mm_real_audio",
        "mm_real_frames", "doc_exact_decontamination", "embedding_knn_label_probe",
        "corpus_prep_report", "fuzzy_name_matches", "snapshot_diff_orders",
        "embedding_pca_covariance", "doc_bpe_merges", "doc_bpe_token_stats",
        "doc_bpe_vocab", "minhash_lsh_candidates_md5", "simhash_near_dups_md5",
        "doc_decontamination", "doc_dedup_clusters", "embedding_topk_qcosine",
        "embedding_topk_mips", "embedding_lsh_topk", "embedding_ivf_topk",
        "doc_token_stats", "doc_lang_id", "doc_quality_score",
        "doc_repetition_stats", "doc_train_split", "doc_top_terms",
        "doc_rolling_fingerprint", "corpus_mixture_report",
        "embedding_cosine_near_dups", "minhash_signatures_md5",
        "simhash_signatures_md5", "per_day_counts", "double_entry_ledger",
        "multi_join_revenue", "topk_per_group", "union_activity_timeline",
        "ngram_jaccard_near_dups",
    }
)


# First 50 rows of CORRECTNESS_r02.json (the round-2 driver window).
_R2_VERIFIED = frozenset(
    {
        "chain_classification_counts", "chain_crc_balances", "chain_current_trust",
        "chain_eth_transfer_stats", "chain_hub_transfers_per_day",
        "chain_safe_eth_transfers", "chain_org_signups", "chain_total_minted",
        "chain_erc20_balances", "chain_timeline_counts", "chain_accepted_crc",
        "chain_alive_accounts", "chain_dead_accounts", "chain_capacity_graph",
        "chain_capacity_changes", "chain_get_capacity", "chain_signups_per_day",
        "chain_balances_by_safe", "chain_crc_minting", "chain_formatted_transfers",
        "chain_trust_reachability", "mm_decode_stats", "mm_thumbnail_geometry",
        "mm_frame_sample", "mm_feature_vectors", "mm_feature_hist",
        "doc_quota_sample", "pricing_summary", "broadcast_join_agg",
        "dedup_first_seen", "completeness_gate", "anti_join_inactive",
        "semi_join_parts", "latest_event_per_user", "version_disambiguation",
        "tumbling_window_stats", "sliding_window_stats", "event_sessionization",
        "asof_latest_purchase", "range_join_active_sessions", "gap_detection",
        "stream_reassembly_join", "filtered_projection", "json_payload",
        "membership_collect", "rollup_revenue_hierarchy", "profile_orders",
        "salted_join_segment_totals", "doc_fingerprint_dedup",
        "ngram_jaccard_near_dups",
    }
)


def test_rows_only_variants_behind_their_oracled_twins():
    """Queries without a DuckDB oracle give the weakest driver signal;
    each must sit behind its md5-oracled twin so the algorithm gets an
    oracle row before the production-hash variant spends a slot."""
    names = list(REGISTRY)
    with_oracle = set(oracles())
    twins = {
        "minhash_lsh_candidates": "minhash_lsh_candidates_md5",
        "minhash_incremental": "minhash_incremental_md5",
        "simhash_signatures": "simhash_signatures_md5",
        "simhash_near_dups": "simhash_near_dups_md5",
        "corpus_token_cardinality_approx": "corpus_token_cardinality",
    }
    # mm_feature_vectors and embedding_pca_project are rows-only by
    # nature (opaque feature bytes / driver-side eigendecomposition),
    # not production twins of an oracled gate.
    exempt = {"mm_feature_vectors", "embedding_pca_project"}
    rows_only = [n for n in names if n not in with_oracle and n not in exempt]
    assert sorted(rows_only) == sorted(twins)
    for variant, twin in twins.items():
        assert names.index(variant) > names.index(twin), (variant, twin)
