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


# The 12 queries that had no driver row in rounds 1-2 (VERDICT r2
# "What's missing" #1) — round 3 rotates them to the very front.
NEVER_DRIVER_VERIFIED = (
    "minhash_incremental_md5",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "embedding_lsh_near_dups",
    "embedding_kmeans_clusters",
    "embedding_semantic_dedup",
    "doc_unigram_stats",
    "doc_chunk_packing",
    "corpus_mixture_rebalance",
    "doc_pii_scrub",
    "corpus_token_cardinality_bound",
    "doc_length_quantiles_approx_bound",
)


def test_never_verified_gates_lead():
    assert list(REGISTRY)[:12] == list(NEVER_DRIVER_VERIFIED)


def test_round3_window_covers_stale_evidence():
    """Everything whose newest driver row predates round 2 — the 12
    never-verified queries, this round's new gates, and the 31 queries
    whose only row is round 1 — must sit inside the driver's ~50-row
    recording window; the back is all round-2-verified."""
    head = set(list(REGISTRY)[:50])
    round3_new_gates = {
        "mm_real_decode",
        "mm_real_audio",
        "mm_real_frames",
        "doc_exact_decontamination",
        "embedding_knn_label_probe",
        "corpus_prep_report",
        "fuzzy_name_matches",
        "snapshot_diff_orders",
        "embedding_pca_covariance",
        "embedding_pca_project",
        "doc_bpe_merges",
        "doc_bpe_token_stats",
        "doc_bpe_vocab",
    }
    # Excused from the window: the first three's exact computations run
    # inside their in-window _bound gates (which compare exact vs
    # sketch), and the rows-only approx twin must stay behind its
    # oracled sibling; the four rows-only production twins yielded
    # their slots to the round-3 PCA/BPE gates — a rows-only driver
    # row is the weakest signal and each algorithm's correctness rides
    # its in-window md5-oracled twin.
    excused = {
        "corpus_token_cardinality",
        "corpus_token_cardinality_approx",
        "doc_length_quantiles",
        "minhash_lsh_candidates",
        "minhash_incremental",
        "simhash_signatures",
        "simhash_near_dups",
        # yielded its slot to doc_bpe_vocab (the last oracled gate
        # with no driver row in any round): a trivial single-agg whose
        # shape the r2-verified chain_total_minted row already covers
        "scalar_total",
    }
    stale_or_new = [
        n
        for n in REGISTRY
        if n not in excused
        and (
            n in NEVER_DRIVER_VERIFIED
            or n in round3_new_gates
            or n not in _R2_VERIFIED
        )
    ]
    assert all(n in head for n in stale_or_new), [n for n in stale_or_new if n not in head]
    # the round-3 dedup rewrite keeps in-window coverage through
    # doc_dedup_clusters (ngram_jaccard_pairs) + the simhash md5 gates
    assert {"doc_dedup_clusters", "simhash_near_dups_md5"} <= head


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
