"""Query library: every SURVEY.md §2 operator shape as a registered
(Spark builder, DuckDB oracle SQL) pair over the driver testdata.

Registration order is rebuilt into an explicit PRIORITY order below.
Why: the driver's correctness harness iterates ``queries()`` in dict
order under a budget — round 1 recorded exactly the first 50 registered
entries and silently dropped the rest (all 16 ``chain_*`` reference-
semantics gates, the 5 ``mm_*`` gates and ``doc_quota_sample`` — see
VERDICT.md "Next round" #1). Whatever the budget is (row cap or wall
clock), the front of the dict is what gets driver-verified, so the
order here is a deliberate ranking:

1. previously-unverified reference-semantics gates (chain_*, mm_*),
2. one gate per distinct §2 operator shape / LLM-pipeline component,
3. gates whose §2 ids are already covered by an earlier chain twin,
4. rows-only production variants (no DuckDB oracle — weakest signal).
"""

from blockchain_indexer_spark.plans.registry import REGISTRY, Query, register

# Importing the modules populates REGISTRY via their register() calls.
from blockchain_indexer_spark.plans import relational as _relational  # noqa: E402,F401
from blockchain_indexer_spark.plans import llmops as _llmops  # noqa: E402,F401
from blockchain_indexer_spark.plans import chain as _chain  # noqa: E402,F401
from blockchain_indexer_spark.plans import multimodal as _multimodal  # noqa: E402,F401

#: Driver-facing iteration order (highest verification value first).
#:
#: Round-3 rotation (VERDICT r2 "Next round" #1): the driver records
#: exactly the first 50 entries per round. Round 2's window covered the
#: 50 entries that now sit at the BACK; the front is now (a) the 12
#: queries that have never had a driver row, (b) new round-3 gates,
#: (c) the 31 queries whose only driver row is round 1, (d) a small
#: chain/mm sentinel set, so after this round every registered query
#: has a driver row from round 2 or round 3.
PRIORITY = (
    # -- tier A: never driver-verified (no r1/r2 row) ------------------
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
    # -- tier A: new round-3 gates -------------------------------------
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
    # -- tier B: driver row is round 1 only (pre-refactor code) --------
    "minhash_lsh_candidates_md5",
    "simhash_near_dups_md5",
    "doc_decontamination",
    "doc_dedup_clusters",
    "embedding_topk_qcosine",
    "embedding_topk_mips",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality_score",
    "doc_repetition_stats",
    "doc_train_split",
    "doc_top_terms",
    "doc_rolling_fingerprint",
    # (corpus_token_cardinality moved below the fold: its exact
    # computation runs INSIDE the tier-A corpus_token_cardinality_bound
    # gate, which compares exact vs HLL — the only r1-only query whose
    # correctness signal is fully embedded in an in-window gate, so it
    # yields its slot to the fuzzy_name_matches round-3 gate)
    "corpus_mixture_report",
    "embedding_cosine_near_dups",
    "minhash_signatures_md5",
    "simhash_signatures_md5",
    "per_day_counts",
    # (scalar_total yielded its slot to doc_bpe_vocab: it is a trivial
    # single-agg whose shape is identically exercised by the in-window
    # chain_total_minted r2 row, while doc_bpe_vocab is a new round-3
    # oracled gate with no driver row at all)
    "double_entry_ledger",
    "multi_join_revenue",
    "topk_per_group",
    "union_activity_timeline",
    # (the four rows-only production variants yielded their slots to
    # the round-3 PCA/BPE gates: a rows-only driver row is the weakest
    # signal, and each algorithm's correctness is carried by its
    # in-window md5-oracled twin — they now sit below the fold)
    # -- tier C: one r2-verified sentinel (regression canary for the
    #    round-3 dedup rewrite — the heaviest code churn this round) --
    "ngram_jaccard_near_dups",
    # ------------------------------------------------------------------
    # Below the ~50-row driver window. The r2 sentinels yielded their
    # slots to the eight new round-3 entries; the round-3 dedup rewrite
    # keeps a canary above via ngram_jaccard_near_dups (plus
    # doc_dedup_clusters and the simhash md5 gates in tier B), and the
    # chain spine runs every round via entry() itself.
    # corpus_token_cardinality's and doc_length_quantiles' exact
    # computations run INSIDE their tier-A _bound gates, so they (and
    # the rows-only approx twin, which must stay behind its oracled
    # sibling) sit just below the fold.
    "corpus_token_cardinality",
    "corpus_token_cardinality_approx",
    "doc_length_quantiles",
    "chain_crc_balances",
    "chain_classification_counts",
    "mm_decode_stats",
    "doc_fingerprint_dedup",
    "stream_reassembly_join",
    "chain_current_trust",
    "chain_eth_transfer_stats",
    "chain_hub_transfers_per_day",
    "chain_safe_eth_transfers",
    "chain_org_signups",
    "chain_total_minted",
    "chain_erc20_balances",
    "chain_timeline_counts",
    "chain_accepted_crc",
    "chain_alive_accounts",
    "chain_dead_accounts",
    "chain_capacity_graph",
    "chain_capacity_changes",
    "chain_get_capacity",
    "chain_signups_per_day",
    "chain_balances_by_safe",
    "chain_crc_minting",
    "chain_formatted_transfers",
    "chain_trust_reachability",
    "mm_thumbnail_geometry",
    "mm_frame_sample",
    "mm_feature_vectors",
    "mm_feature_hist",
    "doc_quota_sample",
    "pricing_summary",
    "broadcast_join_agg",
    "dedup_first_seen",
    "completeness_gate",
    "anti_join_inactive",
    "semi_join_parts",
    "latest_event_per_user",
    "version_disambiguation",
    "tumbling_window_stats",
    "sliding_window_stats",
    "event_sessionization",
    "asof_latest_purchase",
    "range_join_active_sessions",
    "gap_detection",
    "filtered_projection",
    "json_payload",
    "membership_collect",
    "rollup_revenue_hierarchy",
    "profile_orders",
    "salted_join_segment_totals",
    "scalar_total",
    "minhash_lsh_candidates",
    "minhash_incremental",
    "simhash_signatures",
    "simhash_near_dups",
)


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    # Anything registered but not ranked keeps its original relative
    # order at the end — new queries must be slotted into PRIORITY.
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["PRIORITY", "REGISTRY", "Query", "register"]
