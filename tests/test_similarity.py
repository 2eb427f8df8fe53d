"""Similarity-search operators: exact baseline sanity + LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from blockchain_indexer_spark.sources.parquet import load_table


def test_brute_force_topk_shape_and_self_exclusion(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = brute_force_topk(emb, queries, k=3).toPandas()
    n_queries = queries.count()
    assert len(out) == n_queries * 3
    assert (out["query_id"] != out["neighbor_id"]).all()
    assert set(out["rank"]) == {1, 2, 3}


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = lsh_topk(emb, queries, k=5).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"LSH recall {recall} too low"


def test_ivf_recall_vs_exact_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3).toPandas()
    assert (approx["query_id"] != approx["neighbor_id"]).all()
    assert approx.groupby("query_id")["rank"].max().le(5).all()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"IVF recall {recall} too low"
    # centroid training is sample-based and RNG-free — rebuild must
    # produce identical results
    again = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3).toPandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_lsh_near_dup_pairs_precision_and_recall(spark):
    """The banded pair path must be a strict subset of the exact
    all-pairs baseline with identical scores (precision 1), and catch
    nearly every STRONG near-dup — the hyperplane collision law gives
    P[share a band] ≈ 95% at cosine 0.9 for the 16-plane/4-band
    defaults, decaying toward the 0.3 threshold boundary."""
    from blockchain_indexer_spark.operators.dedup import cosine_near_dup_pairs
    from blockchain_indexer_spark.operators.similarity import lsh_near_dup_pairs

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.3).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in lsh_near_dup_pairs(emb, "vec_id", "embedding", dim=64, threshold=0.3).collect()
    }
    assert lsh, "no candidate pairs survived"
    # precision 1: every LSH pair is an exact pair with the same score
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)
    # recall on strong pairs
    strong = {k for k, c in exact.items() if c >= 0.8}
    if strong:
        caught = len(strong & set(lsh)) / len(strong)
        assert caught >= 0.8, f"strong-pair recall {caught:.2f}"


def test_pq_recall_vs_exact_l2_and_determinism(spark, sf_dir):
    from blockchain_indexer_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5, metric="quantized_neg_l2").toPandas()
    approx = pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=50).toPandas()
    assert (approx["query_id"] != approx["neighbor_id"]).all()
    assert approx.groupby("query_id")["rank"].max().le(5).all()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"PQ recall {recall} too low"
    # data-seeded codebook is RNG-free: rebuild must be identical
    again = pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=50).toPandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    from blockchain_indexer_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5, metric="quantized_neg_l2").toPandas()
    approx = ivf_pq_topk(emb, queries, k=5, n_probe=6, rerank=50).toPandas()
    assert (approx["query_id"] != approx["neighbor_id"]).all()
    assert approx.groupby("query_id")["rank"].max().le(5).all()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # IVF pruning caps recall below plain PQ (6/16 cells probed) —
    # on this near-uniform synthetic corpus the coarse cells carry
    # little signal, so the floor is deliberately modest
    assert recall >= 0.35, f"IVF-PQ recall {recall} too low"
    # fully data-seeded (coarse centroids + residual codebook): no RNG
    again = ivf_pq_topk(emb, queries, k=5, n_probe=6, rerank=50).toPandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivfpq_probe_widening_monotone(spark, sf_dir):
    from blockchain_indexer_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    exact = brute_force_topk(emb, queries, k=5, metric="quantized_neg_l2").toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))

    def recall(n_probe):
        out = ivf_pq_topk(emb, queries, k=5, n_probe=n_probe, rerank=100).toPandas()
        pairs = set(zip(out["query_id"], out["neighbor_id"]))
        return len(exact_pairs & pairs) / len(exact_pairs)

    # probing every cell with a wide shortlist approaches the PQ-only
    # ranking; more probes never hurt recall on a fixed shortlist
    assert recall(16) >= recall(4)
