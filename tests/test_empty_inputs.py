"""Degenerate-input sweep: every family of operators must handle an
EMPTY (but correctly-typed) input — a normal state for a shard before
first promote, a filtered-out partition, or a fresh index — by
returning an empty result, not crashing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>, label int")


def test_dedup_family_on_empty(spark, empty_docs):
    from blockchain_indexer_spark.operators.dedup import (
        decontaminate,
        exact_dup_clusters,
        minhash_index_update,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_candidates,
    )

    assert exact_dup_clusters(empty_docs, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(empty_docs, "doc_id", "text").count() == 0
    assert minhash_lsh_candidates(empty_docs, "doc_id", "text").count() == 0
    assert simhash_candidates(empty_docs, "doc_id", "text").count() == 0
    rows, pairs = minhash_index_update(None, empty_docs, "doc_id", "text")
    assert rows.count() == 0 and pairs.count() == 0
    # empty eval set: nothing is contaminated, corpus side intact
    some = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    out = decontaminate(some, empty_docs).collect()
    assert len(out) == 1 and out[0]["n_common_eval"] == 0


def test_text_functions_on_empty(spark, empty_docs):
    from blockchain_indexer_spark.functions.text import (
        bpe_token_count,
        token_count,
    )

    out = empty_docs.select(token_count("text"), bpe_token_count("text"))
    assert out.count() == 0


def test_similarity_family_on_empty_queries(spark, empty_emb, sf_dir):
    from blockchain_indexer_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from blockchain_indexer_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assert brute_force_topk(emb, empty_emb, k=3).count() == 0
    assert lsh_topk(emb, empty_emb, k=3).count() == 0


def test_profile_on_empty(spark, empty_docs):
    from blockchain_indexer_spark.operators.profile import profile

    rows = profile(empty_docs).collect()
    assert len(rows) == len(empty_docs.columns)
    for r in rows:
        assert r["n_rows"] == 0
        assert r["n_nulls"] == 0  # NOT NULL (review finding: SUM over 0 rows)


def test_temporal_joins_on_empty(spark):
    from blockchain_indexer_spark.operators.asof import asof_join
    from blockchain_indexer_spark.operators.range_join import interval_point_join

    left = spark.createDataFrame([], "id long, ts long, v double")
    right = spark.createDataFrame([], "id long, rts long, w double")
    assert asof_join(left, right, on="id", left_ts="ts", right_ts="rts").count() == 0
    points = spark.createDataFrame([], "pid long, ts long")
    spans = spark.createDataFrame([], "sid long, start long, end long")
    assert (
        interval_point_join(
            points, spans, point_col="ts", start_col="start", end_col="end",
            bucket_width=1000,
        ).count()
        == 0
    )


def test_sampling_and_packing_on_empty(spark, empty_docs):
    from blockchain_indexer_spark.operators.packing import pack_chunks
    from blockchain_indexer_spark.operators.sampling import hash_split

    assert hash_split(empty_docs, "doc_id").count() == 0
    assert pack_chunks(empty_docs, "doc_id", "source", F.col("n_chars")).count() == 0


def test_round9_banked_operators_on_empty(spark, empty_docs, empty_emb):
    """Round-10-shelf operators over empty (typed) inputs: empty
    micro-batches, empty indexes, empty runs/qrels — all normal
    production states, none may crash."""
    from blockchain_indexer_spark.operators.dedup import (
        minhash_union_calibration,
        split_leakage_finalize,
        split_leakage_index_update,
    )
    from blockchain_indexer_spark.operators.similarity import (
        opq_rotate,
        pq_distortion,
    )
    from blockchain_indexer_spark.operators.textprep import retrieval_eval

    empty_split = empty_docs.withColumn("split", F.lit("train"))
    # bootstrap from an EMPTY first batch, then feed a real one
    tr, ev, lk = split_leakage_index_update(
        None, empty_split, "doc_id", "text", "split"
    )
    assert tr.count() == 0 and ev.count() == 0 and lk.count() == 0
    real = spark.createDataFrame(
        [
            (1, "a b c d e f g h i", "train"),
            (2, "a b c d e f g h j", "val"),
        ],
        "doc_id long, text string, split string",
    )
    tr2, ev2, lk2 = split_leakage_index_update(
        (tr, ev), real, "doc_id", "text", "split"
    )
    assert lk2.count() == 1  # the empty index contributed nothing, silently
    out = split_leakage_finalize(real, ev2, lk2, "doc_id", "split").collect()
    assert len(out) == 1 and out[0]["leaked"]
    # finalize over fully-empty state
    assert (
        split_leakage_finalize(
            empty_split, ev, lk, "doc_id", "split"
        ).count()
        == 0
    )

    assert minhash_union_calibration(empty_docs, "doc_id", "text").count() == 0

    rotated = opq_rotate(empty_emb, "vec_id", "embedding")
    assert rotated.count() == 0
    with pytest.raises(ValueError, match="corpus smaller"):
        # pq codebooks cannot seed from an empty corpus: loud, not silent
        pq_distortion(rotated, "vec_id", "embedding", m=16, n_codes=32, scale=1).count()

    empty_run = spark.createDataFrame([], "query_id long, doc_id long, rank long")
    empty_qrels = spark.createDataFrame([], "query_id long, doc_id long")
    assert retrieval_eval(empty_run, empty_qrels, k=5).count() == 0
    # qrels without a run: zero-valued rows per judged query, not empty
    qrels = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    rows = retrieval_eval(empty_run, qrels, k=5).collect()
    assert len(rows) == 1 and rows[0]["n_ret"] == 0 and rows[0]["rr_nano"] == 0
