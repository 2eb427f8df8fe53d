"""Bigram-LM fluency scoring (operators/lm.py): hand-computed counts
on a tiny corpus, coverage/NULL contracts, and the float-perplexity
twin against a numpy reference."""

import math

import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.lm import (
    bigram_counts,
    bigram_fluency,
    bigram_log_perplexity,
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


@pytest.fixture(scope="module")
def tiny(spark):
    # train = the corpus itself in these tests (train == docs)
    return _toks(
        spark,
        [
            (0, ["a", "b", "a", "b"]),   # bigrams: ab, ba, ab
            (1, ["a", "b", "c"]),        # ab, bc
            (2, ["z"]),                  # no bigrams
            (3, []),                     # empty
        ],
    )


def test_bigram_counts_by_hand(spark, tiny):
    c2, c1, v = bigram_counts(tiny)
    got = {(r["w1"], r["w2"]): r["c2"] for r in c2.collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    got1 = {r["w1"]: r["c1"] for r in c1.collect()}
    assert got1 == {"a": 3, "b": 2}
    assert v.collect()[0]["_V"] == 4  # a b c z


def test_fluency_by_hand(spark, tiny):
    out = {r["doc_id"]: r for r in bigram_fluency(tiny, tiny).collect()}
    assert set(out) == {0, 1, 2, 3}  # every doc present
    # V=4; p(ab)=(3+1)/(3+4)=4/7, p(ba)=(1+1)/(2+4)=2/6, p(bc)=(1+1)/(2+4)
    ab = math.floor(1e12 * (4 / 7))
    ba = math.floor(1e12 * (2 / 6))
    assert out[0]["n_bigrams"] == 3 and out[0]["n_oov"] == 0
    assert out[0]["fluency_nano"] == (ab + ba + ab) // 3
    assert out[1]["fluency_nano"] == (ab + ba) // 2
    for d in (2, 3):  # no bigrams → zeros, not NULL/missing
        assert out[d]["n_bigrams"] == 0
        assert out[d]["n_oov"] == 0
        assert out[d]["fluency_nano"] == 0


def test_oov_scoring_on_held_out_docs(spark, tiny):
    docs = _toks(spark, [(9, ["q", "r", "a", "b"])])  # qr, ra unseen; ab seen
    row = bigram_fluency(docs, tiny).collect()[0]
    assert row["n_bigrams"] == 3
    assert row["n_oov"] == 2
    # unseen-context bigrams score (0+1)/(0+4)
    unseen = math.floor(1e12 * (1 / 4))
    ab = math.floor(1e12 * (4 / 7))
    assert row["fluency_nano"] == (unseen + unseen + ab) // 3


def test_fluent_docs_outscore_shuffled_ones(spark):
    # a corpus with one dominant phrasing; a doc following it scores
    # above a doc of the same tokens in scrambled order
    train = _toks(spark, [(i, ["the", "cat", "sat"]) for i in range(20)])
    docs = _toks(spark, [(100, ["the", "cat", "sat"]), (101, ["sat", "the", "cat"])])
    out = {r["doc_id"]: r["fluency_nano"] for r in bigram_fluency(docs, train).collect()}
    assert out[100] > out[101]


def test_log_perplexity_matches_numpy(spark, tiny):
    docs = _toks(spark, [(0, ["a", "b", "a", "b"])])
    row = bigram_log_perplexity(docs, tiny).collect()[0]
    # mean log2 p over [4/7, 2/6, 4/7]
    lps = [math.log2(4 / 7), math.log2(2 / 6), math.log2(4 / 7)]
    want = 2.0 ** (-sum(lps) / 3)
    assert row["n_bigrams"] == 3
    assert abs(row["perplexity"] - want) < 1e-9


def test_null_tokens_row_scores_zero(spark, tiny):
    docs = spark.createDataFrame(
        [(7, None)], "doc_id long, toks array<string>"
    )
    row = bigram_fluency(docs, tiny).collect()[0]
    assert (row["n_bigrams"], row["n_oov"], row["fluency_nano"]) == (0, 0, 0)
