"""Batch perceptron (operators/linear.py): hand-replayed epochs on a
tiny corpus, convergence on separable data, and the scoring contract."""

import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.linear import (
    hashed_features,
    perceptron_score,
    perceptron_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, y long, toks array<string>")


@pytest.fixture(scope="module")
def separable(spark):
    # class +1 speaks {good, fine}, class -1 speaks {bad, awful} —
    # linearly separable in any hashed space without bucket collisions
    rows = []
    for i in range(10):
        rows.append((i, 1, ["good", "fine", "good"]))
        rows.append((100 + i, -1, ["bad", "awful"]))
    return _docs(spark, rows)


def test_hashed_features_are_counts(spark):
    feats = hashed_features(_docs(spark, [(1, 1, ["a", "b", "a"])]), n_buckets=1)
    # one bucket → all tokens collapse: a single (doc, bucket 0, cnt 3) row
    [r] = feats.collect()
    assert (r["doc_id"], r["bucket"], r["cnt"]) == (1, 0, 3)


def test_epoch1_weights_are_class_difference_counts(spark, separable):
    feats = hashed_features(separable, n_buckets=64)
    w1 = {r["bucket"]: r["weight"] for r in perceptron_train(feats, epochs=1, n_buckets=64).collect()}
    # w=0 → every doc misclassified → w1[b] = Σ_docs y · cnt_b; verify
    # against a direct aggregation of the same feature frame
    want = {
        r["bucket"]: r["w"]
        for r in feats.groupBy("bucket").agg(F.sum(F.col("y") * F.col("cnt")).alias("w")).collect()
    }
    assert all(w1[b] == want.get(b, 0) for b in w1)
    assert len(w1) == 64  # dense table, untouched buckets present as 0


def test_converges_and_scores_separable_data(spark, separable):
    feats = hashed_features(separable, n_buckets=64)
    w = perceptron_train(feats, epochs=3, n_buckets=64)
    scored = perceptron_score(feats, w).collect()
    assert len(scored) == 20
    assert all(r["correct"] for r in scored)
    assert all(r["y"] * r["margin"] > 0 for r in scored)


def test_margin_zero_counts_incorrect(spark):
    # a doc whose tokens all hash to weight-0 buckets has margin 0 —
    # the trainer's rule treats it as misclassified, and correct=False
    docs = _docs(spark, [(1, 1, ["good"]), (2, -1, ["bad"])])
    feats = hashed_features(docs, n_buckets=64)
    w0 = perceptron_train(feats, epochs=0, n_buckets=64)  # all-zero weights
    out = {r["doc_id"]: r for r in perceptron_score(feats, w0).collect()}
    assert out[1]["margin"] == 0 and not out[1]["correct"]
    assert out[2]["margin"] == 0 and not out[2]["correct"]


def test_training_is_deterministic(spark, separable):
    feats = hashed_features(separable, n_buckets=64)
    a = sorted(map(tuple, perceptron_train(feats, epochs=2, n_buckets=64).collect()))
    b = sorted(map(tuple, perceptron_train(feats, epochs=2, n_buckets=64).collect()))
    assert a == b


def test_margin_calibration_tiles_and_rates(spark):
    """12 hand-scored docs into 4 tiles of 3: NTILE assigns by margin
    order (ties by doc_id), and per-tile pos/correct rates come out as
    the exact single divisions."""
    from blockchain_indexer_spark.operators.linear import margin_calibration

    # margins -5..6, label +1 iff margin > 0 except doc 11 mislabeled
    rows = [
        (i, 1 if (i - 5 > 0 and i != 11) else -1, i - 5) for i in range(12)
    ]
    scored = spark.createDataFrame(rows, "doc_id long, y long, margin long")
    out = {r["tile"]: r for r in margin_calibration(scored, n_buckets=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(r["n_docs"] == 3 for r in out.values())
    # tile 1 = margins -5,-4,-3 (all y=-1, correct: y*margin>0 → all)
    assert out[1]["n_pos"] == 0 and out[1]["n_correct"] == 3
    assert (out[1]["min_margin"], out[1]["max_margin"]) == (-5, -4 + 1)
    # tile 2 = margins -2,-1,0: margin-0 doc counts incorrect
    assert out[2]["n_correct"] == 2 and out[2]["pos_rate"] == 0.0
    # tile 4 = margins 4,5,6: doc 11 mislabeled -1 → incorrect
    assert out[4]["n_pos"] == 2 and out[4]["n_correct"] == 2
    assert out[4]["pos_rate"] == 2.0 / 3.0
    assert out[4]["correct_rate"] == 2.0 / 3.0


def test_agreement_kappa_by_hand(spark):
    """Hand-computed 2x2: cells pp=4, pn=1, np=2, nn=3 over n=10 —
    agree=7, marginals r1=5,r0=5,c1=6,c4... chance = 5*6 + 5*4 = 50;
    kappa = (10*7 - 50) / (100 - 50) = 0.4."""
    from blockchain_indexer_spark.operators.linear import agreement_kappa

    rows = (
        [(True, True)] * 4 + [(True, False)] * 1
        + [(False, True)] * 2 + [(False, False)] * 3
    )
    df = spark.createDataFrame(rows, "pred_a boolean, pred_b boolean")
    out = agreement_kappa(df).collect()[0]
    assert out["n_docs"] == 10 and out["n_agree"] == 7
    assert (out["n_pos_pos"], out["n_pos_neg"], out["n_neg_pos"], out["n_neg_neg"]) == (4, 1, 2, 3)
    assert out["kappa"] == (10 * 7 - 50) / (100 - 50)


def test_agreement_kappa_degenerate_margin_is_zero(spark):
    """Both classifiers always positive: pe = 1, denominator 0 —
    kappa reports 0 instead of dividing by zero."""
    from blockchain_indexer_spark.operators.linear import agreement_kappa

    df = spark.createDataFrame([(True, True)] * 5, "pred_a boolean, pred_b boolean")
    out = agreement_kappa(df).collect()[0]
    assert out["n_agree"] == 5 and out["kappa"] == 0.0
