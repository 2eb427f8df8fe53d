"""Decision-stump split finding (operators/tree.py): exact Gini
arithmetic on hand-computed fixtures, NULL hygiene, determinism."""

from __future__ import annotations

from blockchain_indexer_spark.operators.tree import best_stump, split_candidates

NANO = 1_000_000_000


def test_perfectly_separable_feature_wins_with_zero_impurity(spark):
    # f1 separates perfectly at 2.0; f2 is useless (same distribution
    # both sides)
    rows = [
        (1.0, 10.0, True), (2.0, 20.0, True),
        (3.0, 10.0, False), (4.0, 20.0, False),
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y boolean")
    out = {r["feature"]: r for r in best_stump(df, ["f1", "f2"], "y").collect()}
    assert out["f1"]["rank"] == 1
    assert out["f1"]["threshold"] == 2.0
    assert out["f1"]["score_nano"] == 0  # pure leaves
    assert out["f1"]["predict_left"] is True
    assert out["f1"]["predict_right"] is False
    assert out["f2"]["score_nano"] > 0


def test_hand_computed_gini_score(spark):
    # split at 1.0: L = {+,+} pure, R = {+,-,-}: score =
    # 2*(2*0/2 + 1*2/3) = 4/3 -> floor(1e9*4/3) = 1333333333
    rows = [(0.0, True), (1.0, True), (2.0, True), (3.0, False), (4.0, False)]
    df = spark.createDataFrame(rows, "f double, y boolean")
    cand = {r["threshold"]: r for r in split_candidates(df, ["f"], "y").collect()}
    assert set(cand) == {0.0, 1.0, 2.0, 3.0}  # max value excluded
    assert cand[1.0]["score_nano"] == 1333333333
    assert cand[2.0]["score_nano"] == 0  # the perfect split
    best = best_stump(df, ["f"], "y").collect()[0]
    assert best["threshold"] == 2.0 and best["rank"] == 1


def test_null_features_and_labels_are_ignored(spark):
    rows = [
        (1.0, True), (2.0, True), (None, True), (3.0, None), (4.0, False),
    ]
    df = spark.createDataFrame(rows, "f double, y boolean")
    cand = split_candidates(df, ["f"], "y").collect()
    # only rows (1,T),(2,T),(4,F) count -> totals n=3, p=2
    for r in cand:
        assert r["n_left"] + r["n_right"] == 3
        assert r["pos_left"] + r["pos_right"] == 2


def test_tie_breaks_on_threshold_then_feature(spark):
    # two thresholds with identical score: smaller threshold wins
    rows = [(1.0, True), (2.0, True), (3.0, False), (4.0, False)]
    df = spark.createDataFrame(rows, "f double, y boolean")
    cand = sorted(
        split_candidates(df, ["f"], "y").collect(),
        key=lambda r: (r["score_nano"], r["threshold"]),
    )
    best = best_stump(df, ["f"], "y").collect()[0]
    assert best["threshold"] == cand[0]["threshold"]
