"""Distributed decision-stump training: exact best-split finding via
cumulative statistics — the histogram trick that scales tree learning
(XGBoost/LightGBM's core): instead of testing each candidate split
against the data (O(rows x candidates)), aggregate per-(feature,
value) label counts ONCE, then a cumulative window turns every
distinct value into a fully-evaluated split in O(distinct values).

``best_stump`` fits a depth-1 tree (one feature, one threshold,
predict-majority-per-side) minimizing weighted Gini impurity:

    score = nL * gini(L) + nR * gini(R),   gini = 2 p (n-p) / n^2
          = 2 * [ pL(nL-pL)/nL + pR(nR-pR)/nR ]

evaluated per candidate as ONE double expression over exact BIGINT
counts (products stay exact in double while pL*(nL-pL)*nR < 2^53,
i.e. labeled rows <= ~2e5 per stump; beyond that the same plan runs
with per-side divisions first — the documented precision trade, same
class as ks_drift's integer-range note), floor-quantized to nano
units BEFORE the argmin so the chosen split is engine-reproducible.
Ties break (score, feature, threshold) ascending.

This is the supervised sibling of operators/linear.py's perceptron:
the perceptron learns a dense linear separator by epochs; the stump
is the boosting/cascade base learner and the standard "is this
feature predictive at all" probe a corpus-quality pipeline runs
before committing to a filter.

Scale shape (100 TB): one groupBy per feature over (value) — map-side
combinable to |distinct values| rows; the cumulative window and the
argmin run on the post-agg frame (corpus-size independent). k
features = k such aggs unioned; every corpus-sized pass is a narrow
(feature value, label) projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NANO = 1_000_000_000.0


def split_candidates(
    df: DataFrame,
    features: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Every fully-evaluated candidate split: one row per (feature,
    threshold) with left/right counts and the weighted-Gini score.

    ``label_col`` must be boolean-like (cast to 1/0); rows with NULL
    feature value or NULL label are ignored for that feature.
    Thresholds are the distinct feature values; the split is
    value <= threshold, and the max value (empty right side) is
    excluded. Returns (feature, threshold, n_left, pos_left, n_right,
    pos_right, score_nano).
    """
    if not features:
        raise ValueError("need at least one feature")
    parts = []
    for feat in features:
        base = (
            df.select(
                F.col(feat).cast("double").alias("_v"),
                F.col(label_col).cast("boolean").cast("long").alias("_y"),
            )
            .filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
            .groupBy("_v")
            .agg(
                F.count("*").cast("long").alias("_n"),
                F.sum("_y").cast("long").alias("_p"),
            )
        )
        w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
        cum = (
            base.withColumn("_nl", F.sum("_n").over(w).cast("long"))
            .withColumn("_pl", F.sum("_p").over(w).cast("long"))
            .crossJoin(
                F.broadcast(
                    base.agg(
                        F.sum("_n").cast("long").alias("_nt"),
                        F.sum("_p").cast("long").alias("_pt"),
                    )
                )
            )
            .filter(F.col("_nl") < F.col("_nt"))  # right side non-empty
        )
        parts.append(
            cum.select(
                F.lit(feat).alias("feature"),
                F.col("_v").alias("threshold"),
                F.col("_nl").alias("n_left"),
                F.col("_pl").alias("pos_left"),
                (F.col("_nt") - F.col("_nl")).alias("n_right"),
                (F.col("_pt") - F.col("_pl")).alias("pos_right"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionAll(p)
    # one double expression over exact integer counts, quantized
    # before any comparison (the cross-engine determinism contract)
    score = F.lit(2.0) * (
        (
            F.col("pos_left") * (F.col("n_left") - F.col("pos_left"))
        ).cast("double")
        / F.col("n_left").cast("double")
        + (
            F.col("pos_right") * (F.col("n_right") - F.col("pos_right"))
        ).cast("double")
        / F.col("n_right").cast("double")
    )
    return allc.withColumn(
        "score_nano", F.floor(F.lit(_NANO) * score).cast("long")
    )


def best_stump(
    df: DataFrame,
    features: Sequence[str],
    label_col: str,
    per_feature: bool = True,
) -> DataFrame:
    """The fitted stump: the minimum-impurity candidate overall, or
    (``per_feature=True``) the best candidate of EVERY feature ranked
    globally — the feature-importance view a quality pipeline wants
    ("which signal separates en from the rest best, and by how
    much"). Deterministic: rank orders (score_nano, feature,
    threshold). Adds majority-vote leaf predictions per side."""
    cand = split_candidates(df, features, label_col)
    if per_feature:
        wf = Window.partitionBy("feature").orderBy(
            "score_nano", "threshold"
        )
        cand = (
            cand.withColumn("_rf", F.row_number().over(wf))
            .filter(F.col("_rf") == 1)
            .drop("_rf")
        )
    w = Window.orderBy("score_nano", "feature", "threshold")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "predict_left",
            (F.lit(2) * F.col("pos_left") > F.col("n_left")).cast("boolean"),
        )
        .withColumn(
            "predict_right",
            (F.lit(2) * F.col("pos_right") > F.col("n_right")).cast("boolean"),
        )
    )
