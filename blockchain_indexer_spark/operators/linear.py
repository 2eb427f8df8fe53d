"""Distributed linear-classifier training — the "train a quality /
domain / language filter over the whole corpus" step of a data
pipeline, as pure DataFrame plans with bit-exact integer arithmetic.

A production corpus pipeline trains lightweight linear classifiers
(fastText-style) to score documents: quality vs junk, in-domain vs
out. The float path (logistic regression / SGD) is not reproducible
across engines bit-for-bit, so — following the repo's twin convention
(md5 vs xxhash, integer Lloyd k-means, integer PageRank) — the
oracle-gated trainer here is the BATCH PERCEPTRON over hashed
bag-of-words counts, which is integer-exact end to end:

- features: token → md5-prefix bucket (engine-portable hash idiom,
  functions/hex.py:61), x[b] = count of the doc's tokens in bucket b —
  an integer sparse vector, one explode + groupBy;
- label: y ∈ {+1, −1} from a caller predicate;
- epoch: margin(doc) = Σ_b x[b]·w[b] (integer dot via an equi-join on
  bucket against the CURRENT weight table), a doc is misclassified iff
  y·margin ≤ 0, and w' = w + Σ_misclassified y·x — one aggregation.

Every quantity is an exact int64 (weights are bounded by epochs ×
total token count, far under 2^63), so a DuckDB oracle replays
training epoch by epoch as an unrolled CTE (the BPE-merge oracle
pattern, operators/bpe.py) and the final weight table hash-matches.

Scale shape: the feature frame is the corpus-sized object (one
token-keyed explode + (doc, bucket) groupBy). Each epoch is one join
of features against a ≤ n_buckets-row weight table (broadcast), one
doc-keyed margin aggregation and one bucket-keyed delta aggregation —
O(epochs) passes over the feature frame, which is localCheckpointed
once. The weight table never leaves O(n_buckets) rows; nothing
collects to the driver.

The perceptron update rule guarantees convergence only on separable
data; the pipeline use is a FIXED small epoch budget (a scoring
feature extractor), exactly how the gate runs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.hex import md5_prefix_bigint


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    label_col: str = "y",
    n_buckets: int = 256,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, y, bucket, cnt): hashed bag-of-words counts. Docs with
    no tokens contribute no rows — they always sit ON the margin
    (margin 0 ⇒ misclassified by convention) but with x = 0 they add
    nothing to any update, so dropping the rows changes nothing.

    ``hash_fn`` follows the repo's twin convention: ``"md5_60"`` —
    md5-prefix bucket, reproducible in the DuckDB oracle (the gated
    configuration); default ``"xxhash64"`` — the production path (the
    per-token hash runs once per corpus token, and is the feature
    build's dominant cost)."""
    if hash_fn == "md5_60":
        bucket = md5_prefix_bigint(F.col("_t"), 15) % n_buckets
    elif hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col("_t")), F.lit(n_buckets)).cast("bigint")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; expected 'md5_60' or 'xxhash64'")
    return (
        docs.select(
            id_col,
            label_col,
            F.explode(tokens_col).alias("_t"),
        )
        .select(
            id_col,
            label_col,
            bucket.alias("bucket"),
        )
        .groupBy(id_col, label_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def perceptron_train(
    features: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    epochs: int = 2,
    n_buckets: int = 256,
) -> DataFrame:
    """Batch-perceptron weights after ``epochs`` full passes, starting
    from w = 0. Returns (bucket, weight) for every bucket 0..n-1
    (untouched buckets weight 0 — the full dense table, so the result
    schema is corpus-independent).

    Epoch t: margin_d = Σ x_d·w_t; w_{t+1} = w_t + Σ_{y·margin ≤ 0} y·x_d.
    With w_0 = 0 every doc is misclassified in epoch 1, so w_1 is the
    class-difference count vector — the add-one step that makes the
    unrolled SQL oracle line up epoch for epoch."""
    feat = features.localCheckpoint(eager=True)  # epochs passes, one materialization
    spark = features.sparkSession
    w = spark.range(n_buckets).select(
        F.col("id").alias("bucket"), F.lit(0).cast("long").alias("weight")
    )
    for _ in range(epochs):
        margins = (
            feat.join(F.broadcast(w), "bucket", "left")
            .groupBy(id_col, label_col)
            .agg(F.sum(F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0))).alias("_m"))
        )
        mis = margins.filter(F.col(label_col) * F.col("_m") <= 0).select(id_col, label_col)
        delta = (
            feat.join(mis, [id_col, label_col], "left_semi")
            .groupBy("bucket")
            .agg(F.sum(F.col(label_col) * F.col("cnt")).alias("_d"))
        )
        w = (
            w.join(delta, "bucket", "left")
            .select(
                "bucket",
                (F.col("weight") + F.coalesce(F.col("_d"), F.lit(0))).alias("weight"),
            )
            # materialize each epoch's weights: the next epoch's plan
            # references them twice (margin join + update join) and an
            # unmaterialized lineage would re-run every prior epoch
            .localCheckpoint(eager=True)
        )
    return w


def perceptron_score(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> DataFrame:
    """(id, y, margin, correct): integer margin of every doc under the
    trained weights; ``correct`` = strictly positive y·margin (the
    margin-0 no-token/balanced docs count as incorrect, matching the
    trainer's misclassification rule)."""
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0))).alias("margin"))
        .select(
            id_col,
            label_col,
            "margin",
            (F.col(label_col) * F.col("margin") > 0).alias("correct"),
        )
    )


def margin_calibration(
    scored: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> DataFrame:
    """Calibration buckets for a trained linear classifier: rank every
    scored document by margin into ``n_buckets`` equal-count tiles
    (ties broken by the unique id so both engines pick identical
    tiles) and report, per tile, the document count, positive-label
    count and rate, correct-prediction count and rate, and the margin
    extremes. A calibrated classifier shows pos_rate rising monotonely
    across tiles — the drift alarm that completes the classifier
    stack the way the MinHash estimator-calibration monitor completes
    dedup (estimate-vs-truth per bucket, output bounded by n_buckets).

    The exact-NTILE form is the oracle twin: the unpartitioned window
    is one total sort (Spark plans it single-partition). Production at
    corpus scale swaps the tile for a fixed-width margin bin —
    ``floor(margin / bin_width)`` — which is map-only and keeps the
    same report schema; the tile form stays the verification baseline,
    same convention as the exact-kNN oracle twins in similarity.py.
    """
    from pyspark.sql import Window

    tiled = scored.select(
        id_col,
        label_col,
        "margin",
        F.ntile(n_buckets)
        .over(Window.orderBy("margin", id_col))
        .cast("long")
        .alias("tile"),
    )
    n = F.count(F.lit(1))
    n_pos = F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
    n_correct = F.sum(
        F.when(F.col(label_col) * F.col("margin") > 0, 1).otherwise(0)
    )
    return tiled.groupBy("tile").agg(
        n.cast("bigint").alias("n_docs"),
        n_pos.cast("bigint").alias("n_pos"),
        n_correct.cast("bigint").alias("n_correct"),
        F.min("margin").cast("bigint").alias("min_margin"),
        F.max("margin").cast("bigint").alias("max_margin"),
        (n_pos.cast("double") / n.cast("double")).alias("pos_rate"),
        (n_correct.cast("double") / n.cast("double")).alias("correct_rate"),
    )


def agreement_kappa(
    preds: DataFrame,
    a_col: str = "pred_a",
    b_col: str = "pred_b",
) -> DataFrame:
    """Inter-classifier agreement: the 2x2 confusion matrix between
    two boolean predictors plus Cohen's kappa (Cohen 1960) — the
    model-comparison monitor a filtering pipeline runs when swapping
    classifiers ("do the cheap and expensive filters actually agree
    beyond chance?"). High raw agreement with near-zero kappa means
    both models mostly predict the majority class.

    Integer-deterministic: the cell counts are exact int64 and kappa
    is kept RATIONAL until the last step —

        kappa = (n·agree − (r1·c1 + r0·c0)) / (n² − (r1·c1 + r0·c0))

    (the po/pe form with every term multiplied through by n²), so the
    only float op is ONE IEEE division of exact integers. Exact while
    n² < 2^53 (n < ~94M rows — beyond that, compute per shard and
    merge the integer cells, which sum exactly). A degenerate margin
    (pe = 1, denominator 0) reports kappa 0.

    Scale shape: one scalar aggregate over the joined prediction
    frame — map-side combined, one row out.
    """
    a, b = F.col(a_col), F.col(b_col)
    cell = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = preds.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cell(a & b).alias("n_pos_pos"),
        cell(a & ~b).alias("n_pos_neg"),
        cell(~a & b).alias("n_neg_pos"),
        cell(~a & ~b).alias("n_neg_neg"),
    )
    n = F.col("n_docs")
    agree = F.col("n_pos_pos") + F.col("n_neg_neg")
    r1 = F.col("n_pos_pos") + F.col("n_pos_neg")
    r0 = F.col("n_neg_pos") + F.col("n_neg_neg")
    c1 = F.col("n_pos_pos") + F.col("n_neg_pos")
    c0 = F.col("n_pos_neg") + F.col("n_neg_neg")
    chance = r1 * c1 + r0 * c0
    num = n * agree - chance
    den = n * n - chance
    return agg.select(
        "n_docs",
        "n_pos_pos",
        "n_pos_neg",
        "n_neg_pos",
        "n_neg_neg",
        agree.cast("bigint").alias("n_agree"),
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("kappa"),
    )
