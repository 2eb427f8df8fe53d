"""k-means + SemDeDup: exact cross-check against a pure-numpy
reference implementing the same deterministic contract (data-seeded
init, integer-lattice centroid updates, lowest-cell tie-breaks)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.kmeans import kmeans_assign, semantic_dedup
from blockchain_indexer_spark.sources.parquet import load_table

K, ITERS, SCALE = 8, 2, 1000


def _numpy_lloyd(x: np.ndarray, k: int, iters: int):
    """Reference: x is the quantized (n, dim) matrix ordered by id."""
    cents = x[:k].copy()
    for _ in range(iters):
        d = (cents**2).sum(1)[None, :] - 2.0 * (x @ cents.T)
        assign = d.argmin(1)  # first minimum == lowest cell id
        nxt = cents.copy()
        for c in range(k):
            members = x[assign == c]
            if len(members):
                nxt[c] = np.floor(members.mean(0) + 0.5)
        cents = nxt
    d = (cents**2).sum(1)[None, :] - 2.0 * (x @ cents.T)
    assign = d.argmin(1)
    dist = d[np.arange(len(x)), assign] + (x * x).sum(1)
    return assign, dist, cents


def _quantized(spark, sf_dir) -> tuple[np.ndarray, np.ndarray]:
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r[0] for r in rows])
    raw = np.array([r[1] for r in rows], dtype=np.float64) * SCALE
    # Spark F.round is HALF-AWAY-FROM-ZERO; np.round is half-to-even,
    # which diverges on exact .5 products (e.g. 0.0625 * 1000)
    x = np.copysign(np.floor(np.abs(raw) + 0.5), raw)
    return ids, x


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    ids, x = _quantized(spark, sf_dir)
    ref_assign, ref_dist, _ = _numpy_lloyd(x, K, ITERS)
    out = (
        kmeans_assign(load_table(spark, sf_dir, "embeddings"), k=K, iters=ITERS)
        .orderBy("vec_id")
        .collect()
    )
    got_ids = np.array([r["vec_id"] for r in out])
    assert (got_ids == ids).all()
    assert (np.array([r["cell"] for r in out]) == ref_assign).all()
    assert (np.array([r["dist_sq"] for r in out]) == ref_dist.astype(np.int64)).all()


def test_kmeans_improves_or_holds_inertia(spark, sf_dir):
    """More Lloyd iterations never increase total inertia (up to the
    <= 0.5/scale lattice rounding slack per coordinate, negligible
    relative to cluster radii on this data)."""
    emb = load_table(spark, sf_dir, "embeddings")
    i0 = kmeans_assign(emb, k=K, iters=0).agg(F.sum("dist_sq")).first()[0]
    i2 = kmeans_assign(emb, k=K, iters=2).agg(F.sum("dist_sq")).first()[0]
    assert i2 <= i0


def test_semantic_dedup_flags_match_numpy(spark, sf_dir):
    ids, x = _quantized(spark, sf_dir)
    assign, _, _ = _numpy_lloyd(x, K, ITERS)
    nsq = (x * x).sum(1)
    thr = 0.3
    expect_dup = np.zeros(len(x), dtype=bool)
    for j in range(len(x)):
        if nsq[j] == 0:
            continue
        for i in range(j):
            if assign[i] == assign[j] and nsq[i] > 0:
                cos = (x[i] @ x[j]) / np.sqrt(nsq[i] * nsq[j])
                if cos >= thr:
                    expect_dup[j] = True
                    break
    out = (
        semantic_dedup(
            load_table(spark, sf_dir, "embeddings"), k=K, iters=ITERS, threshold=thr
        )
        .orderBy("vec_id")
        .collect()
    )
    got_dup = np.array([r["is_dup"] for r in out])
    assert (np.array([r["cell"] for r in out]) == assign).all()
    assert (got_dup == expect_dup).all()
    assert expect_dup.any(), "gate should be discriminative at this threshold"
    assert not expect_dup.all()


def test_corpus_smaller_than_k_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="smaller than k"):
        kmeans_assign(df, k=5, iters=0)


def test_empty_cell_keeps_previous_centroid(spark):
    """Two far apart seed points plus a mass near seed 0: seed 1's
    cell goes empty after iteration 1 (every point is nearer the
    moved centroid 0) — it must keep its centroid, not crash or NaN."""
    rows = [(i, [float(i % 3), 0.0]) for i in range(9)] + [(9, [1000.0, 0.0])]
    # seeds are ids 0 and 1; the far point 9 joins cell... compute:
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=2, iters=3).collect()
    assert len(out) == 10
    assert all(r["dist_sq"] >= 0 for r in out)
    # the far point dominates one cell or the other; all rows assigned
    assert {r["cell"] for r in out} <= {0, 1}
