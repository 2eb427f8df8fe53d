"""PCA operator: distributed moments vs numpy, projection invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.pca import (
    covariance_pairs,
    pca_project,
    pca_summary,
)
from blockchain_indexer_spark.sources.parquet import load_table


def _quantized_matrix(spark, sf_dir) -> tuple[np.ndarray, np.ndarray]:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    x = np.array(
        [np.round(np.asarray(v, dtype=np.float64) * 1000) for v in emb["embedding"]],
        dtype=np.int64,
    )
    return emb["vec_id"].to_numpy(), x


def test_covariance_matches_numpy_exactly(spark, sf_dir):
    _, x = _quantized_matrix(spark, sf_dir)
    n, d = x.shape
    out = covariance_pairs(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    ).toPandas()
    assert len(out) == d * (d + 1) // 2
    assert (out["n"] == n).all()
    s = x.sum(axis=0)
    g = x.T @ x
    for row in out.itertuples():
        assert row.sum_i == s[row.i]
        assert row.sum_j == s[row.j]
        assert row.sum_prod == g[row.i, row.j]
        expect = (float(g[row.i, row.j]) - float(s[row.i]) * float(s[row.j]) / n) / (
            n - 1
        )
        assert row.cov == expect  # same IEEE op sequence -> bit-equal


def test_projection_matches_fullbatch_numpy(spark, sf_dir):
    ids, x = _quantized_matrix(spark, sf_dir)
    n = x.shape[0]
    mean = x.mean(axis=0)
    cov = np.cov(x.astype(np.float64), rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order]
    for c in range(4):
        col = comps[:, c]
        if col[np.argmax(np.abs(col))] < 0:
            comps[:, c] = -col
    expect = (x - mean) @ comps

    out = (
        pca_project(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=4)
        .toPandas()
        .sort_values("vec_id")
    )
    got = np.array(out["pcs"].tolist(), dtype=np.float64)
    assert out["vec_id"].to_numpy().tolist() == ids.tolist()
    assert got.shape == (n, 4)
    # same moments (exact ints) -> same covariance -> same eigh input;
    # allow tiny slack for the (x - mean) @ comps float order
    assert np.allclose(got, expect, rtol=0, atol=1e-6)


def test_projection_variance_equals_eigenvalues(spark, sf_dir):
    out = pca_project(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=3
    ).toPandas()
    pcs = np.array(out["pcs"].tolist(), dtype=np.float64)
    eig = (
        pca_summary(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=3)
        .toPandas()
        .sort_values("component")
    )
    var = pcs.var(axis=0, ddof=1)
    assert np.allclose(var, eig["eigenvalue"].to_numpy(), rtol=1e-9)
    # components are ordered by decreasing explained variance
    assert (np.diff(eig["eigenvalue"].to_numpy()) <= 1e-12).all()
    # distinct components are uncorrelated (orthogonal directions)
    c01 = np.cov(pcs[:, 0], pcs[:, 1], ddof=1)[0, 1]
    assert abs(c01) <= 1e-6 * max(1.0, var[0])


def test_whitened_projection_has_unit_variance(spark, sf_dir):
    out = pca_project(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        k=3,
        whiten=True,
    ).toPandas()
    pcs = np.array(out["pcs"].tolist(), dtype=np.float64)
    assert np.allclose(pcs.var(axis=0, ddof=1), 1.0, rtol=1e-9)


def test_scree_ratios_sum_below_one(spark, sf_dir):
    eig = pca_summary(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=8
    ).toPandas()
    assert len(eig) == 8
    assert (eig["var_ratio"] >= 0).all()
    assert eig["var_ratio"].sum() <= 1.0 + 1e-12


def test_pca_raises_on_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        pca_project(empty, "vec_id", "embedding", k=2)
