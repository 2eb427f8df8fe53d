"""Distributed PCA over embedding columns: one-pass second moments,
driver-side eigendecomposition, Arrow-batched projection.

PCA (and its whitening variant) is the standard pre-processing step
before large-scale embedding work — OPQ-style rotation before product
quantization, dimensionality reduction before clustering / SemDeDup,
decorrelation before LSH. The reference engine has no embedding
operators; this extends the LLM-pipeline surface alongside
operators/kmeans.py and operators/similarity.py.

Scale shape (the part that must survive 100 TB):

- the ONLY corpus-wide pass is `second_moments`: a mapInPandas that
  folds every Arrow batch of a partition into one (n, Σv, Σvvᵀ)
  accumulator and emits ONE row per partition. The shuffle that
  follows reduces O(partitions) rows of O(d²) payload — corpus-size
  independent (d=64 → 4 KB·partitions), the classic tree-aggregate
  shape;
- the d×d Gram matrix collects to the driver (O(d²), bounded like the
  k-means seed collect) where numpy eigh runs in microseconds;
- projection is one Arrow-batched (batch×d)·(d×k) matmul per batch —
  the same justified-Pandas-UDF pattern as kmeans assignment and
  similarity.signbit_signature;
- nothing here ever shuffles on a vector or materializes a
  corpus × d² frame (a naive posexplode²-based covariance would be a
  4096× row multiplier on the corpus — that is exactly what the
  per-partition fold avoids).

Determinism / oracle contract (same recipe as kmeans/ivf): vectors
are integer-quantized (round(x·scale) as BIGINT), so n, Σv and Σvvᵀ
are EXACT integers — order-independent, hence identical in Spark's
partial aggregation and DuckDB's single-threaded sum. The covariance
entry is then one fixed sequence of IEEE-double ops over those exact
integers, bit-identical in both engines:

    cov = (sum_prod − sum_i·sum_j / n) / (n − 1)

The eigendecomposition itself is NOT SQL-expressible, so the
projection gate is rows-only; its correctness is pinned by
tests/test_pca.py invariants (component orthonormality, agreement
with numpy's full-batch PCA on the same quantized data, per-component
sample variance == eigenvalue).

Reference parity: none — the reference (CirclesUBI/blockchain-indexer)
has no vector analytics; this is part of the training-data-pipeline
surface the assignment adds on top.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.vectors import quantize
from blockchain_indexer_spark.sources.parquet import spread


def _quantized(df: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    """(_id, _v array<bigint>) working frame; NULL vectors excluded —
    the one policy Spark and the DuckDB oracle can honor identically
    (see kmeans._vq for the rationale)."""
    return (
        spread(df, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )


def second_moments(qframe: DataFrame, vec_col: str = "_v") -> DataFrame:
    """Per-partition [n, Σv (d), flatten(Σvvᵀ) (d²)] packed partials
    over an array<bigint> vector column — ONE row out per non-empty
    input partition, as a single `m array<long>` column.

    Packing everything into one array lets every downstream consumer
    (total count, per-dim sums, cross products) reduce through the
    SAME posexplode → groupBy(pos) exchange, so the corpus is scanned
    once and Catalyst's ReusedExchange shares the reduced ~d² rows
    across branches. Downstream cost is O(partitions × d²) regardless
    of corpus size. int64 accumulation is exact (|q| ≤ ~scale·‖x‖∞,
    per-partition row counts ≪ 2^40)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s: np.ndarray | None = None
        g: np.ndarray | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.int64)
            n += x.shape[0]
            bs = x.sum(axis=0, dtype=np.int64)
            # Gram via float64 BLAS, EXACT: per-batch entries are sums
            # of ≤ batch_size integer products |q_i·q_j| ≤ scale²·‖x‖∞²
            # ≈ 10⁷, so every intermediate stays < 2^53 and the result
            # is integer-valued bit-for-bit. (numpy's int64 matmul has
            # no BLAS path and is ~10× slower.) Accumulation across
            # batches then proceeds in unbounded-exact int64.
            xf = x.astype(np.float64)
            bg = np.rint(xf.T @ xf).astype(np.int64)
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if n:
            yield pd.DataFrame(
                {"m": [[n] + s.tolist() + g.ravel().tolist()]}
            )

    return qframe.mapInPandas(fold, "m array<long>")


def covariance_pairs(
    df: DataFrame, id_col: str, vec_col: str, scale: int = 1000, dim: int | None = None
) -> DataFrame:
    """Upper-triangle sample covariance of a (quantized) embedding
    column as (i, j, n, sum_i, sum_j, sum_prod, cov) rows, i <= j.

    The integer columns are exact (oracle-hashable as-is); `cov` is
    the one double-typed derivation, computed with the same op
    sequence as the DuckDB oracle so it hash-matches bit-for-bit."""
    q = _quantized(df, id_col, vec_col, scale)
    if dim is None:
        first = q.select(F.size("_v").alias("d")).first()
        if first is None:
            raise ValueError("covariance_pairs: no non-null vectors")
        dim = first["d"]

    # one corpus pass → O(partitions) packed partials → ONE shuffle on
    # pos; the three small branches below share it via ReusedExchange.
    moments = (
        second_moments(q)
        .select(F.posexplode("m").alias("pos", "mv"))
        .groupBy("pos")
        .agg(F.sum("mv").cast("long").alias("mv"))
    )
    tot = moments.filter(F.col("pos") == 0).select(F.col("mv").alias("n"))
    sums = moments.filter((F.col("pos") >= 1) & (F.col("pos") <= dim)).select(
        (F.col("pos") - 1).cast("int").alias("i"), F.col("mv").alias("s")
    )
    prods = (
        moments.filter(F.col("pos") > dim)
        .withColumn("p", F.col("pos") - 1 - dim)
        .withColumn("i", (F.col("p") / dim).cast("int"))
        .withColumn("j", (F.col("p") % dim).cast("int"))
        .filter(F.col("i") <= F.col("j"))
        .select("i", "j", F.col("mv").alias("sum_prod"))
    )
    nd = F.col("n").cast("double")
    return (
        prods.crossJoin(F.broadcast(tot))
        .join(F.broadcast(sums).select(F.col("i"), F.col("s").alias("sum_i")), "i")
        .join(
            F.broadcast(sums).select(
                F.col("i").alias("j"), F.col("s").alias("sum_j")
            ),
            "j",
        )
        .select(
            "i",
            "j",
            "n",
            "sum_i",
            "sum_j",
            "sum_prod",
            (
                (
                    F.col("sum_prod").cast("double")
                    - F.col("sum_i").cast("double")
                    * F.col("sum_j").cast("double")
                    / nd
                )
                / (nd - F.lit(1).cast("double"))
            ).alias("cov"),
        )
    )


def _collect_moments(q: DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    """Bounded O(partitions × d²) driver collect of the packed moment
    partials, reduced to (n, Σv, Σvvᵀ-flat)."""
    rows = second_moments(q).collect()
    if not rows:
        raise ValueError("pca: no non-null vectors")
    m = np.sum([np.asarray(r["m"], dtype=np.int64) for r in rows], axis=0)
    # len(m) = 1 + d + d² → d is the positive root of d² + d = len − 1
    d = int(round(((4 * (m.shape[0] - 1) + 1) ** 0.5 - 1) / 2))
    n = int(m[0])
    s = m[1 : 1 + d]
    g = m[1 + d :]
    return n, s, g


def _fit_components(
    q: DataFrame, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Collect the bounded O(d²) moment summary and eigendecompose on
    the driver. Returns (mean[d], components[d,k], eigenvalues[k], n).

    Sign convention: each component is flipped so its
    largest-|coordinate| entry is positive — eigh's sign is otherwise
    arbitrary, and a deterministic output is what makes the projection
    reproducible run-to-run."""
    n, s, g = _collect_moments(q)
    d = s.shape[0]
    if n < 2:
        raise ValueError("pca: need at least 2 vectors")
    if not 1 <= k <= d:
        raise ValueError(f"pca: k={k} outside [1, {d}]")
    mean = s.astype(np.float64) / n
    cov = (g.reshape(d, d).astype(np.float64) - np.outer(s, s) / n) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for c in range(k):
        col = comps[:, c]
        if col[np.argmax(np.abs(col))] < 0:
            comps[:, c] = -col
    return mean, comps, np.maximum(w[order], 0.0), n


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 2,
    scale: int = 1000,
    whiten: bool = False,
) -> DataFrame:
    """Project each vector onto the top-k principal components of the
    corpus: (id, pcs array<double>, var_ratio array<double>).

    `whiten=True` divides each coordinate by √eigenvalue (unit
    per-component variance — the OPQ/ZCA-style preconditioner for
    product quantization and cosine LSH). Components are fit from the
    quantized corpus (one distributed pass, see module doc); the
    projection is one Arrow matmul per batch."""
    q = _quantized(df, id_col, vec_col, scale)
    mean, comps, eigs, _n = _fit_components(q, k)
    proj = comps / np.sqrt(np.where(eigs > 0, eigs, 1.0)) if whiten else comps

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        x = np.array(vs.tolist(), dtype=np.float64)
        out = (x - mean) @ proj
        return pd.Series(list(out))

    return q.select(
        F.col("_id").alias(id_col), project("_v").alias("pcs")
    )


def pca_summary(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, scale: int = 1000
) -> DataFrame:
    """Per-component eigenvalue + explained-variance-ratio summary:
    (component, eigenvalue, var_ratio) — the scree curve a pipeline
    reads to pick a reduced dimension. Single-row-per-component driver
    frame (O(k)); the distributed cost is the same one moments pass."""
    q = _quantized(df, id_col, vec_col, scale)
    n, s, g = _collect_moments(q)
    d = s.shape[0]
    cov = (g.reshape(d, d).astype(np.float64) - np.outer(s, s) / n) / (n - 1)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = float(w.sum())
    spark = df.sparkSession
    data = [
        (int(c), float(w[c]), float(w[c] / total) if total > 0 else 0.0)
        for c in range(min(k, d))
    ]
    return spark.createDataFrame(
        data, "component int, eigenvalue double, var_ratio double"
    )
