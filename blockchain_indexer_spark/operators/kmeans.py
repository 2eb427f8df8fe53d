"""Distributed k-means over embedding columns + SemDeDup semantic dedup.

K-means is the workhorse of embedding-space corpus curation: cluster
the corpus, then act per cluster (SemDeDup pruning — Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023 — density re-weighting, topic balancing). The
reference engine has no embedding operators; this extends the
LLM-pipeline surface alongside operators/similarity.py's ANN stack.

Scale shape (the part that must survive 100 TB):

- centroids live on the driver / in UDF closures — O(k × dim), never
  a shuffle key;
- assignment is one Arrow-batched matmul per batch over the corpus —
  the same justified-Pandas-UDF pattern as similarity.signbit_signature
  (a k×dim classifier per row is hopeless as interpreted HOF lambdas);
- the per-iteration centroid recompute is posexplode → groupBy(cell,
  pos) → avg: partial aggregation collapses each input partition to
  ≤ k×dim rows map-side, so the shuffle is O(k × dim × partitions)
  regardless of corpus size, then k×dim values collect to the driver;
- SemDeDup's pairwise stage self-joins on the cell id — an EQUI-join,
  O(Σ cell²) ≈ n²/k pairs, the method's documented cost. Production
  runs pick k ≈ n/10⁴ so cells stay small; the all-pairs-in-a-cell
  frame never materializes corpus-wide state.

Determinism / oracle contract (same recipe as similarity.ivf_topk):
vectors and seed centroids are integer-quantized (round(x·scale)), so
distances d = ‖c‖² − 2·v·c are exact in float64 and argmin ties break
to the lowest cell id. Centroid updates round the per-dimension mean
back to integers via floor(mean + 0.5): the mean of BIGINTs is the
same IEEE double in every engine (exact integer sum, one divide), and
floor(x + 0.5) is a single well-defined double op — unlike bankers-vs-
half-up round() variance across engines. Every iteration therefore
yields bit-identical centroids, assignments and distances in Spark and
the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.vectors import quantize
from blockchain_indexer_spark.sources.parquet import spread


def _vq(corpus: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    """Quantized (_id, _v) working frame. NULL vectors are excluded —
    the single policy the seeds, the centroid means, the assignment
    UDF and the DuckDB oracle can all honor identically (a NULL row
    would crash the seed collect and silently vanish from the
    posexplode means while the oracle NULL-propagates differently)."""
    return (
        spread(corpus, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )


def _seed_centroids(vq: DataFrame, k: int) -> np.ndarray:
    """Data-seeded init: the k lowest-id quantized vectors (an
    O(k)-row pruned top-k collect, corpus-size independent — the same
    deterministic, RNG-free recipe as similarity.train_ivf_centroids
    and pq_topk's codebook)."""
    rows = vq.orderBy("_id").limit(k).select("_v").collect()
    if len(rows) < k:
        raise ValueError(f"corpus smaller than k={k}")
    return np.array([list(r[0]) for r in rows], dtype=np.float64)


def _assign(vq: DataFrame, cents: np.ndarray, with_dist: bool = False) -> DataFrame:
    """Append ``cell`` (and optionally exact ``dist_sq``) by nearest
    centroid. One numpy matmul per Arrow batch; centroids ride the UDF
    closure (broadcast by Spark's task serialization, O(k×dim))."""
    cents_sq = (cents**2).sum(axis=1)  # exact: integer-valued float64
    dim = cents.shape[1]

    @F.pandas_udf("struct<cell:int,dist_sq:bigint>")
    def _nearest(vec: pd.Series) -> pd.DataFrame:
        if len(vec) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "dist_sq": pd.Series([], dtype="int64")})
        mat = np.array(
            [v if v is not None else np.zeros(dim) for v in vec], dtype=np.float64
        )
        # argmin ‖v−c‖² = argmin (‖c‖² − 2 v·c) + ‖v‖²; all terms are
        # integer-valued float64 (< 2^53) so d is exact and argmin's
        # first-minimum rule breaks ties to the lowest cell id
        d = cents_sq[None, :] - 2.0 * (mat @ cents.T)
        cell = d.argmin(axis=1)
        vsq = (mat * mat).sum(axis=1)
        dist = d[np.arange(len(mat)), cell] + vsq
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "dist_sq": dist.astype(np.int64)}
        )

    out = vq.withColumn("_a", _nearest(F.col("_v")))
    cols = [F.col("_id"), F.col("_v"), F.col("_a.cell").alias("cell")]
    if with_dist:
        cols.append(F.col("_a.dist_sq").alias("dist_sq"))
    return out.select(*cols)


def _lloyd(vq: DataFrame, k: int, iters: int) -> np.ndarray:
    """``iters`` Lloyd passes over a quantized (_id, _v) frame; the
    per-dimension mean rounds back to the integer lattice via
    floor(mean + 0.5), and a cell that loses all members keeps its
    previous centroid. Returns the final (k, dim) centroid matrix."""
    cents = _seed_centroids(vq, k)
    for _ in range(iters):
        means = (
            _assign(vq, cents)
            .select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))  # exact int sum, one divide
            .collect()
        )
        nxt = cents.copy()  # empty cells keep their previous centroid
        for r in means:
            nxt[r["cell"], r["pos"]] = np.floor(r["m"] + 0.5)
        cents = nxt
    return cents


def kmeans_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Lloyd's k-means with integer-rounded centroids; returns
    (``id_col``, cell, dist_sq) — final assignment plus the EXACT
    integer squared distance to the winning centroid.

    ``iters`` full passes of assign → recompute; the update keeps
    centroids on the integer lattice (floor(mean + 0.5) per dimension)
    so every stage stays engine-exact — the quantization error is
    ≤ 0.5/scale per coordinate per iteration, immaterial next to
    cluster radii. A cell that loses all members keeps its previous
    centroid (both engines). Rows with a NULL vector are EXCLUDED up
    front (clustering a missing vector is meaningless, and exclusion
    is the one policy every stage — seeds, means, assignment, the SQL
    oracle — can implement identically).
    """
    vq = _vq(corpus, id_col, vec_col, scale)
    cents = _lloyd(vq, k, iters)
    return _assign(vq, cents, with_dist=True).select(
        F.col("_id").alias(id_col), "cell", "dist_sq"
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    scale: int = 1000,
) -> DataFrame:
    """SemDeDup: k-means the corpus, then inside each cluster drop any
    item whose quantized cosine to a LOWER-id same-cell item is
    ≥ ``threshold`` (keep-lowest-id representative — the paper keeps
    an arbitrary one per near-dup group; lowest-id makes it
    deterministic).

    Returns (``id_col``, cell, is_dup). The pairwise stage is an
    equi-join on cell — O(Σ|cell|²) candidate pairs, never corpus²;
    at production scale pick k so E[|cell|] stays O(10³..10⁴)
    (SemDeDup's published configuration: ~10⁵ clusters for web-scale
    corpora). Zero-norm vectors have no cosine and are never flagged;
    NULL vectors are excluded like in ``kmeans_assign``.
    """
    vq = _vq(corpus, id_col, vec_col, scale)
    cents = _lloyd(vq, k, iters)
    # both the pair join's sides and the final left join read the
    # assignment — materialize it once (same seam as lsh_near_dup_pairs)
    assigned = _assign(vq, cents).localCheckpoint(eager=True)

    from blockchain_indexer_spark.functions.vectors import dot, norm_sq  # noqa: PLC0415

    # each row's norm is computed ONCE here, not per candidate pair —
    # the pair stage is the hot O(Σ|cell|²) loop and an inline
    # norm_sq there would re-evaluate a 64-term lambda |cell| times
    # per vector (the module's DuckDB oracle precomputes nsq the same
    # way)
    nz = assigned.withColumn("_nsq", norm_sq(F.col("_v"))).filter(F.col("_nsq") > 0)
    a = nz.select(
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"), F.col("_nsq").alias("_nsqa"), "cell"
    )
    b = nz.select(
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"), F.col("_nsq").alias("_nsqb"), "cell"
    )
    cos = dot(F.col("_va"), F.col("_vb")) / F.sqrt(F.col("_nsqa") * F.col("_nsqb"))
    dup_ids = (
        a.join(b, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select(F.col("_idb").alias("_id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("_dup", F.lit(True)), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )
