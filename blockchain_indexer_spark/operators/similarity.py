"""Similarity search over embedding columns (array<float>).

Two paths, as a production ANN stack would have:

- ``brute_force_topk`` — exact top-k by a chosen metric. The join is
  queries × corpus; with |Q| ≪ |C| the query side broadcasts, so the
  corpus is scanned once with no shuffle: this scales to any corpus
  size (it is the "flat index" baseline).
- ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures over fixed
  deterministic pseudo-random hyperplanes, candidates share a
  signature band, exact re-rank on candidates only. Sub-linear probe
  cost at the price of recall; the scale path when |Q| is large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.vectors import (
    cosine,
    dot,
    norm_sq,
    quantize,
    to_double,
)
from blockchain_indexer_spark.sources.parquet import spread


def _q_away(a: np.ndarray) -> np.ndarray:
    """Quantization rounding: HALF AWAY FROM ZERO, matching Spark's
    F.round (functions.vectors.quantize) and DuckDB's round() so
    numpy-side quantization is bit-identical to the Catalyst exact
    paths and the oracles. np.round is half-to-even and diverges on
    any component where x*scale lands exactly on .5 (e.g. 0.0625 at
    scale 1000) — which would make a signature/cell disagree with the
    same operator's own exact re-rank."""
    return np.copysign(np.floor(np.abs(a) + 0.5), a)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "quantized_dot",
    scale: int = 1000,
) -> DataFrame:
    """Exact top-k neighbors for each query row.

    metric='quantized_dot' ranks by integer inner product of
    round(x*scale) vectors — exact and engine-reproducible (see
    functions.vectors). metric='cosine' ranks by double cosine.
    Returns (query_id, rank, neighbor_id, score).
    """
    if metric == "quantized_dot":
        prep = lambda df: df.withColumn("_v", quantize(vec_col, scale))  # noqa: E731
        score = dot
    elif metric == "quantized_cosine":
        # integer dot and norms are exact (< 2^53), so the final
        # sqrt+divide is the same IEEE double on every engine —
        # rankings are engine-reproducible, unlike raw-float cosine
        prep = lambda df: df.withColumn("_v", quantize(vec_col, scale))  # noqa: E731
        score = lambda a, b: dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))  # noqa: E731
    elif metric == "cosine":
        prep = lambda df: df.withColumn("_v", to_double(vec_col))  # noqa: E731
        score = cosine
    elif metric == "quantized_neg_l2":
        # negated exact integer squared L2, so the shared desc-rank
        # path orders nearest-first; the exact twin pq_topk's ADC
        # approximates
        prep = lambda df: df.withColumn("_v", quantize(vec_col, scale))  # noqa: E731
        score = lambda a, b: -F.aggregate(  # noqa: E731
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")

    q = prep(queries).select(F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"))
    c = prep(spread(corpus, id_col)).select(F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_cv"))
    if metric in ("quantized_cosine", "cosine"):
        # a zero-norm vector's cosine is 0/0 = NaN, and Spark orders
        # NaN ABOVE every real number — one zero vector would steal
        # rank 1 for every query (the near-dup operators filter
        # norm_sq > 0 for the same reason)
        q = q.filter(norm_sq(F.col("_qv")) > 0)
        c = c.filter(norm_sq(F.col("_cv")) > 0)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", score(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def knn_label_probe(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    stride: int = 37,
    scale: int = 1000,
) -> DataFrame:
    """Embedding-quality probe: predict each probe vector's label by
    majority vote among its k nearest neighbors (leave-one-out kNN) —
    the standard cheap health check for an embedding table (label
    coherence ≈ retrieval quality), run before spending a training
    job on it.

    Probes are every ``stride``-th id (deterministic, corpus-size
    proportional); distances are quantized cosine so rankings — and
    therefore the vote — are engine-reproducible (see
    brute_force_topk). Vote ties break to the smallest label.

    Returns (query_id, true_label, predicted_label, n_votes, correct).

    Scale shape: probe-vs-corpus ranking rides the blocked int64
    matmul scan (all_pairs_topk_cosine with a probe frame —
    bit-identical to the expression flat scan, ~10× on the 100-probe
    100k-corpus stress row); the vote is a k-row-per-probe
    aggregation. Swap the scan for ivf_topk at IVF scale — the vote
    stage is unchanged.
    """
    topk = all_pairs_topk_cosine(
        emb, id_col, vec_col, k=k, scale=scale,
        queries=emb.filter(F.col(id_col) % stride == 0),
    )
    neighbor_labels = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_nl")
    )
    votes = (
        topk.join(neighbor_labels, "neighbor_id")
        .groupBy("query_id", "_nl")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("_nl"))
    predicted = (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("query_id", F.col("_nl").alias("predicted_label"), "n_votes")
    )
    truth = emb.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return (
        predicted.join(truth, "query_id")
        .select(
            "query_id",
            "true_label",
            "predicted_label",
            "n_votes",
            (F.col("predicted_label") == F.col("true_label")).alias("correct"),
        )
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: a fixed integer
    hash of (plane, i) mapped to [-1, 1). No RNG state — reproducible
    anywhere."""
    out = []
    for i in range(dim):
        # splitmix64-style integer scramble, public-domain constant
        z = (plane * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
        z = z ^ (z >> 31)
        out.append((z / float(1 << 63)) - 1.0)
    return out


def signbit_signature(
    df: DataFrame, vec_col: str, dim: int, num_planes: int = 16, scale: int = 1000
) -> DataFrame:
    """Append ``sig`` (bigint bitmask of hyperplane sign bits).

    Implemented as an Arrow-batched Pandas UDF doing one numpy matmul
    per batch (vectors × plane matrix). The Catalyst alternatives both
    lose badly here: aggregate/zip_with lambdas evaluate interpreted
    (~1.2 ms/row for 16×64 terms), and unrolling the 1024-term sum into
    expression nodes chokes the optimizer's recursive tree transforms
    (measured 10× worse). Requires fixed-length ``dim`` vectors.

    Both the hyperplanes and the vectors are quantized to integers
    (round(x*scale)) before the matmul: every product and partial sum
    is an integer far below 2^53, so the float64 matmul is EXACT and
    summation-order-independent — the sign bits (and therefore the
    whole candidate set) are bit-reproducible on any engine, which is
    what lets the DuckDB oracle check the LSH path end-to-end. The
    quantization moves each plane by <0.1% — immaterial for random
    hyperplanes.
    """
    planes = np.array(
        [[round(x * scale) for x in _hyperplane(dim, p)] for p in range(num_planes)],
        dtype=np.float64,
    )
    weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))

    @F.pandas_udf("long")
    def _sig(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int64")
        # NULL embeddings → zero vector → all projections 0 → sig 0,
        # matching the lambda implementation's null-propagation result
        mat = np.array(
            [v if v is not None else np.zeros(dim) for v in vec], dtype=np.float64
        )
        bits = (_q_away(mat * scale) @ planes.T) > 0  # (n, num_planes), exact
        return pd.Series(bits.astype(np.int64) @ weights)

    return df.withColumn("sig", _sig(F.col(vec_col)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    fetch_join: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates must share ≥1 signature band
    (num_planes/bands bits each), re-ranked by exact quantized dot.

    Plan shape: corpus and queries are tagged, union'd and signed in
    ONE Arrow/pandas pass (two separate signature stages measured ~2×
    the latency); the signed frame is cached — it is the LSH index, and
    Spark's CacheManager canonicalization lets every band/probe branch
    (and repeated builds in one session) reuse one materialization.

    ``fetch_join`` picks the candidate-dedup strategy, same bits out
    (equality test-pinned):

    - False (default): vectors ride along through the band join so
      the re-rank needs no fetch join — right when bucket fan-out is
      modest (selective buckets, |candidates| ≈ |probes|).
    - True: dedup ID-ONLY pairs first (24-byte rows through the
      distinct exchange), then fetch both vectors back by hash join
      against the cached index — two more joins but no vector payload
      in the band shuffle. The huge-fan-out regime: at 16 planes / 4
      bands over a 100k corpus each band bucket holds ~6k rows, so
      1000 probes make ~2.5×10⁷ candidate pairs whose 2×64-int
      payload is a ~25 GB distinct exchange (measured 53.7 s → 27.4 s
      at that stress shape).
    """
    if num_planes % bands:
        raise ValueError(f"bands={bands} must divide num_planes={num_planes}")
    rows = num_planes // bands
    mask = (1 << rows) - 1

    tagged = (
        spread(corpus, id_col)
        .select(F.lit("c").alias("_role"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .unionByName(
            queries.select(
                F.lit("q").alias("_role"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
            )
        )
    )
    signed = signbit_signature(tagged, "_v", dim, num_planes).cache()

    def banded(role: str, out_id: str, vec_alias: str | None) -> DataFrame:
        vec_cols = (
            # quantize once per index/probe row, not per candidate
            # pair in the re-rank (the _rerank_topk contract)
            [quantize("_v").alias(vec_alias)] if vec_alias else []
        )
        out_cols = [out_id] + ([vec_alias] if vec_alias else [])
        return (
            signed.filter(F.col("_role") == role)
            .select(
                F.col("_id").alias(out_id),
                *vec_cols,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.shiftrightunsigned(F.col("sig"), b * rows)
                                .bitwiseAND(F.lit(mask))
                                .alias("bucket"),
                            )
                            for b in range(bands)
                        ]
                    )
                ).alias("bb"),
            )
            .select(*out_cols, "bb.band", "bb.bucket")
        )

    if fetch_join:
        ids = (
            banded("c", "neighbor_id", None)
            .join(banded("q", "query_id", None), ["band", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        cidx = signed.filter(F.col("_role") == "c").select(
            F.col("_id").alias("neighbor_id"), quantize("_v").alias("_neighborq")
        )
        qidx = signed.filter(F.col("_role") == "q").select(
            F.col("_id").alias("query_id"), quantize("_v").alias("_queryq")
        )
        cand = ids.join(cidx, "neighbor_id").join(qidx, "query_id")
    else:
        cand = (
            banded("c", "neighbor_id", "_neighborq")
            .join(banded("q", "query_id", "_queryq"), ["band", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "_queryq", "_neighborq")
            .distinct()
        )
    return _rerank_topk(cand.select("query_id", "neighbor_id", "_queryq", "_neighborq"), k)


def _rerank_topk(cand: DataFrame, k: int, metric: str = "dot") -> DataFrame:
    """Exact re-rank of a candidate frame (query_id, neighbor_id,
    _queryq, _neighborq [, _qnorm, _nnorm]) → top-k per query.

    Inputs are PRE-quantized arrays (and, for cosine, per-ROW
    precomputed norms): quantization and norms cost one HOF pass per
    join-input row, never per candidate pair — at index scale the
    candidate set is orders of magnitude larger than either side
    (round-7 stress: ~3×10⁸ IVF candidates from a 10⁵ corpus; the
    former per-pair re-quantization was ~6 interpreted array passes
    per candidate and dominated the probe join). Same arithmetic,
    same bits: quantize/norm per row equals quantize/norm per pair.

    metric='dot' is the gate-pinned default (exact integer scores);
    metric='cosine' normalizes with one IEEE sqrt+divide
    (brute_force_topk's cosine arithmetic) — used where the candidate
    generator must agree with a cosine-ranked exact baseline, e.g.
    the mutual-kNN IVF swap."""
    if metric == "dot":
        score = dot(F.col("_queryq"), F.col("_neighborq"))
    elif metric == "cosine":
        # zero-norm (and NULL) vectors have no cosine: drop the pair
        # from the ranking — the exact baselines' _prep filter, and
        # under ANSI mode the division would otherwise raise
        # DIVIDE_BY_ZERO (caught by the NULL-corpus sweep, round 7)
        cand = cand.filter((F.col("_qnorm") > 0) & (F.col("_nnorm") > 0))
        score = dot(F.col("_queryq"), F.col("_neighborq")) / F.sqrt(
            F.col("_qnorm") * F.col("_nnorm")
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = cand.withColumn("score", score).select(
        "query_id", "neighbor_id", "score"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample: int = 256,
    iters: int = 5,
):
    """Deterministic IVF coarse quantizer: Lloyd iterations on a fixed
    corpus sample, driver-side in numpy.

    The sample is the `sample` lowest-id vectors — deterministic, no
    RNG — and `iters` fixed Lloyd steps from an every-(sample/n_cells)
    stride init. At production scale the sample stays O(centroids ×
     100) rows regardless of corpus size (collecting it is a pruned
    top-k scan, not a full pass); training cost is independent of
    corpus size, which is the standard IVF property.

    ``iters=0`` keeps the stride-sampled data points themselves as
    centroids ("data-seeded" coarse quantizer): together with the
    integer assignment in ``ivf_topk`` this makes the whole index
    SQL-reproducible (the oracle re-derives the same centroids from
    the table), at a small recall cost vs Lloyd-refined cells.

    Returns an (n_cells, dim) float64 ndarray.
    """
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())  # a None row breaks np.array
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("train_ivf_centroids: corpus has no non-null vectors")
    x = np.array([r[0] for r in rows], dtype=np.float64)  # (sample, dim)
    stride = max(1, len(x) // n_cells)
    cents = x[::stride][:n_cells].copy()
    for _ in range(iters):
        # assign to nearest centroid by L2, then recompute means
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample: int = 256,
    iters: int = 5,
    scale: int = 1000,
    broadcast_queries: bool = True,
    metric: str = "dot",
    engine: str = "expr",
    max_cell: int = 4096,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus rows
    bucket to their nearest coarse centroid, each query probes its
    `n_probe` nearest cells, and only same-cell pairs are re-ranked by
    exact quantized dot.

    The scale path complement to `lsh_topk`: the candidate join is an
    equi-join on `cell` (corpus shuffled once by cell id, queries
    exploded ×n_probe), so probe cost is |Q| × n_probe × avg-cell-size
    instead of |Q| × |C|. Centroids are broadcast inside the
    Arrow-batched assignment UDF as numpy literals — one matmul per
    batch, same pattern as `signbit_signature`.

    Assignment runs on INTEGER-quantized centroids and vectors:
    d = ||c_q||² − 2·v_q·c_q is integer-valued (exact in float64, all
    terms ≪ 2^53), argmin ties break to the lowest cell id — so cell
    assignment and probe order are deterministic and, with ``iters=0``
    (data-seeded centroids), bit-reproducible by the DuckDB oracle.

    ``engine`` picks the probe/re-rank implementation, same bits out:

    - ``"expr"`` — pair-level cell equi-join + per-candidate JVM HOF
      score. Right for the serving regime (few queries, modest
      fan-out), and the shape the DuckDB oracle replays 1:1.
    - ``"blocked"`` (cosine only) — each cell's members pack into ONE
      row, probing queries pack per (cell), and one Arrow pass runs a
      per-cell int64 matmul + local top-k under the (score desc, id
      asc) total order (all_pairs_topk_cosine's kernel applied within
      cells); a pair meets in exactly one cell, so the global window
      over the ~|Q|·n_probe·k survivors finishes the exact same
      ranking. Use in the queries≈corpus regime: the candidate count
      is |Q|·n_probe·avg-cell and any per-pair interpreted expression
      multiplies by it (round-7 stress, 100k×64 at 8-of-256 probes =
      3.1×10⁸ candidates: 339 s expr → blocked runs the same probe as
      numpy matmuls: 339 s -> 36 s measured, vs 150 s for the
      exact all-pairs baseline on the same corpus). Equality with
      "expr" is test-pinned.
    """
    if engine not in ("expr", "blocked"):
        raise ValueError(f"unknown engine {engine!r}; expected 'expr' or 'blocked'")
    if engine == "blocked" and max_cell < 1:
        # fail at the call, before centroid training — not as an opaque
        # ceil/pmod-by-zero deep in the executed plan (driver ADVICE r8)
        raise ValueError(f"max_cell must be >= 1, got {max_cell}")
    if engine == "blocked" and metric != "cosine":
        # the blocked kernel drops zero-norm/NULL rows as the cosine
        # contract requires; dot keeps NULL-score rows in the window,
        # a semantic only the expr path preserves
        raise ValueError("engine='blocked' supports metric='cosine' only")
    cents = train_ivf_centroids(corpus, id_col, vec_col, n_cells, sample, iters)
    cents_q = _q_away(cents * scale)  # integer-valued float64
    cents_sq = (cents_q**2).sum(axis=1)  # (n_cells,)

    dim = cents.shape[1]

    def _as_matrix(vec: pd.Series):
        # NULL embeddings → zero vector (assigned deterministically to
        # whichever cell is nearest the origin; they can never win a
        # re-rank, so this is harmless and crash-free)
        return np.array(
            [v if v is not None else np.zeros(dim) for v in vec], dtype=np.float64
        )

    @F.pandas_udf("int")
    def _cell(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        mat = _q_away(_as_matrix(vec) * scale)
        # argmin ||v - c||^2 = argmin (||c||^2 - 2 v·c); ||v||^2 constant
        # per row. Integer math → exact; argmin takes the FIRST minimal
        # index, i.e. ties break to the lowest cell id.
        d = cents_sq[None, :] - 2.0 * (mat @ cents_q.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def _probe_cells(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        mat = _q_away(_as_matrix(vec) * scale)
        d = cents_sq[None, :] - 2.0 * (mat @ cents_q.T)
        # stable sort on exact integers: probe order is (distance, cell)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    # quantize (and, for cosine, norm) ONCE PER ROW before the cell
    # join: the candidate set is |Q|·n_probe·avg-cell pairs and any
    # per-pair array pass multiplies by that factor (round-7 stress:
    # 3×10⁸ candidates). This also keys the re-rank to THIS call's
    # ``scale`` (previously the re-rank always quantized at the
    # default scale regardless of the index's).
    cb = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        quantize(vec_col, scale).alias("_neighborq"),
        _cell(F.col(vec_col)).alias("cell"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        quantize(vec_col, scale).alias("_queryq"),
        F.explode(_probe_cells(F.col(vec_col))).alias("cell"),
    )
    if engine == "blocked":
        return _ivf_blocked_cosine_topk(cb, qb, k, max_cell=max_cell)
    pair_cols = ["query_id", "neighbor_id", "_queryq", "_neighborq"]
    if metric == "cosine":
        cb = cb.withColumn("_nnorm", norm_sq(F.col("_neighborq")))
        qb = qb.withColumn("_qnorm", norm_sq(F.col("_queryq")))
        pair_cols += ["_qnorm", "_nnorm"]
    # broadcast_queries=True is the serving shape (|Q| << |C|: the
    # probe frame rides the wire, the corpus never shuffles); for the
    # queries ≈ corpus regime (e.g. the mutual-kNN graph's IVF swap)
    # broadcasting the whole corpus would be wrong — a plain cell
    # equi-join shuffles BOTH sides once on the cell id instead,
    # still |Q| x n_probe x avg-cell-size probe cost.
    qside = F.broadcast(qb) if broadcast_queries else qb
    cand = cb.join(qside, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # a (query, neighbor) pair can only meet in ONE cell (the
    # neighbor's cell), so no distinct is needed before the re-rank
    return _rerank_topk(cand.select(*pair_cols), k, metric)


def _ivf_blocked_cosine_topk(
    cb: DataFrame, qb: DataFrame, k: int, max_cell: int = 4096
) -> DataFrame:
    """ivf_topk's engine='blocked' probe: per-cell int64 matmul + local
    top-k (all_pairs_topk_cosine's kernel applied within cells).

    Both sides shuffle ONCE on the cell id into one packed row per
    cell (members stay O(avg-cell) per row); the Arrow pass scores
    each (probing queries × cell members) block as one numpy matmul
    and keeps each query's first k under the (score desc, neighbor_id
    asc) TOTAL order — a candidate pair meets in exactly one cell (the
    neighbor's), so the global window over the ~|Q|·n_probe·k
    survivors reproduces the expr engine's ranking bit-for-bit
    (integer dots/norms exact in float64; norm product, sqrt and
    divide are single IEEE ops on both paths). Zero-norm and NULL
    vectors drop before the matmul — the cosine contract
    (_rerank_topk's filter).

    SKEW GUARD (``max_cell``, driver ADVICE r7; made two-sided in the
    same round): a skewed coarse quantizer (e.g. iters=0 data-seeded
    centroids on a clustered corpus) can land the MAX cell — not the
    documented avg cell — in one packed row/task, an unguarded
    single-executor OOM at index scale; symmetrically, in the
    queries ≈ corpus regime a POPULAR cell's whole probe set would
    pack into one row even when the cell itself is small. Both sides
    split by a deterministic id salt into ceil(n/max_cell) groups;
    the block join keys on the cell alone, so each query sub-group
    scores against every corpus sub-cell of the cells it probes — a
    pair still meets in exactly ONE block (the neighbor lives in one
    sub-cell, the query in one sub-group). Each block keeps its local
    top-k with boundary ties and the existing global window merges;
    the true per-cell top-k is a subset of the union of block
    top-ks, so results stay bit-identical (equality test-pinned vs
    engine='expr' at max_cell=7 and 1, where BOTH sides split
    multi-way). Only oversized cells/probe-sets pay the replication.
    At max_cell=4096 a packed row is ≤ 4096×64 int64 ≈ 2 MB — bounded
    per task regardless of quantizer or probe skew. ``max_cell`` must
    be >= 1 (driver ADVICE r8: <= 0 previously surfaced as an opaque
    ceil/pmod-by-zero deep in the plan)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if max_cell < 1:
        raise ValueError(f"max_cell must be >= 1, got {max_cell}")

    # per-cell member/probe counts are one tiny row per cell: broadcast
    # into both sides so the salting adds no extra shuffle of the big
    # frames. BOTH sides split: the corpus side by member-id salt (a
    # skewed quantizer's max cell), and the QUERY side by query-id salt
    # (the symmetric hazard — in the queries ≈ corpus regime a popular
    # cell's whole probe set would otherwise pack into one row). Each
    # query sub-group joins every corpus sub-cell of the cells it
    # probes, so a pair still meets in exactly ONE block.
    ccnt = cb.groupBy("cell").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max_cell)).cast("int").alias("_nsub")
    )
    qcnt = qb.groupBy("cell").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max_cell)).cast("int").alias("_nqsub")
    )
    cb = cb.join(F.broadcast(ccnt), "cell").withColumn(
        "_salt", F.pmod(F.xxhash64("neighbor_id"), F.col("_nsub")).cast("int")
    )
    qb = qb.join(F.broadcast(qcnt), "cell").withColumn(
        "_qsalt", F.pmod(F.xxhash64("query_id"), F.col("_nqsub")).cast("int")
    )
    cpacked = cb.groupBy("cell", "_salt").agg(
        F.collect_list(
            F.struct(F.col("neighbor_id").alias("i"), F.col("_neighborq").alias("v"))
        ).alias("_crows")
    )
    qpacked = qb.groupBy("cell", "_qsalt").agg(
        F.collect_list(
            F.struct(F.col("query_id").alias("i"), F.col("_queryq").alias("v"))
        ).alias("_qrows")
    )
    # join on cell alone: nsub × nqsub blocks per cell, each one
    # bounded numpy matmul task
    cells = qpacked.join(cpacked, "cell").select("_qrows", "_crows")
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def _unpack(rows):
        ids = [r["i"] for r in rows if r["v"] is not None]
        vecs = [r["v"] for r in rows if r["v"] is not None]
        if not ids:
            return None, None
        mi = np.array(ids, dtype=np.int64)
        mm = np.array(vecs, dtype=np.int64)
        nz = (mm * mm).sum(axis=1) > 0
        if not nz.any():
            return None, None
        return mi[nz], mm[nz]

    def batches(it):
        for pdf in it:
            out_q, out_n, out_s = [], [], []
            for qrows, crows in zip(pdf["_qrows"], pdf["_crows"]):
                qi, qm = _unpack(qrows)
                ci, cm = _unpack(crows)
                if qi is None or ci is None:
                    continue
                dots = (qm @ cm.T).astype(np.float64)
                nq = (qm * qm).sum(axis=1).astype(np.float64)
                nc = (cm * cm).sum(axis=1).astype(np.float64)
                s = dots / np.sqrt(nq[:, None] * nc[None, :])
                s[qi[:, None] == ci[None, :]] = -np.inf  # self-pairs out
                # all_pairs_topk_cosine's pruning kernel: argpartition
                # gives the k-th score, the >= threshold mask keeps
                # boundary TIES, and ONE lexsort orders only the ~n·k
                # survivors (a full-ravel lexsort over n_q·n_c pairs
                # dominated the first cut of this engine ~10:1)
                kk = min(k, s.shape[1])
                part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
                thresh = np.take_along_axis(s, part, 1).min(axis=1)
                rows, cols = np.nonzero(s >= thresh[:, None])
                sc = s[rows, cols]
                order = np.lexsort((ci[cols], -sc, rows))
                rows, cols, sc = rows[order], cols[order], sc[order]
                boundary = np.r_[True, rows[1:] != rows[:-1]]
                starts = np.maximum.accumulate(
                    np.where(boundary, np.arange(len(rows)), 0)
                )
                keep = (np.arange(len(rows)) - starts < kk) & np.isfinite(sc)
                out_q.append(qi[rows[keep]])
                out_n.append(ci[cols[keep]])
                out_s.append(sc[keep])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(
                        np.concatenate(out_q) if out_q else [], dtype="int64"
                    ),
                    "neighbor_id": pd.Series(
                        np.concatenate(out_n) if out_n else [], dtype="int64"
                    ),
                    "score": pd.Series(
                        np.concatenate(out_s) if out_s else [], dtype="float64"
                    ),
                }
            )

    local = cells.mapInPandas(batches, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def lsh_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.3,
    num_planes: int = 16,
    bands: int = 4,
    scale: int = 1000,
) -> DataFrame:
    """Sub-quadratic embedding near-dup pairs: candidates must share at
    least one signature band (sign-bit LSH over quantized hyperplanes),
    then exact quantized cosine >= ``threshold`` verifies.

    The scale path for ``dedup.cosine_near_dup_pairs`` (the O(|C|^2)
    oracle baseline): here the self-join key is (band, bucket), so the
    expected candidate count is sum of per-bucket squares — |C|^2 /
    2^(planes/bands) per band under uniform hashing — and the exact
    re-rank runs on candidates only. Precision is 1 by construction
    (every emitted pair passes the exact test); recall follows the
    hyperplane collision law P[share a band] = 1-(1-(1-theta/pi)^r)^b,
    ~95% for cosine 0.9 at the 16/4 defaults, lower near the
    threshold — the standard LSH trade, pinned in tests against the
    exact baseline.

    Everything is integer-quantized (planes, signatures, dots), so the
    pair set and scores are bit-reproducible cross-engine — the DuckDB
    oracle re-derives signatures, buckets, candidates and cosines
    exactly. Returns (vec_a, vec_b, cosine) with vec_a < vec_b.
    """
    if num_planes % bands:
        raise ValueError(f"bands={bands} must divide num_planes={num_planes}")
    rows = num_planes // bands
    mask = (1 << rows) - 1
    base = spread(corpus, id_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    signed = (
        signbit_signature(base, "_v", dim, num_planes, scale)
        .select("_id", quantize("_v", scale).alias("_qv"), "sig")
        # zero-norm vectors have no cosine (NaN orders above numbers);
        # drop them BEFORE banding or they all collide in bucket 0
        .filter(norm_sq(F.col("_qv")) > 0)
        # both join sides read this frame — one signature pass
        .localCheckpoint(eager=True)
    )
    stacked = signed.select(
        "_id",
        "_qv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * rows)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_qv", "bb.band", "bb.bucket")
    a = stacked.select(F.col("_id").alias("vec_a"), F.col("_qv").alias("_va"), "band", "bucket")
    b = stacked.select(F.col("_id").alias("vec_b"), F.col("_qv").alias("_vb"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "_va", "_vb")
        .distinct()
    )
    cos = dot(F.col("_va"), F.col("_vb")) / F.sqrt(
        norm_sq(F.col("_va")) * norm_sq(F.col("_vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _pq_books(
    vq: DataFrame, m: int, n_codes: int, iters: int
) -> tuple[list[list[list[int]]], int, int]:
    """Shared PQ codebook builder (pq_topk / pq_distortion): returns
    (books[j][code] = int subvector, dim, sub). iters=0 seeds the
    codebook with the subvectors of the n_codes lowest-id corpus
    vectors — re-derivable in SQL, the oracle-exact variant; iters>0
    runs per-subspace Lloyd on a deterministic sample (RNG-free) with
    centroids re-quantized to BIGINT so ADC stays integer-exact."""
    sample = n_codes if iters == 0 else max(n_codes * 32, 256)
    seed_rows = vq.orderBy("_id").limit(sample).select("_v").collect()
    if len(seed_rows) < n_codes:
        raise ValueError(f"corpus smaller than n_codes={n_codes}")
    seeds = [list(r[0]) for r in seed_rows]
    dim = len(seeds[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    if iters == 0:
        books = [
            [seeds[c][j * sub : (j + 1) * sub] for c in range(n_codes)]
            for j in range(m)
        ]
    else:
        x = np.array(seeds, dtype=np.float64)
        stride = max(1, len(x) // n_codes)
        books = []
        for j in range(m):
            xj = x[:, j * sub : (j + 1) * sub]
            cents = xj[::stride][:n_codes].copy()
            for _ in range(iters):
                d2 = ((xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(len(cents)):
                    members = xj[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
            # half-away rounding (_q_away), NOT np.rint (half-to-even):
            # the module contract is one rounding rule everywhere
            books.append([[int(v) for v in _q_away(row)] for row in cents])
    return books, dim, sub


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    scale: int = 1000,
    iters: int = 0,
    rerank: int | None = None,
) -> DataFrame:
    """Product-quantization ANN top-k via asymmetric distance
    computation (ADC) — the memory-compressed third leg of the ANN
    stack next to LSH and IVF (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011).

    Index: each vector is split into ``m`` subvectors; each subvector
    is assigned the nearest of ``n_codes`` codebook centroids by exact
    integer L2 (ties → lowest code), so a d-dim float vector is stored
    as m single-byte codes — a 32× compression at d=64/m=8, which is
    what lets a billion-vector index live in cluster memory.

    Codebook: the subvectors of the ``n_codes`` lowest-id corpus
    vectors ("data-seeded", the same deterministic-training trick as
    ``train_ivf_centroids(iters=0)``) — collected driver-side (tiny,
    O(n_codes) rows regardless of corpus size) and re-derivable in
    SQL, so codes, LUTs and rankings are oracle-reproducible end to
    end. A Lloyd-refined codebook drops in without changing any plan.

    Query: per query, a (m × n_codes) lookup table of exact integer
    subvector distances is built and broadcast; ADC distance to a
    corpus vector is the sum of m LUT entries selected by its codes.
    The scan is one broadcast equi-join on (subspace, code) over the
    code table + a sum — the corpus never shuffles its vectors, only
    its m-byte codes, and every distance is an exact BIGINT.

    Returns (query_id, rank, neighbor_id, adc_dist): top ``k`` by
    (ADC distance, neighbor id), self excluded. ADC ranking is
    approximate relative to exact L2 (that's PQ's trade); recall vs
    the exact ranking is pinned in tests.

    ``rerank=R`` switches to the production IVF-PQ serving shape: the
    ADC ranking only selects a shortlist of R candidates per query,
    which is then re-scored with EXACT integer L2 against the true
    vectors and cut to ``k`` — output (query_id, rank, neighbor_id,
    l2_dist). Shortlist recall rises with R at R extra exact
    distances per query; with ``iters=0`` every stage stays
    SQL-reproducible so the oracle checks codes, shortlist and final
    ranking end to end.
    """
    if m <= 0 or n_codes <= 0:
        raise ValueError("m and n_codes must be positive")
    # NULL vectors are excluded on BOTH sides: a NULL corpus row would
    # code deterministically but re-rank with a NULL exact distance
    # (which sorts first and steals rank 1), and the oracle cannot
    # reproduce any non-exclusion policy
    vq = (
        spread(corpus, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )
    books, dim, sub = _pq_books(vq, m, n_codes, iters)
    spark = corpus.sparkSession
    cb = spark.createDataFrame(
        [(j, c, books[j][c]) for j in range(m) for c in range(n_codes)],
        "j int, code int, cv array<bigint>",
    )

    def _sub_dists(frame: DataFrame, out_id: str) -> DataFrame:
        subs = frame.select(
            F.col("_id").alias(out_id),
            F.posexplode(
                F.array(*[F.slice("_v", j * sub + 1, sub) for j in range(m)])
            ).alias("j", "sv"),
        )
        d2 = F.aggregate(
            F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return subs.join(F.broadcast(cb), "j").withColumn("_d", d2)

    # Corpus code assignment is |C| × m × n_codes subvector distances —
    # as a posexplode × codebook join each is an INTERPRETED
    # zip_with/aggregate lambda (the measured hot spot: ~1M lambda
    # evals even at bench scale, and it grows linearly with the
    # corpus). One numpy matmul per Arrow batch instead — the same
    # justified-Pandas-UDF pattern as signbit_signature; all math is
    # integer-valued float64 (< 2^53) so codes are bit-identical to
    # the Catalyst path (argmin first-min == min_by (d, code)). The
    # query-side LUT keeps the Catalyst join: |Q| × m × n_codes stays
    # tiny (it is the broadcast side).
    books_np = np.array(books, dtype=np.float64)  # (m, n_codes, sub)
    books_sq = (books_np**2).sum(axis=2)  # (m, n_codes)

    @F.pandas_udf("array<int>")
    def _code_vec(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        # NULLs are excluded upstream (vq/qq filters); the zero-fill
        # is a crash-free safety net for direct callers only
        mat = np.array(
            [list(v) if v is not None else [0.0] * dim for v in vec],
            dtype=np.float64,
        )  # (n, dim)
        out = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            vj = mat[:, j * sub : (j + 1) * sub]
            d = books_sq[j][None, :] - 2.0 * (vj @ books_np[j].T)
            out[:, j] = d.argmin(axis=1)
        return pd.Series(list(out))

    codes = vq.select(
        F.col("_id").alias("_cid"),
        F.posexplode(_code_vec(F.col("_v"))).alias("j", "code"),
    )
    qq = (
        spread(queries, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )
    lut = _sub_dists(qq, "_qid").select("_qid", "j", "code", F.col("_d").alias("_ld"))
    adc = (
        codes.join(F.broadcast(lut), ["j", "code"])
        .groupBy("_qid", "_cid")
        .agg(F.sum("_ld").alias("adc_dist"))
        .filter(F.col("_cid") != F.col("_qid"))
    )
    w = Window.partitionBy("_qid").orderBy("adc_dist", "_cid")
    ranked = adc.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return ranked.filter(F.col("rank") <= k).select(
            F.col("_qid").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.col("adc_dist").cast("bigint").alias("adc_dist"),
        )
    # ADC shortlist → exact integer-L2 re-rank (the IVF-PQ deployment
    # shape: compressed codes prune, true vectors score only the
    # shortlist — |Q| × rerank exact distances instead of |Q| × n)
    short = ranked.filter(F.col("rank") <= rerank).select("_qid", "_cid")
    l2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    exact = (
        short.join(F.broadcast(qq.select(F.col("_id").alias("_qid"), F.col("_v").alias("_qv"))), "_qid")
        .join(vq.select(F.col("_id").alias("_cid"), F.col("_v").alias("_cv")), "_cid")
        .withColumn("l2_dist", l2)
    )
    w2 = Window.partitionBy("_qid").orderBy("l2_dist", "_cid")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("_cid").alias("neighbor_id"),
            F.col("l2_dist").cast("bigint").alias("l2_dist"),
        )
    )


def pq_distortion(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    scale: int = 1000,
    iters: int = 0,
) -> DataFrame:
    """PQ reconstruction-distortion monitor: how much information the
    compressed codes throw away, per subspace — the index-health twin
    of ``embedding_ann_recall`` (recall watches ranking quality,
    distortion watches the quantizer itself; a subspace whose
    distortion balloons after a data drift is the one whose codebook
    needs retraining).

    Assigns every corpus vector its nearest code per subspace (same
    seeded codebook + exact integer subvector L2 + lowest-code
    tie-break as ``pq_topk``) and reports ONE ROW PER SUBSPACE:

    - ``n_vectors``, ``total_sq_error`` (BIGINT sum of the per-vector
      subvector quantization errors ||v_j - c(v_j)||², exact int64),
      ``mean_sq_error`` (one IEEE division), ``max_sq_error``;
    - ``n_codes_used`` and ``max_code_share`` (top code's population
      share — codebook-collapse alarm: a share near 1.0 means the
      subspace quantizes everything to one cell).

    Scale shape: the per-(subspace, code) partial aggregate caps the
    shuffle at m × n_codes rows per map partition regardless of corpus
    size, then the final per-subspace rollup touches m × n_codes rows
    total. Output is m rows. No window, no collect beyond the
    O(n_codes) codebook seed, no join.
    """
    if m <= 0 or n_codes <= 0:
        raise ValueError("m and n_codes must be positive")
    vq = (
        spread(corpus, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )
    books, dim, sub = _pq_books(vq, m, n_codes, iters)
    books_np = np.array(books, dtype=np.float64)  # (m, n_codes, sub)
    books_sq = (books_np**2).sum(axis=2)  # (m, n_codes)

    # One numpy matmul per Arrow batch (the justified-Pandas-UDF
    # pattern of pq_topk's corpus coder): all math is integer-valued
    # float64 < 2^53, so codes and distances are bit-exact
    @F.pandas_udf("array<struct<j: int, code: int, d: bigint>>")
    def _assign(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([list(v) for v in vec], dtype=np.float64)  # (n, dim)
        out = []
        codes = np.empty((len(mat), m), dtype=np.int64)
        dists = np.empty((len(mat), m), dtype=np.int64)
        for j in range(m):
            vj = mat[:, j * sub : (j + 1) * sub]
            d = (vj**2).sum(axis=1)[:, None] + books_sq[j][None, :] - 2.0 * (
                vj @ books_np[j].T
            )
            codes[:, j] = d.argmin(axis=1)  # first min == lowest code
            dists[:, j] = d[np.arange(len(mat)), codes[:, j]].astype(np.int64)
        for r in range(len(mat)):
            out.append(
                [
                    {"j": int(j), "code": int(codes[r, j]), "d": int(dists[r, j])}
                    for j in range(m)
                ]
            )
        return pd.Series(out)

    per_cell = (
        vq.select(F.explode(_assign("_v")).alias("a"))
        .select("a.j", "a.code", "a.d")
        .groupBy("j", "code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_cnt"),
            F.sum("d").cast("bigint").alias("_sum_d"),
            F.max("d").cast("bigint").alias("_max_d"),
        )
    )
    n_vec = F.sum("_cnt")
    return per_cell.groupBy("j").agg(
        n_vec.cast("bigint").alias("n_vectors"),
        F.sum("_sum_d").cast("bigint").alias("total_sq_error"),
        (F.sum("_sum_d").cast("double") / n_vec.cast("double")).alias(
            "mean_sq_error"
        ),
        F.max("_max_d").cast("bigint").alias("max_sq_error"),
        F.count(F.lit(1)).cast("bigint").alias("n_codes_used"),
        (F.max("_cnt").cast("double") / n_vec.cast("double")).alias(
            "max_code_share"
        ),
    )


def _hd_signs(dim: int) -> list[int]:
    """Deterministic ±1 diagonal for ``opq_rotate``: s_j = 1 − 2·
    parity(popcount(2654435761·(j+1) mod 2³²)) — Knuth's
    multiplicative constant, the ``_video_masks`` idiom: fixed
    integer-derived literals a SQL oracle reproduces by the same
    arithmetic, no RNG state anywhere."""
    return [
        1 - 2 * (bin((2654435761 * (j + 1)) % (1 << 32)).count("1") % 2)
        for j in range(dim)
    ]


def opq_rotate(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """OPQ-style ROTATION pre-step for product quantization — the
    structured HD random rotation (Walsh-Hadamard × deterministic ±1
    diagonal) FAISS applies when full OPQ training is off (Ge et al.
    2013 §2 motivate the rotation; Jégou et al. use the random-
    rotation fallback): PQ quantizes each 4-dim subspace
    independently, so a corpus whose energy concentrates in a few
    leading dimensions wastes most codebooks on near-zero subvectors.
    Rotating by R = H·D (H[i][j] = (−1)^popcount(i∧j) the order-dim
    Hadamard matrix, D the ``_hd_signs`` diagonal) spreads every
    input dimension's energy uniformly across ALL subspaces — the
    classic distortion/recall lift the banked
    ``embedding_opq_distortion`` gate measures on both variants.

    Exactness: H·D is ±1-integer and orthogonal up to the uniform
    factor dim (R·Rᵀ = dim·I), so rotated squared distances are
    EXACTLY dim × the originals — rankings are isometric and every
    entry of R·q is an int64 (|r_i| ≤ dim·max|q|, far under 2⁵³:
    exact in the float64 matmul). Input vectors quantize JVM-side by
    ``scale`` first (the shared ``quantize`` rounding contract);
    feed the output to ``pq_topk``/``pq_distortion``/``ivf_pq_topk``
    with ``scale=1`` — the values are already integers. NULL vectors
    pass through as NULL (downstream NULL policy unchanged); a
    non-NULL vector of length ≠ dim raises.

    Scale shape: one Arrow pass, one (batch × dim) @ (dim × dim) int
    matmul per batch — embarrassingly parallel, no shuffle, no
    collect. dim must be a power of two (Hadamard order)."""
    if dim < 1 or dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    signs = np.array(_hd_signs(dim), dtype=np.int64)
    i = np.arange(dim)
    # popcount of i&j via uint64 bit tricks is overkill at dim<=2^10:
    # table the Hadamard signs directly
    h = np.array(
        [[1 - 2 * (bin(a & b).count("1") % 2) for b in range(dim)] for a in i],
        dtype=np.int64,
    )
    rot = h * signs[None, :]  # (dim, dim): column j scaled by s_j

    @F.pandas_udf("array<double>")
    def _rot(qv: pd.Series) -> pd.Series:
        out: list = []
        for v in qv:
            if v is None:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.int64)
            if a.shape[0] != dim:
                raise ValueError(
                    f"opq_rotate: vector length {a.shape[0]} != dim {dim}"
                )
            out.append((rot @ a).astype(np.float64))
        return pd.Series(out)

    return spread(corpus, id_col).select(
        F.col(id_col),
        _rot(quantize(vec_col, scale)).alias(vec_col),
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 32,
    rerank: int = 50,
    sample: int = 256,
    scale: int = 1000,
) -> DataFrame:
    """IVF-PQ with residual encoding — the FAISS-style production ANN
    composition (Jégou et al. 2011, §IV): the coarse quantizer prunes
    the corpus to ``n_probe`` of ``n_cells`` inverted lists, PQ codes
    of the RESIDUAL (v − centroid) score the survivors via per-(query,
    cell) ADC lookup tables, and an exact integer-L2 re-rank cuts the
    ``rerank`` shortlist to ``k``.

    Scale shape: the corpus contributes one Arrow cell+code assignment
    pass and then only its (cell, m codes) rows — vectors never enter
    the candidate join. The ADC join is an equi-join on (cell,
    subspace, code) against a broadcast LUT frame of |Q| × n_probe ×
    m × n_codes rows (the LUT math itself stays Catalyst-side: it is
    the small broadcast side, same justification as ``pq_topk``'s
    LUT). Probe cost is |Q| × n_probe × avg-cell-size code rows, and
    the exact re-rank touches |Q| × rerank true vectors.

    Determinism: coarse centroids are the data-seeded stride sample
    (``train_ivf_centroids(iters=0)``), the codebook is the residuals
    of the ``n_codes`` lowest-id corpus vectors, and every distance —
    cell assignment, code assignment, LUT entries, ADC sums, final L2
    — is integer-exact with ties to the lowest index, so the whole
    index round-trips through the DuckDB oracle. NULL vectors are
    excluded on both sides (same policy and reasons as ``pq_topk``).
    """
    if m <= 0 or n_codes <= 0:
        raise ValueError("m and n_codes must be positive")
    cents = train_ivf_centroids(corpus, id_col, vec_col, n_cells, sample, iters=0)
    cents_q = _q_away(cents * scale)  # integer-valued float64
    cents_sq = (cents_q**2).sum(axis=1)
    dim = cents.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    vq = (
        spread(corpus, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
    )
    # codebook: residuals of the n_codes lowest-id vectors w.r.t.
    # their own coarse cells — O(n_codes) driver rows, corpus-size
    # independent, re-derivable in SQL
    seed_rows = vq.orderBy("_id").limit(n_codes).select("_v").collect()
    if len(seed_rows) < n_codes:
        raise ValueError(f"corpus smaller than n_codes={n_codes}")
    seeds = np.array([list(r[0]) for r in seed_rows], dtype=np.float64)
    seed_cells = (cents_sq[None, :] - 2.0 * (seeds @ cents_q.T)).argmin(axis=1)
    resid_seeds = seeds - cents_q[seed_cells]  # integer-valued
    books = np.stack(
        [resid_seeds[:, j * sub : (j + 1) * sub] for j in range(m)]
    )  # (m, n_codes, sub)
    books_sq = (books**2).sum(axis=2)  # (m, n_codes)

    @F.pandas_udf("struct<cell:int,codes:array<int>>")
    def _cell_codes(vec: pd.Series) -> pd.DataFrame:
        if len(vec) == 0:
            return pd.DataFrame(
                {"cell": pd.Series([], dtype="int32"), "codes": pd.Series([], dtype="object")}
            )
        mat = np.array([list(v) for v in vec], dtype=np.float64)
        cell = (cents_sq[None, :] - 2.0 * (mat @ cents_q.T)).argmin(axis=1)
        resid = mat - cents_q[cell]
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            rj = resid[:, j * sub : (j + 1) * sub]
            d = books_sq[j][None, :] - 2.0 * (rj @ books[j].T)
            codes[:, j] = d.argmin(axis=1)
        return pd.DataFrame({"cell": cell.astype(np.int32), "codes": list(codes)})

    coded = vq.select(
        F.col("_id").alias("neighbor_id"), _cell_codes(F.col("_v")).alias("_cc")
    ).select(
        "neighbor_id",
        F.col("_cc.cell").alias("cell"),
        F.posexplode(F.col("_cc.codes")).alias("j", "code"),
    )

    @F.pandas_udf("array<int>")
    def _probes(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([list(v) for v in vec], dtype=np.float64)
        d = cents_sq[None, :] - 2.0 * (mat @ cents_q.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    spark = corpus.sparkSession
    qq = (
        spread(queries, id_col)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_qid"), quantize(vec_col, scale).alias("_qv"))
    )
    probes = qq.select("_qid", "_qv", F.explode(_probes(F.col("_qv"))).alias("cell"))
    cents_df = spark.createDataFrame(
        [(c, [int(x) for x in cents_q[c]]) for c in range(len(cents_q))],
        "cell int, cv array<bigint>",
    )
    book_df = spark.createDataFrame(
        [
            (j, c, [int(x) for x in books[j, c]])
            for j in range(m)
            for c in range(n_codes)
        ],
        "j int, code int, bv array<bigint>",
    )
    # per-(query, probed cell) residual, sliced per subspace, against
    # the full codebook: the LUT — |Q| x n_probe x m x n_codes rows,
    # the broadcast side by construction
    resid = F.zip_with(F.col("_qv"), F.col("cv"), lambda x, y: x - y)
    lut_base = probes.join(F.broadcast(cents_df), "cell").select(
        "_qid",
        "cell",
        F.posexplode(
            F.array(*[F.slice(resid, j * sub + 1, sub) for j in range(m)])
        ).alias("j", "rv"),
    )
    ld = F.aggregate(
        F.zip_with(F.col("rv"), F.col("bv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    lut = lut_base.join(F.broadcast(book_df), "j").select(
        "_qid", "cell", "j", "code", ld.alias("_ld")
    )
    adc = (
        coded.join(F.broadcast(lut), ["cell", "j", "code"])
        .groupBy("_qid", "neighbor_id")
        .agg(F.sum("_ld").alias("adc_dist"))
        .filter(F.col("_qid") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("_qid").orderBy("adc_dist", "neighbor_id")
    short = adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= rerank
    )
    l2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    exact = (
        short.select("_qid", "neighbor_id")
        .join(F.broadcast(qq), "_qid")
        .join(vq.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv")), "neighbor_id")
        .withColumn("l2_dist", l2)
    )
    w2 = Window.partitionBy("_qid").orderBy("l2_dist", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.col("l2_dist").cast("bigint").alias("l2_dist"),
        )
    )


def mutual_knn_graph(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    scale: int = 1000,
    index: str = "exact",
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 5,
) -> DataFrame:
    """Undirected mutual-kNN graph over an embedding table: edge
    (src, dst) iff each vector is among the other's k nearest by
    quantized similarity — the standard graph substrate for semantic
    clustering, diversity analysis, and graph-based dedup (mutuality
    prunes the asymmetric hub edges a raw kNN digraph is full of).

    Returns (src, dst) with src < dst, one row per undirected edge.

    Scale shape: neighbor retrieval is the pluggable stage, selected
    by ``index``:

    - ``"exact"`` — the blocked int64-matmul all-pairs scan
      (all_pairs_topk_cosine, bit-identical to the expression flat
      scan and ~8× faster in the queries≈corpus regime). O(n²·d)
      compute: the oracle-exact baseline, and the right choice up to
      ~10⁵ vectors on one box.
    - ``"ivf"`` — the coarse-cell index (ivf_topk with
      broadcast_queries=False: corpus AND query sides shuffle once on
      the cell id, no corpus broadcast), O(n · n_probe · avg-cell)
      probe cost — the 100 TB index-scale path. Approximate: recall
      of the mutual edge set vs exact is pinned in tests on a
      clustered corpus; mutuality itself filters most one-sided
      misses, so edge recall sits above raw neighbor recall.

    The mutualization self-join (one hash join on the directed edge
    set, O(n·k) rows) and everything downstream are identical for
    both retrievals.

    ``iters`` is the IVF coarse-quantizer's Lloyd iteration count
    (ignored for ``"exact"``): the default keeps the recall-tuned
    refined cells; ``iters=0`` keeps the data-seeded sample centroids,
    making the whole retrieval SQL-reproducible (the oracle pattern
    ivf_topk documents — used by the embedding_lp_ivf_agreement gate).
    """
    if index == "exact":
        topk = all_pairs_topk_cosine(emb, id_col, vec_col, k=k, scale=scale)
    elif index == "ivf":
        topk = ivf_topk(
            emb,
            emb,
            id_col,
            vec_col,
            k=k,
            n_cells=n_cells,
            n_probe=n_probe,
            iters=iters,
            scale=scale,
            broadcast_queries=False,
            metric="cosine",  # the exact baseline ranks by cosine
            # queries ≈ corpus: probe via per-cell numpy matmuls, not
            # a per-candidate JVM expression (bit-identical, test-
            # pinned; 339 s -> 36 s at the 100k 8-of-256 stress,
            # vs 150 s for the exact blocked-matmul baseline)
            engine="blocked",
        )
    else:
        raise ValueError(f"unknown index {index!r}; expected 'exact' or 'ivf'")
    d = (
        topk.select("query_id", "neighbor_id")
        # pin the O(n·k) directed edge set BEFORE the mutualization
        # self-join: both join sides read it, and without the pin the
        # retrieval (one full blocked-matmul or IVF probe pass) runs
        # once PER SIDE — no ReusedExchange saves it (measured 2
        # MapInPandas stages in the executed plan, ~2x the matmul at
        # stress scale; the dedup_survivors/dbscan pin convention)
        .localCheckpoint(eager=True)
    )
    rev = d.select(
        F.col("neighbor_id").alias("query_id"), F.col("query_id").alias("neighbor_id")
    )
    return (
        d.join(rev, ["query_id", "neighbor_id"])
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
        )
    )


def hard_negatives(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    stride: int = 37,
    scale: int = 1000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every probe
    vector, the k nearest neighbors whose label DIFFERS from the
    probe's — the most-confusable wrong answers, the negatives that
    actually move a contrastive/triplet loss (random negatives are
    mostly trivial at scale; hardest-negative selection is the
    standard retrieval-training recipe, e.g. DPR/ANCE).

    Ranking is quantized cosine (exact integer dot/norms, one IEEE
    sqrt+divide — engine-reproducible, see brute_force_topk), ties
    broken by neighbor id; the label filter is applied BEFORE
    ranking, so the result is the exact different-label top-k, not a
    post-filtered same-label top-k' (which could surface fewer than
    k, or wrong, negatives when a label cluster is dense).

    Probes are every ``stride``-th id. Returns (query_id, query_label,
    rank, neighbor_id, neighbor_label, score).

    Scale shape: identical to the flat scans — probes broadcast
    through one corpus pass, O(corpus x probes) map-side work, no
    corpus shuffle; swap the scan for ivf_topk with a label-partition
    twist at index scale (the ranking stage is unchanged).
    """
    q = (
        emb.filter(F.col(id_col) % stride == 0)
        .withColumn("_qv", quantize(vec_col, scale))
        .filter(norm_sq(F.col("_qv")) > 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            "_qv",
        )
    )
    c = (
        spread(emb, id_col)
        .withColumn("_cv", quantize(vec_col, scale))
        .filter(norm_sq(F.col("_cv")) > 0)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
            "_cv",
        )
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("query_id") != F.col("neighbor_id"))
            & ~F.col("neighbor_label").eqNullSafe(F.col("query_label")),
        )
        .withColumn(
            "score",
            dot(F.col("_qv"), F.col("_cv"))
            / F.sqrt(norm_sq(F.col("_qv")) * norm_sq(F.col("_cv"))),
        )
        .select("query_id", "query_label", "neighbor_id", "neighbor_label", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "rank", "neighbor_id", "neighbor_label", "score"
        )
    )


def all_pairs_topk_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    scale: int = 1000,
    block_size: int = 2048,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k by quantized cosine via blocked int64 matmuls —
    the BLAS twin of brute_force_topk, returning the same
    (query_id, rank, neighbor_id, score) under the same total order
    (score desc, neighbor_id asc), self-pairs excluded. ``queries``
    defaults to the corpus itself (the all-pairs / mutual-kNN case);
    pass a probe frame for query-vs-corpus ranking.

    Same BLAS-not-nested-loop shape as dedup.cosine_near_dup_pairs:
    vectors hash into ⌈n/block_size⌉ packed blocks, every (query
    block, corpus block) pair is ONE numpy int64 matmul emitting each
    query's LOCAL top-k (global top-k is a subset of the per-block
    top-k under a total order), then one window keeps the global k
    among the O(k·n/block_size) survivors per query. Exactness is
    op-for-op: integer dot/norms are exact in int64→float64, and the
    one float sequence — dot / sqrt(norm_a·norm_b), product in double
    FIRST — matches the zip_with expression path bit-for-bit, so
    every gate downstream (kNN triangles, label propagation, label
    probe) stays oracle-green.

    Use this in the big-cross regime (|queries|·|corpus| ≳ 10⁶ pair
    scores, where the interpreted-HOF expression scan dominates —
    measured ~8× on the 5k-vector mutual-kNN graph and ~10× on the
    100-probe × 100k-corpus stress probe); brute_force_topk stays the
    right call for small probe sets, where broadcasting beats packing.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    def _prep(df: DataFrame) -> DataFrame:
        return (
            spread(df, id_col)
            .select(F.col(id_col).alias("_id"), quantize(vec_col, scale).alias("_v"))
            .filter(norm_sq(F.col("_v")) > 0)
        )

    c = _prep(emb)
    # one bounded scalar action sizing the blocking AND the broadcast
    # gate: row count plus vector width (ADVICE r9 — byte-based gate)
    n, _d = c.agg(F.count(F.lit(1)), F.first(F.size("_v"))).first()
    if n == 0:
        return c.select(
            F.col("_id").alias("query_id"),
            F.lit(0).cast("bigint").alias("rank"),
            F.col("_id").alias("neighbor_id"),
            F.lit(0.0).alias("score"),
        ).limit(0)
    # Scale-adaptive blocking (round 9, guide §2.5/§2.6): the natural
    # ⌈n/block_size⌉ puts a ≲2k-vector corpus in ONE block and AQE
    # coalesces the tiny packed frame to ONE partition — profiled as a
    # single task holding the whole O(n²·d) matmul for 10 s while the
    # rest of the cluster idles. Derive a minimum block count from
    # defaultParallelism (adapts to the core count the driver runs at)
    # so the stream side always carries ≥ ~2 blocks per core, capped
    # at 64-row blocks so tiny corpora don't drown in per-block
    # overhead. The pair set / top-k result is blocking-independent:
    # every (query, corpus) pair is scored in exactly one block pair
    # with identical arithmetic, and local top-k keeps boundary ties.
    par = emb.sparkSession.sparkContext.defaultParallelism
    nblocks = max(1, -(-n // block_size), min(2 * par, -(-n // 64)))

    def _pack(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(
                "_blk", F.pmod(F.xxhash64("_id"), F.lit(nblocks)).cast("int")
            )
            .groupBy("_blk")
            .agg(F.collect_list(F.struct("_id", "_v")).alias("_rows"))
            .localCheckpoint(eager=True)
        )

    packed_c = _pack(c)
    packed_q = packed_c if queries is None else _pack(_prep(queries))
    if n * max(int(_d or 0), 1) * 8 <= 128 * 1024 * 1024:
        # small-corpus regime, gated on ESTIMATED BYTES n*d*8 ≤ 128 MB
        # (ADVICE r9; identical to the former n ≤ 262,144 gate at the
        # fixture d=64): the packed corpus broadcasts, and
        # range-repartitioning the query side to one block per
        # partition pins the matmul parallelism to nblocks tasks —
        # partitioning only; no row changes hands differently
        pairs = (
            packed_q.repartitionByRange(nblocks, "_blk")
            .alias("A")
            .join(F.broadcast(packed_c).alias("B"))
            .select(
                F.col("A._rows").alias("ra"),
                F.col("B._rows").alias("rb"),
            )
        )
    else:
        # index-scale regime: no broadcast (the packed corpus is too
        # big); the replicate join's own partitioning is already wide
        # because nblocks ≳ n/block_size is large here
        pairs = (
            packed_q.alias("A")
            .join(packed_c.alias("B"))
            .select(
                F.col("A._rows").alias("ra"),
                F.col("B._rows").alias("rb"),
            )
        )
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            out_q, out_n, out_s = [], [], []
            for ra, rb in zip(pdf["ra"], pdf["rb"]):
                qi = np.array([r["_id"] for r in ra], dtype=np.int64)
                qm = np.array([r["_v"] for r in ra], dtype=np.int64)
                ci = np.array([r["_id"] for r in rb], dtype=np.int64)
                cm = np.array([r["_v"] for r in rb], dtype=np.int64)
                dots = (qm @ cm.T).astype(np.float64)
                nq = (qm * qm).sum(axis=1).astype(np.float64)
                nc = (cm * cm).sum(axis=1).astype(np.float64)
                s = dots / np.sqrt(nq[:, None] * nc[None, :])
                s[qi[:, None] == ci[None, :]] = -np.inf  # self-pairs out
                kk = min(k, s.shape[1])
                # EXACT top-k without a full-row sort (a per-row
                # O(nc log nc) argsort dominated the 100k stress run
                # ~10:1 over the matmul): argpartition gives the k-th
                # score value, the >= threshold mask keeps every
                # boundary TIE (argpartition alone splits ties
                # arbitrarily), and ONE flattened lexsort orders the
                # ~n·k survivors by (row, score desc, id asc).
                part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
                thresh = np.take_along_axis(s, part, 1).min(axis=1)
                rows, cols = np.nonzero(s >= thresh[:, None])
                sc = s[rows, cols]
                ids = ci[cols]
                order = np.lexsort((ids, -sc, rows))
                rows, sc, ids = rows[order], sc[order], ids[order]
                boundary = np.r_[True, rows[1:] != rows[:-1]]
                starts = np.maximum.accumulate(
                    np.where(boundary, np.arange(len(rows)), 0)
                )
                keep = (np.arange(len(rows)) - starts < kk) & np.isfinite(sc)
                out_q.append(qi[rows[keep]])
                out_n.append(ids[keep])
                out_s.append(sc[keep])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(
                        np.concatenate(out_q) if out_q else [], dtype="int64"
                    ),
                    "neighbor_id": pd.Series(
                        np.concatenate(out_n) if out_n else [], dtype="int64"
                    ),
                    "score": pd.Series(
                        np.concatenate(out_s) if out_s else [], dtype="float64"
                    ),
                }
            )

    local = pairs.mapInPandas(batches, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the
    exact one — the index-quality monitor every ANN deployment needs
    ("measure, don't guess": is IVF's 4-of-16 probe recall still
    acceptable after the last ingest?). Takes any two ranked frames
    carrying (query_col, neighbor_col) — IVF/LSH/PQ vs the exact
    scan, or two index generations against each other.

    Returns (query_col, n_hits, n_exact, recall_nano) per query in
    the EXACT frame: n_hits = |approx ∩ exact| (a semi-join — rank
    disagreements don't matter, membership does), n_exact the
    denominator (== k when the corpus has k true neighbors; smaller
    on tiny/degenerate corpora, so recall stays honest instead of
    capped by construction), recall_nano the one floor-quantized
    IEEE divide. Queries missing entirely from ``approx`` score 0.

    Scale: two retrieval-output-sized frames, one equi-join + one
    agg on the query key — negligible next to either retrieval.
    """
    a = approx.select(
        F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
    ).distinct()
    e = exact.select(
        F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
    ).distinct()
    hits = (
        e.join(a, ["_q", "_n"], "semi")
        .groupBy("_q")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    totals = e.groupBy("_q").agg(F.count("*").cast("long").alias("n_exact"))
    return (
        totals.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            "n_exact",
            F.floor(
                F.lit(1_000_000_000.0)
                * (
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                    / F.col("n_exact").cast("double")
                )
            )
            .cast("long")
            .alias("recall_nano"),
        )
    )
