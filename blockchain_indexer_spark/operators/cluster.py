"""Connected-components clustering for near-duplicate resolution.

A dedup pipeline doesn't stop at PAIRS: if A≈B and B≈C, all three form
one duplicate cluster and exactly one document survives. That closure
is connected components over the near-dup edge set — the step the
reference pipeline lacks and every large-scale corpus dedup needs
(matches the pair generators in operators.dedup: ngram_jaccard_pairs,
minhash_lsh_candidates, simhash_candidates, cosine_near_dup_pairs).

Two interchangeable algorithms, same (id, cluster) contract:

- ``connected_components`` — driver-coordinated min-label propagation:
  each round a vertex takes the minimum label among itself and its
  neighbors — one shuffle join + one groupBy per round, converging in
  O(component diameter) rounds. Near-dup clusters are dense and
  shallow (diameter ≲ 4), so propagation wins there.
- ``connected_components_star`` — alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond"), O(log n) rounds regardless of diameter: the escape hatch
  for adversarial long-chain graphs (equality with propagation is
  test-pinned; a 512-link chain closes in ≤ 20 rounds where
  propagation needs 512).

Every round localCheckpoints its frame — iterative lineage otherwise
grows a plan tree per round and re-analysis cost compounds (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _collected_union_find(
    edge_rows, vertex_ids, spark, id_type
) -> DataFrame:
    """Driver-side closure over a BOUNDED, already-collected edge list:
    classic union-find with path compression, roots kept at component
    minima so labels are min-ids for free. Shared by the two
    connected-components engines' ``local_threshold`` fast paths —
    bit-identical output to their distributed rounds (test-pinned)."""
    from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        if u is None or v is None:
            # a NULL endpoint never joins anything in the distributed
            # rounds (SQL join semantics: NULL matches nothing), so the
            # edge is inert there; skip it here too instead of letting
            # the `rb < ra` comparison raise on None (ADVICE r9). The
            # NULL vertex itself still emits (NULL, NULL) via find(),
            # exactly like the propagation path's unmatched left join.
            continue
        ra, rb = find(u), find(v)
        if ra != rb:
            # attach the larger root under the smaller: roots stay
            # component minima, so labels are min-ids for free
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(v, find(v)) for v in vertex_ids]
    return spark.createDataFrame(
        rows,
        StructType([StructField("id", id_type), StructField("cluster", id_type)]),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = 0,
) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (id, cluster) for every vertex appearing in an edge, where
    ``cluster`` is the minimum vertex id of the component — the
    deterministic canonical survivor. Raises if propagation hasn't
    converged after ``max_iter`` rounds (component diameter > max_iter
    — pick large-star/small-star instead of raising the cap).

    ``local_threshold`` (round 9, optimization): same contract as
    ``connected_components_star``'s — when > 0 and the symmetrized
    edge count is at or under 2x the threshold, the closure is ONE
    bounded collect + driver union-find + one createDataFrame instead
    of O(diameter) iterative rounds at ~3 scheduled jobs per round
    (profiled: the rounds are almost pure job-scheduling overhead at
    any graph size the collect bound admits). Identical (id, min-id
    cluster) bits out; larger graphs fall through to the distributed
    rounds unchanged, so the flag is safe on any caller.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if local_threshold and sym.count() <= 2 * local_threshold:
        # sym carries both orientations (2 rows per undirected edge)
        # and keeps self-loops, so its endpoint set IS the vertex set:
        # one bounded collect serves both the edges and the vertices
        rows = sym.collect()
        vertex_ids = {r[0] for r in rows}
        vertex_ids.update(r[1] for r in rows)
        return _collected_union_find(
            ((r[0], r[1]) for r in rows),
            vertex_ids,
            edges.sparkSession,
            sym.schema["a"].dataType,
        )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # max_iter + 1: a component whose diameter is EXACTLY max_iter
    # still flips a label on round max_iter and needs one quiet round
    # to confirm convergence — without the +1 the stated "diameter >
    # max_iter" contract would raise on diameter == max_iter
    for _ in range(max_iter + 1):
        nb = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nb"))
            .withColumnRenamed("a", "id")
        )
        # One job per round: the change flag rides inside the
        # checkpointed frame, so convergence detection is a local scan
        # of materialized partitions, not a second join+recompute.
        new = (
            labels.join(nb, "id", "left")
            .select(
                "id",
                F.least("label", F.coalesce("nb", "label")).alias("new_label"),
                (F.coalesce("nb", "label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new.select("id", F.col("new_label").alias("label"))
        if new.filter(F.col("_changed")).limit(1).count() == 0:
            return labels.select("id", F.col("label").alias("cluster"))
    raise RuntimeError(
        f"connected_components: not converged after {max_iter} rounds; "
        "component diameter exceeds the cap"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_threshold: int = 0,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the O(log n)-round escape hatch for graphs whose
    component diameter defeats min-label propagation (a 10k-link chain
    converges here in ~log rounds instead of 10k).

    Each round is two phases over the current edge multiset, each ONE
    groupBy + join, all keyed on the vertex id:

    - large-star: every node's strictly-LARGER neighbors re-attach to
      the minimum of its closed neighborhood;
    - small-star: its smaller-or-equal neighbors (and itself) do.

    Both phases only ever decrease (node, min-neighbor) attachments,
    so the edge set converges to stars whose centers are component
    minima. Per-round frames are localCheckpointed (iterative lineage).

    Returns (id, cluster) for every vertex in an edge — identical
    contract to connected_components; equality on random graphs and
    pathological chains is test-pinned.

    ``local_threshold`` (round 8): when > 0 and the deduped edge count
    is at or under it, the closure runs as ONE bounded collect +
    driver-side union-find + one createDataFrame, instead of ~40-50
    iterative micro-jobs — the fast path for HASH-LEVEL closures whose
    graph is bounded by hash-space structure, never corpus size (the
    image/audio/video dedup verdicts: a 16-bit fingerprint space
    cannot exceed 2^16 vertices no matter how many documents hash into
    it, and the distinct-hash pair frame is already materialized for
    the count). Identical (id, min-id cluster) bits out — equality
    with the distributed rounds is test-pinned — and graphs over the
    threshold fall through to the distributed path unchanged, so the
    flag is safe on any caller; it only defaults on where the bound is
    structural. 0 disables (the pre-round-8 behavior).
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Vertices come from the RAW edges (before the self-loop filter):
    # a vertex appearing only in self-loop edges must still emit
    # (id, id) — the same contract as connected_components' (ADVICE r3).
    vertices = (
        raw.select(F.col("u").alias("id"))
        .unionByName(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if local_threshold and e.count() <= local_threshold:
        # bounded collect (both frames are materialized checkpoints)
        return _collected_union_find(
            ((row.u, row.v) for row in e.collect()),
            [v.id for v in vertices.collect()],
            edges.sparkSession,
            vertices.schema["id"].dataType,
        )

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # m(u) = min of the CLOSED neighborhood (neighbors + u itself)
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        nbrs = sym.filter(F.col("v") > F.col("u")) if large else sym.filter(
            F.col("v") <= F.col("u")
        )
        out = nbrs.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        if not large:
            # small-star also attaches u itself to its minimum
            out = out.unionByName(m.select("u", F.col("m").alias("v")))
        return (
            out.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    for _ in range(max_iter):
        after_large = _star(e, large=True)
        after_small = _star(after_large, large=False)
        # converged when the canonical edge set is a fixpoint
        changed = (
            after_small.join(e, ["u", "v"], "left_anti")
            .unionByName(e.join(after_small, ["u", "v"], "left_anti"))
            .limit(1)
            .count()
        )
        e = after_small
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star: not converged after {max_iter} rounds"
        )
    # e is now a union of stars rooted at component minima: every
    # remaining edge (u, v) with u < v attaches v to root u — but
    # roots may chain one level (u itself attached elsewhere) only if
    # not converged, which the fixpoint excludes.
    labels = e.select(F.col("v").alias("id"), F.col("u").alias("cluster"))
    roots = (
        vertices.join(labels, "id", "left_anti")
        .select("id", F.col("id").alias("cluster"))
    )
    return labels.unionByName(roots)


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left: str = "doc_a",
    right: str = "doc_b",
    local_threshold: int = 200_000,
) -> DataFrame:
    """Full-corpus dedup verdict from a near-dup pair frame.

    Returns (id, cluster, keep): every row of ``df`` labeled with its
    duplicate cluster (its own id when it has no near-dups) and whether
    it is the cluster's survivor (the minimum id).

    ``local_threshold`` (round 9, optimization): forwarded to the
    closure — the pair frame is pinned here anyway, so the bounded
    count is a local scan, and a near-dup pair set under the bound
    closes in one driver union-find instead of O(diameter) iterative
    rounds (bit-identical, test-pinned). Larger pair sets fall through
    to the distributed rounds unchanged — the 100 TB posture is
    untouched because the threshold is a hard row-count gate, not a
    heuristic.
    """
    # pin the O(pairs) frame: connected_components' symmetrization
    # union reads it twice, and the pair generators' post-checkpoint
    # tail (size joins + threshold filter) would otherwise run per
    # branch
    pairs = pairs.localCheckpoint(eager=True)
    comp = connected_components(pairs, left, right, local_threshold=local_threshold)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("cluster", "id").alias("cluster"),
            (F.coalesce("cluster", "id") == F.col("id")).alias("keep"),
        )
    )


def dbscan_clusters(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.6,
    min_pts: int = 4,
    scale: int = 1000,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over an
    embedding column — the density complement of k-means/SemDeDup:
    clusters of arbitrary shape emerge from the eps-neighbor graph and
    low-density points are explicitly NOISE instead of being forced
    into the nearest centroid (outlier triage for training corpora).

    Similarity is quantized cosine (>= ``eps`` means "neighbors");
    ``pairs`` defaults to the exact blocked-matmul all-pairs engine
    (``dedup.cosine_near_dup_pairs`` — the oracle baseline) and
    accepts ``similarity.lsh_near_dup_pairs`` output as the
    sub-quadratic scale path, exactly like the near-dup operators.

    Semantics, made deterministic where classic DBSCAN is scan-order
    dependent:

    - core: closed eps-neighborhood size >= ``min_pts`` (the point
      itself counts, the textbook rule);
    - cluster: connected components over CORE-CORE edges, labeled by
      minimum core id (an isolated core is its own cluster);
    - border: non-core with >= 1 core neighbor, assigned the MINIMUM
      cluster label among its core neighbors (classic DBSCAN gives a
      border point to whichever cluster's scan reached it first —
      min-label is the engine-reproducible tie-break);
    - noise: everything else, cluster −1 (zero-norm vectors have no
      cosine, so they are noise by construction).

    Scale: the pair frame is the whole cost (see its engines); after
    it, everything is degree counts, semi-joins and min-aggs on the
    O(E) symmetric edge list (checkpointed once — three consumers) +
    the Pregel-shape CC rounds. Returns (id, role, cluster) for every
    input row, all-integer labels, recursive-CTE oracle-able.
    """
    from blockchain_indexer_spark.operators.dedup import cosine_near_dup_pairs
    from blockchain_indexer_spark.sources.parquet import spread

    if pairs is None:
        pairs = cosine_near_dup_pairs(emb, id_col, vec_col, threshold=eps, scale=scale)
    edges = (
        pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
        # canonicalize + distinct: degrees below COUNT symmetrized
        # rows, so an injected ``pairs`` frame carrying duplicate rows,
        # both orientations, or self-pairs would silently inflate
        # neighborhood sizes and misclassify core/border/noise
        # (ADVICE r6). The built-in engines emit distinct a<b pairs,
        # making this one O(E) exchange a no-op for them — cheap
        # insurance relative to the pair engine it follows.
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # checkpoint BEFORE the symmetrization union: both union
        # branches and all downstream consumers (deg, core-core
        # edges, border assignment) re-read this frame, so without it
        # the O(n^2/B) pair engine runs once per branch (measured 2x
        # the matmul wall time at the 20x stress scale)
        .localCheckpoint(eager=True)
    )
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    core = (
        deg.filter(F.col("deg") + 1 >= min_pts)
        .select(F.col("a").alias("id"))
        .localCheckpoint(eager=True)  # three consumers below
    )
    ce = sym.join(
        core.select(F.col("id").alias("a")), "a", "leftsemi"
    ).join(core.select(F.col("id").alias("b")), "b", "leftsemi")
    # star contraction, not min-label propagation: eps-neighbor graphs
    # over manifold/gradient-shaped embeddings CHAIN (x1~x2~x3... each
    # within eps), so core-core component diameter grows with data
    # shape and blows past propagation's round cap — the same failure
    # mode that moved image_dedup_clusters to star contraction
    # (ADVICE r6; identical (id, cluster=min-id) contract). Bounded
    # core-core graphs close in one driver union-find (round 9: the
    # star rounds profiled as ~90% job-scheduling overhead at any size
    # the collect bound admits); larger graphs fall through unchanged.
    comp = connected_components_star(ce, "a", "b", local_threshold=200_000)
    core_lab = core.join(comp, "id", "left").select(
        "id", F.coalesce("cluster", "id").alias("cluster")
    )
    border = (
        sym.join(core.select(F.col("id").alias("a")), "a", "left_anti")
        .join(
            core_lab.select(F.col("id").alias("b"), F.col("cluster").alias("_c")),
            "b",
        )
        .groupBy("a")
        .agg(F.min("_c").alias("cluster"))
    )
    return (
        spread(emb, id_col)
        .select(F.col(id_col).alias("id"))
        .join(core_lab.withColumnRenamed("cluster", "_cc"), "id", "left")
        .join(
            border.select(F.col("a").alias("id"), F.col("cluster").alias("_bc")),
            "id",
            "left",
        )
        .select(
            "id",
            F.when(F.col("_cc").isNotNull(), F.lit("core"))
            .when(F.col("_bc").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_cc", "_bc", F.lit(-1)).cast("bigint").alias("cluster"),
        )
    )


def khop_reachability(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
) -> DataFrame:
    """Bounded-depth directed reachability: for every source vertex,
    the count of distinct vertices reachable within 1..``k`` hops
    (destination != source; cycles back to the source don't count).

    The Circles primitive behind transitive transfers: "who can I
    ultimately send to through the trust graph" — the bounded-depth
    planning query a pathfinder runs before flow computation (the
    reference materializes the 1-hop capacity graph, 0.0.64.sql
    transitive path views; this is its multi-hop closure).

    Returns (``src``, n_reach_1, .., n_reach_k) — cumulative distinct
    counts per depth. Vertices with out-degree 0 don't appear (they
    reach nothing).

    Scale shape: semi-naive BFS — each round joins only the previous
    FRONTIER (paths of exactly length i) against the edge list, then
    subtracts already-reached pairs, so work per round is proportional
    to newly discovered pairs, not the full closure. One equi-join +
    one distinct per round, both on the vertex key; hub skew is AQE's
    skew-join case. Each round's frontier is localCheckpointed — the
    iterative plan otherwise deepens per round. Bounded k keeps the
    pair set linear in practice (trust graphs fan out fast; unbounded
    closure would need the large-star contraction instead).

    Memory note: the per-round localCheckpoints stay pinned until the
    returned frame's references are garbage collected (the result
    reads them). In a long-lived session interleaving many builds with
    other work, drop the result promptly or materialize it to a table
    — retained checkpoint blocks otherwise accumulate (bench.py
    measured the effect and drains them between sections).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reached = e  # paths of length <= 1
    frontier = e  # paths of exactly the current length
    counts = [
        reached.groupBy("a").agg(F.count("*").alias("n_reach_1")),
    ]
    for depth in range(2, k + 1):
        step = (
            frontier.join(e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b")
            .select("a", F.col("c").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        frontier = step.join(reached, ["a", "b"], "left_anti").localCheckpoint(eager=True)
        reached = reached.union(frontier).localCheckpoint(eager=True)
        counts.append(
            reached.groupBy("a").agg(F.count("*").alias(f"n_reach_{depth}"))
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.join(c, "a")
    return out.withColumnRenamed("a", src)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """Integer-deterministic PageRank: importance ranking over a
    directed edge list — the iterative graph aggregation pattern
    (contrib join + dst-keyed sum per round, same shuffle shape as
    connected_components).

    Determinism engineering: ranks live as 1e12-SCALED INTEGERS and
    every division is an integer floor (r div outdeg; the damping and
    teleport terms use rational damping_num/damping_den) — so the
    dst-keyed contribution SUM is an order-free integer sum and the
    result is bit-identical across runs, partitionings and engines
    (an unrolled-CTE DuckDB oracle reproduces it exactly, the
    kmeans/BPE recipe). The per-division floor loses < 1 unit in 1e12
    per edge vs. real-valued PageRank — far below any ranking
    decision — and buys exactness no float formulation can offer.

    Variant notes (documented contract): dangling vertices (no
    out-edges) absorb their mass (no redistribution term), and
    parallel edges are collapsed (DISTINCT) before degree counting.

    Scale: per round ONE join keyed on src (rank + degree ride
    together) and ONE groupBy on dst; rounds localCheckpoint
    (iterative lineage). State is O(vertices); at 100 TB the edge
    frame partitions by src and the rank frame co-partitions — the
    standard Pregel-style layout.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertices = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return vertices.select(
            "id", F.lit(0).cast("bigint").alias("rank_scaled"),
            F.lit(0.0).alias("rank"),
        )
    # out-degree is loop-invariant: fold it into the edge frame ONCE
    # (round 10, guide §2.4 — the former per-round e ⋈ r ⋈ deg paid the
    # deg join iters times; same rows, same arithmetic, one join and
    # one groupBy per round now)
    e = e.join(e.groupBy("_s").agg(F.count("*").alias("_deg")), "_s").localCheckpoint(
        eager=True
    )
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    r = vertices.select("id", F.lit(scale // n).cast("bigint").alias("_r"))
    for _ in range(iters):
        contrib = (
            e.join(r.withColumnRenamed("id", "_s"), "_s")
            .select(F.col("_d").alias("id"), F.expr("_r div _deg").alias("_c"))
            .groupBy("id")
            .agg(F.sum("_c").cast("bigint").alias("_sum"))
        )
        r = (
            vertices.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(_sum, 0L)) div {damping_den}"
                    )
                ).cast("bigint").alias("_r"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select(
        "id",
        F.col("_r").alias("rank_scaled"),
        (F.col("_r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Quality-aware dedup verdict: like ``dedup_survivors``, but each
    cluster keeps its BEST-scoring member (ties -> smallest id) instead
    of its smallest id — the production dedup policy ("keep the longest
    / highest-quality copy", Gopher/RefinedWeb style) rather than the
    arbitrary-but-stable one.

    Returns (id, cluster, score, keep). Cost shape on top of the
    closure: one left join to label rows and one window argmax
    partitioned by cluster — the same key the components groupBy
    already hashed on, so the added exchange is cluster-keyed and
    skew-bounded by the largest dup cluster (near-dup clusters are
    small by construction; a degenerate giant cluster is a data bug the
    profiler surfaces, not a plan hazard).
    """
    # same pin as dedup_survivors: the closure's symmetrization union
    # reads the pair frame twice (and the same bounded union-find fast
    # path with distributed fall-through — see dedup_survivors)
    pairs = pairs.localCheckpoint(eager=True)
    comp = connected_components(pairs, left, right, local_threshold=200_000)
    labeled = (
        df.select(F.col(id_col).alias("id"), F.col(score_col).alias("score"))
        .join(comp, "id", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("id")))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc_nulls_last("score"), F.asc("id")
    )
    return labeled.withColumn(
        "keep", F.row_number().over(w) == F.lit(1)
    ).select("id", "cluster", "score", "keep")


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle participation and local clustering
    coefficient over an undirected graph — the structural diagnostic
    for similarity graphs (a near-dup or mutual-kNN edge set with high
    triangle density has coherent clusters; a low-coherence one is
    hash noise).

    Degree-ordered orientation (each undirected edge directed from its
    lower-(degree, id) endpoint) is what makes this safe at graph
    scale: every wedge is enumerated at its lowest-rank vertex, whose
    out-degree is O(sqrt(m)), so the wedge self-join emits O(m^{3/2})
    candidates TOTAL regardless of skew (Schank-Wagner / Cohen's
    MapReduce formulation) — a celebrity vertex of degree d costs its
    neighbors' low-side wedges, never d^2. Each triangle is counted
    exactly once (its two lowest-rank edges form the wedge; the
    closing edge is oriented consistently), then credited to all three
    vertices by a 3-way explode.

    Returns (id, degree, n_tri, clustering) for vertices in >= 1
    triangle; clustering = 2*n_tri / (degree*(degree-1)), exact-double
    reproducible because both factors are exact integers.

    Self-loops are dropped (a self-loop is not a triangle edge);
    duplicate / reversed input edges collapse via the canonical
    (least, greatest) distinct.
    """
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # The canonical edge list feeds degree (twice), the orientation
    # join and the closing-edge probe — six consumers in total. Without
    # materialization each one replays the FULL upstream lineage (for a
    # mutual-kNN input that is six brute-force kNN passes over the
    # corpus); the edge list itself is O(m), tiny next to the corpus,
    # so pin it once.
    und = (
        e0.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("_db"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    # Consumed three ways (both wedge legs + the closing-edge probe);
    # still O(m) rows — pin it so the degree joins run once.
    oriented = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("y"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dy"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select("x", "y", F.col("_dy").alias("_ry"))
    e2 = oriented.select(
        F.col("x").alias("_x2"), F.col("y").alias("z"), F.col("_dy").alias("_rz")
    )
    wedges = e1.join(
        e2,
        (F.col("x") == F.col("_x2"))
        & (
            (F.col("_ry") < F.col("_rz"))
            | ((F.col("_ry") == F.col("_rz")) & (F.col("y") < F.col("z")))
        ),
    ).select("x", "y", "z")
    closing = oriented.select(F.col("x").alias("y"), F.col("y").alias("z"))
    tri = wedges.join(closing, ["y", "z"])
    per = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("n_tri"))
    )
    return per.join(deg, "id").select(
        "id",
        F.col("deg").cast("bigint").alias("degree"),
        "n_tri",
        (
            (F.lit(2.0) * F.col("n_tri"))
            / (F.col("deg") * (F.col("deg") - F.lit(1)))
        ).alias("clustering"),
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation over an undirected graph
    (Zhu/Ghahramani 2002, the hard-label variant): seed nodes keep
    their label (clamped); every other node takes, each synchronous
    round, the MAJORITY label among its currently-labeled neighbors
    (ties to the smallest label; no labeled neighbor -> stays
    unlabeled). The cheap way to stretch a small labeled set over an
    unlabeled corpus along a similarity graph (mutual-kNN here) —
    the transductive sibling of the kNN label probe.

    Determinism: the vote is exact integer counts with a total-order
    tie-break (count desc, label asc), so every round — and therefore
    the fixed ``iters``-round result — is engine-reproducible; the
    oracle unrolls the rounds as CTEs (the BPE unrolled-oracle
    pattern).

    Returns (id_col, label_col, is_seed) for every node labeled after
    ``iters`` rounds. NULL-labeled seed rows are ignored.

    Scale: per round one edge-keyed join against the current label
    frame plus one (node, label) count agg — all uniform-key
    shuffles, O(edges) rows; rounds are a small constant. Each
    round's frame is localCheckpointed (iterative lineage, the CC
    pattern above).
    """
    und = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).filter(F.col("_a") != F.col("_b"))
    adj = (
        und.unionAll(
            und.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
        )
        .distinct()
        # every round's checkpoint action re-evaluates adj's lineage;
        # for a mutual-kNN edge input that is one full kNN matmul pass
        # PER ROUND (plus one per union branch) — pin the O(E) frame
        # once, the triangle_counts/pagerank convention
        .localCheckpoint(eager=True)
    )
    seed = (
        seeds.select(
            F.col(id_col).alias("_id"), F.col(label_col).alias("_l")
        )
        .filter(F.col("_l").isNotNull())
        .distinct()
    )
    labels = seed.localCheckpoint(eager=True)
    w = Window.partitionBy("_id").orderBy(F.desc("_n"), F.asc("_l"))
    for _ in range(iters):
        votes = (
            adj.join(
                labels.select(F.col("_id").alias("_b"), "_l"), "_b"
            )
            .select(F.col("_a").alias("_id"), "_l")
            .groupBy("_id", "_l")
            .agg(F.count("*").alias("_n"))
        )
        derived = (
            votes.join(seed.select("_id"), "_id", "anti")  # seeds clamp
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("_id", "_l")
        )
        labels = seed.unionAll(derived).localCheckpoint(eager=True)
    return labels.join(
        seed.select("_id", F.lit(True).alias("is_seed")), "_id", "left"
    ).select(
        F.col("_id").alias(id_col),
        F.col("_l").alias(label_col),
        F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
    )


def cross_modal_dedup_clusters(
    universe: DataFrame,
    evidence: list[DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    """ONE multi-modal keep decision per document from per-modality
    dup evidence: text, image, audio and video dedup each produce
    either a VERDICT frame ((id, cluster, keep) — the
    ``dedup_survivors`` / ``*_dedup_clusters`` contract) or a raw
    near-dup PAIR frame ((doc_a, doc_b) / (id_a, id_b)); this unions
    all of it into one doc-level graph and re-runs the survivor
    closure, so a document that duplicates another in ANY modality
    lands in the same cross-modal cluster and only the minimum id
    survives (transitively: A≈B by image and B≈C by text drops both
    B and C in favor of A).

    Verdict frames contribute their STAR edges (cluster → member, one
    edge per non-survivor doc) rather than raw pairs — O(docs) edges
    per modality regardless of dup-group sizes, preserving each
    modality's hash-level factoring (a dup-dense modality's doc-level
    pair set is quadratic in group size; its star is linear and has
    the same connected components). Pair frames are used as-is.

    Scale: |edges| = Σ O(docs) + |text pairs|; one distinct, then the
    ``dedup_survivors`` star-contraction closure — all uniform-key
    shuffles, nothing quadratic."""
    edges = []
    for ev in evidence:
        cols = set(ev.columns)
        if "cluster" in cols:
            idc = "id" if "id" in cols else id_col
            edges.append(
                ev.filter(F.col(idc) != F.col("cluster")).select(
                    F.col("cluster").alias("doc_a"), F.col(idc).alias("doc_b")
                )
            )
        elif {"doc_a", "doc_b"} <= cols:
            edges.append(ev.select("doc_a", "doc_b"))
        elif {"id_a", "id_b"} <= cols:
            edges.append(
                ev.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
            )
        else:
            raise ValueError(
                f"evidence frame with columns {sorted(cols)} is neither a "
                "verdict (cluster/keep) nor a pair (doc_a/doc_b, id_a/id_b) "
                "frame"
            )
    if not edges:
        raise ValueError("at least one evidence frame required")
    pairs = edges[0]
    for e in edges[1:]:
        pairs = pairs.unionByName(e)
    return dedup_survivors(universe, pairs.distinct(), id_col)
