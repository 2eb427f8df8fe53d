"""Count-min sketch — mergeable approximate frequency counts with a
one-sided error guarantee (estimate ≥ true count, overcount bounded by
εN with probability 1−δ for width=e/ε, depth=ln(1/δ)).

The pipeline use: track per-token (or per-URL, per-domain, per-shingle)
frequencies over a corpus far too wide for an exact groupBy to be kept
AROUND — the sketch is depth×width integer cells regardless of corpus
size, mergeable across partitions/batches by cell-wise addition, so a
streaming ingest can maintain it incrementally (the same posture as
the HLL cardinality and KLL quantile gates: sketch + exact twin).

Hashing follows the repo's twin convention (operators/dedup.py):
``hash_fn="md5_60"`` — bucket_r(x) = md5-prefix-bigint("r:" + x) mod
width (functions/hex.py:61), reproducible in a DuckDB oracle, so the
WHOLE sketch (cells, point estimates, the min over rows) is
oracle-checked hash-exactly, not just property-tested; the default
``"xxhash64"`` is the production path — same plan, ~3× cheaper hash.

Scale shape: cell building is one groupBy over the (depth ×
occurrences) exploded stream — map-side combine reduces every
partition to ≤ depth·width cells before the shuffle, so the exchange
carries O(parts · depth · width) rows, independent of corpus size.
Point estimation broadcasts the finished cells (depth·width rows)
against the probe set — no corpus-sized shuffle at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.hex import md5_prefix_bigint


def _bucket(col, row: int, width: int, hash_fn: str):
    """Row-r bucket of an item, non-negative mod width.

    ``hash_fn="md5_60"`` — md5-prefix("r:" + item), 15 hex chars keeps
    the intermediate inside signed-bigint on both engines
    (the md5_prefix_bigint contract): the ORACLE-portable twin.
    ``hash_fn="xxhash64"`` — the production path (~3× cheaper per
    occurrence; the sketch hashes every occurrence depth times, so the
    hash IS the dominant build cost). Same twin convention as
    minhash/simhash (operators/dedup.py)."""
    if hash_fn == "md5_60":
        return md5_prefix_bigint(F.concat(F.lit(f"{row}:"), col), 15) % width
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(row), col), F.lit(width)).cast("bigint")
    raise ValueError(f"unknown hash_fn {hash_fn!r}; expected 'md5_60' or 'xxhash64'")


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the sketch over an item stream (one row per OCCURRENCE).

    Returns the cell frame (row int, bucket bigint, cnt bigint) —
    ≤ depth·width rows, the mergeable sketch state. Merging two
    sketches = unionByName + groupBy(row, bucket).sum(cnt)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(item_col), r, width, hash_fn).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(pairs).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-estimate the frequency of every DISTINCT item in
    ``probes``: min over the depth rows of the item's bucket count
    (missing cell ⇒ 0 — an item whose bucket nobody touched has true
    count 0). ``depth``/``width`` must match ``cms_build``'s.

    The finished cells broadcast (≤ depth·width rows), so estimation
    adds no corpus-sized shuffle."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(item_col), r, width, hash_fn).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    probe_cells = probes.select(item_col, F.explode(pairs).alias("_c")).select(
        item_col, F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket")
    )
    return (
        probe_cells.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact-twin heavy-hitter gate: the exact top-k items (count desc,
    item asc — total order) side-by-side with their sketch estimates.

    Returns (item, rank, exact_count, cms_count, cms_overcount). The
    sketch guarantee cms_count ≥ exact_count makes cms_overcount ≥ 0 a
    structural invariant; at width ≫ distinct-items it is exactly 0.
    (Candidate generation here is the exact count table — in a stream
    where that table is unaffordable, candidates come from per-batch
    local top-k unions, estimated against the same cells.)"""
    from pyspark.sql import Window as W

    exact = items.groupBy(item_col).agg(F.count("*").alias("exact_count"))
    # orderBy().limit(k) plans a distributed TakeOrdered (per-partition
    # top-k, then a k-row merge) — a global row_number window here
    # would instead single-task-sort the whole distinct-item table.
    # The window below ranks the already-k-row result.
    top = (
        exact.orderBy(F.col("exact_count").desc(), F.col(item_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("exact_count").desc(), F.col(item_col))
            ),
        )
    )
    cells = cms_build(items, item_col, depth, width, hash_fn)
    est = cms_estimate(cells, top.select(item_col), item_col, depth, width, hash_fn)
    return (
        top.join(est, [item_col])
        .select(
            item_col,
            F.col("rank").cast("long").alias("rank"),
            "exact_count",
            "cms_count",
            (F.col("cms_count") - F.col("exact_count")).alias("cms_overcount"),
        )
    )
