"""Deterministic sampling / dataset-split operators.

Training-data pipelines need splits that are (a) stable across runs and
engines — re-running the pipeline must not move a document from train
to test — and (b) free of coordination: assignment must be a pure
function of the row, no global shuffle or RNG state. Hashing the row id
gives both: every engine that agrees on md5 agrees on the split.
Spark's own ``randomSplit`` meets neither requirement (seed × partition
layout dependent), which is why this module exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5 of the
    column rendered as a string.

    The first 8 hex chars (32 bits) are parsed as an integer — exactly
    reproducible in any engine with md5 (DuckDB oracle:
    ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)``).
    32 uniform bits mod ``buckets`` has bias < 2⁻²⁵ for buckets ≤ 10⁴ —
    negligible against sampling noise.
    """
    from blockchain_indexer_spark.functions.hex import md5_prefix_bigint

    c = F.col(col) if isinstance(col, str) else col
    return md5_prefix_bigint(c.cast("string"), 8) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split.

    ``splits`` maps name → percentage (must sum to 100); default the
    standard 90/5/5 train/val/test. Assignment is by hash_bucket of the
    id: stable under re-runs, engine-reproducible, and requires no
    shuffle — it is a pure projection, so Catalyst pushes it into the
    scan stage and the split of a 100 TB corpus costs one map pass.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bad = {n: p for n, p in splits.items() if not 0 <= p <= 100}
    if bad:
        # {'a': 110, 'b': -10} sums to 100 but routes every bucket to
        # 'a' while 'b' silently gets nothing
        raise ValueError(f"split percentages must each be in [0, 100]: {bad}")
    b = hash_bucket(id_col, 100)
    expr: Column | None = None
    hi = 0
    *head, (last_name, _) = splits.items()
    for name, pct in head:
        hi += pct
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    split_col = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", split_col)


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Deterministic per-group quota sample: keep the ``cap`` rows of
    each group that sort first by md5(id) — e.g. "at most N documents
    per domain/language" corpus balancing.

    Hash order makes the selection a uniform-without-replacement sample
    that is stable across runs, partition layouts, and engines (ties
    broken by the id itself, though md5 collisions are not a practical
    concern). Appends ``sample_rank`` (1-based within the group).

    Scale shape: one hash-partitioned window sort keyed on the group —
    the same shuffle any per-group top-k pays. For a pathologically
    large group (≫ executor memory), pre-thin first with
    ``hash_bucket(id, B) < ceil(B * cap * slack / group_count)`` — a
    pure map-side filter — then apply the exact window to the
    survivors; the hash order makes the two-phase result identical to
    the one-phase result with probability 1 - P[undershoot], tunable
    via slack.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= cap)
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Deterministic per-group TOKEN-budget sample: walk each group in
    md5(id) order and keep documents until the group's cumulative
    token count reaches ``budget`` — "give me ~10B tokens per source",
    the unit a training-mixture spec is actually written in (documents
    per source, quota_sample's unit, skews toward short-document
    sources).

    Boundary rule: a document is kept iff the cumulative token count
    BEFORE it is under the budget — so the budget may be overshot by
    at most one document (the standard take-while-crossing contract;
    an undershoot-only rule would starve a group whose first hash-
    ordered document alone exceeds the budget). Zero-token documents
    inside the kept prefix are kept (they cost nothing).

    Appends ``cum_before`` (exact tokens before this doc in hash
    order). Stable across runs/partitionings/engines — same argument
    as quota_sample; the one shuffle is the group-keyed window sort.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum_before = F.coalesce(
        F.sum(F.col(tokens_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    return (
        df.withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < budget)
    )


def shard_plan(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global training-order shuffle, as a (shard, pos)
    placement plan.

    Pretraining consumes the corpus in a reproducible pseudo-random
    order, materialized as S shard files each internally ordered — the
    data loader then streams shards round-robin. A true global sort of
    100 TB is one giant range exchange; instead, order by the uniform
    permutation md5(salt:id) and make it distributed by sharding on
    that same hash: shard = h mod S routes rows in ONE hash exchange,
    and each shard sorts locally under the window — reading shards in
    (shard, pos) order IS the full md5 permutation, because shard is a
    function of h. Changing ``salt`` yields an independent epoch
    permutation with no data movement beyond the same single shuffle.

    Appends ``shard`` and 1-based ``pos``. Engine-reproducible: the
    oracle replays the identical md5 arithmetic (hash_bucket docstring);
    hash ties (different ids, equal 32-bit prefix) break by id.
    """
    from blockchain_indexer_spark.functions.hex import md5_prefix_bigint

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    h = md5_prefix_bigint(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")), 8
    )
    with_h = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("bigint")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        with_h.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )
