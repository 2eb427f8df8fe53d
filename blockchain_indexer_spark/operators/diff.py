"""Snapshot diff: added / removed / changed rows between two versions
of a keyed table.

The audit primitive behind every promote/retract cycle: after a reorg
retraction + replay the final tables must equal their pre-reorg state
(T5, Indexer.cs:273-325) — ``snapshot_diff(before, after, keys)``
returning ZERO rows IS that invariant, checked distributedly instead
of via driver-side collects. Same shape serves ETL regression checks
(yesterday's shard vs today's backfill) and CDC-style change feeds
between arbitrary snapshots.

Shape: ONE full-outer join on the key columns; change detection is a
row-local null-safe comparison (`<=>`) over the compared columns — no
hashing, no second pass, exact on every type including NULLs. Shuffle
is on the key set (the table's natural high-cardinality key), output
is bounded by the true change set.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows whose presence or content differs between snapshots.

    Returns (*keys, change_type) with change_type ∈ {'added',
    'removed', 'changed'}: 'added' = key only in ``after``, 'removed' =
    key only in ``before``, 'changed' = key in both with any compared
    column differing (null-safe: NULL→value and value→NULL count as
    changes, NULL→NULL does not). ``compare_cols`` defaults to every
    shared non-key column. Keys are assumed unique per snapshot (the
    promoted tables' contract); duplicate keys produce one row per
    matched pair, exactly like the underlying join.
    """
    cols = compare_cols or [
        c for c in before.columns if c in set(after.columns) and c not in set(keys)
    ]
    b = before.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        F.lit(True).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in cols],
    )
    a = after.select(
        *[F.col(k).alias(f"_ak_{k}") for k in keys],
        F.lit(True).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in cols],
    )
    # NULL-SAFE key join: a plain equi-join drops every NULL-keyed row
    # into both the added and removed sets (NULL != NULL in join
    # conditions) — with eqNullSafe a NULL key matches a NULL key,
    # which full-row diffs (keys = every column) rely on
    on = reduce(
        lambda acc, k: acc & F.col(f"_bk_{k}").eqNullSafe(F.col(f"_ak_{k}")),
        keys,
        F.lit(True),
    )
    j = b.join(a, on, "full_outer").select(
        *[
            F.coalesce(F.col(f"_bk_{k}"), F.col(f"_ak_{k}")).alias(k)
            for k in keys
        ],
        "_in_b",
        "_in_a",
        *[F.col(f"_b_{c}") for c in cols],
        *[F.col(f"_a_{c}") for c in cols],
    )
    same = reduce(
        lambda acc, c: acc & F.col(f"_b_{c}").eqNullSafe(F.col(f"_a_{c}")),
        cols,
        F.lit(True),
    )
    change = (
        F.when(F.col("_in_b").isNull(), F.lit("added"))
        .when(F.col("_in_a").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
