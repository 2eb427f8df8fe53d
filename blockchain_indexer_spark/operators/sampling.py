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

from pyspark.sql import Column, DataFrame
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
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
        % F.lit(buckets)
    )


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
    b = hash_bucket(id_col, 100)
    expr: Column | None = None
    hi = 0
    *head, (last_name, _) = splits.items()
    for name, pct in head:
        hi += pct
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    split_col = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", split_col)
