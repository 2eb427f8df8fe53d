"""Training-data governance operators: re-identification risk checks
a pipeline runs before releasing a dataset extract.

k-anonymity is the standard release gate (Sweeney 2002): group the
table by its quasi-identifier columns — attributes that look harmless
alone but jointly fingerprint a person (type + day + amount band) —
and every group's size is the anonymity set of its rows. A group of
size 1 is a unique fingerprint; groups under the chosen ``k`` fail
the release policy. The report here is the aggregate form a 100 TB
pipeline can actually afford: a banded distribution of group sizes
with row counts and shares, not a per-row flag (the per-row form is
one extra join against the same grouped frame if a caller needs it).

Scale shape: ONE groupBy over the quasi-identifier tuple (uniform
hash keys — QI tuples are near-unique by construction, so no skew),
then a second aggregate over the already-tiny per-group frame, then
one broadcast scalar for the row-share division. No window, no
collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[Column | str],
    k: int = 5,
    small_factor: int = 4,
) -> DataFrame:
    """Band the quasi-identifier group-size distribution of ``df``.

    ``qi_cols`` are the quasi-identifier expressions (pass already-
    coarsened columns — day truncation, value banding — the caller
    owns the generalization policy). Returns one row per size band:

    - ``size_band``: 'unique' (group of 1), 'under_k' (2..k-1),
      'small' (k..small_factor*k-1), 'anonymous' (the rest);
    - ``n_groups`` / ``n_rows``: BIGINT counts of QI groups and of
      underlying rows in the band;
    - ``min_group_size`` / ``max_group_size``: BIGINT band extremes;
    - ``row_share``: n_rows / total rows, the ONE IEEE division
      (both operands integers < 2^53, so it compares exactly).

    Rows whose QI tuple contains a NULL are excluded up front: a NULL
    quasi-identifier is not a disclosure surface, and dropping them
    keeps Spark's and ANSI SQL's NULL-grouping conventions out of the
    comparison entirely.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    named = [c.alias(f"_qi{i}") for i, c in enumerate(cols)]
    src = df.select(*named)
    for i in range(len(named)):
        src = src.filter(F.col(f"_qi{i}").isNotNull())
    groups = src.groupBy(*[f"_qi{i}" for i in range(len(named))]).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    band = (
        F.when(F.col("group_size") == 1, F.lit("unique"))
        .when(F.col("group_size") < k, F.lit("under_k"))
        .when(F.col("group_size") < small_factor * k, F.lit("small"))
        .otherwise(F.lit("anonymous"))
    )
    report = (
        groups.select(band.alias("size_band"), "group_size")
        .groupBy("size_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("group_size").cast("bigint").alias("n_rows"),
            F.min("group_size").cast("bigint").alias("min_group_size"),
            F.max("group_size").cast("bigint").alias("max_group_size"),
        )
    )
    # Row share via an unpartitioned window over the <= 4-band report
    # frame: one pass, no second scan of the input lineage (a scalar
    # crossJoin would re-run the QI aggregation for the total branch).
    total = F.sum("n_rows").over(Window.partitionBy())
    return report.select(
        "size_band",
        "n_groups",
        "n_rows",
        "min_group_size",
        "max_group_size",
        (F.col("n_rows").cast("double") / total.cast("double")).alias("row_share"),
    )
