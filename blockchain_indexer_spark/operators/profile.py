"""One-pass table profiling: per-column null counts, cardinality and
numeric ranges — the data-quality summary every ingest/ETL run logs
before promoting a shard (schema drift, null explosions, key
cardinality collapse all show up here first).

Shape: ONE aggregate pass computes every column's statistics as
parallel aggregate expressions over the same scan (no per-column
re-scan), then the single result row is exploded into one row per
column. With ``exact_distinct=True`` Spark plans the multi-distinct
via expand (distinct-count per column is exact — the oracle-checked
mode); at corpus scale pass ``exact_distinct=False`` to swap every
distinct for a HyperLogLog sketch — the whole profile then costs one
map pass + one tiny merge, mergeable across shards, same trick as
``corpus_token_cardinality_approx``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num). ``min_num``/``max_num`` are DOUBLE
    for numeric columns and epoch-microseconds for timestamps (both
    exact in IEEE double below 2^53); NULL for other types. NULLs are
    excluded from n_distinct (count of distinct non-null values).
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs.append(
            # coalesce: SUM over an empty table is NULL, but the
            # null-count contract says 0 (profiling a not-yet-promoted
            # shard is a normal call)
            F.coalesce(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"_nn_{c}")
        )
        nd = F.countDistinct(c) if exact_distinct else F.approx_count_distinct(c)
        aggs.append(nd.cast("bigint").alias(f"_nd_{c}"))
        t = dtypes[c]
        if t.split("(")[0] in _NUMERIC:
            num = F.col(c).cast("double")
        elif t.startswith("timestamp"):
            # NTZ → TZ is identity under the pinned UTC session zone;
            # unix_micros only accepts the TZ flavor
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.min(num).alias(f"_min_{c}"))
        aggs.append(F.max(num).alias(f"_max_{c}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_num"),
            F.col(f"_max_{c}").alias("max_num"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
