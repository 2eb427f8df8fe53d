"""Range (interval) join: match points to the intervals containing
them.

Spark plans a raw ``p BETWEEN start AND end`` join as a broadcast
nested loop (or worse) — O(|points| × |intervals|) comparisons with no
partition pruning. The scale path is BUCKETING: intervals explode to
the fixed-width buckets they cover, points map to exactly one bucket,
and the join becomes an equi-join on (keys…, bucket) followed by the
exact range filter. Each (point, interval) pair can only meet in the
point's own bucket, so the equi-join introduces no duplicates.

Cost model: shuffle grows by the average interval's bucket span
(len/bucket_width + 1), comparisons shrink from |P|×|I| per key to
per-bucket products — pick ``bucket_width`` near the median interval
length so typical intervals explode to ~2 buckets. Degenerate long
intervals (≫ bucket_width) are the skew risk: they explode into many
buckets. ``max_span`` guards against unbounded blowup by failing fast
rather than silently producing a 10^6-row explode per row; raise it
deliberately, or pre-split giant intervals hierarchically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: str | list[str] | None = None,
    max_span: int = 4096,
) -> DataFrame:
    """Inner join: every (point, interval) pair with optional equal
    keys ``on`` and ``start_col <= point_col <= end_col``. Columns of
    both inputs survive (names must not collide). Integer/long
    point/start/end columns (convert timestamps with unix_micros).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    wi = int(bucket_width)
    # integer `div` (not float floor-division): float quotients of
    # epoch-microsecond magnitudes can round across bucket boundaries.
    # div truncates toward zero — monotonic, so bucket(point) always
    # lies within [bucket(start), bucket(end)] for contained points.
    b_start = F.expr(f"`{start_col}` div {wi}")
    b_end = F.expr(f"`{end_col}` div {wi}")
    span = (b_end - b_start + 1).cast("int")
    exploded = (
        intervals.withColumn("_span", span)
        .withColumn(
            "_bucket",
            F.explode(
                # lower bound too: an INVERTED interval (end < start)
                # has span <= 0, and Spark's sequence(b_start, b_end)
                # would then auto-step -1 and materialize a giant
                # DESCENDING array — the exact OOM this guard exists
                # to prevent
                F.when(
                    (F.col("_span") >= 1)
                    & (F.col("_span") <= F.lit(int(max_span))),
                    F.sequence(b_start, b_end),
                )
                # fail fast, inside the row that violates the bound, so
                # the error names the offending span instead of OOMing
                .otherwise(F.raise_error(F.concat(
                    F.lit("interval_point_join: interval spans "),
                    F.col("_span").cast("string"),
                    F.lit(f" buckets (must be in [1, {max_span}]); "
                          "widen bucket_width, pre-split long "
                          "intervals, or drop inverted ones"),
                )))
            ),
        )
        .drop("_span")
    )
    pts = points.withColumn("_bucket", F.expr(f"`{point_col}` div {wi}"))
    joined = pts.join(exploded, [*keys, "_bucket"]).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")
