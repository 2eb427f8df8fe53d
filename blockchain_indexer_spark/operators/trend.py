"""Time-series trend analytics over event streams: exact per-group
OLS trend lines and CUSUM change-point detection.

The monitoring questions a pipeline owner asks of any per-day series
("is volume drifting?", "WHEN did it shift?") — answered with the
house determinism contract: all sufficient statistics are exact
BIGINT sums (order-free), every reported fraction is ONE IEEE divide
of exact-in-double integers, floor-quantized to nano units.

- ``group_trend`` — per group, the least-squares line through its
  (day, count) series, from the closed-form sufficient statistics:

      slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
      intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

  x is the day OFFSET from the group's first day, so the integer
  products stay small regardless of the epoch (a raw epoch-day x
  would push n·Σx² toward 2^53 on long histories for no reason).

- ``cusum_changepoint`` — per group, the day where the cumulative
  deviation from the group mean peaks (the classic CUSUM statistic;
  a single level shift maximizes |S| exactly at the shift boundary).
  S_d = Σ_{i≤d}(c_i − μ) is kept INTEGER by scaling with n_days:
  S'_d = n_days·cum(d) − rank(d)·total, so the argmax needs no float
  at all; the reported magnitude is floor-quantized once at the end.

Scale: both are (group, day) count aggregations (map-side combinable,
output bounded by |groups| × |days|) followed by windows over the
post-agg frame — corpus-size independent beyond the first projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000
_NANO = 1_000_000_000.0


def _daily_counts(
    events: DataFrame, group_col: str, ts_col: str
) -> DataFrame:
    """(group, day-offset x, count y) with x relative to the group's
    first active day. NULL groups/timestamps are ignored; silent days
    simply contribute no row (OLS/CUSUM run over OBSERVED days —
    document the densify variant if zeros must count)."""
    d = (
        events.select(group_col, F.unix_micros(F.col(ts_col)).alias("_us"))
        .filter(F.col(group_col).isNotNull() & F.col("_us").isNotNull())
        .select(group_col, F.expr(f"_us div {_US_PER_DAY}").alias("_day"))
        .groupBy(group_col, "_day")
        .agg(F.count("*").cast("long").alias("_y"))
    )
    w = Window.partitionBy(group_col)
    return d.withColumn(
        "_x", (F.col("_day") - F.min("_day").over(w)).cast("long")
    )


def group_trend(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact OLS trend of daily volume per group.

    Returns (group_col, n_days, total, slope_nano, intercept_nano):
    slope in events/day (nano-quantized), intercept the fitted count
    at the group's first observed day. Groups with < 2 distinct days
    (zero variance in x) are dropped — a line through one point is
    undefined. Integer sufficient statistics are exact while
    n·Σx² < 2^53 (≈ 40M observed days per group — decades of
    per-second data rolled daily).
    """
    daily = _daily_counts(events, group_col, ts_col)
    stats = daily.groupBy(group_col).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return (
        stats.filter(den > 0)
        .select(
            group_col,
            F.col("_n").alias("n_days"),
            F.col("_sy").alias("total"),
            F.floor(
                F.lit(_NANO)
                * (
                    (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
                    .cast("double")
                    / den.cast("double")
                )
            )
            .cast("long")
            .alias("slope_nano"),
            F.floor(
                F.lit(_NANO)
                * (
                    (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy"))
                    .cast("double")
                    / den.cast("double")
                )
            )
            .cast("long")
            .alias("intercept_nano"),
        )
    )


def cusum_changepoint(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """CUSUM change-point per group: the observed day where the
    cumulative deviation of daily counts from the group mean peaks.

    Returns (group_col, n_days, total, change_day, cusum_scaled,
    cusum_nano): change_day the epoch-day number at the peak (ties
    break to the EARLIEST day — the first time the shift is fully
    visible), cusum_scaled the exact integer n_days·cum(d) −
    rank(d)·total (= n_days·S_d, so the argmax is float-free),
    cusum_nano = floor(1e9 · |cusum_scaled| / (n_days·total)) — the
    peak cumulative deviation as a fraction of total volume (0 for a
    perfectly level series). Groups with < 2 days are dropped (no
    interior boundary to shift at).
    """
    daily = _daily_counts(events, group_col, ts_col)
    wg = Window.partitionBy(group_col)
    wcum = Window.partitionBy(group_col).orderBy("_day")
    scored = (
        daily.withColumn("_nd", F.count("*").over(wg).cast("long"))
        .withColumn("_tot", F.sum("_y").over(wg).cast("long"))
        .withColumn("_cum", F.sum("_y").over(wcum).cast("long"))
        .withColumn("_rk", F.row_number().over(wcum).cast("long"))
        .filter(F.col("_nd") >= 2)
        .withColumn(
            "_s", F.col("_nd") * F.col("_cum") - F.col("_rk") * F.col("_tot")
        )
    )
    wbest = Window.partitionBy(group_col).orderBy(
        F.desc(F.abs(F.col("_s"))), F.asc("_day")
    )
    return (
        scored.withColumn("_b", F.row_number().over(wbest))
        .filter(F.col("_b") == 1)
        .select(
            group_col,
            F.col("_nd").alias("n_days"),
            F.col("_tot").alias("total"),
            F.col("_day").alias("change_day"),
            F.col("_s").alias("cusum_scaled"),
            F.floor(
                F.lit(_NANO)
                * (
                    F.abs(F.col("_s")).cast("double")
                    / (F.col("_nd") * F.col("_tot")).cast("double")
                )
            )
            .cast("long")
            .alias("cusum_nano"),
        )
    )
