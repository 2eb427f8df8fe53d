"""Ordered-sequence analytics over event streams: funnel conversion
and cohort retention.

The two classic product-analytics operators an event-indexing engine
is asked for (the reference's events surface stops at per-day counts
and sessionization — SURVEY.md SS2 T10/A4; these extend the same
events table to ORDERED behavior):

- ``funnel_conversion`` — per user, greedy-earliest sequential step
  matching: the earliest step-1 event, then the earliest step-2 event
  STRICTLY AFTER it, and so on. "view -> click -> purchase" with the
  steps in order — a GROUP BY over event types cannot express the
  ordering constraint; this is the canonical funnel semantics.
- ``cohort_retention`` — users bucketed by first-activity day (their
  cohort), then for every (cohort, day-offset) the count of cohort
  members active that day, as a retention fraction.

Determinism: all time comparisons are integer epoch MICROSECONDS
(unix_micros / epoch_us — exact on both engines, the
event_sessionization contract); days are integer us // 86_400e6 (no
timezone arithmetic at all); the one retention fraction is a single
IEEE divide of exact integers, floor-quantized to nano units (the
house pattern).

Scale shapes (100 TB):
- funnel: one filtered user-keyed min-agg per step plus an equi-join
  back — k steps = k narrow aggregations over type-pruned scans
  (predicate pushdown keeps each pass to its step's rows), every
  shuffle keyed on the uniform user id.
- cohort: one distinct (user, day) projection, one per-user min, one
  (cohort, offset) count-distinct — all uniform-key shuffles; output
  is bounded by |cohorts| x |offsets|, corpus-size independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000
_NANO = 1_000_000_000.0


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_step_gap_us: int | None = None,
) -> DataFrame:
    """Greedy-earliest funnel matching.

    Returns one row per user who completed at least step 1:
    (user_col, steps_completed, t1_us, t2_us, ... tN_us) where t_i_us
    is the epoch-microsecond timestamp of the matched step-i event
    (NULL once the funnel stalls). Greedy-earliest is the standard
    funnel semantics: matching the EARLIEST eligible event at each
    stage maximizes the number of users who can complete the suffix
    (any later choice only shrinks the remaining window) — and it
    stays optimal under ``max_step_gap_us``, the time-bounded variant
    (step i must land within the gap after step i-1; "clicked within
    a day of viewing"): an earlier match only widens every later
    step's window.

    Ties inside one microsecond resolve to the same t value (min is
    over us), so the result is engine-stable without a row tiebreak.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    e = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(type_col).alias("_t"),
    )
    cur = (
        e.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        gap_ok = (
            F.lit(True)
            if max_step_gap_us is None
            else (F.col("_us") <= F.col("_prev") + F.lit(int(max_step_gap_us)))
        )
        nxt = (
            e.filter(F.col("_t") == step)
            .join(cur.select("_u", F.col(f"t{i-1}_us").alias("_prev")), "_u")
            .filter((F.col("_us") > F.col("_prev")) & gap_ok)
            .groupBy("_u")
            .agg(F.min("_us").alias(f"t{i}_us"))
        )
        cur = cur.join(nxt, "_u", "left")
    completed = sum(
        F.col(f"t{i}_us").isNotNull().cast("long") for i in range(1, len(steps) + 1)
    )
    return cur.select(
        F.col("_u").alias(user_col),
        completed.cast("long").alias("steps_completed"),
        *[F.col(f"t{i}_us") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-granularity cohort retention.

    cohort_day = the integer epoch day (us // 86_400e6) of a user's
    first event; for every (cohort_day, day_offset >= 0) with at
    least one active user, returns

        (cohort_day, day_offset, cohort_size, n_active,
         retention_nano = floor(1e9 * n_active / cohort_size))

    day_offset 0 rows satisfy n_active == cohort_size by construction
    (every member is active on their first day). NULL users/timestamps
    are ignored.
    """
    days = (
        events.select(user_col, F.unix_micros(F.col(ts_col)).alias("_us"))
        .filter(F.col(user_col).isNotNull() & F.col("_us").isNotNull())
        .select(user_col, F.expr(f"_us div {_US_PER_DAY}").alias("_day"))
        .distinct()
    )
    cohorts = days.groupBy(user_col).agg(F.min("_day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    active = (
        days.join(cohorts, user_col)
        .groupBy("cohort_day", (F.col("_day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return active.join(sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        "n_active",
        F.floor(
            F.lit(_NANO)
            * (F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
        )
        .cast("long")
        .alias("retention_nano"),
    )


def time_decayed_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    as_of_us: int | None = None,
) -> DataFrame:
    """Per-user exponentially time-decayed engagement score — the
    recency-weighted rollup behind trending/engagement rankings:
    every event contributes value * 0.5^(age / half_life), so
    yesterday outweighs last month without a hard cutoff window.

    Determinism without libm pow: ages are INTEGER half-life periods
    (age_us div (half_life * 86_400e6)), so the decay factor is
    EXACTLY 2^-k = 1.0 / (1 << k) — a power of two; multiplying the
    (exact 2-decimal) value by it is exact rescaling with NO rounding,
    and the only rounding is the one floor(1e6 * term) quantization
    before the order-free integer SUM (the house pattern). Terms
    older than 62 periods underflow the micro quantum and contribute
    an exact 0 (1 << k would overflow int64 past 62).

    ``as_of_us`` defaults to the table's max timestamp (one scalar
    agg — deterministic from the data, unlike now()). Returns
    (user_col, n_events, last_seen_us, decayed_micro). NULL
    users/timestamps are ignored; NULL values count 0.

    Scale: one narrow projection + one user-keyed agg; the as-of
    scalar is the only driver round-trip.
    """
    e = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.coalesce(
            F.col(value_col).cast("decimal(18,2)").cast("double"), F.lit(0.0)
        ).alias("_v"),
    ).filter(F.col("_u").isNotNull() & F.col("_us").isNotNull())
    if as_of_us is None:
        as_of_us = e.agg(F.max("_us")).collect()[0][0]
        if as_of_us is None:
            return e.select(
                F.col("_u").alias(user_col),
                F.lit(0).cast("long").alias("n_events"),
                F.lit(None).cast("long").alias("last_seen_us"),
                F.lit(0).cast("long").alias("decayed_micro"),
            ).limit(0)
    period_us = half_life_days * _US_PER_DAY
    # clamp at 0: with an explicit as_of_us older than some events,
    # a negative age would reach shiftleft as a negative bit count
    # (Java shifts by count mod 64 — silently wrong); events after
    # the as-of instant count at full weight instead
    e = e.withColumn(
        "_age",
        F.greatest(F.expr(f"({int(as_of_us)} - _us) div {period_us}"), F.lit(0)),
    )
    # shiftleft's DataFrame API takes a literal bit count; the SQL form
    # accepts an expression
    decay = F.when(
        F.col("_age") <= 62,
        F.lit(1.0)
        / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_age AS INT))").cast("double"),
    ).otherwise(F.lit(0.0))
    term = F.floor(F.lit(1_000_000.0) * (F.col("_v") * decay)).cast("long")
    return (
        e.withColumn("_t", term)
        .groupBy("_u")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("_us").alias("last_seen_us"),
            F.sum("_t").cast("long").alias("decayed_micro"),
        )
        .select(
            F.col("_u").alias(user_col), "n_events", "last_seen_us", "decayed_micro"
        )
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    consecutive event pair WITHIN a user (ordered by timestamp, then
    ``order_col`` for same-microsecond ties), count (from_type,
    to_type) transitions — the behavioral-structure rollup funnel
    analysis assumes and sessionization feeds.

    Returns (from_type, to_type, n_transitions, n_users,
    prob_nano = floor(1e9 * n_transitions / total_from)) where
    total_from sums over the from_type row — exact integer counts,
    one IEEE divide, floor-quantized.

    Scale: one user-keyed window (lag) on a narrow projection — the
    same single-exchange shape as event_sessionization — then a
    (from, to) agg bounded by |types|^2.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy("_us", order_col)
    pairs = (
        events.select(
            user_col,
            F.col(order_col),
            F.unix_micros(F.col(ts_col)).alias("_us"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col(user_col).isNotNull() & F.col("_us").isNotNull())
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.countDistinct(user_col).cast("long").alias("n_users"),
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("_tf")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_users",
        F.floor(
            F.lit(_NANO)
            * (F.col("n_transitions").cast("double") / F.col("_tf").cast("double"))
        )
        .cast("long")
        .alias("prob_nano"),
    )


def conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    window_us: int = _US_PER_DAY,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion
    event, every touch event by the same user STRICTLY BEFORE it and
    within the lookback window, with both standard credit models in
    one frame:

    - ``is_last_touch`` — the single most recent touch (ties inside
      one microsecond break to the larger touch id — total order, so
      the winner is engine-reproducible, unlike an unordered as-of
      tie);
    - ``credit_ppm = 1_000_000 div n_touches`` — linear multi-touch
      credit, integer-divided so credits are exact and order-free
      (a conversion's credits sum to <= 1e6 with the remainder
      dropped, the documented floor semantics).

    Returns (conversion_id, user_col, conv_us, touch_id, touch_type,
    touch_us, gap_us, n_touches, is_last_touch, credit_ppm).
    Conversions with NO touch in window emit nothing (count them via
    an anti-join on conversion_id downstream).

    Scale: the candidate join is the bucketed point-in-interval range
    join (operators.range_join — window-sized buckets, span <= 2, so
    each touch replicates O(1) times); ranking and counting run per
    conversion over lookback-bounded frames.
    """
    from blockchain_indexer_spark.operators.range_join import interval_point_join

    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col).alias("_cu"),
            F.unix_micros(F.col(ts_col)).alias("conv_us"),
        )
        .filter(F.col("_cu").isNotNull() & F.col("conv_us").isNotNull())
        .withColumn("_w_start", F.col("conv_us") - F.lit(int(window_us)))
        .withColumn("_w_end", F.col("conv_us") - F.lit(1))
    )
    touch = (
        events.filter(F.col(type_col).isin(list(touch_types)))
        .select(
            F.col(id_col).alias("touch_id"),
            F.col(user_col).alias("_cu"),
            F.col(type_col).alias("touch_type"),
            F.unix_micros(F.col(ts_col)).alias("touch_us"),
        )
        .filter(F.col("_cu").isNotNull() & F.col("touch_us").isNotNull())
    )
    cand = interval_point_join(
        touch,
        conv,
        point_col="touch_us",
        start_col="_w_start",
        end_col="_w_end",
        bucket_width=int(window_us),
        on="_cu",
    )
    w_rank = Window.partitionBy("conversion_id").orderBy(
        F.desc("touch_us"), F.desc("touch_id")
    )
    w_all = Window.partitionBy("conversion_id")
    return (
        cand.withColumn("n_touches", F.count("*").over(w_all).cast("long"))
        .withColumn("_rk", F.row_number().over(w_rank))
        .select(
            "conversion_id",
            F.col("_cu").alias(user_col),
            "conv_us",
            "touch_id",
            "touch_type",
            "touch_us",
            (F.col("conv_us") - F.col("touch_us")).cast("long").alias("gap_us"),
            "n_touches",
            (F.col("_rk") == 1).alias("is_last_touch"),
            F.expr("1000000 div n_touches").cast("long").alias("credit_ppm"),
        )
    )
