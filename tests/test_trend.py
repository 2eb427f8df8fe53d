"""Exact OLS trend and CUSUM change-point semantics
(operators/trend.py)."""

from __future__ import annotations

import datetime as dt

from blockchain_indexer_spark.operators.trend import (
    cusum_changepoint,
    group_trend,
)

T0 = dt.datetime(2024, 1, 1)
NANO = 1_000_000_000


def _ev(spark, rows):
    # rows: (group, day, n_events_that_day)
    data = []
    i = 0
    for g, day, n in rows:
        for _ in range(n):
            data.append((i, g, T0 + dt.timedelta(days=day, minutes=i % 60)))
            i += 1
    return spark.createDataFrame(
        data, "event_id long, event_type string, ts timestamp"
    )


def test_trend_exact_slope_and_intercept(spark):
    # counts 2, 4, 6 on days 0..2: slope exactly 2, intercept 2
    df = _ev(spark, [("a", 0, 2), ("a", 1, 4), ("a", 2, 6)])
    out = group_trend(df).collect()[0]
    assert out["n_days"] == 3 and out["total"] == 12
    assert out["slope_nano"] == 2 * NANO
    assert out["intercept_nano"] == 2 * NANO
    # flat series: slope 0, intercept = the level
    flat = _ev(spark, [("b", 0, 5), ("b", 3, 5), ("b", 9, 5)])
    o = group_trend(flat).collect()[0]
    assert o["slope_nano"] == 0 and o["intercept_nano"] == 5 * NANO


def test_trend_drops_single_day_groups(spark):
    df = _ev(spark, [("only", 4, 7)])
    assert group_trend(df).collect() == []


def test_cusum_finds_the_level_shift_boundary(spark):
    # level 2 for days 0..4, level 10 for days 5..9: the cumulative
    # deviation from the overall mean (6) bottoms out exactly at day 4
    rows = [("a", d, 2) for d in range(5)] + [("a", d, 10) for d in range(5, 10)]
    out = cusum_changepoint(_ev(spark, rows)).collect()[0]
    base = int(T0.timestamp() * 1_000_000) // 86_400_000_000
    assert out["change_day"] == base + 4  # epoch-day of relative day 4
    assert out["n_days"] == 10 and out["total"] == 60
    # |S_4| = |10 - 5*6| = 20 -> fraction 20/60
    assert out["cusum_nano"] == int(NANO * 20 / 60)


def test_cusum_level_series_scores_zero(spark):
    rows = [("a", d, 3) for d in range(6)]
    out = cusum_changepoint(_ev(spark, rows)).collect()[0]
    assert out["cusum_scaled"] == 0 and out["cusum_nano"] == 0
    base = int(T0.timestamp() * 1_000_000) // 86_400_000_000
    assert out["change_day"] == base  # earliest-day tie-break
