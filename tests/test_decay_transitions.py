"""Time-decayed scoring exactness and Markov transition semantics
(operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

from blockchain_indexer_spark.operators.funnel import (
    time_decayed_scores,
    transition_counts,
)

T0 = dt.datetime(2024, 1, 1)
DAY_MIN = 24 * 60


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, T0 + dt.timedelta(minutes=m), t, v)
            for i, (u, m, t, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )


def test_decay_halves_per_half_life_exactly(spark):
    # as_of = max ts = user 2's event; ages in 7-day periods
    rows = [
        (1, 0, "view", 8.0),            # age = 3 periods -> 8/8 = 1.0
        (1, 7 * DAY_MIN, "view", 8.0),  # age = 2 -> 8/4 = 2.0
        (1, 14 * DAY_MIN, "view", 8.0),  # age = 1 -> 8/2 = 4.0
        (2, 21 * DAY_MIN, "view", 8.0),  # age = 0 -> 8.0
    ]
    out = {r["user_id"]: r for r in time_decayed_scores(
        _ev(spark, rows), half_life_days=7).collect()}
    assert out[1]["decayed_micro"] == 1_000_000 + 2_000_000 + 4_000_000
    assert out[2]["decayed_micro"] == 8_000_000
    assert out[1]["n_events"] == 3


def test_decay_ignores_null_user_and_zero_fills_null_value(spark):
    rows = [(1, 0, "view", None), (None, 0, "view", 5.0), (1, 0, "click", 2.0)]
    out = {r["user_id"]: r for r in time_decayed_scores(
        _ev(spark, rows), half_life_days=7).collect()}
    assert set(out) == {1}
    assert out[1]["decayed_micro"] == 2_000_000  # NULL value -> 0
    assert out[1]["n_events"] == 2


def test_decay_underflow_past_62_periods_is_exact_zero(spark):
    rows = [(1, 0, "view", 100.0), (1, 63 * 7 * DAY_MIN, "view", 1.0)]
    out = time_decayed_scores(_ev(spark, rows), half_life_days=7).collect()[0]
    # old event: age 63 -> contributes exactly 0; fresh event: 1e6
    assert out["decayed_micro"] == 1_000_000


def test_transition_counts_and_row_normalization(spark):
    rows = [
        (1, 0, "view", 0.0), (1, 1, "click", 0.0), (1, 2, "view", 0.0),
        (1, 3, "click", 0.0),
        (2, 0, "view", 0.0), (2, 1, "view", 0.0),
    ]
    out = {(r["from_type"], r["to_type"]): r for r in transition_counts(
        _ev(spark, rows)).collect()}
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "click")]["n_users"] == 1
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    # from 'view': 2 of 3 go to click -> floor(1e9 * 2/3)
    assert out[("view", "click")]["prob_nano"] == 666_666_666
    assert out[("view", "view")]["prob_nano"] == 333_333_333
    assert out[("click", "view")]["prob_nano"] == 1_000_000_000


def test_decay_explicit_past_as_of_clamps_future_events_to_full_weight(spark):
    import datetime as dt

    rows = [(1, 0, "view", 4.0), (1, 10 * DAY_MIN, "view", 4.0)]
    as_of = int((T0 + dt.timedelta(minutes=5)).timestamp() * 1_000_000)
    out = time_decayed_scores(
        _ev(spark, rows), half_life_days=7, as_of_us=as_of
    ).collect()[0]
    # both events at age 0 (the later one clamped) -> full weight each
    assert out["decayed_micro"] == 8_000_000
