"""Funnel ordering semantics, cohort retention arithmetic
(operators/funnel.py) and reciprocal-rank fusion (textprep.rrf_fuse)."""

from __future__ import annotations

import datetime as dt

from blockchain_indexer_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)
from blockchain_indexer_spark.operators.textprep import rrf_fuse

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # user 2: purchase BEFORE click -> only 2 steps count
        (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
        # user 3: never viewed -> absent (no step 1)
        (3, 0, "click"), (3, 5, "purchase"),
        # user 4: view only
        (4, 0, "view"),
    ]
    out = {r["user_id"]: r for r in funnel_conversion(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 2  # click matched, purchase was earlier
    assert out[2]["t3_us"] is None
    assert 3 not in out
    assert out[4]["steps_completed"] == 1 and out[4]["t2_us"] is None


def test_funnel_greedy_earliest_maximizes_completion(spark):
    # the ONLY purchase sits between the two clicks: matching the
    # earliest click (greedy) completes the funnel; matching the later
    # one would not.
    rows = [
        (1, 0, "view"), (1, 5, "click"), (1, 7, "purchase"), (1, 9, "click"),
    ]
    out = funnel_conversion(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    assert out[0]["steps_completed"] == 3
    assert out[0]["t2_us"] < out[0]["t3_us"]


def test_cohort_retention_exact_fractions(spark):
    day = 24 * 60
    rows = (
        # cohort day 0: users 1,2,3,4; day1 actives: 1,2; day2: 1
        [(u, 0, "view") for u in (1, 2, 3, 4)]
        + [(1, day, "view"), (2, day + 5, "click"), (1, 2 * day, "view")]
        # cohort day 1: user 5 only
        + [(5, day, "view"), (5, 2 * day, "view")]
    )
    out = {(r["cohort_day"], r["day_offset"]): r for r in cohort_retention(
        _ev(spark, rows)).collect()}
    d0 = min(k[0] for k in out)
    assert out[(d0, 0)]["cohort_size"] == 4
    assert out[(d0, 0)]["n_active"] == 4
    assert out[(d0, 0)]["retention_nano"] == 1_000_000_000
    assert out[(d0, 1)]["n_active"] == 2
    assert out[(d0, 1)]["retention_nano"] == 500_000_000
    assert out[(d0, 2)]["n_active"] == 1
    assert out[(d0, 2)]["retention_nano"] == 250_000_000
    assert out[(d0 + 1, 0)]["cohort_size"] == 1
    assert out[(d0 + 1, 1)]["n_active"] == 1


def test_rrf_fuse_combines_and_breaks_ties_by_doc(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank long",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], k0=60, k=10).collect()}
    s = lambda rk: int(1e9 / (60 + rk))  # noqa: E731
    assert out[10]["rrf_nano"] == s(1) + s(3) and out[10]["n_lists"] == 2
    assert out[11]["rrf_nano"] == s(2) + s(1)
    assert out[12]["rrf_nano"] == s(3) and out[12]["n_lists"] == 1
    assert out[13]["rrf_nano"] == s(2)
    # doc 11 (ranks 2+1) beats doc 10 (ranks 1+3)
    assert out[11]["fused_rank"] == 1 and out[10]["fused_rank"] == 2
    # docs 12 and 13 tie in list count; 13 has the better rank
    assert out[13]["fused_rank"] == 3 and out[12]["fused_rank"] == 4


def test_windowed_funnel_enforces_per_step_gap(spark):
    # user 1: click 30 min after view (inside a 1 h window);
    # user 2: click 2 h after view (outside) -> funnel stalls at 1
    rows = [
        (1, 0, "view"), (1, 30, "click"),
        (2, 0, "view"), (2, 120, "click"),
    ]
    out = {r["user_id"]: r for r in funnel_conversion(
        _ev(spark, rows), ["view", "click"],
        max_step_gap_us=3_600_000_000).collect()}
    assert out[1]["steps_completed"] == 2
    assert out[2]["steps_completed"] == 1 and out[2]["t2_us"] is None


def test_windowed_funnel_greedy_earliest_still_optimal(spark):
    # two views: matching the EARLIER view leaves the click outside
    # the window, but greedy then catches the click from the later...
    # no — step 1 is fixed to the earliest view; the click at 90 min
    # is outside its 1 h window even though a later view is closer.
    # This pins the documented greedy-from-earliest semantics.
    rows = [(1, 0, "view"), (1, 50, "view"), (1, 90, "click")]
    out = funnel_conversion(
        _ev(spark, rows), ["view", "click"], max_step_gap_us=3_600_000_000
    ).collect()[0]
    assert out["steps_completed"] == 1


def test_conversion_attribution_last_touch_and_linear_credit(spark):
    import datetime as dt

    from blockchain_indexer_spark.operators.funnel import conversion_attribution

    rows = [
        # user 1: view@0, click@40, purchase@60; view@-2000 outside 1 h
        (0, 1, -2000, "view"), (1, 1, 0, "view"), (2, 1, 40, "click"),
        (3, 1, 60, "purchase"),
        # user 2: purchase with no touches -> no rows
        (4, 2, 0, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(minutes=m), t) for i, u, m, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = conversion_attribution(
        df, "purchase", ("view", "click"), window_us=3_600_000_000
    ).collect()
    assert {r["conversion_id"] for r in out} == {3}
    by_touch = {r["touch_id"]: r for r in out}
    assert set(by_touch) == {1, 2}  # the -2000 view is outside the window
    assert by_touch[2]["is_last_touch"] is True  # click@40 most recent
    assert by_touch[1]["is_last_touch"] is False
    assert all(r["n_touches"] == 2 and r["credit_ppm"] == 500_000 for r in out)
    assert by_touch[2]["gap_us"] == 20 * 60 * 1_000_000
