"""One-pass table profiler (operators.profile)."""

from __future__ import annotations

import datetime as dt

from blockchain_indexer_spark.operators.profile import profile


def test_profile_nulls_distinct_and_ranges(spark):
    rows = [
        (1, "a", 2.5, dt.datetime(2020, 1, 1)),
        (2, "a", None, dt.datetime(2020, 1, 2)),
        (3, None, 7.5, None),
        (None, "b", 2.5, dt.datetime(2020, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "k bigint, s string, v double, ts timestamp")
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert set(got) == {"k", "s", "v", "ts"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["k"]["n_nulls"] == 1 and got["k"]["n_distinct"] == 3
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 3.0
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_num"] is None and got["s"]["max_num"] is None
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_num"] == 2.5 and got["v"]["max_num"] == 7.5
    assert got["ts"]["n_nulls"] == 1 and got["ts"]["n_distinct"] == 2
    assert got["ts"]["min_num"] == dt.datetime(
        2020, 1, 1, tzinfo=dt.timezone.utc
    ).timestamp() * 1_000_000


def test_profile_approx_mode_matches_exact_on_small_data(spark):
    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    exact = {r["col_name"]: r["n_distinct"] for r in profile(df).collect()}
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile(df, exact_distinct=False).collect()
    }
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(1, 0.06 * exact[c])
