"""asof_join semantics vs pandas.merge_asof (the independent
reference implementation) across directions, exactness, and
tolerance, plus the one-shuffle plan property."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    # keys with: interleaved matches, no-right-rows key (3), ties in
    # ts on both sides, and a right key absent on the left (9)
    left_rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 20, "b2"), (1, 5, "c"),
        (2, 7, "d"), (2, 100, "e"),
        (3, 50, "f"),
    ]
    right_rows = [
        (1, 10, 1.0), (1, 15, 2.0), (1, 19, 3.0),
        (2, 7, 4.0), (2, 8, 5.0),
        (9, 1, 6.0),
    ]
    left = spark.createDataFrame(left_rows, "k long, t long, lv string")
    right = spark.createDataFrame(right_rows, "k long, t long, rv double")
    lp = pd.DataFrame(left_rows, columns=["k", "t", "lv"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values("t", kind="stable")
    return left, right, lp, rp


def _spark_result(left, right, **kw):
    out = asof_join(left, right, on="k", left_ts="t", **kw)
    return sorted(
        (r["k"], r["t"], r["lv"], r["rv_asof"]) for r in out.collect()
    )


def _pandas_result(lp, rp, **kw):
    m = pd.merge_asof(lp, rp, on="t", by="k", **kw)
    return sorted(
        (int(r.k), int(r.t), r.lv, None if pd.isna(r.rv) else float(r.rv))
        for r in m.itertuples()
    )


@pytest.mark.parametrize(
    "spark_kw, pandas_kw",
    [
        ({}, {}),
        ({"allow_exact": False}, {"allow_exact_matches": False}),
        ({"direction": "forward"}, {"direction": "forward"}),
        (
            {"direction": "forward", "allow_exact": False},
            {"direction": "forward", "allow_exact_matches": False},
        ),
        ({"tolerance": 4}, {"tolerance": 4}),
        (
            {"direction": "forward", "tolerance": 2},
            {"direction": "forward", "tolerance": 2},
        ),
    ],
    ids=["backward", "backward-strict", "forward", "forward-strict",
         "backward-tol", "forward-tol"],
)
def test_matches_pandas_merge_asof(frames, spark_kw, pandas_kw):
    left, right, lp, rp = frames
    assert _spark_result(left, right, **spark_kw) == _pandas_result(lp, rp, **pandas_kw)


def test_every_left_row_survives(frames):
    left, right, _, _ = frames
    assert asof_join(left, right, on="k", left_ts="t").count() == left.count()


def test_one_shuffle_plan(frames):
    left, right, _, _ = frames
    p = (
        asof_join(left, right, on="k", left_ts="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange") - p.count("ReusedExchange") == 1, p


def test_null_timestamps_never_match(spark):
    """NULL-ts right rows must not 'precede everything' (ASC
    nulls-first), and NULL-ts left rows must survive with no match."""
    left = spark.createDataFrame(
        [(1, 100), (1, None)], "id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, None, 7.0), (1, 50, 9.0)], "id long, ts long, v double"
    )
    out = {
        (r["ts"]): (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, on="id", left_ts="ts").collect()
    }
    assert out[100] == (50, 9.0)  # matches the real row, not the NULL one
    assert out[None] == (None, None)  # NULL-ts left row survives unmatched


def test_right_tie_break_is_deterministic(spark):
    """Two right rows at the same (key, ts): repeated runs must pick
    the same one (payload-ordered)."""
    left = spark.createDataFrame([(1, 100)], "id long, ts long")
    right = spark.createDataFrame(
        [(1, 50, 5.0), (1, 50, 9.0)], "id long, ts long, v double"
    )
    picks = {
        asof_join(left, right, on="id", left_ts="ts").collect()[0]["v_asof"]
        for _ in range(3)
    }
    assert picks == {9.0}  # max payload struct sorts last under ASC


def test_map_payload_joins(spark):
    """A MapType payload column is unorderable and must be excluded
    from the tie-break sort key, not fail analysis (ADVICE r2)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 100), (2, 100)], "id long, ts long")
    right = (
        spark.createDataFrame([(1, 50, "a"), (1, 70, "b")], "id long, ts long, tag string")
        .withColumn("attrs", F.create_map(F.lit("k"), F.col("tag")))
    )
    got = {r["id"]: r for r in asof_join(left, right, on="id", left_ts="ts").collect()}
    assert got[1]["tag_asof"] == "b"
    assert got[1]["attrs_asof"] == {"k": "b"}
    assert got[2]["attrs_asof"] is None
