"""Count-min sketch (operators/sketch.py): exact-twin equality at
ample width, the one-sided guarantee under forced collisions, cell-wise
mergeability, and the heavy-hitter gate's ranking contract."""

import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _items(spark, freq):
    rows = [(t,) for t, n in freq.items() for _ in range(n)]
    return spark.createDataFrame(rows, "item string")


@pytest.fixture(scope="module")
def stream(spark):
    return _items(spark, {"a": 50, "b": 30, "c": 20, "d": 5, "e": 1})


def test_estimates_exact_at_ample_width(spark, stream):
    cells = cms_build(stream, "item", depth=4, width=1024)
    probes = stream.select("item").distinct()
    got = {r["item"]: r["cms_count"] for r in
           cms_estimate(cells, probes, "item", depth=4, width=1024).collect()}
    assert got == {"a": 50, "b": 30, "c": 20, "d": 5, "e": 1}


def test_one_sided_guarantee_under_collisions(spark, stream):
    # width=2 forces collisions: estimates may overcount, never under
    cells = cms_build(stream, "item", depth=2, width=2)
    probes = stream.select("item").distinct()
    est = {r["item"]: r["cms_count"] for r in
           cms_estimate(cells, probes, "item", depth=2, width=2).collect()}
    true = {"a": 50, "b": 30, "c": 20, "d": 5, "e": 1}
    assert all(est[t] >= n for t, n in true.items())
    # total cell mass per row equals the stream length
    per_row = {r["row"]: r["s"] for r in
               cells.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 106, 1: 106}


def test_unseen_probe_estimates_from_cells_not_null(spark, stream):
    cells = cms_build(stream, "item", depth=4, width=1024)
    probes = spark.createDataFrame([("zzz-never-seen",)], "item string")
    [row] = cms_estimate(cells, probes, "item", depth=4, width=1024).collect()
    assert row["cms_count"] >= 0  # 0 unless a bucket collides


def test_merge_is_cellwise_addition(spark):
    h1, h2 = _items(spark, {"a": 3, "b": 2}), _items(spark, {"a": 1, "c": 4})
    merged = (
        cms_build(h1, "item", depth=3, width=64)
        .unionByName(cms_build(h2, "item", depth=3, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(h1.unionByName(h2), "item", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_heavy_hitters_rank_and_overcount(spark, stream):
    out = cms_heavy_hitters(stream, "item", k=3, depth=4, width=1024).collect()
    by_rank = {r["rank"]: r for r in out}
    assert [by_rank[i]["item"] for i in (1, 2, 3)] == ["a", "b", "c"]
    for r in out:
        assert r["cms_overcount"] >= 0
        assert r["cms_count"] == r["exact_count"] + r["cms_overcount"]


def test_heavy_hitters_ties_break_by_item(spark):
    out = cms_heavy_hitters(
        _items(spark, {"x": 5, "m": 5, "z": 5}), "item", k=3
    ).collect()
    assert [r["item"] for r in sorted(out, key=lambda r: r["rank"])] == ["m", "x", "z"]
