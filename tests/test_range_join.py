"""interval_point_join: bucketed equi-join must be result-identical
to the naive inequality join for every bucket width, and the max_span
guard must fail fast instead of exploding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401  (doc import)

from blockchain_indexer_spark.operators.range_join import interval_point_join


@pytest.fixture(scope="module")
def data(spark):
    # boundary-heavy: points exactly at starts/ends/bucket edges,
    # zero-length intervals, nested and disjoint intervals, two keys
    pts = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(
            [("a", 0), ("a", 10), ("a", 99), ("a", 100), ("a", 101),
             ("a", 250), ("a", 999), ("b", 10), ("b", 500)]
        )],
        "pid long, k string, p long",
    )
    iv = spark.createDataFrame(
        [(j, k, s, e) for j, (k, s, e) in enumerate(
            [("a", 0, 0), ("a", 0, 100), ("a", 50, 250), ("a", 100, 100),
             ("a", 240, 1000), ("b", 0, 5), ("b", 400, 600)]
        )],
        "iid long, k string, s long, e long",
    )
    return pts, iv


def _naive(pts, iv):
    return sorted(
        (r["pid"], r["iid"])
        for r in pts.join(iv, "k").filter(F.col("p").between(F.col("s"), F.col("e"))).collect()
    )


@pytest.mark.parametrize("width", [1, 7, 100, 1000, 10000])
def test_bucketed_matches_naive(data, width):
    pts, iv = data
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_point_join(
            pts, iv, "p", "s", "e", bucket_width=width, on="k"
        ).collect()
    )
    assert got == _naive(pts, iv)


def test_no_keys_variant(spark, data):
    pts, iv = data
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_point_join(
            pts.drop("k"), iv.drop("k"), "p", "s", "e", bucket_width=64
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.drop("k").crossJoin(iv.drop("k"))
        .filter(F.col("p").between(F.col("s"), F.col("e"))).collect()
    )
    assert got == naive


def test_max_span_guard_fails_fast(spark, data):
    pts, iv = data
    with pytest.raises(Exception, match="interval spans"):
        interval_point_join(
            pts, iv, "p", "s", "e", bucket_width=1, on="k", max_span=10
        ).collect()


def test_inverted_interval_fails_fast_not_oom(spark):
    """end < start must raise the span guard, not hand sequence() a
    descending range that materializes a giant bucket array."""
    pts = spark.createDataFrame([(1, "k", 5)], "pid long, k string, p long")
    iv = spark.createDataFrame(
        [(1, "k", 10**12, 0)], "iid long, k string, s long, e long"
    )
    with pytest.raises(Exception, match="interval spans"):
        interval_point_join(
            pts, iv, "p", "s", "e", bucket_width=1000, on="k", max_span=4096
        ).collect()
