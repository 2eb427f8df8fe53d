"""Bucketed co-located joins (no Exchange in the plan) and salted
skew joins (same results as the plain join)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.skew import salted_join
from blockchain_indexer_spark.sources.bucketed import (
    cobucketed_join,
    write_bucketed,
)
from blockchain_indexer_spark.sources.parquet import load_table


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed("l_orderkey", "o_orderkey")
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
        write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=8)
        # force the sort-merge path: a broadcast join would hide the
        # co-location property this test pins
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert not re.search(r"\bExchange\b", plan), "co-bucketed join still shuffles"
            assert "SortMergeJoin" in plan
            # and it computes the right thing
            expect = orders.join(lineitem, "o_orderkey").count()
            assert joined.count() == expect > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    # one mega-hot key (90% of rows) plus a long tail
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("key"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k40", 3), ("missing", 4)], "key string, dim int"
    )
    plain = big.join(small, "key").select("key", "payload", "dim")
    salted = salted_join(big, small, "key").select("key", "payload", "dim")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # outer flavor: unmatched big rows survive with NULL dim
    louter = salted_join(big, small, "key", how="left").filter(F.col("dim").isNull())
    assert louter.count() == big.join(small, "key", "left").filter(F.col("dim").isNull()).count()


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    big = spark.range(10).select(F.lit("k").alias("key"), F.col("id"))
    small = spark.createDataFrame([("k", 1)], "key string, dim int")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "key", how=how)
