"""Bucketed table helpers — shuffle-free co-located joins.

The reference's answer to every hot join path is a covering B-tree
index (0.0.64.sql:41-48 etc., SURVEY §4). The Spark-native analog for
repeated large-× -large joins on a stable key is bucketing: both
tables pre-hashed into the same number of buckets on the join key at
WRITE time, so the join reads co-located buckets and plans a
SortMergeJoin with NO Exchange on either side — the shuffle is paid
once at write, then amortized over every subsequent join.

Uses the session catalog (``saveAsTable``); on a cluster the same call
targets the metastore/lakehouse. Bucket count is a write-time contract:
both sides must agree, and it should be sized so one bucket of the
bigger table fits an executor core (e.g. 100 TB / 4096 buckets ≈ 25 GB
per bucket before column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets lets the join skip its sort stage entirely —
    the plan degenerates to a streaming zip of the two bucket files.

    The frame is repartitioned BY THE BUCKET KEY first: without it,
    every input partition writes its own file per bucket, and Spark
    only trusts a bucket's sort order when the bucket is a single
    file — the read side would silently re-insert Sort nodes and the
    zip-join benefit evaporates.
    """
    writer = (
        df.repartition(buckets, key).write.mode("overwrite").bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    path read would lose it — bucketing lives in the catalog)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With matching bucket counts on both sides the physical plan
    contains no Exchange — asserted in tests/test_plans.py.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how
    )
