"""Parquet source helpers for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet``. Loads are
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown and
column pruning; never cache here — callers decide materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns arrive as long (ns since epoch)
    # under spark.sql.legacy.parquet.nanosAsLong; restore timestamp at
    # microsecond precision — integer `div`, never float division (ns
    # epoch values exceed double's 2^53 exact-integer range). DuckDB
    # truncates ns→us identically (its TIMESTAMP is us-precision).
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Distribute a narrow scan across the cluster before CPU-heavy
    per-row work (shingling, hashing, vector math).

    A small table arriving as one parquet split would otherwise run
    the whole expression pipeline on a single core; the repartition
    costs one tiny shuffle and buys full parallelism. At production
    scale the scan already has >= defaultParallelism splits and this
    is a no-op.

    Pass `key` (a unique id column) when the spread subplan appears
    several times in one query: hash partitioning is deterministic, so
    Catalyst canonicalizes the copies and ReusedExchange computes the
    expensive stage once (round-robin blocks that).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key)) if key else df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
