"""SparkSession factory tuned for this engine.

Local test profile runs on ``local[N]`` (single JVM); the same settings
scale to a real cluster — AQE handles runtime re-planning (partition
coalescing, skew-join splitting), shuffle partitions default to core
count locally and should be raised to ~2-3x total cores on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "blockchain_indexer_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    UTC session timezone is pinned so timestamp semantics match the
    DuckDB oracle (naive-UTC) and stay deterministic across hosts.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by BYTES, but several pipelines shuffle tiny
        # frames whose per-row cost is CPU (posting-list combination
        # explodes, shot/window signatures, packed vector blocks): the
        # default 1m floor collapsed those stages to 1-3 tasks while
        # the cluster idled (round 9, profiled). A 64k floor keeps
        # them wide; at production scale post-shuffle partitions are
        # MBs+, where the floor is inert and coalescing behaves as
        # default. Override via SPARK_GRAFT_AQE_MIN_PARTITION.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Testdata writes TIMESTAMP(NANOS) parquet, which Spark rejects;
        # read as long ns-since-epoch, converted in sources.parquet.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
