"""Health / backlog predicates (J14) — `Persistence/HealthCheck.cs:
8-40` and the HealthService staleness rule (`Api/HealthService.cs:
52-60`) as DataFrame scalar aggregates.

All three distances are cheap scalar aggs over indexed/partitioned
columns — max() over the block-number partition column prunes to the
last partition at scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def backlog_distances(
    blocks: DataFrame, block_staging: DataFrame, requested: DataFrame
) -> dict[str, int | None]:
    """The health query's two distances (HealthCheck.cs:14-31):

    - staging_distance: max staged number - max imported number
    - imported_distance: max imported number - (min requested-but-
      never-imported number - 1)  — how far back the oldest hole is
    """
    max_imported = blocks.agg(F.max("number")).collect()[0][0]
    max_staging = block_staging.agg(F.max("number")).collect()[0][0]
    missing = (
        requested.join(
            blocks.select("number").filter(F.col("number") < F.lit(max_imported))
            if max_imported is not None
            else blocks.select("number"),
            requested["block_no"] == F.col("number"),
            "left_anti",
        )
        .agg(F.min("block_no"))
        .collect()[0][0]
    )
    staging_distance = (
        max_staging - max_imported
        if max_staging is not None and max_imported is not None
        else None
    )
    imported_distance = (
        max_imported - (missing - 1)
        if missing is not None and max_imported is not None
        else None
    )
    return {
        "staging_distance": staging_distance,
        "imported_distance": imported_distance,
    }


def is_healthy(
    blocks: DataFrame,
    block_staging: DataFrame,
    requested: DataFrame,
    max_healthy_backlog: int,
) -> bool:
    """Healthy iff neither distance reaches the backlog bound
    (HealthCheck.cs:29-31 returns unhealthy rows; None == healthy)."""
    d = backlog_distances(blocks, block_staging, requested)
    for v in d.values():
        if v is not None and v >= max_healthy_backlog:
            return False
    return True


def batch_is_fresh(
    last_completed_batch: dt.datetime, now: dt.datetime, max_age_seconds: int = 30
) -> bool:
    """HealthService.cs:52-60 — a batch older than 30 s flags the
    instance unhealthy."""
    return last_completed_batch >= now - dt.timedelta(seconds=max_age_seconds)
