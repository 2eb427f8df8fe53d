"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's registered query
library (blockchain_indexer_spark.plans): every SURVEY.md §2 operator
shape plus the training-data-pipeline operators, each paired with a
DuckDB oracle where deterministically SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from blockchain_indexer_spark.plans import registry as _registry
from blockchain_indexer_spark.plans import REGISTRY  # noqa: F401  (populates registry)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracles()
