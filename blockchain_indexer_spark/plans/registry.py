"""Registry of named queries with DuckDB oracles.

Each query is a pure function ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string executable by DuckDB against the same
parquet tables (registered as views by the driver). Column names MUST
match between the two — the correctness gate sorts columns by name and
hashes values.

Determinism rules for oracle-matched queries (documented once, applied
everywhere):

- Money/value doubles in the testdata are exact 2-decimal values, so
  ``CAST(x AS DECIMAL(18,2))`` is lossless; sums over decimals are
  order-independent and exact. Final outputs cast back to DOUBLE (all
  sums here are far below 2^53, so the cast is exact too).
- Integer-valued aggregates are cast to BIGINT on both sides (DuckDB
  SUM(int) yields HUGEINT, Spark size() yields INT — both normalized).
- Ties inside windows are broken by a unique key so row_number picks
  the same row in both engines.
- Array-valued outputs are sorted then joined to a single string to
  sidestep list-representation differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None
    doc: str = ""
    survey_refs: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    survey_refs: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder with its oracle SQL."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, survey_refs=survey_refs)
        return fn

    return wrap


def queries() -> dict[str, Builder]:
    return {q.name: q.build for q in REGISTRY.values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
