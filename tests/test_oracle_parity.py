"""Every registered query with an oracle must match DuckDB exactly
(rows sorted by all columns, exact values) at sf0.001. This mirrors —
and is stricter than — the driver's hash-based correctness gate."""

from __future__ import annotations

import pytest

from blockchain_indexer_spark.plans import REGISTRY
from tools.check_correctness import compare, duck_con

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    spark_pdf = q.build(spark, sf_dir).toPandas()
    duck_pdf = con.sql(q.oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
