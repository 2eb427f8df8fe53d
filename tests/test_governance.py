"""k-anonymity release gate (operators.governance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.governance import k_anonymity_report


def test_k_anonymity_bands_and_shares(spark):
    """Hand-built QI groups land in the right bands with exact counts:
    one singleton, one group of 3 (under k=5), one of 7 (small), one
    of 25 (anonymous) — 36 rows total."""
    rows = (
        [("a", 1)] * 1 + [("b", 1)] * 3 + [("c", 2)] * 7 + [("d", 2)] * 25
    )
    df = spark.createDataFrame(rows, "qi1 string, qi2 int")
    out = {
        r["size_band"]: r
        for r in k_anonymity_report(df, ["qi1", "qi2"], k=5).collect()
    }
    assert set(out) == {"unique", "under_k", "small", "anonymous"}
    assert (out["unique"]["n_groups"], out["unique"]["n_rows"]) == (1, 1)
    assert (out["under_k"]["n_groups"], out["under_k"]["n_rows"]) == (1, 3)
    assert (out["small"]["n_groups"], out["small"]["n_rows"]) == (1, 7)
    assert (out["anonymous"]["n_groups"], out["anonymous"]["n_rows"]) == (1, 25)
    assert out["small"]["min_group_size"] == 7 == out["small"]["max_group_size"]
    assert out["anonymous"]["row_share"] == 25.0 / 36.0
    assert sum(r["row_share"] for r in out.values()) == 1.0


def test_k_anonymity_null_qi_rows_excluded(spark):
    """A NULL in any QI column drops the row before grouping — NULL
    quasi-identifiers are not a disclosure surface and must not form
    a phantom group."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), (None, 1), ("b", None)],
        "qi1 string, qi2 int",
    )
    out = k_anonymity_report(df, [F.col("qi1"), F.col("qi2")], k=5).collect()
    assert len(out) == 1
    assert out[0]["size_band"] == "under_k"
    assert out[0]["n_rows"] == 2
    assert out[0]["row_share"] == 1.0
