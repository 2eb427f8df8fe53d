"""Classifier parity with TransactionClassifier.cs semantics on the
synthetic chain fixtures (positives, negatives, poison cases)."""

from __future__ import annotations

import pytest

from blockchain_indexer_spark.operators.classify import classify
from blockchain_indexer_spark.operators.extract import assemble_transactions
from tests.chain_fixtures import EXPECTED, build_raw_tables


@pytest.fixture(scope="module")
def classified(spark):
    blocks, txs, logs = build_raw_tables(spark)
    return classify(assemble_transactions(blocks, txs, logs)).cache()


def test_every_case_classified_as_expected(classified):
    got = {r["hash"]: r["classification"] for r in classified.select("hash", "classification").collect()}
    assert len(got) == len(EXPECTED)
    mismatches = {
        h: (exp, got[h]) for h, exp in EXPECTED.items() if got.get(h) != exp
    }
    assert not mismatches, f"classification mismatches: {mismatches}"


def test_flags_consistent_with_labels(classified):
    rows = classified.select("hash", "classification", "is_Erc20Transfer", "is_CrcTrust").collect()
    for r in rows:
        assert r["is_Erc20Transfer"] == ("Erc20Transfer" in r["classification"])
        assert r["is_CrcTrust"] == ("CrcTrust" in r["classification"])
