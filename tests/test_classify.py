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


def test_adversarial_abi_offset_poisons_not_crashes(spark):
    """An execTransaction input whose data-offset head word is 2^32
    (or anything in [2^31, 1e38)) must classify the tx Unknown — the
    reference catches the DecodeFunctionInput throw (:439-443) — and
    must NOT abort the batch with an ANSI CAST_OVERFLOW."""
    from tests.chain_fixtures import exec_transaction_input

    base = exec_transaction_input("0x" + "11" * 20, 5)
    # overwrite head slot 2 (offset word) with 2^32
    body = base[10:]
    evil = "0x6a761202" + body[:128] + f"{2**32:064x}" + body[192:]
    blocks = spark.createDataFrame(
        [(1, "0xb1", 1_600_000_000, 1)],
        "number long, hash string, timestamp long, total_transaction_count int",
    )
    txs = spark.createDataFrame(
        [("0xevil", 1, "0xb1", 0, "0xaa", "0xbb", "0", evil, "1", "0")],
        "hash string, block_number long, block_hash string, `index` int, "
        "`from` string, `to` string, value string, input string, nonce string, type string",
    )
    logs = spark.createDataFrame(
        [], "tx_hash string, log_index int, address string, topics array<string>, data string"
    )
    out = classify(assemble_transactions(blocks, txs, logs)).collect()
    assert len(out) == 1
    assert out[0]["classification"] == ["Unknown"]  # poisoned, job alive


def test_huge_tx_value_string_classifies_not_crashes(spark):
    """A wei value string above decimal(38,0) must not abort the
    batch (try_cast policy); the tx simply fails the value>0 gate the
    way an unparseable value lands in Unknown in the reference."""
    blocks = spark.createDataFrame(
        [(1, "0xb1", 1_600_000_000, 1)],
        "number long, hash string, timestamp long, total_transaction_count int",
    )
    txs = spark.createDataFrame(
        [("0xbig", 1, "0xb1", 0, "0xaa", "0xbb", "9" * 50, "0x", "1", "0")],
        "hash string, block_number long, block_hash string, `index` int, "
        "`from` string, `to` string, value string, input string, nonce string, type string",
    )
    logs = spark.createDataFrame(
        [], "tx_hash string, log_index int, address string, topics array<string>, data string"
    )
    out = classify(assemble_transactions(blocks, txs, logs)).collect()
    assert len(out) == 1
    assert out[0]["classification"] == ["Unknown"]
