"""Extractor outputs vs hand-computed expectations on the fixtures."""

from __future__ import annotations

from decimal import Decimal

import pytest

from blockchain_indexer_spark.operators.classify import classify
from blockchain_indexer_spark.operators.extract import assemble_transactions, extract_all
from blockchain_indexer_spark.schemas import SAFE_OWNERS_SCHEMA
from tests.chain_fixtures import (
    DEST1,
    MINT,
    SAFE1,
    TOKEN1,
    TOKEN2,
    USER1,
    USER2,
    build_raw_tables,
    tx_hash,
)


@pytest.fixture(scope="module")
def tables(spark):
    blocks, txs, logs = build_raw_tables(spark)
    classified = classify(assemble_transactions(blocks, txs, logs)).cache()
    owners = spark.createDataFrame(
        [(USER1, ["0xAAA0000000000000000000000000000000000001"])], SAFE_OWNERS_SCHEMA
    )
    return {k: v.cache() for k, v in extract_all(classified, safe_owners=owners).items()}


def _by_hash(df, h):
    return [r.asDict() for r in df.collect() if r["hash"] == h]


def test_erc20_rows(tables):
    rows = _by_hash(tables["erc20_transfer"], tx_hash("erc20_pos"))
    assert len(rows) == 1
    r = rows[0]
    assert r["from"] == USER1 and r["to"] == USER2 and r["token"] == TOKEN2
    assert r["value"] == Decimal(1234) and r["value_string"] == "1234"
    # two-log tx produces two rows
    assert len(_by_hash(tables["erc20_transfer"], tx_hash("erc20_two_logs"))) == 2
    # signup's mint transfer also appears as an erc20 row
    mint_rows = _by_hash(tables["erc20_transfer"], tx_hash("signup_pos"))
    assert len(mint_rows) == 1 and mint_rows[0]["value"] == Decimal(MINT)


def test_trust_row(tables):
    rows = _by_hash(tables["crc_trust"], tx_hash("trust_pos"))
    assert len(rows) == 1
    r = rows[0]
    # address = topics[2] (user), can_send_to = topics[1]
    assert r["address"] == USER1 and r["can_send_to"] == USER2 and r["limit"] == 50
    # invalid-limit tx contributes nothing
    assert not _by_hash(tables["crc_trust"], tx_hash("trust_neg_limit"))


def test_signup_row_with_owner_enrichment(tables):
    rows = _by_hash(tables["crc_signup"], tx_hash("signup_pos"))
    assert len(rows) == 1
    r = rows[0]
    assert r["user"] == USER1 and r["token"] == TOKEN1
    assert r["owners"] == ["0xaaa0000000000000000000000000000000000001"]  # lowercased
    assert not _by_hash(tables["crc_signup"], tx_hash("signup_neg_mint"))


def test_hub_transfer_row(tables):
    rows = _by_hash(tables["crc_hub_transfer"], tx_hash("hub_pos"))
    assert len(rows) == 1
    r = rows[0]
    assert r["from"] == USER1 and r["to"] == USER2 and r["value"] == Decimal(777)


def test_eth_transfer_row(tables):
    rows = _by_hash(tables["eth_transfer"], tx_hash("eoa_pos"))
    assert len(rows) == 1
    assert rows[0]["value"] == Decimal(10**18) and rows[0]["value_string"] == "1000000000000000000"


def test_safe_transfer_row(tables):
    rows = _by_hash(tables["gnosis_safe_eth_transfer"], tx_hash("safe_pos"))
    assert len(rows) == 1
    r = rows[0]
    assert r["from"] == SAFE1 and r["to"] == DEST1
    assert r["value"] == Decimal(42 * 10**18)
    assert not _by_hash(tables["gnosis_safe_eth_transfer"], tx_hash("safe_neg_data"))


def test_transaction_table_covers_all_txs(tables):
    from tests.chain_fixtures import EXPECTED

    assert tables["transaction"].count() == len(EXPECTED)
