"""Watermarked stream-stream join (tx headers ⋈ receipts): streaming
result cross-checked against the batch twin, late receipts dropped,
outer emission for receipt-less txs once the watermark passes."""

from __future__ import annotations

import os
import time
import pytest

from pyspark.sql import functions as F

from blockchain_indexer_spark.streaming.joins import join_tx_receipts

TX_SCHEMA = "hash string, block_number long, block_timestamp long"
RC_SCHEMA = "receipt_hash string, receipt_timestamp long, logs string"

BASE = 1_600_000_000


def _frames(spark):
    txs = spark.createDataFrame(
        [(f"0x{i:064x}", 100 + i, BASE + 10 * i) for i in range(20)],
        TX_SCHEMA,
    )
    # receipt i lands 60s after its tx; tx 7's receipt is 400s late
    # (outside max_delay=5 min); tx 13 never gets a receipt
    rows = []
    for i in range(20):
        if i == 13:
            continue
        delay = 400 if i == 7 else 60
        rows.append((f"0x{i:064x}", BASE + 10 * i + delay, f"logs-{i}"))
    receipts = spark.createDataFrame(rows, RC_SCHEMA)
    return txs, receipts


def test_inner_join_batch_semantics(spark):
    txs, receipts = _frames(spark)
    out = join_tx_receipts(txs, receipts, max_delay="5 minutes").collect()
    got = {r["hash"] for r in out}
    expect = {f"0x{i:064x}" for i in range(20)} - {f"0x{7:064x}", f"0x{13:064x}"}
    assert got == expect
    assert all(r["logs"] is not None for r in out)


def test_left_outer_batch_nulls(spark):
    txs, receipts = _frames(spark)
    out = join_tx_receipts(txs, receipts, max_delay="5 minutes", how="left_outer")
    rows = {r["hash"]: r["logs"] for r in out.collect()}
    assert len(rows) == 20
    assert rows[f"0x{13:064x}"] is None  # never delivered
    assert rows[f"0x{7:064x}"] is None  # outside the delay bound
    assert rows[f"0x{0:064x}"] == "logs-0"


def test_batch_twin_matches_python_model(spark):
    """Randomized (seeded) delays: the batch twin must equal a plain
    python model of the interval predicate."""
    import random

    rng = random.Random(42)
    txs_rows = [(f"0x{i:064x}", i, BASE + rng.randrange(0, 1000)) for i in range(60)]
    tx_ts = {h: ts for h, _, ts in txs_rows}
    rc_rows = []
    for i in range(60):
        if rng.random() < 0.15:
            continue  # undelivered
        h = f"0x{i:064x}"
        rc_rows.append((h, tx_ts[h] + rng.randrange(-30, 500), f"l{i}"))
    txs = spark.createDataFrame(txs_rows, TX_SCHEMA)
    receipts = spark.createDataFrame(rc_rows, RC_SCHEMA)
    out = join_tx_receipts(txs, receipts, max_delay="5 minutes").collect()
    got = {(r["hash"], r["logs"]) for r in out}
    expect = {
        (h, logs)
        for h, ts, logs in rc_rows
        if tx_ts[h] <= ts <= tx_ts[h] + 300
    }
    assert got == expect and len(expect) > 10


def test_stream_inner_matches_batch(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssj"))
    txs, receipts = _frames(spark)
    tx_dir, rc_dir = os.path.join(root, "tx"), os.path.join(root, "rc")
    txs.write.parquet(tx_dir)
    receipts.write.parquet(rc_dir)
    batch = {
        (r["hash"], r["logs"])
        for r in join_tx_receipts(txs, receipts).collect()
    }
    st = spark.readStream.schema(TX_SCHEMA).parquet(tx_dir)
    sr = spark.readStream.schema(RC_SCHEMA).parquet(rc_dir)
    q = (
        join_tx_receipts(st, sr)
        .select("hash", "logs")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["hash"], r["logs"]) for r in spark.table("ssj_out").collect()}
    assert got == batch and len(got) == 18


@pytest.mark.slowe2e
def test_stream_left_outer_emits_after_watermark(spark, tmp_path_factory):
    """The receipt-less tx must emit (hash, NULL) once the watermark
    passes its join horizon — fed in two phases so the second trigger
    advances the watermark past phase 1.

    The watermark must cover the full intra-stream disorder: parquet
    part files arrive in arbitrary order under maxFilesPerTrigger, so
    a 1-minute watermark over a 190-second event span silently
    late-drops txs that arrive after a newer file has advanced the
    watermark (observed: 6 of 20 rows vanish). 30 minutes covers the
    span; production sizes it to the source's real disorder bound."""
    root = str(tmp_path_factory.mktemp("ssjo"))
    txs, receipts = _frames(spark)
    tx_dir, rc_dir = os.path.join(root, "tx"), os.path.join(root, "rc")
    txs.write.parquet(tx_dir)
    receipts.write.parquet(rc_dir)
    st = spark.readStream.schema(TX_SCHEMA).option(
        "maxFilesPerTrigger", "4"
    ).parquet(tx_dir)
    sr = spark.readStream.schema(RC_SCHEMA).parquet(rc_dir)
    q = (
        join_tx_receipts(st, sr, watermark="30 minutes", how="left_outer")
        .select("hash", "logs")
        .writeStream.format("memory")
        .queryName("ssjo_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    try:
        # phase 2: a far-future sentinel on both sides pushes the
        # watermark past every phase-1 horizon
        far = BASE + 10_000_000
        spark.createDataFrame(
            [("0xsentinel", 999, far)], TX_SCHEMA
        ).write.mode("append").parquet(tx_dir)
        spark.createDataFrame(
            [("0xsentinel", far + 1, "logs-s")], RC_SCHEMA
        ).write.mode("append").parquet(rc_dir)
        deadline = time.time() + 120
        want = {f"0x{7:064x}", f"0x{13:064x}"}
        while time.time() < deadline:
            nulls = {
                r["hash"]
                for r in spark.table("ssjo_out").collect()
                if r["logs"] is None
            }
            if want <= nulls:
                break
            time.sleep(1)
        assert want <= nulls
    finally:
        q.stop()
