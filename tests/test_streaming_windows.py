"""Watermarked windowed aggregation + applyInPandasWithState stateful
operator, cross-checked against their batch twins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blockchain_indexer_spark.streaming.runner import FEED_SCHEMA
from blockchain_indexer_spark.streaming.windows import (
    account_totals_batch,
    running_account_totals,
    windowed_event_counts,
)
from tests.test_streaming import feed_df  # noqa: F401 — module fixture


def test_windowed_counts_stream_matches_batch(spark, tmp_path_factory, feed_df):  # noqa: F811
    root = str(tmp_path_factory.mktemp("wc"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    feed_df.write.parquet(feed_dir)

    batch = {
        (r["window_start"], r["n_txs"])
        for r in windowed_event_counts(feed_df).collect()
    }
    stream = spark.readStream.schema(FEED_SCHEMA).parquet(feed_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["window_start"], r["n_txs"]) for r in spark.table("wc_out").collect()}
    assert got == batch and len(got) > 0


def test_running_account_totals_stateful(spark, tmp_path_factory, feed_df):  # noqa: F811
    root = str(tmp_path_factory.mktemp("state"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    os.makedirs(feed_dir)
    # split the feed by tx-index parity so most accounts have rows in
    # BOTH halves; run the stream twice over the same checkpoint — the
    # second run must restore per-account state and keep accumulating
    out = os.path.join(root, "updates")
    # synthetic feed: 3 accounts × 4 txs each (the chain fixture has
    # one tx per account, which can never span two batches); value=wei
    rows = [
        (
            100 + i,
            f"0xb{i:063x}",
            1_600_000_000 + i,
            1,
            f"0x{i:064x}",
            0,
            f"0xa{i % 3:039x}",
            "0xdst",
            str(10 * (i + 1)),
            "0x",
            "1",
            "0",
            None,
        )
        for i in range(12)
    ]
    full = spark.createDataFrame(rows, FEED_SCHEMA)
    half_a = full.filter(F.col("block_number") % 2 == 0)
    half_b = full.filter(F.col("block_number") % 2 == 1)

    def run() -> None:
        stream = spark.readStream.schema(FEED_SCHEMA).parquet(feed_dir)

        def sink(df, epoch_id):
            df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        q = (
            running_account_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half_a.write.mode("append").parquet(feed_dir)
    run()
    half_b.write.mode("append").parquet(feed_dir)
    run()  # restarts from the checkpoint — must restore per-account state

    updates = spark.read.parquet(out)
    # totals are cumulative, so the final value per account is the row
    # from its highest epoch
    from pyspark.sql import Window as W

    latest = (
        updates.withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("account").orderBy(F.desc("epoch"))),
        )
        .filter(F.col("_rn") == 1)
        .collect()
    )
    got = {r["account"]: (r["n_txs"], round(r["total_value_wei"], 6)) for r in latest}
    want = {
        r["account"]: (r["n_txs"], round(r["total_value_wei"], 6))
        for r in account_totals_batch(full).collect()
    }
    assert got == want and len(want) > 0
    # state genuinely crossed the restart: some account appears in
    # multiple epochs with a growing count
    pairs = updates.select("account", "epoch", "n_txs").collect()
    by_account: dict = {}
    for r in pairs:
        by_account.setdefault(r["account"], []).append((r["epoch"], r["n_txs"]))
    grew = [
        a
        for a, seen in by_account.items()
        if len(seen) > 1 and max(n for _, n in seen) > min(n for _, n in seen)
    ]
    assert grew, "no account accumulated across the two runs"


def test_session_windows_stream_matches_batch(spark, tmp_path_factory, feed_df):  # noqa: F811
    from blockchain_indexer_spark.streaming.windows import session_event_stats

    root = str(tmp_path_factory.mktemp("sw"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    feed_df.write.parquet(feed_dir)

    batch = {
        (r["account"], r["session_start"], r["session_end"], r["n_txs"])
        for r in session_event_stats(feed_df).collect()
    }
    stream = spark.readStream.schema(FEED_SCHEMA).parquet(feed_dir)
    q = (
        session_event_stats(stream)
        .writeStream.format("memory")
        .queryName("sw_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["account"], r["session_start"], r["session_end"], r["n_txs"])
        for r in spark.table("sw_out").collect()
    }
    assert got == batch and len(got) > 0


def test_dedup_feed_stream_suppresses_replayed_hashes(spark, tmp_path_factory, feed_df):  # noqa: F811
    from blockchain_indexer_spark.streaming.windows import dedup_feed_stream

    root = str(tmp_path_factory.mktemp("dd"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    # write the same feed twice — a replayed/duplicated source
    feed_df.write.parquet(feed_dir)
    feed_df.write.mode("append").parquet(feed_dir)

    stream = spark.readStream.schema(FEED_SCHEMA).parquet(feed_dir)
    q = (
        dedup_feed_stream(stream)
        .writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["hash"] for r in spark.table("dd_out").collect()]
    expected = {r["hash"] for r in feed_df.select("hash").collect()}
    assert len(got) == len(set(got)) == len(expected)
