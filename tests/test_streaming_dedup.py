"""Cross-batch streaming first-seen dedup: stateful census vs its
batch twin, checkpoint-restart state restoration, TTL wiring."""

from __future__ import annotations

import os
import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blockchain_indexer_spark.streaming.dedup import (
    first_seen_batch,
    streaming_first_seen,
)

DOCS_SCHEMA = "doc_id long, text string"


def _docs(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
        (3, "Alpha   Beta  gamma"),  # normalized dup of 1
        (4, None),  # contentless: dropped, never merged
        (5, "eta theta iota"),
        (6, "alpha beta gamma"),  # dup of 1, arrives in second half
        (7, "delta epsilon zeta"),  # dup of 2, second half
        (8, "kappa lambda mu"),
        (9, "eta theta iota"),  # dup of 5
        (10, None),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_streaming_first_seen_converges_to_batch_census(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("sdedup"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    out = os.path.join(root, "updates")
    os.makedirs(feed_dir)
    full = _docs(spark)
    # ascending-id halves: stream first-seen == global min id, so the
    # final census must equal the batch twin exactly
    half_a = full.filter(F.col("doc_id") <= 5)
    half_b = full.filter(F.col("doc_id") > 5)

    def run() -> None:
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(feed_dir)

        def sink(df, epoch_id):
            df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        q = (
            streaming_first_seen(stream)
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
    run()  # restart restores per-fingerprint state from the checkpoint

    updates = spark.read.parquet(out)
    latest = (
        updates.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("fingerprint").orderBy(F.desc("epoch"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .collect()
    )
    got = {r["fingerprint"]: (r["keep_id"], r["n_seen"]) for r in latest}
    want = {
        r["fingerprint"]: (r["keep_id"], r["n_seen"])
        for r in first_seen_batch(full).collect()
    }
    assert got == want and len(got) == 4  # 4 distinct fingerprints
    # the second run only re-emitted fingerprints the second half
    # touched, with cumulative counts (state restored, not reset)
    second = updates.filter(F.col("epoch") == 0).collect()  # epochs reset per run
    touched = {
        r["fingerprint"]: (r["n_seen"], r["new_in_batch"])
        for r in updates.filter(F.col("new_in_batch") < F.col("n_seen")).collect()
    }
    # doc 6 is the 3rd copy of doc 1's content (1, 3 in half A)
    assert (3, 1) in touched.values()
    assert len(second) > 0


@pytest.mark.slowe2e
def test_streaming_first_seen_ttl_readmits(spark, tmp_path_factory):
    """With a TTL the operator must still run (timeout wiring) — TTL
    eviction timing itself isn't deterministic enough to assert in a
    unit test, but the census over one pass is unchanged."""
    root = str(tmp_path_factory.mktemp("sdedup_ttl"))
    feed_dir, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    os.makedirs(feed_dir)
    _docs(spark).write.mode("append").parquet(feed_dir)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(feed_dir)
    q = (
        streaming_first_seen(stream, ttl_minutes=60)
        .writeStream.format("memory")
        .queryName("sdedup_ttl_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["fingerprint"]: (r["keep_id"], r["n_seen"])
        for r in spark.table("sdedup_ttl_out").collect()
    }
    want = {
        r["fingerprint"]: (r["keep_id"], r["n_seen"])
        for r in first_seen_batch(_docs(spark)).collect()
    }
    assert got == want


@pytest.mark.slowe2e
def test_streaming_minhash_index_update_equals_full_corpus(
    spark, tmp_path_factory
):
    """The LSH index-maintenance deployment shape end to end: a
    parquet file stream drained one file per trigger through
    foreachBatch, each micro-batch appending its band rows to the
    persisted index dir and its candidate pairs to an output dir
    (new x new plus new x index — never old x old). The accumulated
    distinct pair union must equal the one-shot full-corpus LSH
    candidate set, under whatever batching the file source produced —
    the same union-equivalence the batch-loop test pins, now driven
    through a real streaming query like the reference's live loop."""
    import os

    from blockchain_indexer_spark.operators.dedup import (
        minhash_index_update,
        minhash_lsh_candidates,
    )

    root = str(tmp_path_factory.mktemp("sminhash"))
    feed = os.path.join(root, "feed")
    ckpt = os.path.join(root, "ckpt")
    idx_dir = os.path.join(root, "band_index")
    pairs_dir = os.path.join(root, "pairs")
    os.makedirs(feed)
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # near-dup of 1
        (3, "one two three four five six"),
        (4, "alpha beta gamma delta epsilon"),   # exact dup of 1, later file
        (5, "one two three four five seven"),    # near-dup of 3, later file
        (6, "totally unrelated content words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).repartition(1).write.mode(
            "append"
        ).parquet(feed)

    def sink(batch_df, epoch_id):
        index = (
            spark.read.parquet(idx_dir) if os.path.isdir(idx_dir) else None
        )
        new_rows, new_pairs = minhash_index_update(
            index, batch_df, "doc_id", "text"
        )
        new_pairs = new_pairs.localCheckpoint(eager=True)
        new_rows.write.mode("append").parquet(idx_dir)
        new_pairs.write.mode("append").parquet(pairs_dir)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(pairs_dir).distinct().collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text")
        .select("doc_a", "doc_b")
        .collect()
    }
    assert got == want and (1, 4) in got  # cross-batch dup discovered
