"""End-to-end streaming ingest: chain feed files → Structured
Streaming foreachBatch → partitioned parquet final tables, with
exactly-once semantics under overlapping redelivery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.streaming.runner import (
    EVENT_TABLES,
    FEED_SCHEMA,
    IngestPipeline,
)
from tests.chain_fixtures import EXPECTED, build_raw_tables


def _feed_rows(spark):
    """Fixture chain flattened to the feed layout (tx rows with logs +
    empty-block markers)."""
    blocks, txs, logs = build_raw_tables(spark)
    log_structs = logs.groupBy("tx_hash").agg(
        F.sort_array(F.collect_list(F.struct("log_index", "address", "topics", "data"))).alias(
            "logs"
        )
    )
    b = blocks.select(
        F.col("number").alias("block_number"),
        F.col("hash").alias("block_hash"),
        F.col("timestamp").alias("block_timestamp"),
        "total_transaction_count",
    )
    tx_rows = (
        txs.join(b, ["block_number", "block_hash"])
        .join(log_structs, txs["hash"] == log_structs["tx_hash"], "left")
        .drop("tx_hash")
    )
    empty_blocks = b.join(
        txs.select("block_number").distinct(), "block_number", "left_anti"
    ).select(
        "block_number",
        "block_hash",
        "block_timestamp",
        "total_transaction_count",
        *[F.lit(None).alias(c) for c in ["hash", "index", "from", "to", "value", "input", "nonce", "type"]],
        F.lit(None).cast(FEED_SCHEMA["logs"].dataType).alias("logs"),
    )
    cols = [f.name for f in FEED_SCHEMA.fields]
    return tx_rows.select(*cols).unionByName(empty_blocks.select(*cols))


@pytest.fixture(scope="module")
def feed_df(spark):
    return _feed_rows(spark).cache()


@pytest.mark.slowe2e
def test_streaming_ingest_exactly_once(spark, tmp_path_factory, feed_df):
    root = str(tmp_path_factory.mktemp("stream"))
    feed_dir, ckpt, out = (os.path.join(root, d) for d in ("feed", "ckpt", "final"))
    os.makedirs(feed_dir)

    n_txs = feed_df.filter(F.col("hash").isNotNull()).count()
    split = feed_df.filter(F.col("block_number") % 2 == 0)
    rest_plus_overlap = feed_df  # second delivery contains EVERYTHING again

    pipe = IngestPipeline(spark, out)

    # chunk 1: half the blocks
    split.coalesce(1).write.mode("append").parquet(os.path.join(feed_dir))
    q = pipe.start_stream(feed_dir, ckpt)
    q.awaitTermination(120)

    mid_blocks = pipe.read_final("block").count()
    assert 0 < mid_blocks < feed_df.select("block_number").distinct().count()

    # chunk 2: full redelivery (overlap with chunk 1)
    rest_plus_overlap.coalesce(1).write.mode("append").parquet(os.path.join(feed_dir))
    q = pipe.start_stream(feed_dir, ckpt)
    q.awaitTermination(120)

    blocks_final = pipe.read_final("block")
    txs_final = pipe.read_final("transaction")
    assert blocks_final.count() == feed_df.select("block_number").distinct().count()
    assert txs_final.count() == n_txs
    # no duplicate keys despite overlapping delivery
    assert txs_final.select("hash").distinct().count() == n_txs
    assert blocks_final.select("number").distinct().count() == blocks_final.count()
    # classification survived the trip
    got = {
        r["hash"]: r["classification"]
        for r in txs_final.select("hash", "classification").collect()
    }
    assert got == EXPECTED
    # partition pruning layout exists
    assert any("block_group=" in p for p in os.listdir(os.path.join(out, "transaction")))


@pytest.mark.slowe2e
def test_micro_batch_promote_latency(spark, tmp_path_factory, feed_df):
    """BASELINE live-mode proxy: a 2000-row micro-batch must promote
    well inside the reference's 10 s serial-flush budget (Settings.cs:
    169-170). Generous 20 s bound absorbs test-host jitter; the
    measured value is printed for the record."""
    import time

    from blockchain_indexer_spark.plans.chain import derive_chain

    out = str(tmp_path_factory.mktemp("latency"))
    # build a 2000-tx feed from the derived chain at sf0.001
    chain = derive_chain(spark, "/root/testdata/sf0.001").limit(2000).cache()
    n = chain.count()
    assert n >= 1000
    from pyspark.sql import Window as W

    n_in_block = F.count("*").over(W.partitionBy("block_number")).cast("int")
    feed = chain.select(
        "block_number",
        "block_hash",
        (F.unix_timestamp("timestamp")).alias("block_timestamp"),
        n_in_block.alias("total_transaction_count"),
        "hash", "index", "from", "to", "value", "input", "nonce", "type", "logs",
    )
    pipe = IngestPipeline(spark, out)
    t0 = time.time()
    pipe.process_batch(feed)
    elapsed = time.time() - t0
    print(f"micro-batch promote of {n} txs (cold): {elapsed:.2f}s")
    assert pipe.read_final("transaction").count() == n
    assert elapsed < 20, f"2000-row micro-batch took {elapsed:.1f}s (budget 10s, bound 20s)"
    # Steady state is what the reference's 500 ms live cadence actually
    # exercises: warm codegen cache AND the deeper plan where the
    # exactly-once anti-join runs against non-empty final tables. A
    # duplicate redelivery of the same feed must land as zero new rows
    # and do so faster than the cold batch.
    t0 = time.time()
    pipe.process_batch(feed)
    warm = time.time() - t0
    print(f"micro-batch promote of {n} txs (warm, duplicate): {warm:.2f}s")
    assert pipe.read_final("transaction").count() == n  # idempotent
    assert warm < 15, f"warm duplicate micro-batch took {warm:.1f}s"


def test_jdbc_sink_dispatch(spark, tmp_path_factory, feed_df, monkeypatch):
    """The JDBC branch routes every append through DataFrameWriter.jdbc
    (quoted identifiers — `transaction` is an SQL reserved word) and
    reads finals back via DataFrameReader.jdbc — verified with a
    recording stub that spools to parquet (the real-database twin is
    tests/test_jdbc.py against embedded Derby)."""
    import pyspark.sql.readwriter as rw

    root = str(tmp_path_factory.mktemp("jdbc"))
    spool = os.path.join(root, "spool")
    written, read = [], []

    def unq(table):
        assert table.startswith('"') and table.endswith('"'), table
        return table.strip('"')

    def fake_write_jdbc(self, url, table, mode=None, properties=None):
        written.append((url, unq(table)))
        self.parquet(os.path.join(spool, unq(table)), mode="append")

    def fake_read_jdbc(self, url, table, **kw):
        read.append((url, unq(table)))
        return spark.read.parquet(os.path.join(spool, unq(table)))

    monkeypatch.setattr(rw.DataFrameWriter, "jdbc", fake_write_jdbc)
    monkeypatch.setattr(rw.DataFrameReader, "jdbc", fake_read_jdbc)
    # the missing-table probe (and the pg DDL step) would dial the
    # (nonexistent) server — answer from the spool / record the DDL
    ddl: list[str] = []

    class FakeStatement:
        def execute(self, sql):
            ddl.append(sql)

        def close(self):
            pass

    class FakeConn:
        def createStatement(self):
            return FakeStatement()

        def close(self):
            pass

    monkeypatch.setattr(IngestPipeline, "_jdbc_connection", lambda self: FakeConn())
    monkeypatch.setattr(
        IngestPipeline,
        "_jdbc_table_exists",
        staticmethod(lambda conn, name: os.path.isdir(os.path.join(spool, name))),
    )

    url = "jdbc:postgresql://db/indexer"
    pipe = IngestPipeline(
        spark, root, jdbc_url=url, jdbc_properties={"user": "u"}, maintain_caches=False
    )
    pipe.process_batch(feed_df)
    tables = {t for _, t in written}
    assert tables == {"block", "transaction", *(set(EVENT_TABLES) - {"transaction"})}
    # the pg target got real-dialect DDL before the first append:
    # text[] for the array columns, never the JSON-text fallback
    created = {s.split('"')[1]: s for s in ddl if s.startswith("CREATE TABLE")}
    assert set(created) == tables
    assert '"owners" text[]' in created["crc_signup"]
    assert '"classification" text[]' in created["transaction"]
    assert all(u == url for u, _ in written)
    assert {t for _, t in read} <= {"block", "transaction"}
    # second batch: anti-join reads the spooled tables back via jdbc
    n = spark.read.parquet(os.path.join(spool, "transaction")).count()
    pipe.process_batch(feed_df)  # duplicate delivery
    assert spark.read.parquet(os.path.join(spool, "transaction")).count() == n
    assert ("jdbc:postgresql://db/indexer", "transaction") in read


def test_concurrent_importers_serialize(spark, tmp_path_factory, feed_df):
    """Two indexer instances racing the SAME rows into one sink must
    not double-import: the import lock serializes the read-merge-append
    round (the reference's Serializable promote transaction,
    ImportProcedure.cs:17-27)."""
    from concurrent.futures import ThreadPoolExecutor as TPE

    out = str(tmp_path_factory.mktemp("multiwriter"))
    n_txs = feed_df.filter(F.col("hash").isNotNull()).count()
    pipes = [IngestPipeline(spark, out, maintain_caches=False) for _ in range(2)]
    with TPE(max_workers=2) as pool:
        futs = [pool.submit(p.process_batch, feed_df) for p in pipes]
        for f in futs:
            f.result()
    txs = pipes[0].read_final("transaction")
    assert txs.count() == n_txs  # second writer saw the first's commit
    assert txs.select("hash").distinct().count() == n_txs
    blocks = pipes[0].read_final("block")
    assert blocks.count() == blocks.select("number").distinct().count()


@pytest.mark.slowe2e
def test_compaction_preserves_data_and_shrinks_files(spark, tmp_path_factory, feed_df):
    root = str(tmp_path_factory.mktemp("compact"))
    pipe = IngestPipeline(spark, os.path.join(root, "final"))
    # many tiny appends: one promote round per block parity slice
    for mod in range(4):
        pipe.process_batch(feed_df.filter(F.col("block_number") % 4 == mod))

    table_dir = os.path.join(root, "final", "transaction")
    parts = [p for p in os.listdir(table_dir) if p.startswith("block_group=")]
    files_before = {
        p: len([f for f in os.listdir(os.path.join(table_dir, p)) if f.endswith(".parquet")])
        for p in parts
    }
    before = pipe.read_final("transaction").toPandas().sort_values("hash").reset_index(drop=True)

    stats = pipe.compact("transaction", min_files=1)
    assert stats, f"nothing compacted; files per part: {files_before}"
    for part, (n_b, n_a) in stats.items():
        assert n_a < n_b
        assert n_a == 1  # tiny partitions bin-pack to one file

    after = pipe.read_final("transaction").toPandas().sort_values("hash").reset_index(drop=True)
    assert before.equals(after)
    # idempotent: nothing left above the threshold
    assert pipe.compact("transaction", min_files=1) == {}
