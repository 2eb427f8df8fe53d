"""LiveSource over a real TCP push channel (S3): a local server pushes
JSON feed lines, Spark's socket source drives the same promote round as
the file feed, and the stall watcher enforces the reference's liveness
contract (LiveSource.cs:96-118) when the channel goes silent."""

from __future__ import annotations

import os
import socket
import threading

import pytest
from pyspark.sql import functions as F

from blockchain_indexer_spark.streaming.health import StreamStalled, watch_liveness
from blockchain_indexer_spark.streaming.runner import IngestPipeline
from tests.chain_fixtures import EXPECTED
from tests.test_streaming import _feed_rows


class _PushServer:
    """One-shot newHeads stand-in: accept a client, push every line,
    then hold the connection open silently (a stalled gateway)."""

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        self.srv.settimeout(60)
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        with conn:
            payload = ("\n".join(self.lines) + "\n").encode()
            conn.sendall(payload)
            self._stop.wait(120)  # stay connected, send nothing: stall

    def close(self) -> None:
        self._stop.set()
        self.srv.close()


@pytest.mark.slowe2e
def test_socket_live_source_ingests_then_stalls(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("socket_stream"))
    feed_df = _feed_rows(spark)
    n_blocks = feed_df.select("block_number").distinct().count()
    n_txs = feed_df.filter(F.col("hash").isNotNull()).count()
    # one malformed line: must be dropped, not crash the stream
    lines = feed_df.toJSON().collect() + ["{not json"]

    server = _PushServer(lines)
    server.thread.start()
    pipe = IngestPipeline(spark, os.path.join(root, "final"))
    query = pipe.start_socket_stream("127.0.0.1", server.port, os.path.join(root, "ckpt"))
    try:
        # The push feed is finite, so after it drains the channel is a
        # stalled gateway — the watcher must stop the query and raise,
        # exactly the reference's 20 s timeout behavior (scaled down).
        with pytest.raises(StreamStalled):
            watch_liveness(query, stall_timeout_s=10.0, max_wait_s=180)
        assert not query.isActive
    finally:
        if query.isActive:
            query.stop()
        server.close()

    blocks_final = pipe.read_final("block")
    txs_final = pipe.read_final("transaction")
    assert blocks_final.select("number").distinct().count() == n_blocks
    assert txs_final.count() == n_txs
    got = {
        r["hash"]: r["classification"]
        for r in txs_final.select("hash", "classification").collect()
    }
    assert got == EXPECTED
