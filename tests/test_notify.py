"""K6 notify bus (streaming/notify.py): pg_notify emission per
imported batch, payload chunking under the 8000-byte NOTIFY limit,
reconnect-once semantics, and the honest Derby rejection."""

from __future__ import annotations

import json

import pytest

from blockchain_indexer_spark.streaming.notify import PgNotifyBus, chunk_hashes


class _Stmt:
    def __init__(self, sink):
        self.sink = sink
        self.params = {}

    def setString(self, i, v):  # noqa: N802 (JDBC API)
        self.params[i] = v

    def execute(self):
        self.sink.append((self.params[1], self.params[2]))

    def close(self):
        pass


class _Conn:
    def __init__(self, sink, fail_first=False):
        self.sink = sink
        self.fail_first = fail_first
        self.closed = False

    def prepareStatement(self, sql):  # noqa: N802 (JDBC API)
        assert sql == "SELECT pg_notify(?, ?)"
        if self.fail_first:
            self.fail_first = False
            raise RuntimeError("connection reset")
        return _Stmt(self.sink)

    def close(self):
        self.closed = True


def test_publish_emits_chunked_json_payloads():
    sink = []
    bus = PgNotifyBus(None, "jdbc:postgresql://db/x", conn_factory=lambda: _Conn(sink))
    hashes = [f"0x{i:064x}" for i in range(300)]  # ~20 KB encoded
    bus.publish(hashes)
    assert len(sink) > 1  # chunked under the NOTIFY limit
    got = []
    for i, (channel, payload) in enumerate(sink):
        assert channel == "new_transaction"
        assert len(payload.encode()) < 8000
        msg = json.loads(payload)
        assert msg["seq"] == i
        got.extend(msg["hashes"])
    assert got == hashes  # order and completeness survive chunking


def test_reconnects_once_on_broken_connection():
    sink = []
    conns = []

    def factory():
        conns.append(_Conn(sink, fail_first=len(conns) == 0))
        return conns[-1]

    bus = PgNotifyBus(None, "jdbc:postgresql://db/x", conn_factory=factory)
    bus.publish(["0xaa"])
    assert len(conns) == 2  # first connection failed, second served
    assert json.loads(sink[0][1])["hashes"] == ["0xaa"]
    bus.close()
    assert conns[-1].closed


def test_chunk_hashes_respects_budget_and_order():
    hashes = [f"0x{i:064x}" for i in range(500)]
    chunks = chunk_hashes(hashes, max_bytes=1000)
    assert [h for c in chunks for h in c] == hashes
    for c in chunks:
        assert len(json.dumps(c).encode()) <= 1000
    assert chunk_hashes([]) == []


def test_derby_target_rejects_pg_notify(spark, tmp_path):
    """The honest seam: pg_notify is a Postgres primitive; a non-
    Postgres JDBC target fails loudly instead of dropping notifies."""
    bus = PgNotifyBus(spark, f"jdbc:derby:{tmp_path}/db;create=true")
    with pytest.raises(Exception, match="(?i)pg_notify|syntax"):
        bus.publish(["0xaa"])
