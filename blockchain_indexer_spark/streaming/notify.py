"""K6: ``publish_event`` → ``pg_notify`` — the reference's external
notify bus (0.0.64.sql:2384-2391; consumer
CirclesLand.Host/DatabaseEventListener.cs:60-100), re-expressed as an
``on_imported`` hook that NOTIFYs the sink database.

The reference's importer fires a Postgres trigger whose procedure
calls ``pg_notify('new_transaction', payload)``; any LISTENing process
— a separate host, not a thread — wakes with the payload. That is a
Postgres-only primitive, so this bus is honest about its target: it
emits ``SELECT pg_notify(?, ?)`` over the same JDBC connection family
the sink uses, which a Postgres target executes natively and any other
target rejects (Derby has no such function — the in-process
BroadcastLog + websocket remain the portable channels, streaming/api).

Payloads are JSON ``{"seq": n, "hashes": [...]}`` — the same shape the
websocket pushes — chunked under Postgres's 8000-byte NOTIFY limit so
a large batch never throws ``payload string too long``.

Scale note: one NOTIFY round-trip per imported micro-batch (not per
row); the connection is persistent with a single reconnect retry, so
the bus adds O(1) latency to the 500 ms live cadence.
"""

from __future__ import annotations

import json

# Postgres caps NOTIFY payloads at 8000 bytes; stay under it with
# headroom for the JSON envelope.
_MAX_PAYLOAD_BYTES = 7000


def chunk_hashes(hashes: list[str], max_bytes: int = _MAX_PAYLOAD_BYTES) -> list[list[str]]:
    """Split a hash batch so every JSON payload stays under the NOTIFY
    limit. 66-char hex hashes + JSON overhead ≈ 69 bytes each, but the
    split is computed from actual encoded length, not an estimate."""
    chunks: list[list[str]] = []
    cur: list[str] = []
    cur_len = 2  # []
    for h in hashes:
        h_len = len(json.dumps(h)) + 1
        if cur and cur_len + h_len > max_bytes:
            chunks.append(cur)
            cur, cur_len = [], 2
        cur.append(h)
        cur_len += h_len
    if cur:
        chunks.append(cur)
    return chunks


class PgNotifyBus:
    """``on_imported`` hook that NOTIFYs the sink database per batch.

    Wire it like the in-process log::

        bus = PgNotifyBus(spark, jdbc_url, properties)
        pipe = IngestPipeline(spark, out, jdbc_url=jdbc_url,
                              on_imported=bus.publish)

    ``conn_factory`` is injectable for tests (the sandbox has no
    Postgres; Derby rejects pg_notify by design, which the tests pin).
    """

    def __init__(
        self,
        spark,
        jdbc_url: str,
        properties: dict[str, str] | None = None,
        channel: str = "new_transaction",
        conn_factory=None,
    ) -> None:
        self._channel = channel
        self._seq = 0
        self._conn = None
        if conn_factory is None:
            jvm = spark._sc._jvm
            props = jvm.java.util.Properties()
            for k, v in (properties or {}).items():
                props.setProperty(k, v)

            def conn_factory():
                return jvm.java.sql.DriverManager.getConnection(jdbc_url, props)

        self._conn_factory = conn_factory

    def _notify(self, payload: str) -> None:
        if self._conn is None:
            self._conn = self._conn_factory()
        try:
            st = self._conn.prepareStatement("SELECT pg_notify(?, ?)")
        except Exception:
            # stale/broken connection: reconnect once, then let a real
            # failure propagate — silently dropping a notify would
            # strand LISTENing consumers without their wake-up
            self._conn = self._conn_factory()
            st = self._conn.prepareStatement("SELECT pg_notify(?, ?)")
        try:
            st.setString(1, self._channel)
            st.setString(2, payload)
            st.execute()
        finally:
            st.close()

    def publish(self, hashes: list[str]) -> None:
        """The on_imported signature: one NOTIFY per payload chunk."""
        for chunk in chunk_hashes(list(hashes)):
            self._notify(json.dumps({"seq": self._seq, "hashes": chunk}))
            self._seq += 1

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None
