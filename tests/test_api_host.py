"""API host (streaming/api.py): /health verdicts and the cursor-based
/events push channel, wired to a real ingest batch via on_imported —
the serving twin of the reference's HealthService + websocket
broadcast (Api/TransactionHashBroadcastService.cs:41-57).
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from blockchain_indexer_spark.streaming.api import ApiHost, BroadcastLog
from blockchain_indexer_spark.streaming.runner import REORG_MAGIC_HASH


@pytest.fixture()
def host():
    log = BroadcastLog()
    h = ApiHost(log).start()
    yield h, log
    h.stop()


def _get(h, path):
    addr = h.address
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}{path}") as r:
        return r.status, json.loads(r.read())


def test_health_unhealthy_before_first_batch_then_healthy(host):
    h, log = host
    try:
        _get(h, "/health")
        raise AssertionError("expected 503")
    except urllib.error.HTTPError as e:
        assert e.code == 503
        assert json.loads(e.read())["healthy"] is False
    log.publish(["0xaa"])
    code, body = _get(h, "/health")
    assert code == 200 and body["healthy"] is True
    assert body["last_batch_age_s"] is not None


def test_events_cursor_and_reorg_magic(host):
    h, log = host
    log.publish(["0xaa", "0xbb"])
    log.publish([REORG_MAGIC_HASH])
    code, body = _get(h, "/events?cursor=0&timeout=1")
    assert code == 200
    assert [e["hashes"] for e in body["events"]] == [["0xaa", "0xbb"], [REORG_MAGIC_HASH]]
    cursor = body["next_cursor"]
    # no new events: the long-poll returns empty after the timeout
    t0 = time.time()
    _, body2 = _get(h, f"/events?cursor={cursor}&timeout=1")
    assert body2["events"] == [] and body2["next_cursor"] == cursor
    assert time.time() - t0 >= 0.9
    # a publish wakes a waiting poller
    log.publish(["0xcc"])
    _, body3 = _get(h, f"/events?cursor={cursor}&timeout=5")
    assert [e["hashes"] for e in body3["events"]] == [["0xcc"]]


def test_ring_capacity_drops_oldest():
    log = BroadcastLog(capacity=2)
    for i in range(5):
        log.publish([f"0x{i}"])
    events = log.read(0, timeout=0)
    assert [h for _, hs in events for h in hs] == ["0x3", "0x4"]
    assert events[0][0] == 3  # sequence numbers survive the drop


def test_api_host_serves_real_ingest(spark, tmp_path, host):
    from blockchain_indexer_spark.streaming.runner import IngestPipeline
    from tests.test_streaming import _feed_rows

    h, log = host
    feed = _feed_rows(spark)
    pipe = IngestPipeline(
        spark, str(tmp_path / "final"), on_imported=log.publish, maintain_caches=False
    )
    pipe.process_batch(feed)
    code, body = _get(h, "/events?cursor=0&timeout=1")
    announced = {x for e in body["events"] for x in e["hashes"]}
    expected = {r["hash"] for r in feed.filter("hash is not null").select("hash").collect()}
    assert announced == expected
    assert _get(h, "/health")[1]["healthy"] is True


def test_health_fn_exception_is_503_not_reset():
    import json as _json
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from blockchain_indexer_spark.streaming.api import ApiHost, BroadcastLog

    log = BroadcastLog()
    log.touch()

    def bad_health():
        raise RuntimeError("probe query failed")

    host = ApiHost(log, health_fn=bad_health).start()
    try:
        addr = host.address
        try:
            urlopen(f"http://{addr[0]}:{addr[1]}/health", timeout=10)
            raise AssertionError("expected 503")
        except HTTPError as e:
            assert e.code == 503
            assert _json.loads(e.read())["healthy"] is False
    finally:
        host.stop()


def test_events_rejects_nan_timeout():
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from blockchain_indexer_spark.streaming.api import ApiHost, BroadcastLog

    host = ApiHost(BroadcastLog()).start()
    try:
        addr = host.address
        try:
            urlopen(f"http://{addr[0]}:{addr[1]}/events?cursor=0&timeout=nan", timeout=10)
            raise AssertionError("expected 400")
        except HTTPError as e:
            assert e.code == 400
    finally:
        host.stop()


def test_touch_keeps_health_fresh_without_events():
    """An imported empty-block batch heartbeats via touch(): health
    stays fresh, but no long-poll consumer is woken."""
    from blockchain_indexer_spark.streaming.api import BroadcastLog

    log = BroadcastLog()
    assert log.last_batch_at is None
    log.touch()
    assert log.last_batch_at is not None
    assert log.read(0, timeout=0.1) == []  # no event appended
