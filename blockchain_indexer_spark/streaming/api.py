"""API host — the reference's serving surface re-expressed stdlib-only.

The reference runs an ASP.NET host next to the indexer with
`/health` (Api/HealthService.cs:52-60) and a websocket that broadcasts
each committed batch's transaction hashes — plus the deadbeef magic on
reorgs (Api/TransactionHashBroadcastService.cs:41-57, Indexer.cs:37-38)
— and a `publish_event` → pg_notify channel (0.0.64.sql:2384-2391, K6).

No network/websocket library ships in this environment, so the push
channel is a cursor-based long-poll over HTTP (stdlib http.server):

- ``GET /health`` → 200/503 with the staleness verdict (a batch older
  than 30 s flags the instance unhealthy, like HealthService).
- ``GET /events?cursor=N[&timeout=S]`` → blocks until an announcement
  with seq >= N exists (or the timeout lapses), then returns
  ``{"next_cursor": M, "events": [{"seq": k, "hashes": [...]}]}``.

Unlike the reference's fire-and-forget socket, the cursor lets a
consumer resume without losing announcements (bounded by the ring
capacity). ``BroadcastLog.publish`` IS the pipeline's ``on_imported``
hook — wiring is one constructor argument, and reorgs arrive as the
REORG_MAGIC_HASH announcement exactly like the websocket contract.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class BroadcastLog:
    """Thread-safe announcement ring with monotonically increasing
    sequence numbers; `publish` is the K5 `on_imported` hook."""

    def __init__(self, capacity: int = 4096) -> None:
        self._events: list[tuple[int, list[str]]] = []
        self._base_seq = 0
        self._cap = capacity
        self._cond = threading.Condition()
        self.last_batch_at: dt.datetime | None = None

    def touch(self) -> None:
        """Liveness heartbeat: refresh last_batch_at WITHOUT appending
        an event — an imported batch of empty blocks (or a pure
        redelivery) proves the pipeline alive but has nothing to
        announce, and waking every long-poll client for it would
        defeat the long-poll."""
        with self._cond:
            self.last_batch_at = dt.datetime.now(dt.timezone.utc)

    def publish(self, hashes: list[str]) -> None:
        with self._cond:
            seq = self._base_seq + len(self._events)
            self._events.append((seq, list(hashes)))
            if len(self._events) > self._cap:
                drop = len(self._events) - self._cap
                self._events = self._events[drop:]
                self._base_seq += drop
            self.last_batch_at = dt.datetime.now(dt.timezone.utc)
            self._cond.notify_all()

    def read(self, cursor: int, timeout: float = 25.0) -> list[tuple[int, list[str]]]:
        """Announcements with seq >= cursor, long-polling up to
        `timeout` seconds when none exist yet."""
        deadline = time.monotonic() + timeout
        with self._cond:
            while True:
                newer = [e for e in self._events if e[0] >= cursor]
                if newer:
                    return newer
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return []
                self._cond.wait(remaining)


class ApiHost:
    """Tiny threading HTTP host for /health and /events.

    `health_fn` (optional) adds a deployment-specific verdict (e.g.
    `streaming.health.is_healthy` over the final tables) AND'ed with
    the batch-freshness rule.
    """

    def __init__(
        self,
        log: BroadcastLog,
        host: str = "127.0.0.1",
        port: int = 0,
        health_fn=None,
        max_age_seconds: int = 30,
    ) -> None:
        self.log = log
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (stdlib API)
                url = urlparse(self.path)
                if url.path == "/health":
                    now = dt.datetime.now(dt.timezone.utc)
                    last = api.log.last_batch_at
                    fresh = last is not None and (now - last).total_seconds() <= max_age_seconds
                    try:
                        healthy = fresh and (
                            health_fn() if health_fn is not None else True
                        )
                    except Exception:
                        # a throwing health probe IS an unhealthy
                        # verdict — return the 503 + diagnostics the
                        # monitor needs, not a connection reset
                        healthy = False
                    self._json(
                        200 if healthy else 503,
                        {
                            "healthy": healthy,
                            "last_batch_age_s": None
                            if last is None
                            else round((now - last).total_seconds(), 3),
                        },
                    )
                elif url.path == "/events":
                    q = parse_qs(url.query)
                    try:
                        cursor = int(q.get("cursor", ["0"])[0])
                        timeout = float(q.get("timeout", ["25"])[0])
                        # NaN passes float() but poisons every deadline
                        # comparison in read() into an infinite busy
                        # loop; clamp instead of trusting the client
                        if not timeout == timeout:
                            raise ValueError("timeout is NaN")
                        timeout = min(max(timeout, 0.0), 60.0)
                    except ValueError:
                        self._json(400, {"error": "cursor/timeout must be numeric"})
                        return
                    events = api.log.read(cursor, timeout)
                    next_cursor = (events[-1][0] + 1) if events else cursor
                    self._json(
                        200,
                        {
                            "next_cursor": next_cursor,
                            "events": [{"seq": s, "hashes": h} for s, h in events],
                        },
                    )
                else:
                    self._json(404, {"error": "unknown path"})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def start(self) -> "ApiHost":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
