"""Driver-thread overlap for independent eager sub-pipelines.

Several registered queries compose INDEPENDENT engines whose builders
run eager actions (localCheckpoint pins, iterative closure rounds,
driver-trained codebooks) before the final plan is assembled — e.g.
the agreement monitors run an exact baseline AND an approximate engine
over the same input, and the cross-modal dedup runs three modality
engines. Built sequentially, each engine's stage tail leaves most of
the cluster idle while the next engine waits.

``build_concurrently`` runs the builder callables on a small driver
thread pool (guide §2.6: Spark's scheduler runs several jobs at once;
actions are only serial because driver code calls them serially — FIFO
scheduling back-fills executors freed by one job's tail with the next
job's tasks). Each builder returns its (typically checkpointed)
DataFrame; results come back in argument order, and the first builder
exception propagates unchanged.

This changes WHEN the same deterministic jobs run, never what they
compute: every builder still produces the same pinned frame, and the
assembled query plan is byte-identical. Determinism of results is
therefore untouched (equality with the serial build is test-pinned).

PySpark note: ``inheritable_thread_target`` is the documented way to
run driver threads so JVM thread-locals (job group, description) are
inherited and cleaned up correctly under both classic and connect
modes.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark import inheritable_thread_target
from pyspark.sql import SparkSession


def build_concurrently(*builders: Callable[[], Any]) -> list[Any]:
    """Run independent eager builders on driver threads; return their
    results in argument order. One builder → run inline (no pool)."""
    if len(builders) == 1:
        return [builders[0]()]
    # Pass the active session in BOTH modes (ADVICE r9): on PySpark 4.x
    # the bare classic-mode form emits a UserWarning per call ("Spark
    # session is not provided. Tags will not be inherited.") and skips
    # session-tag inheritance. With a session the wrapper is the
    # session-first curried form under classic AND connect; fall back
    # to the bare form only when no session is active.
    session = SparkSession.getActiveSession()
    wrap = (
        inheritable_thread_target(session)
        if session is not None
        else inheritable_thread_target
    )
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futures = [pool.submit(wrap(b)) for b in builders]
        return [f.result() for f in futures]
