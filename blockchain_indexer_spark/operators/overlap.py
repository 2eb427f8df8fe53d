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
    from pyspark.sql.utils import is_remote  # noqa: PLC0415

    if is_remote():  # connect mode: the wrapper takes the session first
        wrap = inheritable_thread_target(SparkSession.getActiveSession())
    else:  # classic mode: the wrapper takes the target function itself
        wrap = inheritable_thread_target
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futures = [pool.submit(wrap(b)) for b in builders]
        return [f.result() for f in futures]
