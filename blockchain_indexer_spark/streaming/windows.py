"""Event-time windowed aggregation and custom stateful operators for
the live feed.

The reference has no watermark concept — its per-day stats are batch
SQL over final tables (0.0.64.sql crc_total_minted_amount etc., T10)
and its only cross-batch state is the tables themselves. These
operators are the streaming-native complements for consumers that want
incremental stats directly off the feed without re-scanning finals:

- ``windowed_event_counts``: tumbling event-time windows with a
  watermark bounding how late a block may arrive before its window
  closes. State size is O(open windows), independent of stream length.
- ``running_account_totals``: an ``applyInPandasWithState`` operator
  keeping one running (n_txs, total_value_wei) pair per account —
  the pattern for any custom per-key accumulator the built-in
  aggregations cannot express. State is one row per account, updated
  per micro-batch from Arrow batches.

Both run identically over a batch DataFrame (the window agg verbatim;
the stateful op via its batch twin ``account_totals_batch``) — used by
the tests to cross-check streaming output against batch SQL.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_txs", T.LongType()),
        T.StructField("total_value_wei", T.DoubleType()),
    ]
)

TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("account", T.StringType()),
        T.StructField("n_txs", T.LongType()),
        T.StructField("total_value_wei", T.DoubleType()),
    ]
)


def windowed_event_counts(
    feed: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Tumbling event-time tx counts over the ingest feed.

    Works on a stream (with the watermark bounding state) and on a
    batch frame (watermark is a no-op there). Event time is the block
    timestamp; a block arriving later than ``watermark`` past the max
    seen event time no longer updates its closed window — the
    trade-off the reference never had to make because it recomputed
    per-day stats from final tables each time.
    """
    with_ts = feed.withColumn("_event_time", F.timestamp_seconds("block_timestamp"))
    return (
        with_ts.withWatermark("_event_time", watermark)
        .filter(F.col("hash").isNotNull())
        .groupBy(F.window("_event_time", window).alias("w"))
        .agg(F.count("*").alias("n_txs"))
        .select(F.col("w").start.alias("window_start"), "n_txs")
    )


def session_event_stats(
    feed: DataFrame, gap: str = "30 minutes", watermark: str = "2 days"
) -> DataFrame:
    """Per-account session windows over the feed: txs separated by
    less than ``gap`` merge into one session; the window closes (and
    its state evicts) once the watermark passes its end.

    This is the streaming twin of the batch gaps-and-islands
    sessionization (plans/relational.py event_sessionization) with
    Spark's native boundary convention: ``F.session_window`` ends a
    session at last-event + gap and treats an event exactly at the
    boundary as a NEW session (windows are [start, end)), where the
    batch lag-formulation merges on `diff <= gap`. Runs identically
    over a batch frame (tested stream-vs-batch).
    """
    with_ts = feed.withColumn("_event_time", F.timestamp_seconds("block_timestamp"))
    return (
        with_ts.withWatermark("_event_time", watermark)
        .filter(F.col("hash").isNotNull())
        .groupBy(
            F.col("from").alias("account"),
            F.session_window("_event_time", gap).alias("w"),
        )
        .agg(F.count("*").alias("n_txs"))
        .select(
            "account",
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "n_txs",
        )
    )


def dedup_feed_stream(feed: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Streaming-native duplicate-tx suppression on the live feed.

    The promote path dedups exactly-once via the staged-vs-final
    anti-join (operators/promote.py merge_new, the reference's
    already-imported check); this is its in-flight twin for consumers
    reading the feed directly: one state row per tx hash, evicted once
    the watermark passes — bounded state, unlike a plain
    dropDuplicates which would keep every hash forever on a stream.
    """
    # NULL hashes are the FEED_SCHEMA empty-block markers, and NULL
    # dedup keys compare EQUAL — deduping on raw `hash` would collapse
    # every in-watermark empty block onto the first one, making the
    # others look like permanent gaps. Each marker dedups per block
    # instead.
    key = F.coalesce(
        F.col("hash"), F.concat(F.lit("empty-block-"), F.col("block_number"))
    )
    return (
        feed.withColumn("_event_time", F.timestamp_seconds("block_timestamp"))
        .withColumn("_dedup_key", key)
        .withWatermark("_event_time", watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_event_time", "_dedup_key")
    )


def _totals_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].astype("float64").sum())
    state.update((n, total))
    yield pd.DataFrame({"account": [key[0]], "n_txs": [n], "total_value_wei": [total]})


def running_account_totals(feed_stream: DataFrame) -> DataFrame:
    """Per-account running (tx count, total wei) across micro-batches.

    Custom stateful operator via applyInPandasWithState: one state row
    per `from` account, updated from Arrow batches; each batch emits
    the new running totals for accounts it touched. Grouping shuffles
    by account (uniform key) and state is O(accounts) — the same shape
    any per-key accumulator (rate limiter, anomaly baseline, session
    window) takes in this engine.
    """
    txs = feed_stream.filter(F.col("hash").isNotNull()).select(
        F.col("from").alias("account"), F.col("value").cast("double").alias("value")
    )
    return txs.groupBy("account").applyInPandasWithState(
        _totals_fn,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def account_totals_batch(feed: DataFrame) -> DataFrame:
    """Batch twin of ``running_account_totals`` (final totals per
    account) — the cross-check oracle for the stateful operator."""
    return (
        feed.filter(F.col("hash").isNotNull())
        .groupBy(F.col("from").alias("account"))
        .agg(
            F.count("*").alias("n_txs"),
            F.sum(F.col("value").cast("double")).alias("total_value_wei"),
        )
    )
