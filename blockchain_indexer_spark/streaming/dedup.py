"""Streaming first-seen deduplication — exact dedup AT INGEST.

Batch dedup (operators.dedup.exact_dup_clusters) answers "which rows of
this corpus are copies"; an ingest pipeline needs the other form:
documents arrive continuously and each micro-batch must emit only
fingerprints never seen before, across batches and restarts. The
reference solves its flavor of this with the requested_blocks ledger +
anti-join merge (Indexer/ImportProcedure.cs via operators/promote.py
T4/A8); for a document stream the streaming-native shape is a custom
stateful operator: group by content fingerprint, one state row per
distinct fingerprint.

Scale shape: grouping shuffles each micro-batch by the md5 fingerprint
(uniform key, no skew); state is O(distinct fingerprints) in the state
store (RocksDB-backed on a production cluster, where 10^10 fingerprints
are a routine state size). The optional processing-time TTL bounds
state for unbounded streams — the documented trade: a duplicate
arriving after its fingerprint's TTL eviction is re-admitted, the
standard windowed-dedup semantics (Spark's own dropDuplicates requires
the same watermark bound for exactly this reason).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from blockchain_indexer_spark.functions.text import fingerprint_md5

#: One row per fingerprint TOUCHED in the micro-batch: the cumulative
#: census (keep_id, n_seen) plus how many copies this batch added.
DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("keep_id", LongType()),
        StructField("n_seen", LongType()),
        StructField("new_in_batch", LongType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType(
    [StructField("keep_id", LongType()), StructField("n_seen", LongType())]
)


def _make_dedup_fn(ttl_ms: int | None):
    def _fn(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: drop the census row; a later copy of this
            # fingerprint re-enters as first-seen (windowed semantics)
            state.remove()
            return
        first, n = state.get if state.exists else (None, 0)
        new = 0
        for pdf in batches:
            if not len(pdf):
                continue
            m = int(pdf["_id"].min())
            # first-seen id: min id of the FIRST batch that carried the
            # fingerprint (deterministic within a batch regardless of
            # Arrow chunking; across batches, stream order decides)
            first = m if first is None else first
            n += len(pdf)
            new += len(pdf)
        state.update((first, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "keep_id": [first],
                "n_seen": [n],
                "new_in_batch": [new],
            }
        )

    return _fn


def streaming_first_seen(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Cross-batch exact dedup census over a document stream.

    Each micro-batch emits one update row per content fingerprint it
    touched: (fingerprint, keep_id, n_seen, new_in_batch). A consumer
    admits a document iff it IS the keep_id row of a fingerprint whose
    census it hasn't admitted before; everything else is a duplicate.
    NULL-text rows are dropped for the same reason
    exact_dup_clusters drops them (md5(NULL) would merge unrelated
    contentless docs into one cluster).

    ``ttl_minutes`` bounds the state store via processing-time timeout;
    None keeps every fingerprint forever (exact dedup, state grows with
    distinct content — fine when distinct content is the corpus you are
    building anyway).
    """
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000
    fp = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            fingerprint_md5(text_col).alias("fingerprint"),
            F.col(id_col).cast("long").alias("_id"),
        )
    )
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def first_seen_batch(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Batch twin — the final census streaming_first_seen converges to
    over any batch split of the same data (the cross-check oracle),
    PROVIDED micro-batches arrive in ascending id order or ids are
    reassigned at ingest; with no TTL, (fingerprint, n_seen) always
    matches and keep_id is the stream's first-seen rather than the
    global min when arrival order and id order disagree."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            fingerprint_md5(text_col).alias("fingerprint"),
            F.col(id_col).cast("long").alias("_id"),
        )
        .groupBy("fingerprint")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_seen"))
    )
