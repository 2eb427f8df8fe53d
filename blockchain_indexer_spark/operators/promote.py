"""Staging → final promotion — the batch core of the reference's
`import_from_staging_2` procedure (0.0.64.sql:2040-2379) and its
exactly-once machinery (README.md:85-113).

Stages, same order as the procedure:

1. Block-version disambiguation (:2048-2101) — same number staged with
   different hash/timestamp (reorg residue) ⇒ keep the newest.
2. Completeness gating (:2106-2119) — a block is promoted only when
   its staged distinct tx count equals the declared
   total_transaction_count; incomplete blocks stay staged.
3. Dedup (:2139-2263) — staging allows duplicates (at-least-once
   delivery); promotion inserts DISTINCT rows only.
4. Idempotent merge — `ON CONFLICT DO NOTHING` without unique
   indexes: an anti-join against already-promoted keys.

All state lives in the tables themselves (as in the reference), never
in Spark state — restart-safe by construction. Every step is a keyed
shuffle on block_number or hash; nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def disambiguate_blocks(block_staging: DataFrame) -> DataFrame:
    """Keep the newest staged version of each block number (A10/T7)."""
    w = W.partitionBy("number").orderBy(F.desc("timestamp"), F.desc("hash"))
    return (
        block_staging.dropDuplicates(["number", "hash", "timestamp"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def complete_blocks(blocks: DataFrame, tx_staging: DataFrame) -> DataFrame:
    """Blocks whose staged distinct tx hashes match the declared count
    (T3). Empty blocks (count 0) are trivially complete."""
    counts = (
        tx_staging.join(
            blocks.select(F.col("number").alias("_bnr"), F.col("hash").alias("_bhash")),
            (tx_staging["block_number"] == F.col("_bnr"))
            & (tx_staging["block_hash"] == F.col("_bhash")),
        )
        .groupBy(F.col("_bnr").alias("number"))
        .agg(F.countDistinct(tx_staging["hash"]).alias("staged_txs"))
    )
    return (
        blocks.join(counts, "number", "left")
        .withColumn("staged_txs", F.coalesce(F.col("staged_txs"), F.lit(0)))
        .filter(F.col("staged_txs") == F.col("total_transaction_count"))
        .drop("staged_txs")
    )


def merge_new(staged: DataFrame, existing: DataFrame | None, keys: list[str]) -> DataFrame:
    """Idempotent append set: staged minus rows whose key already
    exists (T4's ON CONFLICT DO NOTHING as a left anti join)."""
    deduped = staged.dropDuplicates(keys)
    if existing is None:
        return deduped
    return deduped.join(existing.select(*keys), keys, "left_anti")


def promote(
    block_staging: DataFrame,
    tx_staging: DataFrame,
    log_staging: DataFrame,
    existing_blocks: DataFrame | None = None,
    existing_txs: DataFrame | None = None,
    checkpoint=None,
) -> dict[str, DataFrame]:
    """One promotion round over raw staging tables.

    Returns {'block', 'transaction_raw', 'log_raw', 'leftover_blocks'}:
    promoted rows (new, complete, deduplicated) plus the staged block
    rows that must be retried next round (incomplete blocks that are
    not yet imported — the reference leaves them in staging and marks
    imported ones, :2265-2270).

    `checkpoint` (optional, df -> df): applied to each promoted frame
    in dependency order. The streaming path passes an eager
    localCheckpoint so transaction_raw builds on the already-
    materialized block result instead of re-running the
    disambiguate/complete/merge lineage per output — checkpointing the
    three returned frames after the fact recomputes the pyramid.
    """
    ckpt = checkpoint if checkpoint is not None else (lambda df: df)
    best = disambiguate_blocks(block_staging)
    ready = complete_blocks(best, tx_staging)
    new_blocks = ckpt(merge_new(ready, existing_blocks, ["number"]))

    ready_keys = new_blocks.select("number", F.col("hash").alias("block_hash"))
    ready_txs = tx_staging.join(
        F.broadcast(ready_keys),
        (tx_staging["block_number"] == ready_keys["number"])
        & (tx_staging["block_hash"] == ready_keys["block_hash"]),
        "left_semi",
    )
    new_txs = ckpt(merge_new(ready_txs, existing_txs, ["hash"]))
    new_logs = ckpt(
        log_staging.join(
            new_txs.select(F.col("hash").alias("tx_hash")), "tx_hash", "left_semi"
        ).dropDuplicates(["tx_hash", "log_index"])
    )

    # leftovers = rows still awaiting promotion NEXT round: not
    # promoted this round AND not already imported earlier. Without
    # the existing_blocks anti-join, an at-least-once redelivery of an
    # old block would sit in the retry set forever (merge_new drops it
    # from new_blocks every round) — the reference instead marks
    # imported staged rows (:2265-2270); this is the same drain.
    leftover_blocks = block_staging.join(new_blocks.select("number"), "number", "left_anti")
    if existing_blocks is not None:
        leftover_blocks = leftover_blocks.join(
            existing_blocks.select("number"), "number", "left_anti"
        )
    return {
        "block": new_blocks,
        "transaction_raw": new_txs,
        "log_raw": new_logs,
        "leftover_blocks": leftover_blocks,
    }


def retract_from(tables: dict[str, DataFrame], reorg_block: int) -> dict[str, DataFrame]:
    """Reorg retraction (T5, Indexer.cs:273-325): drop every final row
    at or above the diverging block; caller re-ingests from there.
    With partitioned storage this is a partition-range delete.

    Every frame must carry its block column (`number` for 'block',
    `block_number` otherwise) — a frame that cannot be range-retracted
    raises instead of silently surviving the reorg (stale rows that
    dodge a retraction would be re-promoted as duplicates on replay).
    Raw per-tx logs never persist in this engine (they flow into the
    typed event tables, which all carry block_number); a deployment
    that does persist them must store the block number alongside.
    """
    out = {}
    for name, df in tables.items():
        col = "number" if name == "block" else "block_number"
        if col not in df.columns:
            raise ValueError(
                f"retract_from: table {name!r} has no {col!r} column and "
                "cannot be range-retracted — persist it with its block number"
            )
        out[name] = df.filter(F.col(col) < reorg_block)
    return out
