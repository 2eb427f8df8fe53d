"""Round-10 BANKED gates — implemented, DuckDB-parity-tested, but NOT
yet registered (VERDICT r8 "Next round" #4, the plans/banked_r7/_r8/
_r9 convention).

Why banked: the driver records exactly the first 50 registry entries
per round, and round 9's window budget is fully spoken for (5 promoted
gates + 2 rows-only debuts + 43 stale refreshes). Registering more new
oracled gates this round would displace staleness-rotation slots and
re-break the rotation invariant (tests/test_registry_order.py) by
arithmetic.

So these follow the banked convention: the OPERATOR code, the oracle
SQL, and a full Spark-vs-DuckDB parity test land now
(tests/test_banked_r10.py runs them through the exact same compare()
as the registered gates); round 10 promotes each entry to a plans/*
@register call plus a PRIORITY front-window slot — a mechanical move
of the Query objects below.

This module must NOT be imported by plans/__init__ until promotion:
the registry invariants assert set(REGISTRY) == set(PRIORITY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_indexer_spark.plans.registry import Query
from blockchain_indexer_spark.sources.parquet import load_table

BANKED: dict[str, Query] = {}


def _bank(name: str, oracle: str | None, doc: str, survey_refs: tuple[str, ...] = ()):
    def wrap(fn):
        BANKED[name] = Query(
            name=name, build=fn, oracle=oracle, doc=doc, survey_refs=survey_refs
        )
        return fn

    return wrap


# ---------------------------------------------------------------------------
# doc_split_leakage_incremental: per-batch eval-contamination index
# maintenance (the minhash_incremental pattern applied to decontam)
# ---------------------------------------------------------------------------


# The FULL-corpus split-leakage oracle — shared verbatim with the
# registered doc_split_leakage gate: the incremental gate must
# converge to exactly the one-shot scan, so the strongest oracle for
# it IS the one-shot oracle.
from blockchain_indexer_spark.plans.llmops import _SPLIT_LEAKAGE_SQL  # noqa: E402


@_bank(
    "doc_split_leakage_incremental",
    oracle=_SPLIT_LEAKAGE_SQL,
    doc="INCREMENTAL split-leakage verdict (operators.dedup."
    "split_leakage_index_update + split_leakage_finalize, VERDICT r8 "
    "'Next round' #4a): the corpus arrives in three micro-batches of "
    "mixed train/eval documents (doc_id % 3 — the foreachBatch shape, "
    "driven through a real streaming query in the unit suite); each "
    "batch appends its window rows to two persisted hash indexes and "
    "emits leak events BOTH ways — new-eval windows hitting the train "
    "set so far, and PRIOR eval windows hit retroactively by the "
    "batch's new train docs (the half a one-directional scan misses). "
    "The distinct event union folded through the finalizer must equal "
    "the one-shot full-corpus scan, which is exactly what the oracle "
    "computes: the gate proves per-batch contamination maintenance is "
    "lossless. Per-batch cost is O(|batch| windows) of uniform-key "
    "hash probes, independent of corpus age — the reference's "
    "stale-key cache refresh (T8) paired with the Lee et al. "
    "exact-substring decontamination criterion.",
    survey_refs=("LLM-dedup", "LLM-sample", "T8"),
)
def doc_split_leakage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blockchain_indexer_spark.operators.dedup import (
        split_leakage_finalize,
        split_leakage_index_update,
    )
    from blockchain_indexer_spark.operators.sampling import hash_split

    d = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    state: tuple[DataFrame, DataFrame] | None = None
    leak_parts: list[DataFrame] = []
    for b in range(3):
        batch = d.filter(F.pmod(F.col("doc_id"), F.lit(3)) == b)
        tr, ev, lk = split_leakage_index_update(
            state, batch, "doc_id", "text", "split", k=8
        )
        leak_parts.append(lk)
        state = (
            (tr, ev)
            if state is None
            else (state[0].unionByName(tr), state[1].unionByName(ev))
        )
    leaks = leak_parts[0]
    for lk in leak_parts[1:]:
        leaks = leaks.unionByName(lk)
    assert state is not None
    return split_leakage_finalize(d, state[1], leaks, "doc_id", "split").select(
        F.col("id").alias("doc_id"),
        "split",
        "n_windows",
        "n_leaked",
        "leak_frac",
        "leaked",
    )
