"""Interleaved A/B of the AQE coalesced-partition floor (round 10).

Round 9 set spark.sql.adaptive.coalescePartitions.minPartitionSize=64k
globally; the driver's round-9 record regressed the overhead-bound
iterative queries at local[32] (graph_supplier_pagerank 2.41 -> 7.05 s)
while the CPU-heavy micro-shuffle paths improved. The conf is runtime-
settable, so this A/B alternates it between runs INSIDE one JVM
(min-of-N per side, alternating order) to decide a per-query scoping.

Usage: python tools/ab_aqe_floor.py [sf_dir] [cycles] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_indexer_spark.plans import REGISTRY  # noqa: E402
from blockchain_indexer_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    # regressed at local[32] in the driver's r09 record
    "graph_supplier_pagerank",
    "embedding_knn_triangles",
    "doc_mmr_rerank",
    "multi_join_revenue",
    "pricing_summary",
    "asof_latest_purchase",
    # 64k-floor winners per the r09 A/B — must keep their gains
    "doc_dedup_clusters",
    "ngram_jaccard_near_dups",
    "event_sessionization",
    "minhash_lsh_candidates",
)

CONF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries = tuple(sys.argv[3:]) or DEFAULT_QUERIES
    spark = get_spark("ab_aqe_floor")
    import gc

    # shape-warm each query once per side so JIT noise drops out
    for floor in ("64k", "1m"):
        spark.conf.set(CONF, floor)
        for q in queries:
            REGISTRY[q].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    res: dict[str, dict[str, list[float]]] = {
        q: {"64k": [], "1m": []} for q in queries
    }
    for cyc in range(cycles):
        sides = ("64k", "1m") if cyc % 2 == 0 else ("1m", "64k")
        for floor in sides:
            spark.conf.set(CONF, floor)
            for q in queries:
                t0 = time.time()
                REGISTRY[q].build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[q][floor].append(round(time.time() - t0, 3))
                gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(f"\n{'query':32s} {'min64k':>8s} {'min1m':>8s}  raw")
    for q in queries:
        a, b = res[q]["64k"], res[q]["1m"]
        print(f"{q:32s} {min(a):8.2f} {min(b):8.2f}  64k={a} 1m={b}")


if __name__ == "__main__":
    main()
