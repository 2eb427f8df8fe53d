"""Interleaved A/Bs for the deferred session-level experiments
(VERDICT r9 "Next round" #7).

Mode "smj":   spark.sql.join.preferSortMergeJoin true/false — a runtime
              SQL conf, toggled between runs inside one JVM (the AQE
              floor A/B methodology).
Mode "codec": spark.io.compression.codec lz4/zstd — a core conf fixed
              at JVM start, so each invocation runs ONE side and the
              caller alternates fresh processes:
                for i in 1 2; do
                  python tools/ab_session_confs.py codec lz4
                  python tools/ab_session_confs.py codec zstd
                done

Usage: python tools/ab_session_confs.py smj [sf_dir] [cycles]
       python tools/ab_session_confs.py codec <lz4|zstd> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_indexer_spark.plans import REGISTRY  # noqa: E402
from blockchain_indexer_spark.session import get_spark  # noqa: E402

#: shuffle-join-heavy subset: the paths where join strategy / shuffle
#: codec can matter (most other queries broadcast or are scan-bound)
QUERIES = (
    "doc_dedup_clusters",
    "ngram_jaccard_near_dups",
    "graph_supplier_pagerank",
    "minhash_lsh_candidates",
    "doc_bm25_topk",
    "multi_join_revenue",
    "snapshot_diff_orders",
    "fuzzy_name_matches",
    "event_sessionization",
    "doc_longest_repeat",
)


def run_set(spark, sf_dir) -> dict[str, float]:
    out = {}
    for q in QUERIES:
        t0 = time.time()
        REGISTRY[q].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[q] = round(time.time() - t0, 3)
    return out


def main() -> None:
    mode = sys.argv[1]
    if mode == "smj":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        spark = get_spark("ab_smj")
        conf = "spark.sql.join.preferSortMergeJoin"
        for v in ("true", "false"):  # shape warm both sides
            spark.conf.set(conf, v)
            run_set(spark, sf_dir)
        res: dict[str, dict[str, list[float]]] = {
            q: {"true": [], "false": []} for q in QUERIES
        }
        for cyc in range(cycles):
            sides = ("true", "false") if cyc % 2 == 0 else ("false", "true")
            for v in sides:
                spark.conf.set(conf, v)
                for q, dt in run_set(spark, sf_dir).items():
                    res[q][v].append(dt)
        print(f"{'query':32s} {'minSMJ':>8s} {'minSHJ':>8s}  raw")
        for q in QUERIES:
            a, b = res[q]["true"], res[q]["false"]
            print(f"{q:32s} {min(a):8.2f} {min(b):8.2f}  smj={a} shj={b}")
    elif mode == "codec":
        codec = sys.argv[2]
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark(
            f"ab_codec_{codec}", extra_conf={"spark.io.compression.codec": codec}
        )
        run_set(spark, sf_dir)  # shape warm
        best: dict[str, float] = {q: float("inf") for q in QUERIES}
        for _ in range(2):
            for q, dt in run_set(spark, sf_dir).items():
                best[q] = min(best[q], dt)
        total = round(sum(best.values()), 3)
        print(f"CODEC {codec} total {total} " + " ".join(f"{q}={v}" for q, v in best.items()))
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
