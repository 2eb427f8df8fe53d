"""Dump .explain('formatted') for named queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (built at sf0.001 —
plan SHAPE is scale-independent; eager sub-builds run but stay cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_indexer_spark.plans import REGISTRY  # noqa: E402
from blockchain_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
