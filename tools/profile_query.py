"""Per-job time attribution for one registered query (guide §1).

Runs the query with the Spark UI enabled, then dumps every job's wall
time and description from the REST API — the local-mode substitute for
clicking through the UI. Iterative operators (closure rounds, monitors)
launch dozens of jobs per build; this shows which phase owns the time.

Usage: python tools/profile_query.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_indexer_spark.plans import REGISTRY  # noqa: E402
from blockchain_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    q = REGISTRY[name]
    # warm run (JIT/codegen/parquet footers), then the measured run
    for i in range(runs):
        t0 = time.time()
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.time() - t0:.3f}s", file=sys.stderr)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        jobs = json.loads(r.read())
    jobs.sort(key=lambda j: j["jobId"])
    # keep only the jobs of the LAST run: find the largest gap... simpler,
    # report all with timestamps; caller reads the tail.
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    total = 0.0
    for j in jobs:
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        total += dur
        desc = (j.get("description") or j["name"])[:110]
        ntasks = j.get("numCompletedTasks", 0)
        print(f"job {j['jobId']:4d}  {dur:7.3f}s  tasks={ntasks:5d}  {desc}")
    print(f"sum of job durations: {total:.2f}s over {len(jobs)} jobs")


if __name__ == "__main__":
    main()
