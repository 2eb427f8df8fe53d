from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fast default test profile (round 10, VERDICT r9 #2: the suite
# outgrew the driver's pytest budget). The fixtures are sf0.001-sized,
# where local[32] x 32 shuffle partitions is pure scheduling overhead:
# local[8] + 8 shuffle partitions ran the same suites 34% faster with
# identical results (the operators are partitioning-independent by
# design — the oracle sweeps pin that). Both knobs stay
# env-overridable; the production/bench sessions are untouched
# (session.py defaults; the envs below are set BEFORE session.py is
# imported because it reads SPARK_GRAFT_SHUFFLE_PARTITIONS at import).
os.environ.setdefault("SPARK_GRAFT_TEST_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from blockchain_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master=f"local[{os.environ['SPARK_GRAFT_TEST_CPUS']}]")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
