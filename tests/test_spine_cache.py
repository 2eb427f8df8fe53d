"""Promoted-table disk layer: cached reads must equal a fresh spine.

The reference promotes event tables once and serves every view from
them (ImportProcedure.cs:17-27); plans/chain.py reproduces that with a
fingerprinted parquet layer. These tests pin: (a) cache round-trip
equivalence table-by-table, (b) fingerprint invalidation on source
change, (c) the SPARK_GRAFT_SPINE_CACHE=0 bypass.
"""

from __future__ import annotations

import os
import shutil

import pytest

from blockchain_indexer_spark.plans import chain as C

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def fresh_cache(tmp_path, monkeypatch):
    """Point both cache layers at an empty dir and drop session caches."""
    monkeypatch.setenv("SPARK_GRAFT_SPINE_CACHE", "1")
    monkeypatch.setattr(
        "blockchain_indexer_spark.sources.parquet._CACHE_DIR", str(tmp_path)
    )
    C._PIPELINE_CACHE.clear()
    C._VIEW_CACHE.clear()
    yield tmp_path
    C._PIPELINE_CACHE.clear()
    C._VIEW_CACHE.clear()


def test_disk_cache_round_trip_equals_fresh_compute(spark, fresh_cache):
    fresh = C.compute_pipeline_tables(spark, SF)
    expected = {name: _rows(df) for name, df in fresh.items()}

    built = C._pipeline_tables(spark, SF)  # computes AND publishes
    spine_dirs = [
        d for d in os.listdir(fresh_cache / "sf0.001") if d.startswith("spine-")
    ]
    assert len(spine_dirs) == 1

    C._PIPELINE_CACHE.clear()  # force the disk-read path
    cached = C._pipeline_tables(spark, SF)
    assert set(cached) == set(C._PIPELINE_NAMES) == set(built)
    for name in C._PIPELINE_NAMES:
        if name == "classified":
            # promoted copy drops the parsed-log payload column
            keep = [c for c in cached[name].columns]
            assert _rows(cached[name]) == _rows(fresh[name].select(*keep))
        else:
            assert _rows(cached[name]) == expected[name], name


def test_derived_views_round_trip(spark, fresh_cache):
    built = {k: _rows(v) for k, v in C._derived_views(spark, SF).items()}
    C._PIPELINE_CACHE.clear()
    C._VIEW_CACHE.clear()
    cached = C._derived_views(spark, SF)
    assert set(cached) == {"signups", "trust", "ledger", "balances"}
    for name, rows in built.items():
        assert _rows(cached[name]) == rows, name


def test_fingerprint_tracks_source_and_code(tmp_path, monkeypatch):
    d1 = C._spine_dir(SF, "spine")
    # same inputs → same dir
    assert C._spine_dir(SF, "spine") == d1
    # a different events.parquet (copy with its own mtime) → new dir
    alt = tmp_path / "sfalt"
    alt.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), alt / "events.parquet")
    os.utime(alt / "events.parquet", ns=(1, 1))
    d2 = C._spine_dir(str(alt), "spine")
    assert os.path.basename(d1) != os.path.basename(d2)
    # a code change → new fingerprint
    monkeypatch.setattr(C, "_CODE_FP", "0" * 32)
    assert C._spine_dir(SF, "spine") != d1


def test_cache_bypass_env(spark, fresh_cache, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPINE_CACHE", "0")
    C._pipeline_tables(spark, SF)
    # nothing published, nothing read
    assert not os.path.exists(fresh_cache / "sf0.001") or not any(
        d.startswith("spine-") for d in os.listdir(fresh_cache / "sf0.001")
    )


def test_ingest_spine_counts_all_txs(spark, fresh_cache):
    n = C.ingest_spine(spark, SF)
    assert n == C.derive_chain(spark, SF).count()
