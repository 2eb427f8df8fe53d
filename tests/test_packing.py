"""Sequence packing and mixture rebalancing (operators.packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.packing import pack_chunks, rebalance_mixture
from blockchain_indexer_spark.operators.sampling import hash_bucket


def test_pack_chunks_spans_and_offsets(spark):
    # budget 10: doc sizes chosen to exercise exact-fit, straddle, and
    # longer-than-budget spans
    rows = [
        (1, "a", 4),   # chunk 0, offset 0
        (2, "a", 6),   # fills chunk 0 exactly (ends at 10)
        (3, "a", 25),  # chunks 1..3 (tokens 10..34)
        (4, "a", 1),   # token 35 → chunk 3
        (5, "b", 10),  # separate group restarts at chunk 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n"])
    got = {
        r["doc_id"]: (r["first_chunk"], r["last_chunk"], r["n_chunks"], r["chunk_offset"])
        for r in pack_chunks(df, "doc_id", "source", "n", budget=10).collect()
    }
    assert got == {
        1: (0, 0, 1, 0),
        2: (0, 0, 1, 4),
        3: (1, 3, 3, 0),
        4: (3, 3, 1, 5),
        5: (0, 0, 1, 0),
    }


def test_pack_chunks_drops_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 3)], ["doc_id", "source", "n"]
    )
    out = pack_chunks(df, "doc_id", "source", "n", budget=10)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_rebalance_levels_to_smallest_group(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = rebalance_mixture(df, "doc_id", "source").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    # the smallest group survives whole (bucket * 40 < 40 * 1e6 always)
    assert len(by_group["small"]) == 40
    # the big group is thinned toward ~40 (hash-uniform: allow slack)
    assert 15 <= len(by_group["big"]) <= 80
    # survivors are exactly the acceptance-test winners — deterministic
    expected_big = {
        r["doc_id"]
        for r in df.filter(F.col("source") == "big")
        .withColumn("b", hash_bucket("doc_id", 1_000_000))
        .collect()
        if r["b"] * 400 < 40 * 1_000_000
    }
    assert {r["doc_id"] for r in by_group["big"]} == expected_big


def test_rebalance_explicit_target(spark):
    rows = [(i, "x") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    n = rebalance_mixture(df, "doc_id", "source", target=50).count()
    # expected 50 survivors, hash-uniform
    assert 25 <= n <= 90


def test_pack_chunks_property_vs_python_reference(spark):
    """Randomized (seeded) cross-check against a pure-Python packer."""
    import random

    rng = random.Random(7)
    rows = [
        (i, f"s{rng.randrange(3)}", rng.randrange(1, 40)) for i in range(300)
    ]
    budget = 16
    df = spark.createDataFrame(rows, ["doc_id", "source", "n"])
    got = {
        r["doc_id"]: (r["first_chunk"], r["last_chunk"], r["n_chunks"], r["chunk_offset"])
        for r in pack_chunks(df, "doc_id", "source", "n", budget=budget).collect()
    }
    # python reference: concat per source in doc_id order, cut every budget
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, s, n in sorted(rows):
        by_src.setdefault(s, []).append((i, n))
    expect = {}
    for s, docs in by_src.items():
        cum = 0
        for i, n in docs:
            expect[i] = (cum // budget, (cum + n - 1) // budget,
                         (cum + n - 1) // budget - cum // budget + 1, cum % budget)
            cum += n
    assert got == expect


def test_rebalance_excludes_null_groups_from_target(spark):
    """A tiny NULL-source group must neither survive nor poison the
    default (min-group) target."""
    from blockchain_indexer_spark.operators.packing import rebalance_mixture

    rows = [(i, "big") for i in range(200)] + [(1000 + i, None) for i in range(3)] + [
        (2000 + i, "small") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = rebalance_mixture(df, "doc_id", "source").collect()
    assert all(r["source"] is not None for r in out)
    # target = 50 (the smallest REAL group), not 3
    n_small = sum(1 for r in out if r["source"] == "small")
    assert n_small == 50  # at-or-under-target group keeps everything
