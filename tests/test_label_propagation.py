"""Label-propagation semantics (operators/cluster.py): clamping,
majority vote, tie-break, round-by-round spread."""

from __future__ import annotations

from blockchain_indexer_spark.operators.cluster import label_propagation


def _run(spark, edges, seeds, iters):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "id long, label int")
    out = label_propagation(e, s, iters=iters)
    return {r["id"]: (r["label"], r["is_seed"]) for r in out.collect()}


def test_chain_spreads_one_hop_per_round(spark):
    # 0 -- 1 -- 2 -- 3, seed at 0
    edges = [(0, 1), (1, 2), (2, 3)]
    seeds = [(0, 7)]
    one = _run(spark, edges, seeds, iters=1)
    assert one == {0: (7, True), 1: (7, False)}
    two = _run(spark, edges, seeds, iters=2)
    assert two == {0: (7, True), 1: (7, False), 2: (7, False)}


def test_majority_vote_and_tie_to_smallest_label(spark):
    # node 10 has two label-1 neighbors and one label-2 -> majority 1;
    # node 20 has one of each -> tie -> smallest label wins
    edges = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5)]
    seeds = [(1, 1), (2, 1), (3, 2), (4, 9), (5, 3)]
    out = _run(spark, edges, seeds, iters=1)
    assert out[10] == (1, False)
    assert out[20] == (3, False)


def test_seeds_are_clamped_against_neighbor_majority(spark):
    # seed node 1 (label 5) is surrounded by label-2 seeds: stays 5
    edges = [(1, 2), (1, 3), (1, 4)]
    seeds = [(1, 5), (2, 2), (3, 2), (4, 2)]
    out = _run(spark, edges, seeds, iters=2)
    assert out[1] == (5, True)


def test_isolated_unlabeled_nodes_stay_unlabeled(spark):
    edges = [(0, 1), (8, 9)]  # component {8,9} has no seed
    seeds = [(0, 4)]
    out = _run(spark, edges, seeds, iters=3)
    assert 8 not in out and 9 not in out
    assert out[1] == (4, False)
