"""Pins the driver-facing registry iteration order.

Round 1's driver correctness run recorded exactly the first 50
registered queries and dropped the rest (VERDICT.md "Next round" #1),
so dict order is load-bearing: the reference-semantics chain/mm gates
must come first and the oracle-less rows-only variants last.
"""

from blockchain_indexer_spark.plans import PRIORITY, REGISTRY
from blockchain_indexer_spark.plans.registry import oracles


def test_every_registered_query_is_ranked():
    assert set(REGISTRY) == set(PRIORITY)
    assert len(PRIORITY) == len(set(PRIORITY))


def test_registry_iterates_in_priority_order():
    assert list(REGISTRY) == list(PRIORITY)


def test_round1_missing_gates_lead():
    head = list(REGISTRY)[:27]
    assert [n for n in head if n.startswith("chain_")] == head[:21]
    assert [n for n in head if n.startswith("mm_")] == head[21:26]
    assert head[26] == "doc_quota_sample"


def test_rows_only_variants_trail():
    """Queries without a DuckDB oracle give the weakest driver signal;
    every one of them must sit behind every oracle-checked query,
    except mm_feature_vectors which rides the tier-A multimodal block.
    """
    names = list(REGISTRY)
    with_oracle = set(oracles())
    rows_only = [n for n in names if n not in with_oracle and n != "mm_feature_vectors"]
    # every rows-only variant sits after every oracle-checked query
    last_oracle_pos = max(i for i, n in enumerate(names) if n in with_oracle)
    assert all(names.index(n) > last_oracle_pos for n in rows_only), rows_only
