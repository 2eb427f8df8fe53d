"""Content-defined chunking boundary semantics (operators/packing.py
cdc_chunks) and hard-negative mining exactness (operators/similarity.py
hard_negatives)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.packing import cdc_chunks
from blockchain_indexer_spark.operators.similarity import hard_negatives


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, "doc_id", "text", **kw).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    return by_doc


def test_cdc_short_null_and_empty_docs(spark):
    got = _chunks(
        spark,
        [(1, "just three tokens"), (2, None), (3, "   "), (4, "one")],
        window=4,
    )
    # shorter than the window -> exactly one chunk covering all tokens
    assert [(r["chunk_idx"], r["n_tokens"]) for r in got[1]] == [(0, 3)]
    assert [(r["chunk_idx"], r["n_tokens"]) for r in got[4]] == [(0, 1)]
    assert 2 not in got and 3 not in got  # NULL / blank emit nothing


def test_cdc_chunk_token_counts_partition_the_document(spark, sf_dir):
    from blockchain_indexer_spark.functions.text import token_count
    from blockchain_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = cdc_chunks(docs, "doc_id", "text")
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("total"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    )
    truth = docs.select("doc_id", token_count("text").alias("expect")).filter(
        F.col("expect") > 0
    )
    joined = per_doc.join(truth, "doc_id").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["total"] == r["expect"]  # chunks partition the tokens
        assert r["max_idx"] == r["n_chunks"] - 1  # contiguous indices


def test_cdc_boundaries_survive_a_head_insertion(spark):
    # THE CDC property: prepending content only perturbs chunks up to
    # the first content-defined boundary; every later chunk hash is
    # unchanged (fixed-offset chunking would shift all of them).
    base = " ".join(f"tok{i * 37 % 101}" for i in range(400))
    got = _chunks(
        spark, [(1, base), (2, "INSERTED HEAD WORDS " + base)], window=4, divisor=8
    )
    h1 = [r["chunk_hash"] for r in got[1]]
    h2 = [r["chunk_hash"] for r in got[2]]
    assert len(h1) > 3, "fixture should produce several chunks"
    # all chunks of doc1 except (possibly) the first reappear in doc2
    shared = set(h1[1:]) & set(h2)
    assert shared == set(h1[1:])
    # and the shared suffix is in the same relative order
    tail1 = [h for h in h1 if h in shared]
    tail2 = [h for h in h2 if h in shared]
    assert tail1 == tail2


def test_hard_negatives_labels_always_differ_and_match_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [
        (i, [float(x) for x in vecs[i]], int(i % 3) if i % 7 else None)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(df, "vec_id", "embedding", "label", k=4, stride=5).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        assert r["neighbor_label"] != r["query_label"] or (
            (r["neighbor_label"] is None) != (r["query_label"] is None)
        )
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])

    q = np.round(vecs.astype(np.float64) * 1000)
    labels = [int(i % 3) if i % 7 else None for i in range(40)]
    for qid in range(0, 40, 5):
        scores = []
        for nid in range(40):
            if nid == qid or labels[nid] == labels[qid]:
                continue
            s = float(q[qid] @ q[nid]) / np.sqrt(
                float(q[qid] @ q[qid]) * float(q[nid] @ q[nid])
            )
            scores.append((-s, nid))
        expect = [nid for _, nid in sorted(scores)[:4]]
        assert got[qid] == expect, qid
