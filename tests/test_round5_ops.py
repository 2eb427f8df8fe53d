"""Round-5 operators: sliding-window chunking (RAG-standard), per-doc
TF-IDF keywords, and the MinHash estimator-calibration monitor."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.dedup import minhash_calibration
from blockchain_indexer_spark.operators.packing import sliding_chunks
from blockchain_indexer_spark.operators.textprep import tfidf_keywords


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sliding_chunks_match_python_reference(spark):
    texts = {
        1: " ".join(f"t{i}" for i in range(25)),  # 25 tokens, w=8 s=6
        2: " ".join(f"t{i}" for i in range(8)),   # n == window: one chunk
        3: " ".join(f"t{i}" for i in range(3)),   # n < window: one chunk
        4: "solo",
        5: "",                                     # no rows
        6: None,                                   # no rows
    }
    out = sliding_chunks(
        _docs(spark, list(texts.items())), "doc_id", "text", window=8, stride=6
    ).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start"], r["end"], r["n_tokens"], r["chunk_hash"]
        )
        for r in out
    }
    expect = {}
    for doc_id, text in texts.items():
        toks = (text or "").lower().split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - 8) // 6))
        for i in range(n_chunks):
            start, end = i * 6, min(i * 6 + 8, n)
            expect[(doc_id, i)] = (
                start, end, end - start, _md5_60(" ".join(toks[start:end]))
            )
    assert got == expect
    # 25 tokens, w=8 s=6 -> ceil(17/6)=3, so 4 chunks; last covers 18..25
    assert (1, 3) in got and got[(1, 3)][:2] == (18, 25)


def test_sliding_chunks_invariants_across_geometries(spark):
    """One Spark pass over many (n, window, stride) geometries; the
    chunk set of every document must tile [0, n): first chunk starts
    at 0, consecutive starts differ by exactly stride, every chunk
    ends at min(start+window, n), and the last chunk reaches n with
    no earlier chunk already covering it (no zero-overhang tails)."""
    cases = [
        (n, w, s)
        for n in (1, 2, 5, 7, 8, 9, 15, 16, 17, 31, 64, 97)
        for (w, s) in ((8, 6), (8, 8), (16, 4), (5, 5), (64, 48), (3, 1))
    ]
    rows = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, (n, _, _) in enumerate(cases)
    ]
    df = _docs(spark, rows)
    by_geom = {}
    for (w, s) in sorted({(w, s) for _, w, s in cases}):
        out = sliding_chunks(df, "doc_id", "text", window=w, stride=s).collect()
        for r in out:
            by_geom.setdefault((w, s), {}).setdefault(r["doc_id"], []).append(r)
    for i, (n, w, s) in enumerate(cases):
        chunks = sorted(by_geom[(w, s)].get(i, []), key=lambda r: r["chunk_idx"])
        assert chunks, (n, w, s)
        assert chunks[0]["start"] == 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start"] == c["chunk_idx"] * s
            assert c["end"] == min(c["start"] + w, n)
            assert c["n_tokens"] == c["end"] - c["start"] > 0
        assert chunks[-1]["end"] == n
        # minimality: the second-to-last chunk must NOT already reach n
        if len(chunks) > 1:
            assert chunks[-2]["end"] < n, (n, w, s)


def test_sliding_chunks_stride_equals_window_is_disjoint(spark):
    out = sliding_chunks(
        _docs(spark, [(1, " ".join(f"t{i}" for i in range(20)))]),
        "doc_id", "text", window=5, stride=5,
    ).collect()
    spans = sorted((r["start"], r["end"]) for r in out)
    assert spans == [(0, 5), (5, 10), (10, 15), (15, 20)]


def test_tfidf_keywords_rank_rare_terms_first(spark):
    # "rare" appears once in doc 1 only; "common" is in every doc — the
    # rational idf must rank rare above common despite equal tf
    rows = [
        (1, "rare common common"),
        (2, "common common x2"),
        (3, "common x3 x3"),
    ]
    out = tfidf_keywords(_docs(spark, rows), "doc_id", "text", k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"], r["score_nano"]))
    for doc in by_doc:
        by_doc[doc].sort()
    # doc 1: rare (tf=1, df=1) scores 1e9*(2*3-2+1)/3 = 5/3e9 > common
    # (tf=2, df=3) 1e9*2*(6-6+1)/7 = 2/7e9
    assert [t[1] for t in by_doc[1]] == ["rare", "common"]
    assert by_doc[1][0][4] == int(1e9 * (1 * (2 * 3 - 2 * 1 + 1)) / (2 * 1 + 1))
    # doc 3: x3 (tf=2, df=1) leads; every doc emits at most k rows
    assert [t[1] for t in by_doc[3]][0] == "x3"
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_keywords_tie_breaks_by_term_and_log_variant_runs(spark):
    rows = [(1, "aa bb"), (2, "cc dd")]
    out = tfidf_keywords(_docs(spark, rows), "doc_id", "text", k=2).collect()
    d1 = sorted((r["rank"], r["term"]) for r in out if r["doc_id"] == 1)
    # equal tf/df everywhere -> alphabetical by term
    assert d1 == [(1, "aa"), (2, "bb")]
    log_out = tfidf_keywords(
        _docs(spark, rows), "doc_id", "text", k=1, use_log_idf=True
    ).collect()
    assert {r["doc_id"] for r in log_out} == {1, 2}


def test_minhash_calibration_buckets_are_calibrated(spark):
    # planted near-dup pair (identical long docs) + unrelated docs:
    # the identical pair must land in the top bucket with est == true
    # == 1.0; every bucket's means stay inside [0, 1]
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base),
        (3, " ".join(f"x{i}" for i in range(40))),
        (4, " ".join(f"y{i}" for i in range(40))),
    ]
    out = minhash_calibration(
        _docs(spark, rows), "doc_id", "text", k=3, num_hashes=64, bands=16,
        n_buckets=8, hash_fn="md5_60",
    ).collect()
    assert out, "the identical pair must be an LSH candidate"
    by_bucket = {r["bucket"]: r for r in out}
    top = by_bucket[max(by_bucket)]
    assert top["bucket"] == 8  # matches == 64 -> the exact-1.0 bucket
    assert top["mean_est"] == 1.0
    assert top["mean_true"] == pytest.approx(1.0, abs=1e-9)
    for r in out:
        assert 0.0 <= r["mean_est"] <= 1.0
        assert 0.0 <= r["mean_true"] <= 1.0
        assert r["n_pairs"] >= 1


def test_minhash_calibration_true_jaccard_matches_exact_pairs(spark):
    """Per-pair ground truth: the monitor's bucketed mean_true must
    reproduce from ngram_jaccard_pairs run uncapped on the same corpus
    (the monitor computes the same intersection, just bucketed)."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g z"),   # high overlap
        (3, "p q r s t u v w"),
    ]
    from blockchain_indexer_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _docs(spark, rows)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(
            d, "doc_id", "text", k=3, hash_fn="md5_60"
        ).collect()
    }
    if not cand:
        pytest.skip("no LSH candidates on this tiny corpus")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            d, "doc_id", "text", k=3, threshold=0.0, max_doc_freq=None
        ).collect()
    }
    out = minhash_calibration(
        d, "doc_id", "text", k=3, hash_fn="md5_60"
    ).collect()
    n_pairs = sum(r["n_pairs"] for r in out)
    assert n_pairs == len(cand)
    # weighted mean of mean_true == mean of the exact jaccards (to the
    # 1e-9 floor grid) over candidate pairs
    got = sum(r["mean_true"] * r["n_pairs"] for r in out) / n_pairs
    want = sum(int(1e9 * exact.get(p, 0.0)) / 1e9 for p in cand) / len(cand)
    assert got == pytest.approx(want, abs=1e-6)


import pytest  # noqa: E402  (used by approx above)
