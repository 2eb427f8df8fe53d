"""BPE trainer: parity with a pure-Python reference implementation."""

from __future__ import annotations

import re
from collections import Counter

from blockchain_indexer_spark.operators.bpe import (
    bpe_token_stats,
    bpe_train,
    merges_frame,
)
from blockchain_indexer_spark.sources.parquet import load_table

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in WS.split(t.strip().lower()):
            if w and "\x1f" not in w:
                c[tuple(w)] += 1
    return c


def _py_merge_word(sym: tuple[str, ...], lhs: str, rhs: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == lhs and sym[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2  # greedy leftmost, non-overlapping
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _py_bpe(texts: list[str], n_merges: int):
    vocab = _py_word_freqs(texts)
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # count DESC, then lexicographic (lhs, rhs) ASC
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((lhs, rhs, cnt))
        # rebuild with summed freqs (two distinct pre-merge words can
        # collapse onto one post-merge symbol tuple)
        nxt: Counter = Counter()
        for sym, freq in vocab.items():
            nxt[_py_merge_word(sym, lhs, rhs)] += freq
        vocab = nxt
    return merges, vocab


def test_merges_match_python_reference(spark, sf_dir):
    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    expect, _ = _py_bpe(texts, 6)
    got = bpe_train(load_table(spark, sf_dir, "documents"), "text", n_merges=6)
    assert [(m.lhs, m.rhs, m.pair_count) for m in got] == expect


def test_token_stats_match_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    merges = bpe_train(docs, "text", n_merges=6)
    out = bpe_token_stats(docs, "doc_id", "text", merges).collect()
    assert len(out) == len(texts)
    for row in out:
        words = [
            w
            for w in WS.split(texts[row["doc_id"]].strip().lower())
            if w and "\x1f" not in w
        ]
        n_tokens = 0
        for w in words:
            cur: tuple[str, ...] = tuple(w)
            for m in merges:
                cur = _py_merge_word(cur, m.lhs, m.rhs)
            n_tokens += len(cur)
        assert row["n_words"] == len(words)
        assert row["n_word_chars"] == sum(len(w) for w in words)
        assert row["n_bpe_tokens"] == n_tokens


def test_greedy_overlap_semantics(spark):
    # 'aaaa' under merge (a,a): greedy leftmost -> [aa, aa]; 'aaa' -> [aa, a]
    df = spark.createDataFrame(
        [(1, "aaaa aaa aa b")], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=1)
    assert (merges[0].lhs, merges[0].rhs) == ("a", "a")
    # pairs in 'aaaa'=3, 'aaa'=2, 'aa'=1 -> count 6
    assert merges[0].pair_count == 6
    stats = bpe_token_stats(df, "doc_id", "text", merges).collect()[0]
    # aaaa->2, aaa->2, aa->1, b->1
    assert stats["n_bpe_tokens"] == 6


def test_merges_monotone_and_compressive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=8)
    assert [m.rank for m in merges] == list(range(1, len(merges) + 1))
    base = bpe_token_stats(docs, "doc_id", "text", [])
    merged = bpe_token_stats(docs, "doc_id", "text", merges)
    b = {r["doc_id"]: r["n_bpe_tokens"] for r in base.collect()}
    m = {r["doc_id"]: r["n_bpe_tokens"] for r in merged.collect()}
    assert all(m[k] <= b[k] for k in b)  # merges never add tokens
    assert sum(m.values()) < sum(b.values())  # and strictly compress overall
    # with zero merges, token count == char count of the words
    nc = {r["doc_id"]: r["n_word_chars"] for r in base.collect()}
    assert b == nc


def test_early_stop_without_pairs(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_train(df, "text", n_merges=5) == []
    mf = merges_frame(spark, [])
    assert mf.count() == 0 and mf.columns == [
        "rank",
        "lhs",
        "rhs",
        "merged",
        "pair_count",
    ]


def test_vocab_consistent_with_token_stats(spark, sf_dir):
    from blockchain_indexer_spark.operators.bpe import bpe_vocab

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=6)
    vocab = bpe_vocab(docs, "text", merges).collect()
    stats = bpe_token_stats(docs, "doc_id", "text", merges).collect()
    # total token occurrences agree between the two views
    assert sum(r["freq"] for r in vocab) == sum(r["n_bpe_tokens"] for r in stats)
    # every merged symbol that survived is a vocab entry; base symbols
    # plus merge products are the only possible tokens
    tokens_set = {r["token"] for r in vocab}
    merge_products = {m.lhs + m.rhs for m in merges}
    base = {c for r in docs.select("text").collect() for c in r["text"].lower() if not c.isspace()}
    assert tokens_set <= base | merge_products


def test_null_text_counts_as_zero(spark):
    df = spark.createDataFrame(
        [(1, "aa ab"), (2, None)], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=1)
    out = {r["doc_id"]: r for r in bpe_token_stats(df, "doc_id", "text", merges).collect()}
    assert out[2]["n_words"] == 0
    assert out[2]["n_word_chars"] == 0
    assert out[2]["n_bpe_tokens"] == 0
    assert out[1]["n_words"] == 2
