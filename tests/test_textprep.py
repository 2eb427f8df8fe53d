"""operators/textprep.py: CCNet-style boilerplate removal and the
engine-deterministic integer-scaled BM25."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, lines array<string>")


def test_boilerplate_scrub_drops_repeated_lines(spark):
    from blockchain_indexer_spark.operators.textprep import strip_boilerplate

    rows = [
        (1, "web", ["COOKIE BANNER", "real content one", "FOOTER"]),
        (2, "web", ["COOKIE BANNER", "real content two", "FOOTER"]),
        (3, "web", ["COOKIE BANNER", "unique text here"]),
        (4, "web", ["no shared lines at all"]),
        # a line repeated WITHIN one doc counts once toward df
        (5, "web", ["solo dup", "solo dup", "middle", "solo dup"]),
        (6, "wiki", ["COOKIE BANNER"]),  # other group: df=1 there, kept
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _docs(spark, rows), min_docs=2, min_frac=0.05
        ).collect()
    }
    assert out[1]["clean_text"] == "real content one"
    assert out[2]["clean_text"] == "real content two"
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (3, 2)
    assert out[3]["clean_text"] == "unique text here"
    assert out[4]["clean_text"] == "no shared lines at all"
    # within-doc repetition is not boilerplate (df=1), order preserved
    assert out[5]["clean_text"] == "solo dup\nsolo dup\nmiddle\nsolo dup"
    assert out[5]["n_boiler_lines"] == 0
    # group isolation: wiki's single banner doc keeps it
    assert out[6]["clean_text"] == "COOKIE BANNER"


def test_boilerplate_scrub_min_frac_threshold(spark):
    """With 60 docs sharing a line in a 60-doc group, min_frac=0.05
    gives threshold max(2, ceil(3))=3 — a line in exactly 2 docs
    survives, one in 3 does not."""
    from blockchain_indexer_spark.operators.textprep import strip_boilerplate

    rows = [(i, "s", ["common3" if i < 3 else f"u{i}", "pair" if i < 2 else f"v{i}"])
            for i in range(60)]
    out = {r["doc_id"]: r for r in strip_boilerplate(_docs(spark, rows)).collect()}
    assert out[0]["n_boiler_lines"] == 1  # common3 (df=3) dropped
    assert "pair" in out[0]["clean_text"]  # df=2 < ceil(0.05*60)=3 kept


def test_boilerplate_scrub_null_and_empty_docs(spark):
    from blockchain_indexer_spark.operators.textprep import strip_boilerplate

    rows = [(1, "s", None), (2, "s", []), (3, "s", ["x"])]
    out = {r["doc_id"]: r for r in strip_boilerplate(_docs(spark, rows)).collect()}
    for i in (1, 2):
        assert (out[i]["n_lines"], out[i]["n_boiler_lines"], out[i]["clean_text"]) == (
            0,
            0,
            "",
        )
    assert out[3]["clean_text"] == "x"


def _bm25_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, ["apple", "banana", "apple"]),
            (2, ["apple", "cherry"]),
            (3, ["banana", "banana", "banana", "date"]),
            (4, ["elderberry"]),
        ],
        "doc_id long, toks array<string>",
    )
    queries = spark.createDataFrame(
        [(100, "apple"), (100, "banana"), (200, "elderberry")],
        "query_id long, term string",
    )
    return docs, queries


def _expected_nano(tf, df, dl, n, s):
    num = 22 * s * tf * (2 * n - 2 * df + 1)
    den = (10 * s * tf + 3 * s + 9 * dl * n) * (2 * df + 1)
    return math.floor(1e9 * (num / den))


def test_bm25_scores_match_hand_computation(spark):
    from blockchain_indexer_spark.operators.textprep import bm25_scores

    docs, queries = _bm25_fixture(spark)
    n, s = 4, 10
    got = {
        (r["query_id"], r["doc_id"]): (r["n_hit_terms"], r["score_nano"])
        for r in bm25_scores(docs, queries).collect()
    }
    exp = {
        (100, 1): (2, _expected_nano(2, 2, 3, n, s) + _expected_nano(1, 2, 3, n, s)),
        (100, 2): (1, _expected_nano(1, 2, 2, n, s)),
        (100, 3): (1, _expected_nano(3, 2, 4, n, s)),
        (200, 4): (1, _expected_nano(1, 1, 1, n, s)),
    }
    assert got == exp


def test_bm25_topk_ranks_and_ties(spark):
    from blockchain_indexer_spark.operators.textprep import bm25_topk

    docs, queries = _bm25_fixture(spark)
    rows = bm25_topk(docs, queries, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert len(by_q[100]) == 2  # top-2 of 3 candidates
    ranks = dict(by_q[100])
    assert set(ranks) == {1, 2}
    assert by_q[200] == [(1, 4)]


def test_bm25_log_idf_variant_ranks_sensibly(spark):
    """The production ln-idf path: a rare term must outrank a common
    one at equal tf/dl; negative-idf terms (df > N/2) drag scores
    down like standard BM25."""
    from blockchain_indexer_spark.operators.textprep import bm25_scores

    docs = spark.createDataFrame(
        [(i, ["common", "filler"] if i else ["rare", "filler"]) for i in range(5)],
        "doc_id long, toks array<string>",
    )
    queries = spark.createDataFrame(
        [(1, "rare"), (2, "common")], "query_id long, term string"
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_nano"]
        for r in bm25_scores(docs, queries, use_log_idf=True).collect()
    }
    assert got[(1, 0)] > max(v for (q, _), v in got.items() if q == 2)


def test_intra_dedup_keeps_first_occurrence_order(spark):
    from blockchain_indexer_spark.operators.textprep import dedup_doc_lines

    docs = spark.createDataFrame(
        [
            (1, ["b", "a", "b", "c", "a", "b"]),
            (2, []),
            (3, None),
            (4, ["x"]),
        ],
        "doc_id long, lines array<string>",
    )
    out = {r["doc_id"]: r for r in dedup_doc_lines(docs).collect()}
    assert out[1]["clean_text"] == "b\na\nc"  # first occurrences, in order
    assert (out[1]["n_lines"], out[1]["n_unique_lines"]) == (6, 3)
    for d in (2, 3):
        assert (out[d]["n_lines"], out[d]["n_unique_lines"], out[d]["clean_text"]) == (0, 0, "")
    assert out[4]["clean_text"] == "x"


def test_intra_dedup_is_shuffle_free(spark):
    from blockchain_indexer_spark.operators.textprep import dedup_doc_lines

    docs = spark.createDataFrame([(1, ["a", "a"])], "doc_id long, lines array<string>")
    plan = dedup_doc_lines(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
