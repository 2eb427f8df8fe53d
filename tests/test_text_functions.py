from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.text import (
    fingerprint_md5,
    punct_count,
    token_count,
    word_shingles,
)


def test_token_count_and_punct(spark):
    df = spark.createDataFrame([("Hello, world! How are you?",)], "text string")
    row = df.select(
        token_count("text").alias("nt"), punct_count("text").alias("np")
    ).collect()[0]
    assert row["nt"] == 5
    assert row["np"] == 3  # comma, bang, question mark


def test_word_shingles_short_text_empty(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",)], "text string")
    out = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert out[0]["sh"] == []
    assert out[1]["sh"] == ["a b c", "b c d"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Foo  BAR\tbaz",), ("foo bar baz",)], "text string")
    fps = [r[0] for r in df.select(fingerprint_md5("text")).collect()]
    assert fps[0] == fps[1]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_rolling_fingerprint_properties(spark):
    from blockchain_indexer_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [("", None), ("ab", None), ("ab c", None), ("AB  c", None)],
        "text string, pad string",
    )
    fps = [r[0] for r in df.select(rolling_fingerprint("text")).collect()]
    # empty → 0; manual Rabin-Karp for "ab": (97*131 + 98) % (2^31-1)
    assert fps[0] == 0
    assert fps[1] == (ord("a") * 131 + ord("b")) % 2147483647
    # rolling property: appending a char is one multiply-add
    assert fps[2] == ((fps[1] * 131 + ord(" ")) * 131 + ord("c")) % 2147483647
    # whitespace/case normalization invariance
    assert fps[3] == fps[2]


def test_bpe_token_count(spark):
    from blockchain_indexer_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("Hello, world! It's 2026.",), ("",), ("foo_bar #42",)], "text string"
    )
    out = [r[0] for r in df.select(bpe_token_count("text")).collect()]
    # Hello , world ! It ' s 2026 .  → 9
    # foo _ bar # 42                 → 5
    assert out == [9, 0, 5]
