"""Distributed BPE tokenizer training (Sennrich et al. 2016) + merged
token accounting — the tokenizer-fitting step of a pretraining data
pipeline, run as Spark jobs.

Classic BPE trainers operate on the WORD-FREQUENCY table, not the raw
corpus: count word types once, then iterate merges over the (tiny by
comparison) vocabulary. That structure is exactly what makes the
algorithm scale on Spark:

- the ONLY corpus-wide pass is one whitespace-tokenize → explode →
  groupBy(word) count: a single shuffle on a high-cardinality uniform
  key. At 100 TB the word-type table is ~10⁸ rows — 10⁴× smaller than
  the corpus;
- each merge iteration touches only the vocab frame: adjacent-pair
  counts are one explode + groupBy(pair) (vocab-sized shuffle), the
  argmax collects ONE row to the driver (orderBy cnt DESC with a
  lexicographic tie-break → deterministic), and applying the merge is
  a narrow `replace` projection. The frame is localCheckpoint-ed per
  iteration, so lineage stays flat over any merge count;
- token accounting with a learned merge list is a pure projection:
  the merge rules are string literals in a `transform` lambda —
  shuffle-free, whole-stage-codegen, no UDF.

Word → symbol-string representation: symbols are separated by a
DOUBLED unit separator — '␟␟' + c1 + '␟␟' + c2 + '␟␟'. A merge
(l, r) is then `replace(w, ␟+l+␟␟+r+␟, ␟+lr+␟)`: the pattern
consumes only the INNER half of each boundary, so the outer '␟'
survives on both sides and the scan position after a match sits
exactly on a valid boundary for the next one. That makes the
left-to-right non-overlapping scan of Java String.replace and DuckDB
replace IDENTICAL to BPE's greedy leftmost application — including
back-to-back merges in symbol runs ('aaaa' → [aa, aa], 'ababab' →
[ab, ab, ab]), which a single-separator encoding gets wrong because
the first match eats the boundary the second needs ('aaaa' →
[aa, a, a]). Verified on both engines. A false interior match is
impossible: the pattern's inner '␟␟' occurs only at true symbol
boundaries and its single-'␟' edges require the neighboring outer
'␟' that only boundaries carry; symbols never contain the separator
byte — words containing it are dropped on both sides (the one
explicit policy).

Determinism / oracle contract: pair counts are exact integer sums of
word frequencies; ties break (count DESC, lhs ASC, rhs ASC) with
binary string comparison in both engines, so every merge — and hence
the whole merge table and every downstream token count — is
reproducible bit-for-bit. The DuckDB oracle unrolls the training loop
into per-merge CTE layers (the operators/kmeans.py `_kmeans_ctes`
recipe applied to BPE).

Reference parity: none — the reference (CirclesUBI/blockchain-indexer)
has no text operators; this extends the training-data-pipeline
surface (SURVEY LLM-text) beyond counting into tokenizer FITTING.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_indexer_spark.functions.text import tokens

SEP = "\x1f"


@dataclass(frozen=True)
class Merge:
    rank: int
    lhs: str
    rhs: str
    pair_count: int


def _clean_words(text_col: str) -> Column:
    """Normalized word array: whitespace tokens minus any word carrying
    the separator byte (mirrored by the oracle's list_filter)."""
    return F.filter(tokens(text_col), lambda x: ~x.contains(SEP))


def _symbolize(word: Column) -> Column:
    """'abc' → '␟␟a␟␟b␟␟c␟␟' (every initial symbol is one character,
    boundaries are doubled separators — see module doc)."""
    return F.concat(F.lit(SEP * 2), F.regexp_replace(word, "(.)", "$1" + SEP * 2))


def _merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    """(search, replacement) applying merge (lhs, rhs) as greedy
    leftmost BPE: consume the inner half of each boundary only."""
    return SEP + lhs + SEP * 2 + rhs + SEP, SEP + lhs + rhs + SEP


def _symbols(w: Column | str) -> Column:
    c = F.col(w) if isinstance(w, str) else w
    return F.filter(F.split(c, SEP), lambda x: x != "")


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(w symbol-string, freq) word-type table — the one corpus pass."""
    return (
        df.select(F.explode(_clean_words(text_col)).alias("_word"))
        .groupBy(_symbolize(F.col("_word")).alias("w"))
        .agg(F.count("*").cast("long").alias("freq"))
    )


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 8) -> list[Merge]:
    """Learn `n_merges` BPE merges from the corpus; returns them in
    application order. Stops early if no adjacent pair remains."""
    words = word_freqs(df, text_col).localCheckpoint(eager=True)
    merges: list[Merge] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select("freq", _symbols("w").alias("_sy"))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(_sy, 1, size(_sy) - 1), "
                        "slice(_sy, 2, size(_sy) - 1), "
                        "(l, r) -> struct(l AS lhs, r AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs")).limit(1).collect()
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append(Merge(rank=rank, lhs=lhs, rhs=rhs, pair_count=cnt))
        pat, rep = _merge_pattern(lhs, rhs)
        words = words.select(
            F.replace("w", F.lit(pat), F.lit(rep)).alias("w"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def merges_frame(spark: SparkSession, merges: list[Merge]) -> DataFrame:
    """Merge table as a DataFrame: (rank, lhs, rhs, merged, pair_count)."""
    return spark.createDataFrame(
        [(m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.pair_count) for m in merges],
        "rank int, lhs string, rhs string, merged string, pair_count long",
    )


def _apply_merges(word: Column, merges: list[Merge]) -> Column:
    out = _symbolize(word)
    for m in merges:
        pat, rep = _merge_pattern(m.lhs, m.rhs)
        out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def bpe_token_stats(
    df: DataFrame, id_col: str, text_col: str, merges: list[Merge]
) -> DataFrame:
    """Per-document token accounting under a learned merge list:
    (id, n_words, n_word_chars, n_bpe_tokens). Pure projection — the
    merge rules are literals in the transform lambda, so the whole
    thing runs JVM-side with no shuffle and no UDF.

    NULL text counts as zero words/chars/tokens (coalesced to an empty
    array) — matching the oracle's COALESCE(list_sum(...), 0) instead
    of NULL-propagating, so a future corpus with NULL rows cannot
    silently diverge."""
    words = F.coalesce(
        _clean_words(text_col), F.array().cast("array<string>")
    )
    per_word_tokens = F.transform(
        words, lambda w: F.size(_symbols(_apply_merges(w, merges))).cast("long")
    )
    zero = F.lit(0).cast("long")
    return df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            zero,
            lambda acc, x: acc + x,
        ).alias("n_word_chars"),
        F.aggregate(per_word_tokens, zero, lambda acc, x: acc + x).alias(
            "n_bpe_tokens"
        ),
    )


def bpe_vocab(df: DataFrame, text_col: str, merges: list[Merge]) -> DataFrame:
    """Final vocabulary after applying the learned merges: (token,
    freq) — the artifact a tokenizer ships. One corpus pass (the
    word-frequency shuffle) + a vocab-sized explode/groupBy; token
    frequency counts every occurrence of the symbol across all words,
    weighted by word frequency."""
    words = word_freqs(df, text_col)
    merged = words
    for m in merges:
        pat, rep = _merge_pattern(m.lhs, m.rhs)
        merged = merged.select(
            F.replace("w", F.lit(pat), F.lit(rep)).alias("w"), "freq"
        )
    return (
        merged.select("freq", F.explode(_symbols("w")).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
