"""Sequence packing and mixture rebalancing for training-data prep.

Two corpus-shaping operators a pretraining pipeline runs after
filtering/dedup and before tokenizer sharding:

- ``pack_chunks``: GPT-style concat-and-chunk packing. Documents are
  concatenated in a deterministic order within each group (source) and
  cut into fixed token-budget chunks (context windows); each document
  is mapped to the chunk span it lands in. This is the "pack to
  sequence length" planning step — the output says, for every doc,
  which context windows it occupies and at what offset, without
  materializing the token stream.

- ``rebalance_mixture``: deterministic down-sampling to a target
  mixture. Each group (source/language) is thinned to a target count
  by an md5-hash acceptance test, so the surviving corpus has the
  requested composition and the selection is stable across runs,
  engines, and partitionings (unlike ``sample()``).

Both are pure DataFrame plans — no UDFs, no collect.

Scale notes (100 TB):
- ``pack_chunks`` uses a running sum over (group, order) — locally a
  window, which shuffles each group to one task. At cluster scale a
  single source can be many TB, so the production shape is the classic
  two-phase distributed prefix sum: range-partition by (group, order),
  aggregate per-partition token subtotals (tiny: one row per
  partition), broadcast the per-partition offsets back, then each
  partition computes exact global cumulative sums map-side. Same
  arithmetic, no single-task group. The window form below is the
  correctness twin of that plan (identical output), kept because the
  oracle and the harness data fit comfortably in one task per group.
- ``rebalance_mixture`` aggregates one row per group (a few thousand
  groups at most), broadcasts the rates back, and filters the corpus
  in a single map-side pass — the 100 TB side is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from blockchain_indexer_spark.operators.sampling import hash_bucket

REBALANCE_PPM = 1_000_000


def pack_chunks(
    df: DataFrame,
    id_col: str,
    group_col: str,
    tokens_col: Column | str,
    budget: int = 512,
) -> DataFrame:
    """Map each document to the token-budget chunks it occupies when
    the group's documents are concatenated in ``id_col`` order and cut
    every ``budget`` tokens.

    Returns (``id_col``, ``group_col``, n_tokens, first_chunk,
    last_chunk, n_chunks, chunk_offset): chunk ids are 0-based per
    group; ``chunk_offset`` is the document's start position inside
    its first chunk. A document longer than ``budget`` spans several
    chunks (n_chunks > 1). Zero-token documents are dropped (they
    occupy no chunk; keeping them would also make the empty-span
    chunk ids engine-dependent).
    """
    n_tok = (tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)).cast(
        "bigint"
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.select(id_col, group_col, n_tok.alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    d = d.withColumn("_cum_after", F.sum("n_tokens").over(w))
    cum_before = F.col("_cum_after") - F.col("n_tokens")
    # integer `div`, not floor(x/y): bigint/int promotes to DOUBLE and
    # cumulative sums past 2^53 could round across a chunk boundary,
    # disagreeing with the exact % offset below (same rationale as
    # range_join's bucket math). Operands are non-negative, so div ==
    # floor-division.
    b = int(budget)
    first_chunk = F.expr(f"(_cum_after - n_tokens) div {b}")
    last_chunk = F.expr(f"(_cum_after - 1) div {b}")
    return d.select(
        id_col,
        group_col,
        "n_tokens",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks"),
        (cum_before % budget).alias("chunk_offset"),
    )


def rebalance_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target: int | None = None,
) -> DataFrame:
    """Thin every group to ~``target`` documents (default: the size of
    the smallest group, i.e. level to a uniform mixture) by a
    deterministic md5-hash acceptance test.

    A document survives iff ``bucket * n_group < target * 1e6`` where
    ``bucket = md5-hash of the id in [0, 1e6)`` — pure integer
    arithmetic, so any engine with md5 reproduces the exact surviving
    set (no floating-point rate, no RNG). Expected survivors per group
    = ``n_group * target/n_group = target``; groups at or under target
    keep everything. Returns the surviving rows as (``id_col``,
    ``group_col``, n_group, bucket).

    Rows with a NULL group are EXCLUDED up front: the equi-join below
    would silently drop them anyway (null-key semantics), but without
    the explicit filter their phantom (NULL, n) count row could become
    the smallest group and poison the default target.
    """
    df = df.filter(F.col(group_col).isNotNull())
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_group"))
    if target is None:
        tgt = counts.agg(F.min("n_group").alias("_target"))
        counts = counts.crossJoin(F.broadcast(tgt))
    else:
        counts = counts.withColumn("_target", F.lit(int(target)).cast("bigint"))
    d = df.select(id_col, group_col).join(F.broadcast(counts), group_col)
    bucket = hash_bucket(id_col, REBALANCE_PPM)
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") * F.col("n_group") < F.col("_target") * REBALANCE_PPM)
        .select(id_col, group_col, "n_group", "bucket")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (basic Rabin CDC) at token
    granularity: cut the token stream AFTER position i whenever the
    hash of the trailing ``window``-token context is ``== 0 mod
    divisor`` — so chunk boundaries follow CONTENT, not offsets, and
    an insertion near a document's head shifts only the chunk it
    lands in (fixed-size chunking reshuffles everything downstream,
    the storage-dedup motivation for CDC; FastCDC's min/max bounds
    are a gear-hash variant of the same seam rule).

    Returns one row per chunk: (id_col, chunk_idx, n_tokens,
    chunk_hash) where chunk_hash is the engine-portable
    md5-prefix-bigint of the space-joined chunk tokens — groupBy
    chunk_hash downstream finds content-equal chunks across the
    corpus regardless of position. Documents shorter than ``window``
    tokens are a single chunk; empty/NULL text emits no rows.
    Expected chunk length ~= divisor tokens.

    Plan: explode to (id, pos, token), per-position trailing-window
    hash as a JVM expression over a collected window frame, boundary
    flags, then a cumulative-count window keyed on the id — ONE
    uniform-key shuffle (documents, not corpus, are the partition
    unit; a window within one document never crosses executors). The
    per-position md5 is the oracle-portable hash; production callers
    swap xxhash64 at the same seam (the minhash/simhash/cms pattern).
    """
    from blockchain_indexer_spark.functions.hex import md5_prefix_bigint
    from blockchain_indexer_spark.functions.text import tokens

    toks = (
        df.select(id_col, tokens(text_col).alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(id_col, F.posexplode("_toks").alias("_pos", "_tok"))
    )
    w_ctx = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    w_last = Window.partitionBy(id_col)
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        toks.withColumn("_ctx", F.collect_list("_tok").over(w_ctx))
        .withColumn("_n", F.max("_pos").over(w_last) + F.lit(1))
        .withColumn(
            "_cut",
            (
                (F.size("_ctx") == window)
                & (F.col("_pos") < F.col("_n") - 1)  # never cut after last
                & (
                    md5_prefix_bigint(F.array_join("_ctx", " "), 15)
                    % F.lit(divisor)
                    == 0
                )
            ).cast("long"),
        )
        .withColumn(
            "chunk_idx",
            F.coalesce(F.sum("_cut").over(w_cum), F.lit(0)).cast("long"),
        )
    )
    return (
        flagged.groupBy(id_col, "chunk_idx")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("_chunk_text"),
        )
        .select(
            id_col,
            "chunk_idx",
            "n_tokens",
            md5_prefix_bigint(F.col("_chunk_text"), 15).alias("chunk_hash"),
        )
    )


def sliding_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-size overlapping token windows — the standard RAG /
    long-context chunker (stride < window ⇒ window−stride tokens of
    overlap so no sentence is orphaned at a boundary; stride == window
    degenerates to disjoint chunking).

    Chunk i of a document with n tokens covers token positions
    [i·stride, min(i·stride + window, n)); the chunk count is
    1 + max(0, ceil((n − window) / stride)) — the last window is the
    first one whose end reaches n, so no zero-overhang tail chunks are
    emitted. Returns one row per chunk: (id_col, chunk_idx, start,
    end, n_tokens, chunk_hash) with the same engine-portable
    md5-prefix-bigint content hash as cdc_chunks, so content-equal
    chunks group across documents. Empty/NULL text emits no rows.

    Plan: SHUFFLE-FREE — tokenize once, build the chunk-index range
    with F.sequence, explode, and slice the token array per chunk, all
    JVM-side HOF expressions inside one projection (contrast
    cdc_chunks, whose content-keyed boundaries need one doc-keyed
    window shuffle). At 100 TB this is a map-only pass whose output is
    ~n/stride rows per document; integer `div` arithmetic (never
    double division) keeps chunk ids exact past 2^53 tokens.
    """
    from blockchain_indexer_spark.functions.hex import md5_prefix_bigint
    from blockchain_indexer_spark.functions.text import tokens

    w, s = int(window), int(stride)
    if w <= 0 or s <= 0:
        raise ValueError("window and stride must be positive")
    d = (
        df.select(id_col, tokens(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks").cast("bigint"))
        .filter(F.col("_n") > 0)
        # 1 + max(0, ceil((n - w)/s)) in exact integer math
        .withColumn(
            "_n_chunks",
            F.lit(1)
            + F.greatest(
                F.lit(0).cast("bigint"),
                F.expr(f"(_n - {w} + {s} - 1) div {s}"),
            ),
        )
    )
    start = F.col("chunk_idx") * s
    end = F.least(start + w, F.col("_n"))
    return (
        d.select(
            id_col,
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("start"),
            end.alias("end"),
            (end - start).alias("n_tokens"),
            md5_prefix_bigint(
                F.array_join(
                    F.slice(F.col("_toks"), (start + 1).cast("int"), F.lit(w)), " "
                ),
                15,
            ).alias("chunk_hash"),
        )
    )
