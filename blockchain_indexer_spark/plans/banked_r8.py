"""Round-8 BANKED gates — implemented, DuckDB-parity-tested, but NOT
yet registered (VERDICT r6 "Next round" #3, the plans/banked_r7
convention round 6 established).

Why banked: the driver records exactly the first 50 registry entries
per round, and round 7's window budget is fully spoken for (4 new
gates + 46 stale-r4 refreshes). Registering more new oracled gates
this round would displace staleness-rotation slots and re-break the
rotation invariant (tests/test_registry_order.py) by arithmetic.

So these follow the banked convention: the OPERATOR code, the oracle
SQL, and a full Spark-vs-DuckDB parity test land now
(tests/test_banked_r8.py runs them through the exact same compare()
as the registered gates); round 8 promotes each entry to a plans/*
@register call plus a PRIORITY front-window slot — a mechanical move
of the Query objects below.

This module must NOT be imported by plans/__init__ until promotion:
the registry invariants assert set(REGISTRY) == set(PRIORITY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_indexer_spark.plans.registry import Query
from blockchain_indexer_spark.sources.parquet import load_table

#: Same whitespace tokenizer the registered text oracles use
#: (plans/llmops._TOKS_SQL — duplicated so this module stays
#: import-independent of llmops' register() side effects).
_TOKS_SQL = (
    r"list_filter(string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+'),"
    r" x -> x <> '')"
)

BANKED: dict[str, Query] = {}


def _bank(name: str, oracle: str | None, doc: str, survey_refs: tuple[str, ...] = ()):
    def wrap(fn):
        BANKED[name] = Query(
            name=name, build=fn, oracle=oracle, doc=doc, survey_refs=survey_refs
        )
        return fn

    return wrap


# ---------------------------------------------------------------------------
# mm_audio_dedup_clusters: spectral-fingerprint audio dedup verdict
# ---------------------------------------------------------------------------

# The sample CTEs replay attach_wav_blob's closed form (n = 16+id%37,
# s_i = (31·id + 17·i) mod 65536 − 32768, zero-padded to 64); the WHT
# CTE computes the integer Walsh-Hadamard amplitudes for sequency bins
# 1..17 via bit_count parity, the hash CTE codes adjacent band-energy
# differences (chromaprint's rule, DC skipped), and the banding +
# closure + label CTEs replay dedup.hamming_band_pairs over DISTINCT
# fingerprints and multimodal.audio_dedup_clusters' hash-level
# connected components (the image_dedup_clusters shape for the third
# modality).
_AUDIO_DEDUP_SQL = """
    WITH RECURSIVE d AS (SELECT doc_id FROM documents),
    s AS (
      SELECT doc_id, i.x AS i,
             CASE WHEN i.x < 16 + doc_id % 37
                  THEN (doc_id * 31 + i.x * 17) % 65536 - 32768
                  ELSE 0 END AS v
      FROM d, UNNEST(range(0, 64)) AS i(x)
    ),
    amp AS (
      SELECT doc_id, k.x AS k,
             CAST(SUM(CASE WHEN bit_count(CAST(k.x AS BIGINT) & CAST(i AS BIGINT)) % 2 = 0
                           THEN v ELSE -v END) AS BIGINT) AS a
      FROM s, UNNEST(range(1, 18)) AS k(x)
      GROUP BY 1, 2
    ),
    e AS (SELECT doc_id, k, a * a AS e FROM amp),
    hsh AS (
      SELECT lo.doc_id,
             CAST(SUM(CASE WHEN lo.e > hi.e
                           THEN CAST(1 AS BIGINT) << (lo.k - 1) ELSE 0 END)
                  AS BIGINT) AS whash
      FROM e lo JOIN e hi ON hi.doc_id = lo.doc_id AND hi.k = lo.k + 1
      WHERE lo.k <= 16
      GROUP BY 1
    ),
    hv AS (SELECT DISTINCT whash FROM hsh),
    banded AS (
      SELECT whash, r.b AS band, (whash >> (4 * r.b)) & 15 AS bucket
      FROM hv, UNNEST(range(0, 4)) AS r(b)
    ),
    p AS (
      SELECT DISTINCT a.whash AS ha, b.whash AS hb
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.whash < b.whash
      WHERE bit_count(xor(a.whash, b.whash)) <= 2
    ),
    edges AS (SELECT ha AS a, hb AS b FROM p
              UNION SELECT hb, ha FROM p),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, reach.r FROM edges e JOIN reach ON e.a = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
    hlab AS (
      SELECT hv.whash, COALESCE(comp.cluster, hv.whash) AS hc
      FROM hv LEFT JOIN comp ON comp.id = hv.whash
    ),
    dlab AS (SELECT hsh.doc_id, hlab.hc FROM hsh JOIN hlab USING (whash)),
    cmin AS (SELECT hc, MIN(doc_id) AS cluster FROM dlab GROUP BY 1)
    SELECT dlab.doc_id, cmin.cluster, dlab.doc_id = cmin.cluster AS keep
    FROM dlab JOIN cmin USING (hc)
    """


@_bank(
    "mm_audio_dedup_clusters",
    oracle=_AUDIO_DEDUP_SQL,
    doc="AUDIO dedup verdict end-to-end (operators.multimodal."
    "audio_dedup_clusters): real RIFF/PCM decode (genuine chunk walk "
    "incl. a planted LIST chunk) -> 16-bit spectral fingerprint "
    "(integer WALSH-HADAMARD band energies, adjacent-band difference "
    "coding — chromaprint's rule with the DC loudness bin skipped, "
    "all int64-exact) -> banded hamming blocking over DISTINCT "
    "fingerprints (dedup.hamming_band_pairs, 4 bands x 4 bits, "
    "pigeonhole-COMPLETE for hamming <= 2) -> hash-level connected "
    "components (star contraction: hamming balls chain) -> min-id "
    "survivor keeps. Completes exact-dup -> near-dup coverage for the "
    "third modality on the SAME banding + closure engines as text "
    "and image dedup; the sawtooth fixture corpus is genuinely "
    "dup-dense (7 distinct fingerprints over 500 docs chain into one "
    "family), which is exactly the regime the hash-level factoring "
    "exists for. One row per document at any scale.",
    survey_refs=("LLM-multimodal", "LLM-dedup"),
)
def mm_audio_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blockchain_indexer_spark.operators.multimodal import (
        attach_wav_blob,
        audio_dedup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_dedup_clusters(
        attach_wav_blob(docs), bits=16, bands=4, max_hamming=2
    )


# ---------------------------------------------------------------------------
# mm_video_shots: shot-boundary detection over real decoded frames
# ---------------------------------------------------------------------------

# The frame CTE replays attach_avi_blob's closed form (nf = 1+id%5,
# constant fills B=(id+11f)%256 G=(3id+7f+1)%256 R=(5id+13f+2)%256);
# the cut CTE replays shot_boundaries' L1 threshold rule over the
# lagged per-frame channel means, and the shot CTE the running cut
# sum + per-shot extent aggregation.
_VIDEO_SHOTS_SQL = """
    WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS nf FROM documents),
    fr AS (
      SELECT doc_id, f.x AS f,
             (doc_id + 11 * f.x) % 256 AS b,
             (3 * doc_id + 7 * f.x + 1) % 256 AS g,
             (5 * doc_id + 13 * f.x + 2) % 256 AS r
      FROM d, UNNEST(range(0, nf)) AS f(x)
    ),
    cut AS (
      SELECT doc_id, f,
             CASE WHEN lag(b) OVER w IS NULL THEN 0
                  WHEN abs(b - lag(b) OVER w) + abs(g - lag(g) OVER w)
                       + abs(r - lag(r) OVER w) >= 128 THEN 1
                  ELSE 0 END AS c
      FROM fr
      WINDOW w AS (PARTITION BY doc_id ORDER BY f)
    ),
    sh AS (
      SELECT doc_id, f,
             CAST(SUM(c) OVER (PARTITION BY doc_id ORDER BY f) AS BIGINT) AS shot
      FROM cut
    )
    SELECT doc_id, shot AS shot_id,
           CAST(MIN(f) AS BIGINT) AS start_frame,
           CAST(MAX(f) AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM sh GROUP BY doc_id, shot
    """


@_bank(
    "mm_video_shots",
    oracle=_VIDEO_SHOTS_SQL,
    doc="VIDEO shot-boundary detection end-to-end (operators."
    "multimodal.shot_boundaries over sample_frames_real): real AVI "
    "decode (nested RIFF walk, strf geometry, DIB stride) -> every "
    "frame's per-channel pixel means -> the classic "
    "sum-of-absolute-differences cut detector (a boundary before "
    "frame f when the L1 distance of consecutive frames' quantized "
    "features reaches 128 — on this fixture the channel-fill ramps "
    "wrap mod 256, so cuts are the deterministic wrap events) -> "
    "maximal boundary-free runs reported as SHOTS (id, shot_id, "
    "start/end frame, length). The operator takes ANY per-frame "
    "feature frame (hashes, motion stats); integer-exact lag window "
    "+ running cut sum, bit-reproducible cross-engine. Scale: one "
    "shuffle on the video id (lag + running sum share the "
    "partitioning) + one (id, shot) groupBy — nothing quadratic in "
    "frames.",
    survey_refs=("LLM-multimodal", "W2", "T10"),
)
def mm_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blockchain_indexer_spark.operators.multimodal import (
        attach_avi_blob,
        sample_frames_real,
        shot_boundaries,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames_real(attach_avi_blob(docs), every=1)
    return shot_boundaries(frames, threshold=128).select(
        "doc_id", "shot_id", "start_frame", "end_frame", "n_frames"
    )


# ---------------------------------------------------------------------------
# doc_longest_repeat: suffix-doubling memorization ladder
# ---------------------------------------------------------------------------


def _ladder_rung_sql(k: int) -> str:
    return f"""
    w{k} AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(t, i, i + {k - 1}), ' ') AS h
      FROM toks, UNNEST(range(1, len(t) - {k - 2})) AS r(i)
      WHERE len(t) >= {k}
    ),
    hit{k} AS (
      SELECT DISTINCT doc_id, CAST({k} AS BIGINT) AS k
      FROM w{k}
      WHERE h IN (SELECT h FROM w{k} GROUP BY h HAVING COUNT(*) >= 2)
    )"""


_LADDER_SQL = (
    rf"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),"""
    + ",".join(_ladder_rung_sql(k) for k in (4, 8, 16, 32, 64))
    + """,
    shared4 AS (SELECT h FROM w4 GROUP BY h HAVING COUNT(*) >= 2),
    base AS (
      SELECT w4.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(COUNT(s.h) AS BIGINT) AS n_repeated
      FROM w4 LEFT JOIN shared4 s ON s.h = w4.h
      GROUP BY 1
    ),
    hits AS (
      SELECT * FROM hit4 UNION ALL SELECT * FROM hit8
      UNION ALL SELECT * FROM hit16 UNION ALL SELECT * FROM hit32
      UNION ALL SELECT * FROM hit64
    ),
    longest AS (SELECT doc_id, MAX(k) AS longest_pow2_repeat FROM hits GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(b.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(b.n_repeated, 0) AS BIGINT) AS n_repeated,
           CASE WHEN COALESCE(b.n_windows, 0) = 0 THEN 0.0
                ELSE CAST(b.n_repeated AS DOUBLE) / b.n_windows
           END AS repeat_frac,
           CAST(COALESCE(l.longest_pow2_repeat, 0) AS BIGINT) AS longest_pow2_repeat
    FROM documents d
    LEFT JOIN base b ON b.doc_id = d.doc_id
    LEFT JOIN longest l ON l.doc_id = d.doc_id
    """
)


@_bank(
    "doc_longest_repeat",
    oracle=_LADDER_SQL,
    doc="Corpus-level longest-repeat memorization scan (operators."
    "dedup.longest_repeat_ladder) — cross_repeat_spans generalized "
    "from one window size to the suffix-DOUBLING ladder 4/8/16/32/64: "
    "per document, the largest rung at which a window of that length "
    "occurs verbatim in another document (a 2-approximation of the "
    "exact suffix-array longest shared substring at O(log L) corpus "
    "passes), plus the base-rung shared-window counts. Rung hashes "
    "derive by doubling — h_2k(i) = xxhash64(h_k(i), h_k(i+k)), a "
    "2k-window IS the pair of k-windows at i and i+k — so each level "
    "is O(1) per window (shuffle-free JVM HOF over per-doc hash "
    "arrays, localCheckpointed per level) + one uniform-key distinct "
    "and count agg; the oracle groups raw window STRINGS per rung "
    "(hash-agnostic, strictly stronger). Lee et al.'s exact-substring "
    "criterion, reported as per-doc memorization DEPTH.",
    survey_refs=("LLM-dedup", "LLM-text"),
)
def doc_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blockchain_indexer_spark.operators.dedup import longest_repeat_ladder

    d = load_table(spark, sf_dir, "documents")
    return longest_repeat_ladder(d, "doc_id", "text", base=4, levels=5).select(
        F.col("id").alias("doc_id"),
        "n_windows",
        "n_repeated",
        "repeat_frac",
        "longest_pow2_repeat",
    )


# ---------------------------------------------------------------------------
# doc_split_leakage: train/eval exact-substring contamination gate
# ---------------------------------------------------------------------------

_SPLIT_LEAKAGE_SQL = rf"""
    WITH sp AS (
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                  THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 95
                  THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    toks AS (
      SELECT d.doc_id, sp.split, {_TOKS_SQL} AS t
      FROM documents d JOIN sp USING (doc_id)
    ),
    w AS (
      SELECT DISTINCT doc_id, split,
             array_to_string(list_slice(t, i, i + 7), ' ') AS h
      FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i)
      WHERE len(t) >= 8
    ),
    tr AS (SELECT DISTINCT h FROM w WHERE split = 'train'),
    per AS (
      SELECT w.doc_id, w.split,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(COUNT(tr.h) AS BIGINT) AS n_leaked
      FROM w LEFT JOIN tr ON tr.h = w.h
      WHERE w.split <> 'train'
      GROUP BY 1, 2
    )
    SELECT sp.doc_id, sp.split,
           CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(p.n_leaked, 0) AS BIGINT) AS n_leaked,
           CASE WHEN COALESCE(p.n_windows, 0) = 0 THEN 0.0
                ELSE CAST(p.n_leaked AS DOUBLE) / p.n_windows
           END AS leak_frac,
           COALESCE(p.n_leaked, 0) > 0 AS leaked
    FROM sp
    LEFT JOIN per p ON p.doc_id = sp.doc_id
    WHERE sp.split <> 'train'
    """


@_bank(
    "doc_split_leakage",
    oracle=_SPLIT_LEAKAGE_SQL,
    doc="Train/eval SPLIT-LEAKAGE gate (operators.dedup.split_leakage "
    "over sampling.hash_split's deterministic 90/5/5 assignment): for "
    "every val/test document, whether any 8-token sliding window "
    "occurs verbatim in a TRAIN document — the Lee et al. / GPT-3 "
    "exact-substring contamination criterion applied at split time, "
    "the check a pipeline runs before shipping an eval set (leaked "
    "eval spans inflate benchmarks). One row per non-train doc with "
    "distinct-window counts, leak fraction, and the boolean verdict. "
    "The train side reduces to ONE distinct 64-bit hash set (counts "
    "are hash-equality classes; the oracle groups raw window strings "
    "— hash-agnostic and strictly stronger); at 100 TB the dominant "
    "train corpus pays two uniform-key hash exchanges and the eval "
    "side is 5-10% of docs by construction.",
    survey_refs=("LLM-dedup", "LLM-sample", "LLM-text"),
)
def doc_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blockchain_indexer_spark.operators.dedup import split_leakage
    from blockchain_indexer_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    return split_leakage(
        hash_split(d, "doc_id"), "doc_id", "text", "split", k=8
    ).select(
        F.col("id").alias("doc_id"),
        "split",
        "n_windows",
        "n_leaked",
        "leak_frac",
        "leaked",
    )
