"""Edit-distance (fuzzy) join — typo-level entity matching between
two string columns without the O(n·m) cross join.

The classic need a catalog/metadata pipeline hits when joining records
whose keys were typed by humans: names, tickers, file stems. Spark has
``F.levenshtein`` but no join strategy for it — the naive formulation
plans a cartesian product.

Strategy (deletion-neighborhood blocking, exact-complete for
``max_dist=1``): two strings are within Levenshtein distance 1 iff
their deletion neighborhoods — the string itself plus every
single-character deletion — intersect:

- equal strings share themselves;
- a substitution at position i shares the deletion-at-i variant;
- an insertion/deletion shares the shorter string itself.

So candidates come from ONE equi-join on an 8-byte ``xxhash64`` of the
variant (each string fans out to len+1 variants — linear, bounded),
and a final ``F.levenshtein`` filter removes the false positives the
neighborhood admits (e.g. "ab"/"ba" share variants but are distance
2). No candidate above the distance bound is ever missed — the verify
only prunes, completeness is structural.

Scale shape: the variant explode is a projection (no shuffle); the
candidate equi-join shuffles on the uniform variant hash; the verify
is a row-local expression on the candidate set. Cost is
O(total string length) + O(candidate pairs), never O(n·m) — and like
every near-match enumerator it is lower-bounded by its OUTPUT size:
the TPC-H harness names (zero-padded sequential digits) are
adversarially dense, 15k distinct names yielding 540k true
distance-1 pairs at sf0.1, so the gate's wall time there is the
output, not the plan. For ``max_dist`` ≥ 2 the neighborhood blowup
is O(L^d) — use the q-gram count-filter + PassJoin family instead
(out of scope here; the operator raises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: str):
    """Array of the string itself + every single-character deletion —
    all JVM-side (sequence + transform + substr), no UDF."""
    s = F.col(col)
    # sequence(1, 0) would generate a DESCENDING [1, 0] for the empty
    # string — guard to an empty index array instead
    idx = F.when(F.length(s) > 0, F.sequence(F.lit(1), F.length(s))).otherwise(
        F.array().cast("array<int>")
    )
    dels = F.transform(
        idx,
        lambda i: F.concat(
            s.substr(F.lit(1), i - F.lit(1)),          # chars before i
            s.substr(i + F.lit(1), F.length(s)),       # chars after i
        ),
    )
    return F.concat(F.array(s), dels)


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left row, right row) pairs whose strings are within
    ``max_dist`` Levenshtein distance. Returns left's and right's
    columns plus ``distance``. Rows with NULL strings never match.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is exact-complete for max_dist=1; "
            "use q-gram count filtering / PassJoin for larger bounds"
        )
    # The whole candidate pipeline runs over DISTINCT STRINGS, not
    # rows: variants derive from the string alone, so deduping first
    # (a) keeps the candidate join narrow (two strings + an 8-byte
    # hash — candidate row multiplicity is per shared variant, and a
    # wide-row distinct was the measured bottleneck), and (b) runs
    # levenshtein — an O(L²) DP per call — once per unique string
    # pair instead of once per candidate occurrence. Matching rows
    # re-attach by joining the verified string-pair table back to
    # both inputs (duplicated input strings fan out there, which is
    # the correct row-pair semantics).
    # repartition AFTER the distinct: AQE coalesces a small distinct
    # to one partition, and everything downstream of it — the ×(L+1)
    # variant explode, the candidate join's probe side (candidate
    # multiplicity × the distinct strings — the WIDE frame of this
    # plan), and the pair-distinct's partial aggregation — would run
    # in that single task (measured 13.4 s → 1.7 s at sf0.1 from this
    # line alone). At cluster scale the distinct is already spread and
    # the round-robin exchange is a no-op-sized safety net.
    n_parts = left.sparkSession.sparkContext.defaultParallelism
    ls = left.select(left_col).filter(F.col(left_col).isNotNull()).distinct().repartition(n_parts)
    rs = (
        right.select(right_col).filter(F.col(right_col).isNotNull()).distinct().repartition(n_parts)
    )
    # array_distinct: a string with repeated characters yields the SAME
    # deletion variant once per repetition (zero-padded ids, the common
    # catalog-key shape, are the worst case) and the candidate join
    # multiplies the copies from both sides — deduping variants per
    # string cut candidate rows 37% on the TPC-H names.
    lsv = (
        ls.withColumn("_var", F.explode(F.array_distinct(_deletion_variants(left_col))))
        .withColumn("_vh", F.xxhash64("_var"))
        .drop("_var")
    )
    rsv = (
        rs.withColumn("_var", F.explode(F.array_distinct(_deletion_variants(right_col))))
        .withColumn("_vh", F.xxhash64("_var"))
        .drop("_var")
    )
    matches = (
        lsv.join(rsv, "_vh")
        .drop("_vh")
        .distinct()
        .withColumn("distance", F.levenshtein(F.col(left_col), F.col(right_col)))
        .filter(F.col("distance") <= max_dist)
    )
    return left.join(matches, left_col).join(right, right_col)
