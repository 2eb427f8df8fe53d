"""As-of join: match each left row to the temporally closest right row.

Spark has no native ASOF JOIN (DuckDB does; pandas has merge_asof).
The scalable formulation here is the union+window plan:

    union(left, right) → one shuffle on the join key → sort by
    (ts, side) → last(right payload, ignorenulls) over a running
    window → keep left rows.

That is ONE exchange of left+right regardless of time-range overlap —
unlike the naive inequality-join formulation, whose candidate set is
O(|left| × |right per key|) and which Spark can only plan as a
broadcast nested loop or cartesian variant. A backward as-of over
100 TB of events against a snapshot table shuffles each byte once.

Semantics match ``pandas.merge_asof(left, right, by=on, on=ts)``:
backward = latest right row with right_ts <= left_ts (allow_exact)
or < left_ts (not allow_exact); forward mirrors it; ``tolerance``
(in the ts column's own units) voids matches farther than the bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether a type may appear in ORDER BY: MapType (at any nesting
    depth) is Spark's one unorderable container."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    allow_exact: bool = True,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join. Every left row survives; matched right columns
    arrive as ``<col><suffix>`` (NULL where no right row qualifies).

    on: equality key(s); left_ts/right_ts: ordering columns (orderable
    type — numeric or timestamp). ``tolerance`` requires NUMERIC ts
    columns (subtraction must yield a number — convert timestamps
    with unix_micros first). right_cols: right payload columns to
    carry (default: all but key+ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, not {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
    ).alias("_asof_payload")
    # deterministic tie-break between right rows sharing (key, ts):
    # only ORDERABLE payload columns may join the sort key — a MapType
    # payload column in the ORDER BY fails analysis outright, and such
    # frames must still join (just with an arbitrary-but-stable-per-run
    # winner among ties, like pandas keeps the last input row)
    tie_cols = [c for c in right_cols if _orderable(right.schema[c].dataType)]
    tie = (
        F.struct(*[F.col(c) for c in tie_cols]) if tie_cols else F.lit(0)
    ).alias("_asof_tie")
    # side flag orders equal timestamps: with allow_exact a right row
    # at ts == left ts must sort BEFORE the left row (visible to it),
    # without it must sort after (invisible)
    r_side = 0 if allow_exact else 2
    # NULL-timestamp policy (pandas.merge_asof rejects null keys; here
    # they must simply never match): a NULL-ts right row would sort
    # nulls-first under ASC and "precede" every left row; a NULL-ts
    # left row would sort nulls-last under DESC and "follow" every
    # right row — both produce spurious matches. Right rows are
    # dropped; left rows survive (left-join contract) but match
    # nothing via the _m guard below.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(r_side).alias("_side"),
        payload,
        tie,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        F.lit(None).cast(r.schema["_asof_tie"].dataType).alias("_asof_tie"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # the trailing _asof_tie sort key breaks ties between right rows
    # sharing (key, ts): without it F.last picks whichever the
    # partition-internal order delivers — nondeterministic across runs
    # (when NO payload column is orderable the struct is empty and the
    # tie-break degrades to that documented nondeterminism)
    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_asof_tie").asc()]
    if direction == "forward":
        # forward = backward over reversed time: latest-preceding
        # becomes earliest-following under descending order
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col("_asof_tie").asc()]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(
        "_m", F.last("_asof_payload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)

    m: Column = F.when(F.col("_t").isNotNull(), F.col("_m"))
    if tolerance is not None:
        gap = (
            (F.col("_t") - m["_ts"])
            if direction == "backward"
            else (m["_ts"] - F.col("_t"))
        )
        m = F.when(gap <= F.lit(tolerance), m)

    out = matched.select(
        *left.columns,
        m["_ts"].alias(f"{right_ts}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
