"""Skew mitigation for hot-key joins.

First line of defense is AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it needs
no code changes and sees actual partition sizes. This helper is for
the cases AQE cannot fix: the skewed side is too large to broadcast,
the hot key is known/stable (one mega-account, one stop-token), and
the join must not funnel that key through a single reducer.

``salted_join`` splits every hot key into ``salt`` sub-keys on the big
side and replicates the small side ×salt, so the hot key's rows spread
over ``salt`` reducers. Cost: small side inflates ×salt — keep the
small side genuinely small (dimension-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join with the big side salted into ``salt`` sub-partitions
    per key.

    The salt is a deterministic hash of the big row's full content
    (uniform-ish, stable across retries — no rand(), which would break
    task re-execution). Caveat that follows from determinism: IDENTICAL
    duplicate rows share a salt, so a hot key whose rows are verbatim
    copies (rather than merely key-skewed) still lands on one reducer —
    for that shape pass ``salt_on`` naming a per-row-distinct column
    (an id, offset, or monotonic ingest counter). Output columns match
    ``big.join(small, key, how)`` for the SUPPORTED join types: inner,
    left (outer), left_semi and left_anti. Right/full joins are
    rejected — the ×salt replication of the small side would surface
    each unmatched small row `salt` times.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} — not {how!r}: the small side "
            "is replicated per salt, so right/full flavors would duplicate "
            "unmatched small-side rows"
        )
    salt_src = [F.col(salt_on)] if salt_on else [F.col(c) for c in big.columns]
    salt_col = F.pmod(F.xxhash64(*salt_src), F.lit(salt)).cast("int")
    b = big.withColumn("_salt", salt_col)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
