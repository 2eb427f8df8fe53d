"""Vector column functions over array<float>/array<double> embeddings.

Implemented with higher-order functions (zip_with / aggregate /
transform) so the math runs JVM-side. For hash-exact cross-engine
comparison, ``quantize`` maps floats to scaled BIGINTs: integer dot
products are exact in IEEE double (all intermediates < 2^53), hence
order-independent and reproducible on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> → array<bigint> of round(x*scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def dot(a: Column, b: Column) -> Column:
    """Dot product; exact when inputs are quantized integers."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision (not hash-exact across
    engines; use quantized dot for oracle-compared paths)."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))
