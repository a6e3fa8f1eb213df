"""Vector math over `array<float>` columns — JVM-side higher-order
functions, no Python boundary.

Double-precision discipline: elements are cast to double BEFORE any
arithmetic.  float32 intermediates would diverge from any
double-computing engine (including the DuckDB oracle) and from most
numpy reference implementations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold of elementwise products."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
