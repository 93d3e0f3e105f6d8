"""Vector expressions over ARRAY<FLOAT/DOUBLE> embedding columns.

Pure built-in higher-order functions (zip_with / aggregate) — the dot
product and norms run JVM-side per row with no Python boundary. For
very wide vectors a Pandas UDF over numpy can win on SIMD; provide
both and let the caller choose (the built-in path is the default
because it needs no Arrow transfer).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sqdist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance — monotonic with L2, so argmin
    ordering matches ``list_distance`` without the sqrt."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
