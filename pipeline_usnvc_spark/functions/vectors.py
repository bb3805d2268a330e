"""Vector expressions over ``array<float>`` embedding columns.

All native higher-order functions (``zip_with`` + ``aggregate``) —
the math runs JVM-side per row with no Python round-trip, which is
what makes brute-force similarity viable as a baseline at scale.
Float32 inputs are widened to double before arithmetic so results are
deterministic and match the DuckDB oracle bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity from the deterministic fold dot/norms."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
