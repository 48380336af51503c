"""Vector math over array<float>/array<double> embedding columns.

Pure higher-order-function expressions (zip_with + aggregate): JVM-side,
codegen-friendly, and — critically for oracle parity — *sequential* left
fold in index order, which makes the double-precision result bit-identical
to an equivalent sequential SQL formula.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
