"""Skew-mitigation utilities (ARCHITECTURE.md: identity edges and hot
shingles are the known skewed keys; AQE skew-join handles moderate cases,
salting handles the pathological ones).

Salted join: replicate the small side R times, salt the big side's key with
``hash(row) % R`` — a hot key's rows spread across R reducers instead of
one. Classic trade: R x small-side shuffle volume for even task times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` by salting.

    Big side gets a deterministic per-row salt; small side is exploded
    across all salt values; the join key becomes (key, salt). Result
    columns match a plain ``big.join(small, key, how)``.
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in big.columns])) % salts).alias("__salt")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
