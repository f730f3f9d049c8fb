"""Skew mitigation: key salting for joins whose hot keys overwhelm a
single reducer.

AQE's skew-join splitting handles sort-merge skew automatically, but
aggregations and non-splittable joins still need salting: spread each
hot key over ``n_salts`` sub-keys, aggregate partially per sub-key,
then merge. ``salted_count`` demonstrates the two-phase aggregate; the
same pattern applies to any algebraic aggregate (sum/min/max/avg via
(sum, count)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col: str = "_salt") -> DataFrame:
    """Content-derived salt: murmur3 hash of all columns mod n_salts.

    Deterministic per row *content* (stable across repartitioning and
    retries, unlike monotonically_increasing_id). Caveat: exact duplicate
    rows share a salt, so this spreads same-key-different-row skew — the
    common case — not identical-row skew.
    """
    return df.withColumn(
        col, (F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts).cast("int")
    )


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) partial counts, then
    groupBy(key) merge. Result equals a direct groupBy(key).count() but
    no single task ever sees a whole hot key."""
    return (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )
