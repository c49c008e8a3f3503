"""Skew handling: salted joins and partitioned layout helpers.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; salting is the explicit fallback for pathological keys — e.g. a
null-heavy foreign key or one mega-customer owning 10% of a 100 TB fact
table — and for aggregations (AQE does not split skewed aggregate groups).

Salting a fact⋈dim join: the fact side gets a deterministic salt in
[0, n); the dim side is replicated n× with every salt value; the join key
becomes (key, salt), spreading one hot key over n tasks. Result is
identical to the unsalted join — verified by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, from_cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets) hashed from ``from_cols``
    (default: all columns — unique-ish rows spread uniformly)."""
    cols = from_cols if from_cols is not None else df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))
    )


def replicate_with_salts(df: DataFrame, buckets: int) -> DataFrame:
    """Replicate every row once per salt value (the small/dim side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join that spreads hot keys of ``skewed`` over ``buckets`` tasks.

    Correct for inner/left joins keyed on ``on``; the dim side grows
    buckets× (keep it the small side — it usually also broadcasts, in which
    case salting is unnecessary; this is for dims just over the broadcast
    threshold or aggregate-heavy cases).
    """
    left = with_salt(skewed, buckets)
    right = replicate_with_salts(dim, buckets)
    return left.join(right, on + [SALT_COL], how).drop(SALT_COL)


def salted_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation: count per (key, salt), then sum per
    key — the partial state per task is bounded even for a mega-key."""
    return (
        with_salt(df, buckets)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )
