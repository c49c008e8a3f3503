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


def advised_salt_plan(
    df: DataFrame, key: str, target_partitions: int = 32
) -> DataFrame:
    """Per-key salt factors derived from the measured key histogram — the
    profile_salt_advisor computation (operators/profiling.py:589) in
    join-able form: (key, salts) for EVERY key, where salts =
    ceil(n / budget) for keys over one average task's row budget
    (budget = ceil(total / target_partitions)) and 1 for the cold tail.
    Integer ceil-divs only, so the plan is deterministic. One partial-agg
    pass + one tiny agg; at 100 TB this is the driver-side advisory read
    that replaces guessing a uniform bucket constant."""
    k = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("n"))
    b = k.agg(
        F.expr(
            f"CAST((sum(n) + {target_partitions} - 1) "
            f"div {target_partitions} AS BIGINT)"
        ).alias("budget")
    )
    return k.crossJoin(F.broadcast(b)).select(
        "key",
        F.when(
            F.col("n") > F.col("budget"),
            F.expr("(n + budget - 1) div budget"),
        )
        .otherwise(F.lit(1))
        .cast("int")
        .alias("salts"),
    )


def advised_salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    plan: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Equi-join salted PER KEY by the advisor's factors (advised_salt_plan
    / profile_salt_advisor) instead of one uniform constant.

    Why per-key beats uniform: uniform salting replicates the ENTIRE dim
    buckets×, paying the replication and the wider shuffle for every cold
    key that never needed it, and the constant is a guess — too low leaves
    the straggler, too high multiplies dim traffic. Here each fact row
    hashes into [0, salts(key)) and each dim row replicates exactly
    salts(key) ways: hot keys get exactly the parallelism the measurement
    says they need (worst task ≤ one average task's budget), the cold tail
    pays zero replication. Result is identical to the unsalted join —
    the registered query's oracle IS the plain join."""
    p = F.broadcast(plan.select(F.col("key").alias(on), "salts"))
    fact_cols = skewed.columns
    left = (
        skewed.join(p, on, "left")
        .withColumn("salts", F.coalesce("salts", F.lit(1)))
        .withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in fact_cols]), F.col("salts")
            ).cast("int"),
        )
        .drop("salts")
    )
    right = (
        dim.join(p, on, "left")
        .withColumn("salts", F.coalesce("salts", F.lit(1)))
        .withColumn(
            SALT_COL,
            # sequence of int literals → array<int>; a generator cannot be
            # nested inside a cast, and none is needed
            F.explode(F.sequence(F.lit(0), F.col("salts") - 1)),
        )
        .drop("salts")
    )
    return left.join(right, [on, SALT_COL], how).drop(SALT_COL)
