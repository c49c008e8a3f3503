"""Salted-join/aggregation equivalence on a deliberately skewed fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from bert_etl_spark.functions.skew import salted_count, salted_join


def _skewed(spark):
    # 10k rows for key 1 (the mega-key), 10 rows each for keys 2..20
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = (
        spark.range(10 * 19)
        .select((F.col("id") % 19 + 2).alias("k"), F.col("id").alias("v"))
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 21)], "k long, name string"
    )
    plain = fact.join(dim, ["k"]).groupBy("k", "name").agg(F.count("*").alias("n"))
    salted = (
        salted_join(fact, dim, ["k"], buckets=8)
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([(2, "only_two")], "k long, name string")
    out = salted_join(fact, dim, ["k"], how="left", buckets=4)
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNull()).count() == fact.filter(F.col("k") != 2).count()


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in salted_count(df, "k", buckets=8).collect()}
    assert plain == salted
    assert salted[1] == 10_000


def test_advised_salt_plan_sizes_hot_keys_only(spark):
    """The advisor's factors: the mega-key gets ceil(n/budget) salts, the
    cold tail gets exactly 1 (zero replication)."""
    from bert_etl_spark.functions.skew import advised_salt_plan

    df = _skewed(spark)  # 10_190 rows, key 1 owns 10_000
    plan = {r.key: r.salts for r in advised_salt_plan(df, "k", 32).collect()}
    budget = (10_190 + 31) // 32  # 319
    assert plan[1] == (10_000 + budget - 1) // budget
    assert all(v == 1 for k, v in plan.items() if k != 1)


def test_advised_salted_join_equals_plain_join(spark):
    """Per-key salting is result-invisible (the registered query's oracle
    contract) and actually spreads the hot key over its salt range."""
    from bert_etl_spark.functions.skew import (
        advised_salt_plan,
        advised_salted_join,
    )

    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 21)], "k long, name string"
    )
    plan = advised_salt_plan(fact, "k", 32)
    plain = fact.join(dim, ["k"]).groupBy("k", "name").agg(
        F.count("*").alias("n")
    )
    advised = (
        advised_salted_join(fact, dim, "k", plan)
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, advised.collect())
    )
    # the hot key's fact rows really land in >1 salt bucket
    from bert_etl_spark.functions.skew import SALT_COL

    salts = {r.key: r.salts for r in plan.collect()}[1]
    p = F.broadcast(plan.select(F.col("key").alias("k"), "salts"))
    left = (
        fact.join(p, "k", "left")
        .withColumn("salts", F.coalesce("salts", F.lit(1)))
        .withColumn(
            SALT_COL,
            F.pmod(F.xxhash64("k", "v"), F.col("salts")).cast("int"),
        )
    )
    hot_buckets = (
        left.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    )
    assert salts > 1 and hot_buckets == salts
