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
