"""Bucketed tables co-locate joins: no Exchange in the physical plan.

The 100 TB pattern for repeated joins on the same key (fact⋈fact, repeated
merges, the dedup ledger): write both sides bucketed+sorted on the key and
the sort-merge join runs with zero shuffle on either side.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a = spark.range(10_000).withColumn("v", F.col("id") * 2)
        b = spark.range(10_000).withColumn("w", F.col("id") * 3)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        (a.write.bucketBy(8, "id").sortBy("id")
          .option("path", str(tmp_path / "ta")).saveAsTable("bkt_a"))
        (b.write.bucketBy(8, "id").sortBy("id")
          .option("path", str(tmp_path / "tb")).saveAsTable("bkt_b"))

        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == 10_000

        # control: the same join on unbucketed data DOES shuffle
        plain = a.join(b, "id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy layout → partition pruning: a filtered read lists only
    the matching directory."""
    path = str(tmp_path / "part")
    (spark.range(1000)
        .withColumn("bucket", (F.col("id") % 4).cast("int"))
        .write.partitionBy("bucket").parquet(path))
    one = spark.read.parquet(path).filter(F.col("bucket") == 2)
    assert one.count() == 250
    files = one.select(F.input_file_name()).distinct().collect()
    assert all("bucket=2" in r[0] for r in files)
