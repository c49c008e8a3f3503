"""Reader round-trips (parquet/json/csv) and permissive JSON semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bert_etl_spark.sources.readers import read_csv, read_json, read_parquet

SCHEMA = "id long, name string, score double"
ROWS = [(1, "ada", 9.5), (2, "linus", 7.25), (3, None, None)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "p")
    _df(spark).write.parquet(p)
    back = read_parquet(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_json_roundtrip_schema_first(spark, tmp_path):
    p = str(tmp_path / "j")
    _df(spark).write.json(p)
    back = read_json(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    assert back.schema.simpleString() == "struct<id:bigint,name:string,score:double>"


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "c")
    _df(spark).write.option("header", True).csv(p)
    back = read_csv(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_malformed_json_rows_are_null_not_fatal(spark, tmp_path):
    """Permissive mode: bad records must not kill a 100 TB ingest."""
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "name": "ok", "score": 1.0}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "also ok", "score": 2.0}\n'
    )
    back = read_json(spark, str(p), SCHEMA)
    rows = back.collect()
    assert len(rows) == 3  # corrupt row surfaces as nulls, not an exception
    assert sum(1 for r in rows if r.id is not None) == 2


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Real JDBC smoke test against the Derby driver Spark bundles.

    Covers the reference's Postgres datasource context
    (/root/reference/bert/datasource.py:50-84) end-to-end: Spark writes a
    table over JDBC, read_jdbc scans it back — including the partitioned
    read path (partitionColumn/bounds), which is the 100 TB-relevant part:
    a production JDBC ingest must split into parallel range scans, never
    one giant serial cursor.
    """
    from bert_etl_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/smokedb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src = spark.createDataFrame(
        [(i, f"name-{i}", float(i) * 1.5) for i in range(20)],
        "id int, name string, score double",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "items")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )

    plain = read_jdbc(spark, url, "items", driver=driver)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, src.collect()))

    parts = read_jdbc(
        spark, url, "items",
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=20,
        driver=driver,
    )
    assert parts.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, parts.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """Hive-style partitioned layout: a date filter on the partition column
    must prune directories at PLANNING time (PartitionFilters in the scan,
    only matching partitions listed) — at 100 TB the difference between
    reading one day and reading the lake. Written via repartition(col) so
    each partition directory gets one file, not one file per task."""
    from bert_etl_spark.operators.registry import tbl

    p = str(tmp_path / "events_by_day")
    events = tbl(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    events.repartition(F.col("day")).write.partitionBy("day").parquet(p)

    target = events.groupBy("day").count().orderBy(F.desc("count")).first()
    back = spark.read.parquet(p).filter(F.col("day") == F.lit(target["day"]))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(day" in plan
    assert back.count() == target["count"] and target["count"] > 0
