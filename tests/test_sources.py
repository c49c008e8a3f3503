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


# --- physical-type drift: ns-as-long / µs-NTZ / µs-UTC timestamps ----------
#
# The same logical events table has shipped with three physical ts
# encodings across writer/Spark versions. Round 3's regression was a
# streaming reader that assumed one of them and silently sheared every
# timestamp 1000x on another. Both boundaries (batch tbl(), streaming
# events_stream()) must normalize all three to identical wall-clock values.

_DRIFT_ROWS = [
    (1, "2024-03-01 00:00:00", 10, "click", 1.0, "{}"),
    (2, "2024-03-01 01:30:00", 10, "purchase", 2.0, "{}"),
    (3, "2024-03-02 12:00:00", 20, "view", 3.0, "{}"),
]


def _write_events_variant(tmp_path, unit: str, tz: str | None) -> str:
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / f"ev_{unit}_{tz or 'ntz'}"
    d.mkdir()
    tzinfo = dt.timezone.utc if tz else None
    ts = [
        dt.datetime.strptime(r[1], "%Y-%m-%d %H:%M:%S").replace(tzinfo=tzinfo)
        for r in _DRIFT_ROWS
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _DRIFT_ROWS], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([r[2] for r in _DRIFT_ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _DRIFT_ROWS], pa.string()),
            "value": pa.array([r[4] for r in _DRIFT_ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _DRIFT_ROWS], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"), version="2.6")
    return str(d)


def _wallclock(df):
    return sorted(
        (r["event_id"], r["w"])
        for r in df.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("w")
        ).collect()
    )


def test_ts_physical_drift_batch_and_streaming(spark, tmp_path):
    from bert_etl_spark.operators.registry import tbl
    from bert_etl_spark.streaming.events import events_stream, run_to_memory

    expected = sorted((r[0], r[1]) for r in _DRIFT_ROWS)
    variants = [
        _write_events_variant(tmp_path, "ns", None),   # ns -> nanosAsLong shim
        _write_events_variant(tmp_path, "us", None),   # µs NTZ (Spark 4 default)
        _write_events_variant(tmp_path, "us", "UTC"),  # µs adjusted-to-UTC
    ]
    for i, d in enumerate(variants):
        batch = tbl(spark, d, "events")
        assert dict(batch.dtypes)["ts"] == "timestamp", d
        assert _wallclock(batch) == expected, f"batch drift on {d}"
        stream = events_stream(spark, d, glob="events.parquet")
        assert dict(stream.dtypes)["ts"] == "timestamp", d
        drained = run_to_memory(
            stream.select("event_id", "ts"), f"drift_sink_{i}", output_mode="append"
        )
        assert _wallclock(drained) == expected, f"streaming drift on {d}"


def test_compaction_collapses_file_count(spark, tmp_path):
    from pyspark.sql import functions as F

    from bert_etl_spark.sources.sinks import compact_dataset

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(50).write.parquet(src)
    import glob

    n_before = len(glob.glob(f"{src}/part-*"))
    assert n_before == 50
    compact_dataset(spark, src, dst)  # 10k tiny rows << 128MB -> 1 file
    n_after = len(glob.glob(f"{dst}/part-*"))
    assert n_after == 1
    # lossless: same multiset of rows
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b
