"""Source readers (SURVEY §2B scans). All thin, schema-first wrappers over
``spark.read`` — inference is allowed only at exploration time; production
paths pass explicit schemas so scans stay single-pass.

JDBC (the reference's Postgres env context, /root/reference
bert/datasource.py:50-84) is exercised against the Derby driver Spark
bundles (tests/test_sources.py::test_jdbc_roundtrip_embedded_derby),
including the partitioned range-scan path; point ``read_jdbc`` at any
other database by shipping its driver jar via ``spark.jars``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)  # no inference pass
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """schema: DDL string or StructType (DataFrameReader.schema takes both)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, partition_column: str | None = None,
    num_partitions: int = 8, lower_bound=None, upper_bound=None, **options
) -> DataFrame:
    """Parallel JDBC scan; requires a JDBC driver jar on the classpath."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
