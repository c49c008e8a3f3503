"""Dataset sinks + the incremental-ingest ledger.

Reference parity (/root/reference):
- ``append_dataset``    = ETLDataset.add + synchronize (bert/etl/__init__.py:
  103-117,137-156): append-only shards under a prefix → parquet append.
- ``overwrite_dataset`` = ETLDataset.update (bert/etl/__init__.py:87-101,
  158-164): clear + rewrite → parquet overwrite.
- ``read_dataset``      = ETLDatasetReader.consolidate (bert/etl/__init__.py:
  166-236): multi-shard scan.
- ``incremental_ingest``= the ETLState contains-ledger (bert/etl/__init__.py:
  57-80): only rows whose content hash is NOT in the persisted ledger are
  ingested; the ledger grows by exactly those hashes. Deterministic hash —
  no uuid — so re-running an ingest is a no-op (idempotent loads).

Scale: the ledger anti-join is a shuffle on the 64-hex digest (uniformly
distributed → no skew); at 100 TB the ledger would be bucketed by digest so
repeated ingests co-locate without re-shuffling the ledger side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bert_etl_spark.functions.identity import with_identity


def append_dataset(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def overwrite_dataset(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def incremental_ingest(
    new_df: DataFrame,
    dataset_path: str,
    ledger_path: str,
    cols: list[str] | None = None,
) -> int:
    """Ingest only content not already in the ledger; returns rows ingested.

    Within-batch duplicates collapse first (keep one per identity), then the
    anti-join drops rows already ingested by any previous run.
    """
    spark = new_df.sparkSession
    candidates = with_identity(new_df, cols).dropDuplicates(["identity"])

    if _path_exists(spark, ledger_path):
        ledger = spark.read.parquet(ledger_path).select("identity")
        fresh = candidates.join(ledger, "identity", "left_anti")
    else:
        fresh = candidates

    # materialize once; both writes consume the same computed set
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            fresh.drop("identity").write.mode("append").parquet(dataset_path)
            fresh.select("identity").write.mode("append").parquet(ledger_path)
    finally:
        fresh.unpersist()
    return n


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a fragmented parquet dataset into
    ceil(total_bytes / target_file_bytes) files. Returns the output file
    count.

    The operational counterpart of streaming/append ingestion (the
    reference's append-only shard layout, bert/etl/__init__.py:103-117,
    accumulates one shard per ingest forever): many small files tax the
    driver's split planning and every scan's open() overhead at 100 TB.
    Sizing comes from the Hadoop FileSystem API (portable to HDFS/S3A, not
    just local disk); the rewrite is ONE round-robin shuffle of the data —
    no collect, no driver-side file juggling.
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return n_files
