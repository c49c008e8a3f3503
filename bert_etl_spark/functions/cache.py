"""Function-result caching — parity with ``@cache_function_results``
(/root/reference bert/etl/functools.py:24-100), which memoizes a function's
output in S3 keyed by sha256 of its source + invocation args.

Here the cached unit is a DataFrame build: the key is a digest of caller-
supplied parts (query name, parameters, input fingerprints); the store is a
parquet table per key. Re-running with the same key reads the materialized
table instead of recomputing the plan — the stage-cache / restart-at-job-N
behavior of RedisCacheBackend (bert/backends.py:27-113) without the copy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def cache_key(*parts: object) -> str:
    return hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()


def cached_table(
    spark: SparkSession,
    cache_dir: str,
    key_parts: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the cached table for ``key_parts``, building it on first use."""
    path = f"{cache_dir}/{cache_key(*key_parts)}"
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
