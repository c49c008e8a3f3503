"""Driver-local rows as a ONE-partition DataFrame.

``spark.createDataFrame(rows, schema)`` parallelizes driver rows across
``defaultParallelism`` Python partitions. Any downstream single-task
consumer of that frame — ``coalesce(1)`` before an artifact write, a
single-partition action — then iterates all N parent partitions
SEQUENTIALLY, paying the Python-worker handshake once per partition:
measured ~4.5 s per 128-row codebook write on local[32] (round-14 §1/§4
measurement), vs ~0.35 s when the rows are parallelized into one slice
up front. One slice is also the honest shape for driver-literal tables:
they are tiny by construction (codebooks, key lists, demo batches), and
a single Python partition keeps exactly one JVM↔Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for driver-local rows, pinned to ONE slice."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )
