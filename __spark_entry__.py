"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (revenue by nation) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2B, keyed by name.
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.

Implementations live in ``bert_etl_spark/operators/*``; each module registers
its queries + oracles into a shared registry at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bert_etl_spark.operators import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.ALL_QUERIES["revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ALL_ORACLES)
