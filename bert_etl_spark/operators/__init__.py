"""Operator library: each module registers named queries + DuckDB oracles.

Import side effect: importing a module under this package populates the global
query registry consumed by ``__spark_entry__``.
"""

from bert_etl_spark.operators.registry import ALL_ORACLES, ALL_QUERIES, query

__all__ = ["ALL_QUERIES", "ALL_ORACLES", "query"]
