"""Named-table registry over parquet data directories.

The analog of the reference's job/dataset registry (`bert/utils.py:28-62`
scan_jobs; `bert/etl/__init__.py:166-236` ETLDatasetReader): datasets are
addressed by name, resolved to a storage location, and exposed both as
DataFrames and as SQL temp views.

Scale note: each table is a plain `spark.read.parquet` scan — at 100 TB these
become multi-thousand-file scans where Catalyst handles split planning,
predicate pushdown, and partition pruning. Nothing here materializes data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-joinable. At TPC-H scale these grow
# sub-linearly (region/nation are constant), so the hint holds at 100 TB.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load each table lazily; optionally register SQL temp views."""
    tables: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return tables


class Catalog:
    """Lazy table accessor bound to one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self.spark.read.parquet(table_path(self.sf_dir, name))
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_all(self) -> None:
        load_tables(self.spark, self.sf_dir)
