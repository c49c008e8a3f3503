from bert_etl_spark.sources.readers import read_csv, read_json, read_parquet
from bert_etl_spark.sources.sinks import (
    append_dataset,
    incremental_ingest,
    overwrite_dataset,
    read_dataset,
)

__all__ = [
    "read_parquet",
    "read_json",
    "read_csv",
    "append_dataset",
    "overwrite_dataset",
    "read_dataset",
    "incremental_ingest",
]
