"""bert_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jbcurtin/bert-etl, re-expressed Spark-first.

The reference (see SURVEY.md) is a queue-based dataflow ETL micro-framework:
pure-Python jobs chained into a linear pipeline, each consuming dict "work
items" from a queue. This engine replaces that row-at-a-time model with
declarative DataFrame plans that Catalyst can optimize (predicate pushdown,
column pruning, join selection, AQE), plus first-class operators for the
LLM-data-pipeline extensions: deduplication, similarity search, multimodal
columns, and text analysis.

Layout:
  session     — SparkSession builder with scale-aware defaults
  catalog     — named-table registry over the parquet test data
  pipeline    — the ``@follow`` analog: ordered DataFrame.transform chains
  operators/  — relational + dedup + similarity + text + multimodal operators
  functions/  — identity hashing, ndarray codecs, array math helpers
  sources/    — readers (parquet/json/csv/jdbc) and dataset sinks
  streaming/  — Structured Streaming equivalents of the queue semantics
"""

from bert_etl_spark.session import get_spark
from bert_etl_spark.catalog import Catalog, load_tables, TABLE_NAMES
from bert_etl_spark.pipeline import Pipeline, follow

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Catalog",
    "load_tables",
    "TABLE_NAMES",
    "Pipeline",
    "follow",
    "__version__",
]
