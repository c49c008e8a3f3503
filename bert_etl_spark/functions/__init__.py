from bert_etl_spark.functions.deterministic import davg, dsum, sql_davg, sql_dsum
from bert_etl_spark.functions.identity import with_identity, identity_col

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg", "with_identity", "identity_col"]
