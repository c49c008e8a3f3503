"""Arbitrary-Python operator surface (SURVEY §2A#13 parity).

The reference's ENTIRE transform language is per-item Python inside a job
body. The Spark-native equivalents, in preference order (pyspark guide /
SURVEY §2B "UDF/UDAF/UDTF surface"):

1. built-in expressions (everything else in operators/ — the fast path)
2. ``applyInPandas`` — per-group pandas DataFrames (the gapply pattern)
3. ``mapInPandas``   — per-partition Arrow batch iterator (multimodal.py)
4. Python UDTF       — 1→N row generators
5. row-at-a-time ``udf`` — deliberately unused (10-100× slower)

Determinism rule for oracle-checked Python ops: only exact arithmetic
(integers, min/max, order statistics, per-row float ops) — no accumulated
float reductions, whose summation order differs between numpy and any SQL
engine.

Scale: applyInPandas shuffles once on the group key and streams one group
per pandas frame (groups must fit in memory — fine for per-user/per-segment
groups; skewed mega-groups would need salting first). UDTF fan-out is
pipelined, no shuffle.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bert_etl_spark.operators.registry import query, sqlq, tbl


# ---------------------------------------------------------------------------
# applyInPandas #1: min-max normalization per market segment.
# Exact semantics: min/max are order-free, the per-row rescale is plain IEEE.
# ---------------------------------------------------------------------------


def _minmax_group(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    span = hi - lo
    pdf["bal_scaled"] = 0.0 if span == 0 else (pdf["c_acctbal"] - lo) / span
    return pdf[["c_custkey", "c_mktsegment", "c_acctbal", "bal_scaled"]]


@query(
    "pandas_minmax_scale",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           (c_acctbal - MIN(c_acctbal) OVER w)
               / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w) AS bal_scaled
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
)
def pandas_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .applyInPandas(
            _minmax_group,
            "c_custkey long, c_mktsegment string, c_acctbal double, bal_scaled double",
        )
    )


# ---------------------------------------------------------------------------
# applyInPandas #2: per-user max inter-event gap (sorted inside the group —
# shuffle order is nondeterministic, the sort restores determinism). Integer
# microseconds → exact.
# ---------------------------------------------------------------------------


def _max_gap_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    us = pdf["ts"].astype("int64") // 1000  # datetime64[ns] via Arrow → µs
    gap = int(us.diff().max()) if len(us) > 1 else None
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n_events": [len(pdf)], "max_gap_us": [gap]}
    )


@query(
    "pandas_max_gap",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_events, MAX(gap) AS max_gap_us
    FROM gaps GROUP BY user_id
    """,
)
def pandas_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit hash repartition before the grouped-pandas op: AQE would
    # otherwise coalesce the small shuffle to ~1 partition and serialize all
    # Python work on one core (explicit REPARTITION_BY_NUM is exempt from
    # AQE coalescing). Sized to the cluster's parallelism so every core
    # runs a Python worker; at 100 TB the same hint sizes Python parallelism.
    return (
        tbl(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
        .groupBy("user_id")
        .applyInPandas(_max_gap_group, "user_id long, n_events long, max_gap_us long")
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (the UDAF surface): one scalar per group,
# computed vectorized in pandas. Exact arithmetic only (max-min) per the
# determinism rule above.
# ---------------------------------------------------------------------------


@query(
    "pandas_udaf_range",
    oracle="""
    SELECT c_mktsegment,
           MAX(c_acctbal) - MIN(c_acctbal) AS bal_range,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def pandas_udaf_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bal_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg —
    # the row count is a second pandas UDAF for that reason
    @pandas_udf("long")
    def group_n(v: pd.Series) -> int:
        return len(v)

    return (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            bal_range("c_acctbal").alias("bal_range"),
            group_n("c_acctbal").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF: JSON object → (key, value) rows, the schemaless-payload
# exploder (reference dict payloads, SURVEY §1.1). 1→N fan-out, pipelined.
# ---------------------------------------------------------------------------


@query(
    "udtf_json_kv",
    oracle="""
    SELECT e.event_id, j.key, j.value
    FROM events e,
         LATERAL (SELECT unnest(json_keys(e.props)) AS key,
                         json_extract_string(e.props, '$.' || unnest(json_keys(e.props))) AS value) j
    """,
)
def udtf_json_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value string")
    class JsonKV:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield k, str(v)

    spark.udtf.register("json_kv", JsonKV)
    return sqlq(
        spark,
        sf_dir,
        "SELECT e.event_id, j.key, j.value FROM events e, LATERAL json_kv(e.props) j",
        ("events",),
    )
