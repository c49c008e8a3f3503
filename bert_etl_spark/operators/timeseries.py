"""Time-series resampling operators: OHLC bars, time-weighted averages, and
exponentially-weighted moving averages over the events stream.

The reference has no time-series surface at all (its closest primitive is the
DynamoDB-Streams batch window, /root/reference/bert/binding.py:60-66); these
are the hypertable-style rollups a metrics/telemetry user of the engine needs.

Cross-engine determinism:
- OHLC open/close use the lexicographic struct-min/max idiom
  (``MIN(struct_pack(ts, id, v)).v`` ≡ ``F.min(F.struct(ts, id, v))["v"]``)
  with event_id as tiebreak — DuckDB's arg_min has no composite-key overload.
- The time-weighted average weights are integer microseconds (exact), the
  weighted sum goes through the DECIMAL reduction, and the final division is
  one double op over identical operands in both engines.
- EWMA is a sequential left fold (s := a*s + (1-a)*x) over a per-key array
  sorted by (ts, event_id); identical fold order in ``F.aggregate`` and
  DuckDB ``list_reduce`` makes the result bit-identical (a = 0.5 is exact in
  binary; no transcendentals involved).

Scale design:
- OHLC / TWA are single-shuffle groupBy/window aggregations with map-side
  partial aggregation; bar count is bounded by (buckets x types), never rows.
- EWMA collects one array per entity: the standard per-entity fold pattern.
  Array size is the per-user event count (bounded in any real telemetry
  schema by retention windows); for unbounded keys the same fold runs as a
  Structured Streaming ``applyInPandasWithState`` operator
  (streaming/events.py) without materializing history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bert_etl_spark.functions.deterministic import dsum, sql_dsum
from bert_etl_spark.functions.temporal import epoch_micros
from bert_etl_spark.operators.registry import query, tbl

EWMA_ALPHA = 0.5  # exact in binary floating point


@query(
    "timeseries_resample_ohlc",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
           event_type,
           (MIN(struct_pack(ts := ts, id := event_id, v := value))).v AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           (MAX(struct_pack(ts := ts, id := event_id, v := value))).v AS close,
           COUNT(*) AS n,
           {sql_dsum('value')} AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def timeseries_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample raw events into hourly OHLC(V) bars per event type.

    One scan, one shuffle on (bucket, event_type); all five aggregates
    partial-aggregate map-side, so the exchange carries only bar-level rows.
    open/close are struct-min/max with event_id tiebreak → deterministic
    under concurrent equal timestamps.
    """
    ohlc_key = F.struct(F.col("ts"), F.col("event_id").alias("id"), F.col("value").alias("v"))
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min(ohlc_key)["v"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(ohlc_key)["v"].alias("close"),
            F.count("*").alias("n"),
            dsum("value", "volume"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "volume",
        )
    )


@query(
    "timeseries_time_weighted_avg",
    oracle=f"""
    WITH d AS (
        SELECT event_type, value,
               epoch_us(lead(ts) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id))
                 - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           {sql_dsum('value * dur_us')} / CAST(SUM(dur_us) AS BIGINT) AS twa
    FROM d
    WHERE dur_us IS NOT NULL
    GROUP BY event_type
    """,
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type.

    Each reading holds until the next one; its weight is the interval length
    in integer microseconds (exact in both engines). The weighted sum runs
    through the DECIMAL reduction so the shuffle-order of partial sums can't
    change the result. The last reading per key has no successor and drops
    out — the standard left-closed TWA convention.

    Note the DuckDB ``SUM(BIGINT)`` → HUGEINT widening: both oracle sums are
    cast back to BIGINT or the driver's type-sensitive hash diverges.
    """
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dur = epoch_micros(F.lead("ts").over(w)) - epoch_micros("ts")
    return (
        tbl(spark, sf_dir, "events")
        .withColumn("dur_us", dur)
        .filter(F.col("dur_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").alias("total_us"),
            (dsum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")).alias("twa"),
        )
    )


@query(
    "timeseries_ewma",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (s, x) -> {EWMA_ALPHA} * s + {1 - EWMA_ALPHA} * x),
                 6) AS ewma
    FROM events
    GROUP BY user_id
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA of ``value`` per user (s := a*s + (1-a)*x, a = 0.5).

    A recursive smoother can't be expressed as a commutative aggregate, so
    both engines run the SAME sequential left fold over the per-user series
    sorted by (ts, event_id): ``F.aggregate`` here, ``list_reduce`` in the
    oracle, seeded with the first element. Identical operation order over
    IEEE doubles → bit-identical results (rounded to 6 for the value hash).

    Scale: one shuffle on user_id; array length is the per-user event count.
    For unbounded per-key history the streaming formulation
    (applyInPandasWithState, streaming/events.py) folds incrementally
    instead of materializing the array.
    """
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    vals = F.transform(arr, lambda x: x["value"])
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda s, x: F.lit(EWMA_ALPHA) * s + F.lit(1 - EWMA_ALPHA) * x,
    )
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
        )
    )


# First-difference volatility per event type: lag the value series along
# (ts, event_id), then mean/stddev of the step changes via exact decimal
# co-moments — the telemetry "rate of change" rollup. One window + one
# aggregation, both keyed on event_type.
@query(
    "timeseries_lag_returns",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               value - LAG(value) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS diff
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(diff) AS BIGINT) AS n_steps,
           ROUND({sql_dsum('diff')} / COUNT(diff), 6) AS mean_diff,
           ROUND(sqrt({sql_dsum('diff * diff')} / COUNT(diff)
                 - ({sql_dsum('diff')} / COUNT(diff))
                 * ({sql_dsum('diff')} / COUNT(diff))), 6) AS std_diff
    FROM d WHERE diff IS NOT NULL
    GROUP BY event_type
    """,
)
def timeseries_lag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.withColumn("diff", F.col("value") - F.lag("value").over(w)).filter(
        F.col("diff").isNotNull()
    )
    n = F.count("diff")
    mean = dsum(F.col("diff")) / n
    var = dsum(F.col("diff") * F.col("diff")) / n - mean * mean
    return d.groupBy("event_type").agg(
        n.alias("n_steps"),
        F.round(mean, 6).alias("mean_diff"),
        F.round(F.sqrt(var), 6).alias("std_diff"),
    )


# Hour-of-day x day-of-week seasonality matrix — the load-shape rollup
# behind capacity planning and anomaly baselines. Dimensions come from the
# timestamp (no calendar join); output cardinality is fixed at 7x24
# regardless of input rows, and the single aggregation partials map-side.
# DuckDB dayofweek is 0-based where Spark's is 1-based — the oracle
# compensates (+1) so both engines emit the same key.
@query(
    "timeseries_seasonality",
    oracle=f"""
    SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def timeseries_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum("value", "total_value"),
        )
    )


# Time-hierarchy rollup: year / year-month / year-month-day partial
# aggregates in ONE grouping-sets pass — the hypertable "continuous
# aggregate" ladder, materialized at three granularities without three
# scans. GROUPING() flags disambiguate the levels; at 100 TB each level
# lands in its own partition of the rollup table and serves dashboards
# without touching raw events.
@query(
    "timeseries_hierarchy_rollup",
    oracle=f"""
    SELECT CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(GROUPING(month(ts)) AS BIGINT) AS g_month,
           CAST(GROUPING(day(ts)) AS BIGINT) AS g_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY GROUPING SETS ((year(ts)), (year(ts), month(ts)),
                            (year(ts), month(ts), day(ts)))
    """,
)
def timeseries_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select(
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        "value",
    )
    ev.createOrReplaceTempView("_ts_rollup_input")
    return ev.sparkSession.sql("""
        SELECT y, m, d,
               CAST(GROUPING(m) AS BIGINT) AS g_month,
               CAST(GROUPING(d) AS BIGINT) AS g_day,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM _ts_rollup_input
        GROUP BY GROUPING SETS ((y), (y, m), (y, m, d))
    """)


CUSUM_H = 2.0  # drift alarm at h sigma of the daily deviations


# CUSUM drift detection — the classic sequential change-point statistic
# (manufacturing SPC, KPI drift monitors): accumulate daily deviations
# from the series mean and alarm when the one-sided cumulative sum
# exceeds h·σ. The textbook form is a RECURRENCE, S_i = max(0, S_{i-1} +
# d_i) — not window-expressible as written — but it has an exact
# prefix-form rewrite: S_i = P_i − min(0, min_{j≤i} P_j) where P is the
# plain running sum of deviations, which IS two keyed window functions
# (running sum + running min), shuffling once on event_type. All
# reductions and both running aggregates use the decimal recipe over a
# unique (event_type, day) order, so the statistic is bit-identical in
# both engines and the h·σ comparison cannot flip — no tolerance window.
@query(
    "timeseries_cusum_drift",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {sql_dsum('value')} AS v
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               {sql_dsum('v')} / COUNT(*) AS mu,
               sqrt({sql_dsum('v * v')} / COUNT(*)
                    - ({sql_dsum('v')} / COUNT(*))
                    * ({sql_dsum('v')} / COUNT(*))) AS sigma
        FROM daily GROUP BY 1
    ),
    p AS (
        SELECT d.event_type, d.day,
               CAST(SUM(CAST(d.v - m.mu AS DECIMAL(25,6)))
                    OVER (PARTITION BY d.event_type ORDER BY d.day)
                    AS DOUBLE) AS pf
        FROM daily d JOIN m USING (event_type)
    ),
    c AS (
        SELECT event_type, day,
               pf - LEAST(CAST(0 AS DOUBLE),
                          MIN(pf) OVER (PARTITION BY event_type
                                        ORDER BY day)) AS cusum
        FROM p
    )
    SELECT c.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(cusum), 6) AS max_cusum,
           CAST(SUM(CASE WHEN cusum > {CUSUM_H} * m.sigma
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_drift_days
    FROM c JOIN m USING (event_type)
    GROUP BY 1
    """,
)
def timeseries_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(dsum(F.col("value"), "v"))
    n = F.count("*")
    mu = dsum(F.col("v")) / n
    sigma = F.sqrt(dsum(F.col("v") * F.col("v")) / n - mu * mu)
    m = daily.groupBy("event_type").agg(
        mu.alias("mu"), sigma.alias("sigma")
    )
    wsum = W.partitionBy("event_type").orderBy("day")
    p = daily.join(F.broadcast(m), "event_type").withColumn(
        "pf",
        F.sum((F.col("v") - F.col("mu")).cast("decimal(25,6)"))
        .over(wsum)
        .cast("double"),
    )
    c = p.withColumn(
        "cusum",
        F.col("pf")
        - F.least(F.lit(0.0), F.min("pf").over(wsum)),
    )
    return c.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.max("cusum"), 6).alias("max_cusum"),
        F.sum(
            F.when(F.col("cusum") > CUSUM_H * F.col("sigma"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_drift_days"),
    )
