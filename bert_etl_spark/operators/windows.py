"""Window functions + event-time windows (SURVEY §2B).

Reference parity: per-user sequential processing in a job loop (SURVEY
§2A#13) and DynamoDB-Streams batch windows (§2A#28). A Spark window is one
shuffle on the partition key + an in-partition sort; running/moving sums use
exact decimal arithmetic inside the frame so segment-tree vs. sequential
evaluation order cannot change the result.

Determinism rule: every ORDER BY carries a unique tiebreak column so
row_number/lag/lead/ntile are well-defined in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bert_etl_spark.functions.deterministic import dsum, sql_dsum
from bert_etl_spark.functions.temporal import epoch_micros, epoch_millis
from bert_etl_spark.operators.registry import query, tbl

_DEC = "decimal(25,6)"


@query(
    "window_ranking",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(RANK()       OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4)     OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return tbl(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_analytic",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
    )


@query(
    "window_frames",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS {_DEC})) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS {_DEC})) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_4,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_n
    FROM events
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-3, W.currentRow)
    val = F.col("value").cast(_DEC)
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(val).over(running).cast("double").alias("running_total"),
        F.sum(val).over(moving).cast("double").alias("moving_sum_4"),
        F.count("*").over(moving).alias("moving_n"),
    )


@query(
    "window_analytic2",
    oracle="""
    SELECT event_id, user_id,
           LAG(value, 2, -1.0)  OVER w AS lag2,
           LEAD(value, 2, -1.0) OVER w AS lead2,
           NTH_VALUE(value, 3) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_seen,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_analytic2(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("value", 2, -1.0).over(w).alias("lag2"),
        F.lead("value", 2, -1.0).over(w).alias("lead2"),
        F.nth_value("value", 3).over(running).alias("third_seen"),
        F.last(purchase_val, ignorenulls=True).over(running).alias("last_purchase"),
    )


# Top-K per group: the scalable idiom — rank within partition, filter ≤ K.
# AQE + partial top-k (WindowGroupLimit in Spark 3.5+) keep this one shuffle.
@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        tbl(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percent_rank/cume_dist over a UNIQUE total order reduce to closed
    # forms of the global rank ((r-1)/(N-1) and r/N, no peer groups), so
    # the distributed exact rank replaces the single-task global window.
    from bert_etl_spark.operators.global_order import with_global_rank

    d = with_global_rank(
        tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal"),
        [F.asc("s_acctbal"), F.asc("s_suppkey")],
        "_r",
        keep_total="_n",
    )
    denom = F.greatest(F.col("_n") - 1, F.lit(1))
    return d.select(
        "s_suppkey",
        "s_acctbal",
        F.round((F.col("_r") - 1) / denom, 6).alias("pct_rank"),
        F.round(F.col("_r") / F.col("_n"), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Event-time windows over the events table (batch form of the streaming
# operators; SURVEY §2A#28). F.window() is epoch-aligned tumbling/sliding —
# the oracle reproduces the alignment with time_bucket arithmetic.
# ---------------------------------------------------------------------------


@query(
    "window_event_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_event_sliding",
    oracle="""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                 - k.k * INTERVAL '30 minutes' AS window_start,
               e.*
        FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n
    FROM slid
    GROUP BY 1, 2
    """,
)
def window_event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )


# The SAME tumbling aggregation executed as a genuine Structured Streaming
# query (file source → watermark → complete-mode memory sink, drained with
# availableNow): the sink table equals the batch result, so a real streaming
# run is value-checked against the same SQL oracle.
@query(
    "streaming_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import streaming_tumbling_from_dir

    return streaming_tumbling_from_dir(spark, sf_dir)


# Streaming session windows, complete-mode drained: all sessions survive to
# the final sink table, so the merging session-window state machine is
# value-checked against the lag/cumsum SQL derivation.
@query(
    "streaming_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("streaming_sessions_oracle")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_sessions_oracle")


# Streaming percentile monitoring: the mergeable quantile sketch
# (approx_percentile, a bounded-size TypedImperativeAggregate whose state
# merges map-side AND across micro-batches) running inside a genuine
# watermarked tumbling-window streaming aggregation — the always-on
# latency/size-percentile dashboard shape. The sketch is the only form
# whose streaming state is bounded (an exact percentile would buffer
# every value per window forever). The hash-checked outputs are the
# exact interpolated median (computed batch-side after the drain; Spark
# `percentile` and DuckDB `quantile_cont` share the definition) plus a
# MERGEABILITY flag: the sketch state merged incrementally across
# micro-batches must equal the sketch built in one batch pass over the
# same input. Equality is exact whenever a window's row count is within
# the sketch's accuracy parameter (the summary then holds every value) —
# true at every test SF by orders of magnitude; past that regime the
# check would relax to sketch_quantile_mergeable's bounded-error form.
# (The flag deliberately does NOT compare the sketch against the
# interpolated exact value: on a 2-row window the sketch returns an
# element while quantile_cont returns the midpoint — a structural
# difference, not sketch error.)
@query(
    "streaming_windowed_quantiles",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           ROUND(quantile_cont(value, 0.50), 6) AS exact_p50,
           TRUE AS stream_sketch_equals_batch
    FROM events GROUP BY 1, 2
    """,
)
def streaming_windowed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream, run_to_memory

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.expr("approx_percentile(value, 0.5, 10000)").alias("ap50"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "ap50"
        )
    )
    streamed = run_to_memory(
        agg, "streaming_windowed_quantiles_sink", output_mode="complete"
    )
    batch = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("ex50"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("bp50"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "ex50", "bp50")
    )
    return streamed.join(batch, ["window_start", "event_type"]).select(
        "window_start",
        "event_type",
        F.round("ex50", 6).alias("exact_p50"),
        (F.abs(F.col("ap50") - F.col("bp50")) <= F.lit(1e-9)).alias(
            "stream_sketch_equals_batch"
        ),
    )


# Gap-based sessionization, batch form: flag session starts with lag(), then
# a running sum assigns session ids — one shuffle on user_id, no self-join.
@query(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_ms = epoch_millis("ts") - epoch_millis(F.lag("ts").over(w))
    return (
        tbl(spark, sf_dir, "events")
        .withColumn(
            "new_session",
            F.when(gap_ms.isNull() | (gap_ms > 1800000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(running))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


# Spark's native session_window() in batch mode; oracle reproduces its
# close-at-last-event+gap semantics from the sessionize CTE.
@query(
    "window_session_native",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# Streaming stateful dedup, append-mode drained: dropDuplicates keeps one
# row per key across ALL micro-batches (state table keyed by the dedup
# cols); emitting only the key columns makes the surviving-row choice
# irrelevant, so a real streaming run is value-checked against DISTINCT.
# At scale the state is bounded by key cardinality — use
# dropDuplicatesWithinWatermark (streaming/events.py) when keys are
# unbounded but duplicates arrive close together.
@query(
    "streaming_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("streaming_dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_dedup_sink")


# Watermark-BOUNDED streaming dedup — the ETLState ledger
# (bert/etl/__init__.py:57-80 analog) for unbounded key spaces: state
# holds a key only until the watermark passes its event time + horizon,
# so memory is O(rate x horizon) instead of O(distinct keys). The events
# table arrives as one file -> one availableNow micro-batch, so no key
# expires mid-run and the result is exactly DISTINCT — which is what
# makes a real dropDuplicatesWithinWatermark run oracle-checkable.
@query(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream, stream_dedup

    stream = events_stream(spark, sf_dir, glob="events.parquet").select(
        "ts", "user_id", "event_type"
    )
    deduped = stream_dedup(
        stream, ["user_id", "event_type"], watermark="2 hours"
    ).select("user_id", "event_type")
    q = (
        deduped.writeStream.format("memory")
        .queryName("streaming_dedup_wm_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_dedup_wm_sink")


# Rolling 7-day revenue per customer: RANGE frame over epoch-days, so a
# customer with sparse order dates still gets a true time-window (ROWS
# frames would count rows, not days). Decimal-cast inside the window sum
# keeps the fold order-insensitive. State at 100 TB is bounded by the
# frame span per key — no unbounded accumulation.
@query(
    "window_rolling_range",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d
    FROM orders
    """,
)
def window_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d"),
    )


# Stream-static join: the streaming side joins a static dim per
# micro-batch with NO streaming state (stateless enrich) — the batch dim
# is re-broadcast per trigger, so dim updates are picked up between
# batches. Append-mode memory sink drained with availableNow; oracle is
# the equivalent batch join.
@query(
    "streaming_stream_static_join",
    oracle="""
    SELECT e.event_id, e.event_type, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    customer = tbl(spark, sf_dir, "customer")
    enriched = stream.join(
        F.broadcast(customer), stream["user_id"] == customer["c_custkey"]
    ).select("event_id", "event_type", "c_mktsegment")
    q = (
        enriched.writeStream.format("memory")
        .queryName("streaming_stream_static_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_stream_static_sink")


# REAL stream-stream join run (two file-source streams, watermark + time
# bound, memory sink drained): clicks matched to purchases by the same user
# within the next hour. The interval condition is what bounds the join
# state at scale — each side buffers only watermark+interval of history.
# The oracle is the equivalent batch interval join: with availableNow
# draining everything and a watermark wider than any in-batch disorder,
# streaming append-mode output equals the batch result exactly.
@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT l.event_id AS l_event_id, r.event_id AS r_event_id
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL '1 hour'
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream, stream_stream_join

    clicks = events_stream(spark, sf_dir, glob="events.parquet").filter(
        F.col("event_type") == "click"
    )
    purchases = events_stream(spark, sf_dir, glob="events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_join(
        clicks, purchases, key="user_id", interval="1 hour", watermark="2 hours"
    ).select("l_event_id", "r_event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("streaming_stream_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_stream_stream_sink")


# Funnel analysis: ordered-stage conversion (view → click → purchase)
# per user via min-timestamp-after-previous-stage. One shuffle on
# user_id computes all three stages; the final count is a tiny global
# agg. At 100 TB this is the partition-friendly funnel formulation — no
# self-joins, no per-user explode.
@query(
    "funnel_conversion",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_any
        FROM events GROUP BY user_id
    ),
    funnel AS (
        SELECT user_id, t_view,
               CASE WHEN t_click_any > t_view THEN t_click_any END AS t_click,
               CASE WHEN t_buy_any > t_view AND t_click_any > t_view
                         AND t_buy_any > t_click_any
                    THEN t_buy_any END AS t_buy
        FROM stages
    )
    SELECT COUNT(t_view) AS n_viewed,
           COUNT(t_click) AS n_clicked,
           COUNT(t_buy) AS n_purchased
    FROM funnel
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click_any"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy_any"),
    )
    funnel = stages.select(
        "user_id",
        "t_view",
        F.when(F.col("t_click_any") > F.col("t_view"), F.col("t_click_any")).alias(
            "t_click"
        ),
        F.when(
            (F.col("t_buy_any") > F.col("t_view"))
            & (F.col("t_click_any") > F.col("t_view"))
            & (F.col("t_buy_any") > F.col("t_click_any")),
            F.col("t_buy_any"),
        ).alias("t_buy"),
    )
    return funnel.agg(
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_buy").alias("n_purchased"),
    )


# Cohort retention: users bucketed by first-activity day, counted per
# day-offset — first-touch via a groupBy min (no window over the full
# stream), then one join back. Both exchanges hash on user_id.
@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS TIMESTAMP))
               AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("DAY", F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("DAY", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# Last-touch attribution: each purchase attributes to the most recent
# click by the same user within a 7-day lookback. Spark side is the
# SCALABLE formulation — union the two event kinds, ONE window pass per
# user carrying the last-click struct forward (same shape as join_asof,
# no self-join, no per-user quadratic term); the 7-day cutoff filters
# after the carry. The oracle is the equivalent interval self-join with
# a lexicographic arg-max — correct but quadratic, exactly what the
# window form avoids at 100 TB. Ties (click and purchase at the same
# timestamp, or two clicks at the same timestamp) are pinned by ordering
# (ts, kind, event_id) in Spark == max(struct(ts, event_id)) in DuckDB.
@query(
    "attribution_last_touch",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           max(struct_pack(ts := c.ts, id := c.event_id)).id
               AS attributed_click_id,
           CAST((epoch_us(p.ts)
                 - epoch_us(max(struct_pack(ts := c.ts, id := c.event_id)).ts))
                // 60000000 AS BIGINT) AS minutes_to_convert
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 7 DAY
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("id")),
        ).alias("click"),
    )
    # clicks sort before purchases at equal ts (is_purchase ascending) so a
    # simultaneous click is attributable; equal-ts clicks pin on event_id
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(
            (F.col("is_purchase") == 1)
            & F.col("last_click").isNotNull()
            & (F.col("last_click.ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_click.id").alias("attributed_click_id"),
            (
                (epoch_micros("ts") - epoch_micros("last_click.ts"))
                / F.lit(60000000)
            )
            .cast("bigint")
            .alias("minutes_to_convert"),
        )
    )


# Anomaly detection: per-user z-score of each event's value against the
# user's own mean/std, computed from exact decimal sums (sum, sum-of-
# squares) so the moments are order-free and engine-identical — the same
# trick as agg_corr_deterministic. One groupBy + one broadcast-back join;
# flags |z| > 2. The rounding before comparison pins the boundary cases.
@query(
    "anomaly_zscore",
    oracle="""
    WITH m AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id
    ),
    stats AS (
        SELECT user_id, n, s1 / n AS mu,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
        FROM m WHERE n >= 2
    )
    SELECT e.event_id, e.user_id,
           ROUND((e.value - s.mu) / s.sigma, 6) AS z,
           abs((e.value - s.mu) / s.sigma) > 2.0 AS is_anomaly
    FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    dec = "decimal(25,6)"
    m = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(dec)).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast(dec)).cast("double").alias("s2"),
    )
    stats = m.filter(F.col("n") >= 2).select(
        "user_id",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .select(
            "event_id",
            "user_id",
            F.round(z, 6).alias("z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


# Running distinct count: COUNT(DISTINCT) isn't a window function in
# either engine, so mark each value's first occurrence per user
# (row_number = 1 over (user, value)) and take a running sum — two
# window passes over the same user_id partitioning, one exchange.
@query(
    "window_running_distinct",
    oracle="""
    WITH firsts AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM firsts
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn(
            "is_first",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
        )
    )


# Gaps-and-islands: collapse each user's active days into maximal
# consecutive-day runs via the classic (day - row_number) grouping key —
# two window-free aggregations around ONE per-user window, no self-join,
# no sequence materialization. Distinct from `window_sessionize` (timestamp
# gap threshold): islands are calendar-exact runs, the idiom behind streak
# features and SLA-coverage reports. At 100 TB: the distinct + window +
# aggs all share the user_id shuffle key, so AQE plans one exchange.
@query(
    "window_gaps_islands",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
        SELECT user_id, day,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS rn
        FROM d
    ),
    g AS (
        SELECT user_id, day - rn AS grp,
               CAST(COUNT(*) AS BIGINT) AS streak,
               MIN(day) AS streak_start
        FROM r GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           MAX(streak) AS longest_streak,
           CAST(SUM(streak) AS BIGINT) AS n_active_days,
           MIN(streak_start) AS first_day
    FROM g GROUP BY user_id
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        tbl(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    islands = (
        days.withColumn("grp", F.date_sub(F.col("day"), rn))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("streak"), F.min("day").alias("streak_start"))
    )
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("streak").alias("longest_streak"),
        F.sum("streak").alias("n_active_days"),
        F.min("streak_start").alias("first_day"),
    )


# Sliding (overlapping) event-time windows, streaming-real: 2h windows
# every 1h means each event lands in exactly two windows. Spark expands
# the event against the window grid BEFORE the partial aggregate (same
# Expand pattern as multi-distinct), so state is per-(window, type) — at
# 100 TB the overlap factor multiplies shuffle rows, which is why slide
# granularity is the knob to watch. Complete-mode memory sink drained
# with availableNow makes the real stream oracle-checkable.
@query(
    "streaming_sliding",
    oracle=f"""
    WITH ex AS (
        SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                       time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
                   AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '2 hours' AS window_end,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM ex GROUP BY 1, 2, 3
    """,
)
def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import events_stream

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("streaming_sliding_oracle")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("streaming_sliding_oracle")


# The custom stateful operator (applyInPandasWithState running per-user
# counts — the reference's process-shared StreamingQueue/ETLState pattern,
# SURVEY §2A#16/#19) as a DRIVER-VISIBLE query: real stream, update-mode
# memory sink, and because the running count is monotone, max-per-user
# over the drained sink equals the batch COUNT(*) — an exact oracle for a
# genuinely streaming-stateful computation.
@query(
    "streaming_stateful_counts",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.streaming.events import (
        events_stream,
        run_to_memory,
        stateful_running_counts,
    )

    stream = events_stream(spark, sf_dir, glob="events.parquet")
    drained = run_to_memory(
        stateful_running_counts(stream),
        "streaming_stateful_counts_sink",
        output_mode="update",
    )
    return drained.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


# Event-transition matrix: P(next event type | current) per user journey —
# the Markov-chain view of product analytics (what follows an error?).
# One lead() window along each user's timeline, then a count aggregate
# and a per-from-state share; window and both aggs share shuffle keys.
@query(
    "events_transition_matrix",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    c AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM nxt WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = nxt.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    share = F.col("n").cast("double") / F.sum("n").over(W.partitionBy("from_type"))
    return c.select("from_type", "to_type", "n", F.round(share, 6).alias("p"))


# DAU / WAU / stickiness: distinct users per day, distinct users over the
# trailing 7-day window, and their ratio — the canonical engagement
# metric. The scale-correct formulation never runs a windowed
# count-distinct over raw events: one pass dedups to (day, user) — the
# only row-scale stage — and the WAU self-join runs on the tiny
# (day x user) activity table against a 7-day range, then per-day counts.
@query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
    ),
    wau AS (
        SELECT d.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
        FROM days d JOIN du a
          ON a.day <= d.day AND a.day >= d.day - 6
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.operators.registry import persist_once

    du = persist_once(
        tbl(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            du.alias("a"),
            (F.col("a.day") <= F.col("d.day"))
            & (F.col("a.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("a.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


# RFM segmentation: recency / frequency / monetary quintiles per user —
# the classic customer-scoring matrix. The row-scale work is ONE pass
# collapsing events to per-user (last purchase ts, count, decimal sum);
# the three exact quintile assignments then run over the user table via
# the distributed ntile (operators/global_order.py — no single-task
# global window even at billions of users), deterministic via user_id
# tiebreaks. The corpus max-date anchor broadcasts.
@query(
    "events_rfm_segments",
    oracle="""
    WITH p AS (
        SELECT user_id,
               MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS monetary
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    anchor AS (SELECT MAX(ts) AS max_ts FROM events),
    r AS (
        SELECT user_id,
               CAST(date_diff('second', last_ts, max_ts) AS BIGINT)
                   AS recency_s,
               frequency, monetary
        FROM p CROSS JOIN anchor
    )
    SELECT user_id, recency_s, frequency, ROUND(monetary, 6) AS monetary,
           CAST(ntile(5) OVER (ORDER BY recency_s, user_id) AS INTEGER)
               AS r_quintile,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INTEGER)
               AS f_quintile,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
               AS m_quintile
    FROM r
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias(
                "monetary"
            ),
        )
    )
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    r = p.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (
            F.unix_timestamp("max_ts") - F.unix_timestamp("last_ts")
        ).alias("recency_s"),
        "frequency",
        "monetary",
    )
    from bert_etl_spark.operators.global_order import with_ntile_multi
    from bert_etl_spark.operators.registry import persist_once

    r = r.select(
        "user_id", "recency_s", "frequency", F.round("monetary", 6).alias("monetary")
    )
    # materialize the per-user rollup ONCE: the quintile pass re-reads its
    # input twice (range-boundary sampling + the shuffle map), so without
    # the cache the events scan + groupBy + anchor join would re-run. The
    # cached table is per-user (metadata-scale next to events) and is
    # released at the next release_internals(). All THREE quintile
    # orderings then ride ONE range exchange (with_ntile_multi) instead of
    # three chained with_ntile passes — DESC orders are encoded by
    # negating the (numeric, < 2^53) metrics, user_id breaks ties.
    r = persist_once(r)
    r = with_ntile_multi(
        r,
        5,
        [
            ("r_quintile", F.col("recency_s")),
            ("f_quintile", -F.col("frequency")),
            ("m_quintile", -F.col("monetary")),
        ],
        "user_id",
    )
    return r.select(
        "user_id", "recency_s", "frequency", "monetary",
        "r_quintile", "f_quintile", "m_quintile",
    )


# Bounce rate per day: fraction of sessions with exactly one event —
# composes the gap-sessionization idiom (flag + running sum, shared
# user_id shuffle) with a per-day rollup. Session identity never leaves
# the user partition; only per-session rows reach the day aggregate.
@query(
    "events_bounce_rate",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               CAST(MIN(ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(count_if(n_events = 1) AS BIGINT) AS n_bounces,
           ROUND(CAST(count_if(n_events = 1) AS DOUBLE) / COUNT(*), 6)
               AS bounce_rate
    FROM sessions GROUP BY day
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = epoch_millis("ts") - F.lag(epoch_millis("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_ms.isNull() | (gap_ms > 1_800_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("day"), F.count("*").alias("n_events")
    )
    bounces = F.count_if(F.col("n_events") == 1)
    return sessions.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounces.alias("n_bounces"),
        F.round(bounces.cast("double") / F.count("*"), 6).alias("bounce_rate"),
    )


# Path analysis: the top navigation trigrams (event_type -> next -> next)
# per user journey — the product-analytics "what do users do next"
# query. One partitioned window (user_id) produces both lookaheads in a
# single WindowExec; the path aggregate then runs on trigram-cardinality
# rows. Emitting the full deterministic path->count table (no top-k
# cutoff) keeps the result order-insensitively hashable.
@query(
    "events_path_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = tbl(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling median — the robust-smoothing window op (rolling mean is one
# outlier away from useless on monitoring/financial series). Spark has no
# percentile window aggregate, so the frame (a CONSTANT 7 rows) is
# collected per row, sorted, and indexed — bounded arrays inside
# whole-stage codegen, not a UDF. The oracle mirrors the construction
# (list → list_sort → middle) rather than DuckDB's median(), so both
# engines run the identical interpolation arithmetic. At 100 TB the
# shuffle is the window's partitionBy(custkey); the per-row array work is
# O(frame²·log) with frame = 7, a constant.
# ---------------------------------------------------------------------------

ROLLING_MEDIAN_FRAME = 7  # current row + 6 preceding


@query(
    "window_rolling_median",
    oracle=f"""
    WITH w AS (
        SELECT o_custkey, o_orderkey,
               list_sort(list(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN {ROLLING_MEDIAN_FRAME - 1} PRECEDING
                        AND CURRENT ROW)) AS arr
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(len(arr) AS INTEGER) AS frame_n,
           ROUND(CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
                ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
           END, 6) AS rolling_median
    FROM w
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-(ROLLING_MEDIAN_FRAME - 1), 0)
    )
    arr = F.array_sort(F.collect_list("o_totalprice").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise((lo + hi) / 2.0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        n.cast("int").alias("frame_n"),
        F.round(med, 6).alias("rolling_median"),
    )
