"""Join suite (SURVEY §2B): inner/left/right/full/semi/anti equi-joins,
broadcast, cross, theta (non-equi), range, self, and as-of.

The reference has NO join operator — joins happen as Python-side dict lookups
inside job bodies. Here every variant is a Catalyst-planned join:

- equi-joins: sort-merge by default, broadcast when a side fits the threshold,
  AQE converts to shuffled-hash / handles skew at runtime.
- semi/anti: dedicated LeftSemi/LeftAnti — no payload materialization of the
  right side (also the dedup-ledger pattern, SURVEY §2A#19).
- theta/range: BroadcastNestedLoop only when one side is small (we keep the
  build side a dim); range predicates piggyback on an equi-key wherever
  possible so the executor does a hash probe + residual filter, not O(n²).
- as-of: implemented shuffle-once via union + running `last(ignorenulls)`
  window — the 100 TB-safe pattern (no pairwise blowup, one exchange on the
  partition key), vs. the naive join+max-per-key double shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bert_etl_spark.functions.deterministic import dsum, sql_dsum
from bert_etl_spark.functions.temporal import epoch_millis
from bert_etl_spark.operators.registry import query, tbl


@query(
    "join_inner",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_lines,
           {sql_dsum('l_extendedprice')} AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "total_price"))
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(l.l_orderkey) AS n_matched
    FROM lineitem l RIGHT JOIN orders o
      ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    GROUP BY o.o_orderpriority
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_returnflag == "R")
    return (
        li.join(o, cond, "right")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"), F.count("l_orderkey").alias("n_matched"))
    )


# Full outer of two pre-aggregated sides: aggregate-then-join keeps the outer
# join tiny regardless of fact size (100 TB-safe ordering of operators).
@query(
    "join_full",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        tbl(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        tbl(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cust.join(supp, "nationkey", "full").select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    urgent = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# Left-anti = the reference's ETLState dedup-ledger membership test
# (`bert/etl/__init__.py:71-80`): "rows not already in the state table".
@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# Theta self-join within a brand: the equi-key (brand) bounds the quadratic
# term to within-group pairs — the scalable form of a non-equi join.
@query(
    "join_theta",
    oracle="""
    SELECT a.p_brand, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size < b.p_size
    GROUP BY a.p_brand
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = tbl(spark, sf_dir, "part").select("p_brand", "p_size")
    b = tbl(spark, sf_dir, "part").select(
        F.col("p_brand").alias("b_brand"), F.col("p_size").alias("b_size")
    )
    return (
        a.join(b, (a.p_brand == F.col("b_brand")) & (a.p_size < F.col("b_size")))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_pairs"))
    )


# Range join riding an equi-key: hash probe on orderkey + residual timestamp
# band filter. Never a nested-loop at any scale.
@query(
    "join_range",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_quick_ships
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_quick_ships"))
    )


# As-of join: for each 'error' event, the value of the user's most recent
# 'purchase' at-or-before it. Single shuffle on user_id; the running
# last(ignorenulls) window replaces a pairwise time join. DuckDB oracle uses
# its native ASOF JOIN.
@query(
    "join_asof",
    oracle="""
    WITH errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.ts, p.value AS last_purchase_value
    FROM errors e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("purchase_value"),
    )
    # purchases sort before errors at equal ts so an exactly-simultaneous
    # purchase is visible to the error row (ASOF's >= semantics).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.desc("is_purchase"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn(
            "last_purchase_value", F.last("purchase_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 0)
        .select("event_id", "user_id", "ts", "last_purchase_value")
    )


# Forward as-of join (pandas merge_asof direction='forward'): for each
# 'error' event, the value of the user's NEXT 'purchase' at-or-after it.
# Mirror image of join_asof — the carry flips to first(ignorenulls) over
# [current row, unbounded following]; still ONE shuffle on user_id, no
# pairwise time join. Tie rule: errors sort before purchases at equal ts
# (is_purchase ascending) so a simultaneous purchase is visible forward.
@query(
    "join_asof_forward",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
               CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events WHERE event_type IN ('error', 'purchase')
    )
    SELECT event_id, user_id, ts, next_purchase_value FROM (
        SELECT event_id, user_id, ts, is_purchase,
               FIRST_VALUE(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_value
        FROM tagged
    ) WHERE is_purchase = 0
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "next_purchase_value", F.first("pv", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 0)
        .select("event_id", "user_id", "ts", "next_purchase_value")
    )


# Pure non-equi join (no equi key at all) → BroadcastNestedLoopJoin with the
# small side as build. Legitimate ONLY when one side is dim-sized; at 100 TB
# you either find a blocking key (see join_theta) or bucketize the range.
@query(
    "join_nonequi_bnl",
    oracle="""
    SELECT s.s_suppkey, COUNT(c.c_custkey) AS n_close
    FROM supplier s LEFT JOIN customer c
      ON abs(c.c_acctbal - s.s_acctbal) < 25
    GROUP BY s.s_suppkey
    """,
)
def join_nonequi_bnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = tbl(spark, sf_dir, "supplier")
    c = tbl(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(s), F.abs(c.c_acctbal - s.s_acctbal) < 25, "right")
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n_close"))
    )


# MERGE/upsert emulation (no Delta in this image): full-outer on the key +
# CASE per column — the SCD-style pattern for dims. At scale the target
# would be bucketed on the key so repeated merges co-locate.
@query(
    "merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT o_custkey AS c_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS new_bal
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, u.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.new_bal ELSE c.c_acctbal END AS acctbal,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN u.c_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.functions.deterministic import dsum

    updates = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("u_custkey"))
        .agg(dsum("o_totalprice", "new_bal"))
    )
    c = tbl(spark, sf_dir, "customer")
    return c.join(updates, c.c_custkey == updates.u_custkey, "full").select(
        F.coalesce("c_custkey", "u_custkey").alias("c_custkey"),
        F.when(F.col("u_custkey").isNotNull(), F.col("new_bal"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("u_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.c_mktsegment
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = tbl(spark, sf_dir, "region").select("r_name")
    segs = tbl(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    # explicit broadcast: segs is a handful of distinct values; BroadcastNLJ
    # keeps the cross product shuffle-free regardless of stats availability
    return r.crossJoin(F.broadcast(segs))


# Self-join: same-customer order pairs in the same calendar month.
@query(
    "join_self",
    oracle="""
    SELECT CAST(date_trunc('month', a.o_orderdate) AS TIMESTAMP) AS order_month, COUNT(*) AS n_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND date_trunc('month', a.o_orderdate) = date_trunc('month', b.o_orderdate)
    GROUP BY 1
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_custkey").alias("a_cust"),
        F.col("o_orderkey").alias("a_key"),
        F.date_trunc("month", "o_orderdate").alias("a_month"),
    )
    b = o.select(
        F.col("o_custkey").alias("b_cust"),
        F.col("o_orderkey").alias("b_key"),
        F.date_trunc("month", "o_orderdate").alias("b_month"),
    )
    return (
        a.join(
            b,
            (F.col("a_cust") == F.col("b_cust"))
            & (F.col("a_key") < F.col("b_key"))
            & (F.col("a_month") == F.col("b_month")),
        )
        .groupBy(F.col("a_month").alias("order_month"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Salted join, registered form: identical result to the plain equi-join
# (the oracle IS the plain join), but the fact side carries a
# deterministic xxhash64 salt and the dim side is replicated salt-ways,
# spreading any hot l_suppkey over `buckets` tasks. This is the explicit
# fallback for skew that AQE's runtime splitting can't fix (e.g. a
# pre-partitioned layout it must respect, or skewed aggregate groups).
# ---------------------------------------------------------------------------


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT s.s_name, COUNT(*) AS n_items, {sql_dsum('l.l_extendedprice')} AS volume
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.functions.skew import salted_join

    li = tbl(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = tbl(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(li, sup, on=["l_suppkey"], buckets=8)
    return joined.groupBy("s_name").agg(
        F.count("*").alias("n_items"), dsum("l_extendedprice", "volume")
    )


# ADVISOR-driven salted join (round-10 verdict ask #4): join_skew_salted
# guesses a uniform bucket constant; here the per-key salt factors come
# from the MEASURED key histogram (functions.skew.advised_salt_plan — the
# profile_salt_advisor computation in join-able form), so each hot key
# gets exactly the parallelism the measurement says it needs and the cold
# tail pays zero dim replication. Demonstrated on orders.o_orderpriority —
# the advisor's own demo key, where all 5 keys exceed one average task's
# budget. The oracle is the PLAIN join: salting must be result-invisible.
# Skewed-replica measurement (advised vs uniform vs unsalted) lives in
# tools/r11_measurements.py `salt`; numbers in SCALING.md round 11.
@query(
    "join_salted_advised",
    oracle=f"""
    WITH dim AS (
        SELECT DISTINCT o_orderpriority AS pri,
               CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS urgency
        FROM orders
    )
    SELECT d.pri AS o_orderpriority, d.urgency,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o.o_totalprice / d.urgency')} AS weighted_volume
    FROM orders o JOIN dim d ON o.o_orderpriority = d.pri
    GROUP BY 1, 2
    """,
)
def join_salted_advised(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.functions.skew import (
        advised_salt_plan,
        advised_salted_join,
    )

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn(
            "urgency", F.substring("o_orderpriority", 1, 1).cast("int")
        )
    )
    plan = advised_salt_plan(orders, "o_orderpriority", 32)
    joined = advised_salted_join(orders, dim, "o_orderpriority", plan)
    return joined.groupBy("o_orderpriority", "urgency").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dsum(F.col("o_totalprice") / F.col("urgency"), "weighted_volume"),
    )


ASOF_TOLERANCE_MS = 3_600_000  # 1 hour


# As-of join WITH TOLERANCE (pandas merge_asof(tolerance=...) semantics):
# the carried match is discarded when it is older than the tolerance
# window. Same single window carry as join_asof — the stale-match filter
# is a post-projection, so the tolerance costs nothing extra; the oracle
# keeps DuckDB's native ASOF join and nulls stale matches after the fact.
@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN epoch_ms(e.ts) - epoch_ms(p.ts) <= {ASOF_TOLERANCE_MS}
                THEN p.value END AS recent_purchase_value
    FROM errors e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
        F.when(
            F.col("event_type") == "purchase", epoch_millis("ts")
        ).alias("purchase_ms"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.desc("is_purchase"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried_v = F.last("purchase_value", ignorenulls=True).over(w)
    carried_ms = F.last("purchase_ms", ignorenulls=True).over(w)
    gap_ok = (epoch_millis("ts") - carried_ms) <= ASOF_TOLERANCE_MS
    return (
        tagged.withColumn(
            "recent_purchase_value", F.when(gap_ok, carried_v)
        )
        .filter(F.col("is_purchase") == 0)
        .select("event_id", "user_id", "ts", "recent_purchase_value")
    )


# Fuzzy entity resolution: match dirty names (one character deleted —
# derived deterministically from an md5-sampled slice) back to the master
# list by Levenshtein distance, WITHOUT the all-pairs cross join. The
# blocking key is the scale guard — and choosing it is THE design
# decision: these names share a constant prefix ("Customer#..."), so
# prefix blocking degenerates to one giant block and an all-pairs
# verify (measured: 160s at sf0.1 = the hot-block failure mode).
# The SUFFIX is discriminative (trailing id digits) and invariant under
# the mid-string deletion, so right(name, 4) yields ~uniform tiny blocks
# and the Levenshtein verify runs on O(block²)≈O(1) pairs per record —
# the blocking-then-verify shape every dedup/ER system uses, with the
# block-key selectivity check that must precede it. A rank window keeps
# the single best match per dirty record (tiebreak: distance, custkey).
@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH dirty AS (
        SELECT c_custkey AS dirty_key,
               substr(c_name, 1, 10) || substr(c_name, 12) AS dirty_name
        FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '4'
    ),
    cand AS (
        SELECT d.dirty_key, d.dirty_name, c.c_custkey AS match_key,
               levenshtein(d.dirty_name, c.c_name) AS dist
        FROM dirty d JOIN customer c
          ON right(d.dirty_name, 4) = right(c.c_name, 4)
        WHERE levenshtein(d.dirty_name, c.c_name) <= 2
    )
    SELECT dirty_key, dirty_name, match_key, CAST(dist AS INTEGER) AS dist
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_key
                                     ORDER BY dist, match_key) AS rn
        FROM cand
    ) WHERE rn = 1
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    dirty = cust.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) < "4"
    ).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.substring("c_name", 1, 10), F.expr("substring(c_name, 12)")
        ).alias("dirty_name"),
    )
    cand = (
        dirty.join(
            cust.select("c_custkey", "c_name"),
            F.substring("dirty_name", -4, 4) == F.substring("c_name", -4, 4),
        )
        .withColumn("dist", F.levenshtein("dirty_name", "c_name"))
        .filter(F.col("dist") <= 2)
    )
    w = W.partitionBy("dirty_key").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dirty_key",
            "dirty_name",
            F.col("c_custkey").alias("match_key"),
            "dist",
        )
    )


BLOOM_BITS = 4096   # filter size (positions)
BLOOM_HASHES = 3    # md5 slices per key
BLOOM_NATION_MAX = 5  # dim subset: suppliers with s_nationkey < 5


def _bloom_pos_spark(col, j: int):
    """Bloom position j for a key: an 8-hex md5 slice → BIGINT % bits.
    Deterministic (the minhash md5-slicing idiom), so the DuckDB oracle
    builds the bit-identical filter."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1 + 8 * j, 8), 16, 10)
        .cast("long") % BLOOM_BITS
    )


def _bloom_pos_sql(expr: str, j: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), {1 + 8 * j}, 8)) "
        f"AS BIGINT) % {BLOOM_BITS})"
    )


# Bloom-prefilter join — the scan-side pruning pattern for selective
# fact ⋈ dim joins at 100 TB: build a fixed-size Bloom filter over the
# dim's join keys, drop fact rows whose keys cannot match BEFORE the
# shuffle, then run the exact join on the survivors. The filter is a
# position SET (distinct md5-slice positions of every dim key, broadcast
# — O(bits) regardless of dim size); a fact key passes iff all K of its
# positions are present (per-key count == K over a broadcast join — the
# bitmap-free distributed formulation). False positives only add rows the
# exact join re-drops; false negatives are impossible, which the oracle
# checks end-to-end by computing the identical filter AND the final
# aggregate. Output is the audit row a tuner reads: total fact keys,
# keys passing the filter, keys truly matching (selectivity vs false-
# positive rate), and the joined revenue. Spark's own runtime bloom
# (spark.sql.optimizer.runtime.bloomFilter.enabled) does this inside AQE
# with an opaque hash; this operator is the portable, value-checkable
# form of the same plan shape.
@query(
    "join_bloom_prefilter",
    oracle=f"""
    WITH dim AS (
        SELECT s_suppkey FROM supplier WHERE s_nationkey < {BLOOM_NATION_MAX}
    ),
    bloom AS (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(
                f"SELECT {_bloom_pos_sql('s_suppkey', j)} AS pos FROM dim"
                for j in range(BLOOM_HASHES)
            )}
        )
    ),
    fact_keys AS (SELECT DISTINCT l_suppkey FROM lineitem),
    passed AS (
        SELECT l_suppkey FROM (
            SELECT f.l_suppkey, COUNT(*) AS hits
            FROM (
                {" UNION ALL ".join(
                    f"SELECT l_suppkey, {_bloom_pos_sql('l_suppkey', j)} AS pos "
                    f"FROM fact_keys"
                    for j in range(BLOOM_HASHES)
                )}
            ) f JOIN bloom USING (pos)
            GROUP BY 1
        ) WHERE hits = {BLOOM_HASHES}
    ),
    matched AS (SELECT l_suppkey FROM passed JOIN dim ON l_suppkey = s_suppkey)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fact_keys) AS n_fact_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed) AS n_bloom_passed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_matched,
           (SELECT ROUND({sql_dsum('l.l_extendedprice')}, 2)
            FROM lineitem l JOIN matched m ON l.l_suppkey = m.l_suppkey)
               AS matched_revenue
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    dim = (
        tbl(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < BLOOM_NATION_MAX)
        .select("s_suppkey")
    )
    bloom = None
    for j in range(BLOOM_HASHES):
        part = dim.select(_bloom_pos_spark(F.col("s_suppkey"), j).alias("pos"))
        bloom = part if bloom is None else bloom.unionByName(part)
    bloom = bloom.distinct()
    fact_keys = li.select("l_suppkey").distinct()
    probes = None
    for j in range(BLOOM_HASHES):
        part = fact_keys.select(
            "l_suppkey", _bloom_pos_spark(F.col("l_suppkey"), j).alias("pos")
        )
        probes = part if probes is None else probes.unionByName(part)
    passed = (
        probes.join(F.broadcast(bloom), "pos")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == BLOOM_HASHES)
        .select("l_suppkey")
    )
    matched = passed.join(
        F.broadcast(dim), passed["l_suppkey"] == dim["s_suppkey"], "left_semi"
    )
    revenue = (
        li.join(F.broadcast(matched), "l_suppkey")
        .agg(F.round(dsum("l_extendedprice"), 2).alias("matched_revenue"))
    )
    counts = (
        fact_keys.agg(F.count("*").alias("n_fact_keys"))
        .crossJoin(passed.agg(F.count("*").alias("n_bloom_passed")))
        .crossJoin(matched.agg(F.count("*").alias("n_matched")))
    )
    return counts.crossJoin(revenue).select(
        "n_fact_keys", "n_bloom_passed", "n_matched", "matched_revenue"
    )
