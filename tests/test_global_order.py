"""Distributed exact global-order primitives vs single-task window truth.

The helpers must agree with Spark's own global windows bit-for-bit — the
whole point is identical semantics with a scalable plan — so each test
computes the reference answer WITH the (test-only) empty-partition window
and compares.

The helpers are ADAPTIVE (global_order module docstring): below the
``smallRows`` threshold they collapse to a deliberate single-partition
window, above it they run the distributed range-exchange + offsets form.
The ``go_branch`` fixture runs every semantics test under BOTH branches
by forcing the threshold to 0 (strict ``<``, so everything goes
distributed) or leaving the default (test inputs are tiny, so everything
goes small).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bert_etl_spark.operators.global_order import (
    SMALL_ROWS_CONF,
    with_global_cumsum,
    with_global_rank,
    with_ntile,
    with_ntile_multi,
)


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(params=["small", "distributed"])
def go_branch(request, spark):
    """Run the test under each adaptive branch of global_order."""
    if request.param == "distributed":
        spark.conf.set(SMALL_ROWS_CONF, "0")
    try:
        yield request.param
    finally:
        spark.conf.unset(SMALL_ROWS_CONF)


def test_global_rank_matches_window(spark, go_branch):
    rows = [(i, float((i * 37) % 101)) for i in range(500)]
    df = _df(spark, rows)
    got = {
        r["k"]: r["r"]
        for r in with_global_rank(df, [F.asc("v"), F.asc("k")], "r").collect()
    }
    want = {
        r["k"]: r["r"]
        for r in df.withColumn(
            "r", F.row_number().over(W.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_window(spark, go_branch):
    # integer value column: the helper's contract (corpus token budgets);
    # float cumsums are fold-order-sensitive in ANY distributed plan
    rows = [(i, (i * 11) % 7 + 1) for i in range(300)]
    df = _df(spark, rows, "k long, v long")
    got = {
        r["k"]: r["c"]
        for r in with_global_cumsum(df, [F.desc("v"), F.asc("k")], "v", "c").collect()
    }
    want = {
        r["k"]: r["c"]
        for r in df.withColumn(
            "c",
            F.sum("v").over(
                W.orderBy(F.desc("v"), "k").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        ).collect()
    }
    assert got == want


def test_ntile_matches_window_all_bucket_counts(spark, go_branch):
    rows = [(i, float((i * 13) % 29)) for i in range(101)]  # N=101: uneven tiles
    df = _df(spark, rows)
    for n in (2, 5, 10, 7):
        got = {
            r["k"]: r["t"]
            for r in with_ntile(df, n, [F.asc("v"), F.asc("k")], "t").collect()
        }
        want = {
            r["k"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(n).over(W.orderBy("v", "k"))
            ).collect()
        }
        assert got == want, f"ntile({n}) diverges"


def test_ntile_fewer_rows_than_tiles(spark, go_branch):
    df = _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)])
    got = sorted(
        (r["k"], r["t"])
        for r in with_ntile(df, 10, [F.asc("v"), F.asc("k")], "t").collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]  # each row its own tile, q=0 branch


def test_empty_input(spark, go_branch):
    df = _df(spark, [], "k long, v double")
    assert with_global_rank(df, [F.asc("v"), F.asc("k")], "r").count() == 0
    assert with_global_cumsum(df, [F.asc("v")], "v", "c").count() == 0
    assert with_ntile(df, 4, [F.asc("v")], "t").count() == 0


def test_rank_plan_has_no_global_window(spark, go_branch):
    """NEITHER branch may contain an empty-partition-spec window: the
    distributed branch partitions by range-partition id, the small branch
    by the (constant but attribute-bound) partition id of a deliberate
    single-partition exchange."""
    from tests.test_plans import _empty_partition_windows

    df = _df(spark, [(i, float(i)) for i in range(50)])
    ranked = with_global_rank(df, [F.asc("v"), F.asc("k")], "r")
    assert _empty_partition_windows(ranked) == []


def test_adaptive_switch_picks_the_right_plan(spark):
    """Pin the threshold semantics: rows < smallRows -> single-partition
    plan (no range exchange); threshold forced to 0 -> distributed plan
    (range exchange present). Protects against silently losing either
    branch."""
    df = _df(spark, [(i, float(i % 13)) for i in range(200)])

    # the range exchange itself hides inside the persisted subtree
    # (InMemoryRelation), so the branch marker is the offsets machinery:
    # only the distributed form joins a __go_offset column back in.
    small_plan = (
        with_global_rank(df, [F.asc("v"), F.asc("k")], "r")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "__go_offset" not in small_plan, small_plan
    assert "Repartition 1" in small_plan, small_plan

    spark.conf.set(SMALL_ROWS_CONF, "0")
    try:
        big_plan = (
            with_global_rank(df, [F.asc("v"), F.asc("k")], "r")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
    finally:
        spark.conf.unset(SMALL_ROWS_CONF)
    assert "__go_offset" in big_plan, big_plan


def test_two_level_prefix_across_blocks(spark):
    """More range partitions than one offset block (600 > _BLOCK=256): the
    block-offset + within-block-offset composition must still reproduce
    exact global ranks. Forces the distributed branch — the partitions
    override only exists there."""
    from bert_etl_spark.operators.global_order import _BLOCK

    df = _df(spark, [(i, float((i * 37) % 997)) for i in range(5000)])
    spark.conf.set(SMALL_ROWS_CONF, "0")
    try:
        got = {
            r["k"]: r["r"]
            for r in with_global_rank(
                df, [F.asc("v"), F.asc("k")], "r", partitions=2 * _BLOCK + 88
            ).collect()
        }
    finally:
        spark.conf.unset(SMALL_ROWS_CONF)
    want = {
        r["k"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(W.orderBy("v", "k"))).collect()
    }
    assert got == want


def test_ntile_multi_matches_three_windows(spark, go_branch):
    """with_ntile_multi under three orderings (asc, desc via negation) must
    equal three independent ntile windows — one range exchange replacing
    three chained passes is a plan change, not a semantics change."""
    rows = [(i, float((i * 13) % 29), (i * 7) % 11, float((i * 31) % 17)) for i in range(101)]
    df = spark.createDataFrame(rows, "k long, a double, b long, c double")
    got = {
        r["k"]: (r["ta"], r["tb"], r["tc"])
        for r in with_ntile_multi(
            df,
            5,
            [("ta", F.col("a")), ("tb", -F.col("b")), ("tc", -F.col("c"))],
            "k",
        ).collect()
    }
    want = {
        r["k"]: (r["ta"], r["tb"], r["tc"])
        for r in df.withColumn("ta", F.ntile(5).over(W.orderBy("a", "k")))
        .withColumn("tb", F.ntile(5).over(W.orderBy(F.desc("b"), "k")))
        .withColumn("tc", F.ntile(5).over(W.orderBy(F.desc("c"), "k")))
        .collect()
    }
    assert got == want


def test_ntile_multi_keeps_payload_and_plan_clean(spark, go_branch):
    from tests.test_plans import _empty_partition_windows

    df = spark.createDataFrame(
        [(i, float(i % 7), i * 2) for i in range(40)], "k long, a double, pay long"
    )
    out = with_ntile_multi(df, 4, [("t", F.col("a"))], "k")
    assert set(out.columns) == {"k", "a", "pay", "t"}
    assert _empty_partition_windows(out) == []
    # payload survives the fold intact
    assert {r["k"]: r["pay"] for r in out.collect()} == {i: i * 2 for i in range(40)}


def test_adaptive_probe_opt_out_is_lazy(spark):
    """With spark.bert_etl.globalOrder.adaptive=false, CONSTRUCTING a
    global-order plan must run zero Spark jobs (plan-only contexts:
    catalog explain, plan sweeps) — and must still build the distributed
    branch (no empty-partition window). The default (adaptive) path runs
    its probe jobs eagerly, which keeps this assertion non-vacuous."""
    from bert_etl_spark.operators.global_order import ADAPTIVE_CONF
    from tests.test_plans import _empty_partition_windows

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    st = spark.sparkContext.statusTracker()
    spark.conf.set(ADAPTIVE_CONF, "false")
    try:
        before = len(st.getJobIdsForGroup(None))
        out = with_global_rank(df, [F.col("a"), F.col("k")], "r")
        assert len(st.getJobIdsForGroup(None)) == before  # lazy: no jobs
        assert _empty_partition_windows(out) == []
    finally:
        spark.conf.unset(ADAPTIVE_CONF)
    # default path probes eagerly (jobs run at construction) — proves the
    # job-count assertion above can actually detect eager work
    before = len(st.getJobIdsForGroup(None))
    out2 = with_global_rank(df, [F.col("a"), F.col("k")], "r")
    assert len(st.getJobIdsForGroup(None)) > before
    # both constructions produce identical results
    got = [(r.k, r.r) for r in out.orderBy("k").collect()]
    want = [(r.k, r.r) for r in out2.orderBy("k").collect()]
    assert got == want
