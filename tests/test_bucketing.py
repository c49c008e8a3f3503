"""Bucketed tables co-locate joins: no Exchange in the physical plan.

The 100 TB pattern for repeated joins on the same key (fact⋈fact, repeated
merges, the dedup ledger): write both sides bucketed+sorted on the key and
the sort-merge join runs with zero shuffle on either side.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a = spark.range(10_000).withColumn("v", F.col("id") * 2)
        b = spark.range(10_000).withColumn("w", F.col("id") * 3)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        (a.write.bucketBy(8, "id").sortBy("id")
          .option("path", str(tmp_path / "ta")).saveAsTable("bkt_a"))
        (b.write.bucketBy(8, "id").sortBy("id")
          .option("path", str(tmp_path / "tb")).saveAsTable("bkt_b"))

        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == 10_000

        # control: the same join on unbucketed data DOES shuffle
        plain = a.join(b, "id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy layout → partition pruning: a filtered read lists only
    the matching directory."""
    path = str(tmp_path / "part")
    (spark.range(1000)
        .withColumn("bucket", (F.col("id") % 4).cast("int"))
        .write.partitionBy("bucket").parquet(path))
    one = spark.read.parquet(path).filter(F.col("bucket") == 2)
    assert one.count() == 250
    files = one.select(F.input_file_name()).distinct().collect()
    assert all("bucket=2" in r[0] for r in files)


def test_copurchase_edges_bucketed_input_no_sort_no_join_exchange(spark, tmp_path):
    """With spark.bert_etl.graph.lineitemTable pointing at the bucketed
    at-rest lineitem projection, the co-purchase self-join must run with
    ZERO Sort and only the groupBy's single Exchange (measured 90.8 s vs
    214.6 s plain at the 100x replica) — and produce the identical edge
    set as the plain parquet path."""
    from bert_etl_spark.operators.advanced import (
        GRAPH_LINEITEM_TABLE_CONF,
        _copurchase_edge_plan,
        _lineitem_for_edges,
        bucketize_lineitem,
    )

    sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bkt_test")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        bucketize_lineitem(spark, sf, table="li_bkt_test", n_buckets=4)
        plain = sorted(
            (r.u, r.v)
            for r in _copurchase_edge_plan(
                _lineitem_for_edges(spark, sf)
            ).collect()
        )
        spark.conf.set(GRAPH_LINEITEM_TABLE_CONF, "li_bkt_test")
        df = _copurchase_edge_plan(_lineitem_for_edges(spark, sf))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Sort ") == 0, plan
        # the one remaining Exchange belongs to the (u, v) aggregation,
        # never the join inputs
        assert plan.count("Exchange") <= 2, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        bucketed = sorted((r.u, r.v) for r in df.collect())
        assert bucketed == plain and len(plain) > 0
    finally:
        spark.conf.unset(GRAPH_LINEITEM_TABLE_CONF)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("DROP TABLE IF EXISTS li_bkt_test")


def test_bucketed_lineitem_survives_catalog_loss(spark, tmp_path):
    """Session-survival for the at-rest edge-build input (round-10 ask
    #3): bucketize_lineitem(location=...) writes an EXTERNAL bucketed
    table; after the catalog entry is gone (DROP TABLE on an external
    table removes metadata only — the honest stand-in for a new JVM,
    since the test harness's in-memory catalog is shared across
    newSession()), register_bucketed_lineitem restores the table from the
    files alone and the self-join plans 0-sort/0-join-exchange again with
    identical results."""
    from bert_etl_spark.operators.advanced import (
        GRAPH_LINEITEM_TABLE_CONF,
        _copurchase_edge_plan,
        _lineitem_for_edges,
        bucketize_lineitem,
        register_bucketed_lineitem,
    )

    sf = "/root/testdata/sf0.001"
    loc = str(tmp_path / "li_external")
    spark.sql("DROP TABLE IF EXISTS li_bkt_ext")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def _edges():
        df = _copurchase_edge_plan(_lineitem_for_edges(spark, sf))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Sort ") == 0, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        return sorted((r.u, r.v) for r in df.collect())

    try:
        bucketize_lineitem(
            spark, sf, table="li_bkt_ext", n_buckets=4, location=loc
        )
        spark.conf.set(GRAPH_LINEITEM_TABLE_CONF, "li_bkt_ext")
        session_one = _edges()
        assert len(session_one) > 0

        # "new JVM": catalog entry gone, files remain
        spark.conf.unset(GRAPH_LINEITEM_TABLE_CONF)
        spark.sql("DROP TABLE li_bkt_ext")
        import os

        assert os.path.isdir(loc) and os.listdir(loc)

        register_bucketed_lineitem(
            spark, loc, table="li_bkt_ext", n_buckets=4
        )
        assert (
            spark.conf.get(GRAPH_LINEITEM_TABLE_CONF) == "li_bkt_ext"
        )
        assert _edges() == session_one
    finally:
        spark.conf.unset(GRAPH_LINEITEM_TABLE_CONF)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("DROP TABLE IF EXISTS li_bkt_ext")
