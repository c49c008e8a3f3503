"""Physical-plan regression tests: the scale properties that must not rot.

These assert on explain output, not results — a correct-but-shuffling plan
is a performance bug at 100 TB even when values match.
"""

from __future__ import annotations

import pytest

from bert_etl_spark.operators import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.ALL_QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # lineitem scan must read only the 4 needed columns of 11
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,l_shipdate" in plan
    assert "BroadcastHashJoin" in plan


def test_dim_joins_broadcast_not_shuffle(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_anti_use_dedicated_join_types(spark):
    assert "LeftSemi" in _plan(spark, "join_semi")
    assert "LeftAnti" in _plan(spark, "join_anti")


def test_topk_per_group_uses_group_limit(spark):
    # Spark >= 3.5 pushes rank<=k down as WindowGroupLimit before the shuffle
    plan = _plan(spark, "window_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_global_topn_avoids_total_sort(spark):
    plan = _plan(spark, "sort_limit_topn")
    assert "TakeOrderedAndProject" in plan


def test_filter_project_reads_minimal_schema(spark):
    plan = _plan(spark, "filter_project")
    assert "PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_discount)" in plan
    assert "struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double," in plan


def test_nonequi_bnl_builds_small_side(spark):
    plan = _plan(spark, "join_nonequi_bnl")
    assert "BroadcastNestedLoopJoin" in plan


def test_no_python_udfs_in_relational_operators(spark):
    """The relational/dedup/text surface must stay JVM-side (whole-stage
    codegen); Python only at the explicitly-pandas operators."""
    for name in [
        "pricing_summary",
        "dedup_minhash_lsh",
        "text_tfidf_top_terms",
        "sim_topk_bruteforce",
        "window_sessionize",
    ]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name


def test_aggregates_run_partial_before_exchange(spark):
    """Map-side combine: partial_sum/partial_count must appear below the
    exchange so only O(groups) state shuffles."""
    plan = _plan(spark, "pricing_summary")
    assert "partial_sum" in plan and "partial_count" in plan


def test_q19_disjunctive_stays_hash_join(spark):
    # Catalyst must extract the common p_partkey=l_partkey equi-condition
    # from the OR branches — a nested-loop here is quadratic at scale
    plan = _plan(spark, "tpch_q19_disjunctive")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_pushes_all_filters_to_scan(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    # explain truncates the PushedFilters list; assert the prefix proves
    # all three predicate columns reached the scan
    assert (
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"
        in plan
    )
    # column pruning: exactly the four needed columns
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    )


def test_q18_aggregates_before_join(spark):
    # HashAggregate on lineitem must appear BELOW the join with orders —
    # the 100 TB shuffle-shrinker
    plan = _plan(spark, "tpch_q18_large_volume")
    join_pos = plan.find("Join")
    agg_pos = plan.find("HashAggregate")
    assert agg_pos != -1 and join_pos != -1
    # executedPlan prints top-down: the join node precedes (is above) the
    # fact aggregate feeding it
    assert join_pos < plan.rfind("HashAggregate")


def test_q5_broadcasts_all_dims(spark):
    plan = _plan(spark, "tpch_q5_local_supplier")
    # four dims broadcast; the only shuffle join (if any) is lineitem⋈orders
    assert plan.count("BroadcastHashJoin") >= 4


def test_rolling_range_single_window_exchange(spark):
    # one hashpartitioning exchange on o_custkey feeds the range-frame
    # window — no extra repartition
    plan = _plan(spark, "window_rolling_range")
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1


def test_sample_pushes_hash_predicate(spark):
    # the md5-prefix predicate is a row-level filter right above the scan —
    # no shuffle before the aggregate's own exchange
    plan = _plan(spark, "sample_hash_deterministic")
    assert plan.count("Exchange") <= 2  # partial/final agg only


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key into the same
    bucket count join WITHOUT any Exchange — the physical layout already
    partitions both sides identically. At 100 TB this is THE lever for a
    repeatedly-joined fact pair: pay the shuffle once at write time, never
    at read time."""
    from pyspark.sql import functions as F

    orders = registry.tbl(spark, SF, "orders")
    lineitem = registry.tbl(spark, SF, "lineitem")
    # at test SF everything fits the broadcast threshold, which would hide
    # the co-location (a broadcast join never shuffles anyway); disable it
    # to see the plan a 100 TB fact-fact join would get
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
               .mode("overwrite").saveAsTable("bkt_orders"))
        (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
                 .mode("overwrite").saveAsTable("bkt_lineitem"))
        joined = (
            spark.table("bkt_lineitem")
            .join(
                spark.table("bkt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_section, plan
        # bucket pruning metadata visible in the scan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        # and the result is still correct
        n = dict(joined.collect())
        want = dict(
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert {r: n[r] for r in n} == {r: want[r] for r in want}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_triangle_count_never_nested_loops(spark):
    # the wedge-closing probe must stay a hash equi-join: the (degree, id)
    # total order fixes the closing edge's orientation, so no OR-condition
    # BroadcastNestedLoop should ever appear
    plan = _plan(spark, "graph_triangle_count")
    # single-row summary crossJoins print as "...Join BuildRight, Cross" and
    # are fine; a conditioned nested loop (the OR-join formulation) would
    # print as Inner and is the 100 TB killer
    assert "BroadcastNestedLoopJoin BuildRight, Inner" not in plan
    assert "BroadcastNestedLoopJoin BuildLeft, Inner" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # degree table broadcasts


def test_quantize_broadcasts_scales(spark):
    # pass 2 must consume the 64-float scale vector via broadcast — a
    # shuffle here would re-partition the whole corpus for one tiny row
    plan = _plan(spark, "embedding_quantize_int8")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_profile_single_scan(spark):
    # all five column profiles come from ONE pass over lineitem
    plan = _plan(spark, "profile_columns")
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan  # multi-column exact distinct via Expand


def test_containment_joins_stay_hash(spark):
    # inverted-index + size joins are all equi-keyed; any cartesian here
    # means the df-cap/indexing structure broke
    plan = _plan(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_dau_wau_nested_loop_is_day_bounded(spark):
    # the 7-day range join has no equi key, so a nested loop is expected —
    # but it must BUILD on the tiny day-grid side (BuildLeft), never
    # degenerate to an unbuilt cartesian over the activity table
    plan = _plan(spark, "events_dau_wau")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin BuildLeft, Inner" in plan


def _empty_partition_windows(df) -> list[str]:
    """Walk the optimized logical plan and return every Window/
    WindowGroupLimit node whose partition spec is EMPTY — the
    one-task-gets-every-row shape that serializes a 1000-executor
    cluster onto a single core."""
    bad: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name in ("Window", "WindowGroupLimit"):
            try:
                if node.partitionSpec().isEmpty():
                    bad.append(name)
            except Exception:
                pass
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def test_no_global_windows_anywhere(spark):
    """NO registered query may contain a window with an empty partition
    spec. Global-order semantics (exact ntile / global rank / global
    cumsum) must route through operators/global_order.py, which is
    adaptive: the small branch is a DELIBERATE single-partition window
    partitioned by the physical partition id (non-empty spec, so this
    invariant stays meaningful — an accidental global window still has an
    empty spec), the large branch is fully distributed and is swept by
    test_no_global_windows_distributed_branch below. Streaming queries
    are excluded only because invoking them executes the stream; their
    windows are keyed by construction."""
    offenders = {}
    for name in sorted(registry.ALL_QUERIES):
        if name.startswith("streaming_"):
            continue
        df = registry.ALL_QUERIES[name](spark, SF)
        bad = _empty_partition_windows(df)
        if bad:
            offenders[name] = bad
    assert not offenders, f"global single-task windows found: {offenders}"


# every registered query routing through operators/global_order.py — the
# distributed-branch sweep below must cover each of them
GLOBAL_ORDER_QUERIES = (
    "window_distribution",
    "histogram_equi_depth",
    "events_rfm_segments",
    "text_vocab_coverage",
    "corpus_token_budget_select",
    "corpus_global_shuffle",
)


def test_no_global_windows_distributed_branch(spark):
    """Force the adaptive smallRows threshold to 0 so every global-order
    consumer builds its DISTRIBUTED plan, and re-check the no-empty-
    partition-window invariant there — the branch the sf0.001 sweep above
    no longer reaches."""
    from bert_etl_spark.operators.global_order import SMALL_ROWS_CONF

    spark.conf.set(SMALL_ROWS_CONF, "0")
    try:
        offenders = {}
        for name in GLOBAL_ORDER_QUERIES:
            df = registry.ALL_QUERIES[name](spark, SF)
            bad = _empty_partition_windows(df)
            if bad:
                offenders[name] = bad
    finally:
        spark.conf.unset(SMALL_ROWS_CONF)
    assert not offenders, f"global single-task windows found: {offenders}"


def test_bucketed_join_query_has_no_join_exchange(spark):
    """The REGISTERED bucketed-join query (not just the capability test
    above) must join its bucketed tables with zero Exchange on either
    side — the bucketed layout satisfies the join distribution."""
    df = registry.ALL_QUERIES["source_bucketed_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_section, plan


def test_path_trigrams_single_window(spark):
    """Both lead() lookaheads share one window spec — the plan must contain
    exactly one Window node (a second would mean a duplicated sort)."""
    plan = _plan(spark, "events_path_trigrams")
    assert plan.count("Window ") == 1, plan


def test_substring_cut_has_no_explode(spark):
    # the cut is a higher-order filter over the token array: span DISCOVERY
    # may posexplode the k-windows, but the cut itself must add ZERO
    # Generate nodes — re-exploding the corpus tokens would shuffle
    # |tokens| rows instead of |docs|. The family span table is
    # materialized by checkpoint_once, so the discovery Generates live in
    # the BUILD plan; consumers may carry at most their own discovery
    # (keep-first re-derives occurrence order from the corpus), never more.
    from bert_etl_spark.operators.dedup import duplicated_spans, window_hashes

    build = duplicated_spans(window_hashes(registry.tbl(spark, SF, "documents")))
    discovery_generates = (
        build._jdf.queryExecution().executedPlan().toString().count("Generate ")
    )
    assert discovery_generates >= 1  # the k-window posexplode is real
    for name in ("dedup_substring_remove", "dedup_substring_remove_keep_first"):
        plan = _plan(spark, name)
        assert plan.count("Generate ") <= discovery_generates, name
        assert "array_join(transform(" in plan, name  # HOF cut, not explode
        assert "CartesianProduct" not in plan, name


def test_substring_spans_islands_window_is_doc_partitioned(spark):
    # gaps-and-islands must run per-doc, never as a global window: walk
    # the optimized plan for EMPTY window partition specs (a plan-string
    # token match would be vacuous — physical plans never print
    # "partitionBy", so that assertion could not fail). The merge runs
    # inside the family_spans BUILD (checkpoint_once executes it at
    # construction), so the window properties are asserted on the build
    # plan; the registered query itself scans the materialized spans.
    from bert_etl_spark.operators.dedup import duplicated_spans, window_hashes

    build = duplicated_spans(window_hashes(registry.tbl(spark, SF, "documents")))
    plan = build._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert _empty_partition_windows(build) == []
    assert "HashAggregate" in plan  # dup-window detection is partial-agg'd
    # and the full registered query must never smuggle in a global window
    df = registry.ALL_QUERIES["dedup_substring_spans"](spark, SF)
    assert _empty_partition_windows(df) == []


def test_decontaminate_probe_broadcasts(spark):
    # the eval-gram side must reach the corpus scan as a broadcast — a
    # shuffle join here re-partitions the full corpus against a tiny set
    plan = _plan(spark, "corpus_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_orc_scan_pushes_filter(spark):
    # the ORC reader must engage the same pushdown machinery as parquet
    plan = _plan(spark, "source_orc_scan")
    assert "FileScan orc" in plan
    assert "PushedFilters: [IsNotNull(s_acctbal), GreaterThan(s_acctbal" in plan


def test_partitioned_scan_prunes_partitions(spark):
    # the date range must prune at the DIRECTORY level (PartitionFilters),
    # not as a row-level data filter: at 100 TB this is the difference
    # between reading 7 days and reading the whole table
    plan = _plan(spark, "source_partitioned_scan")
    assert "PartitionFilters: [isnotnull(event_date" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]
    # no pushed row filter on the partition column — pruning happened above
    assert "PushedFilters: []" in plan


def test_pagerank_loop_broadcasts_contributions(spark):
    """Each power iteration must broadcast the |V|-sized contribution
    vector onto the edge list (|V| << |E|) — a shuffle join per iteration
    would re-partition the full edge table k times. The lazy chain means
    all k iterations appear in ONE plan: count the broadcast joins."""
    from bert_etl_spark.operators.advanced import PAGERANK_ITERS

    plan = _plan(spark, "graph_pagerank_k_iters")
    assert plan.count("BroadcastHashJoin") >= PAGERANK_ITERS
    assert "CartesianProduct" not in plan
    # the per-iteration reduction is a partial-agg shuffle, not a sort
    assert "HashAggregate" in plan


def test_dhash_band_join_is_hash_equi_join(spark):
    """dHash banding must stay a hash equi-join on the packed BIGINT band
    slice — never a nested loop, and no Exchange carrying the raw bit
    ARRAY (the round-5 shuffle-volume lesson: only the packed longs may
    cross the wire)."""
    plan = _plan(spark, "multimodal_dedup_phash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # verification ships packed longs; the bit array b is projected away
    # before any exchange
    for line in plan.splitlines():
        if "Exchange" in line:
            assert " b#" not in line, line


def test_maxsim_streams_corpus_with_partial_reductions(spark):
    """Late-interaction MaxSim must score with the query side broadcast
    (corpus streams once, never a CartesianProduct), combine the per-token
    MAX map-side before the exchange, and push the per-query top-k down as
    a group-limit — the three properties that keep the scoring pass
    O(corpus) at 100 TB."""
    plan = _plan(spark, "sim_maxsim_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan
    assert "WindowGroupLimit" in plan


def test_label_propagation_broadcasts_labels_each_round(spark):
    """Each LPA round must broadcast the |V|-sized label vector (the edge
    list shuffles once on its key, never sort-merges against labels) and
    both per-round reductions must combine map-side."""
    from bert_etl_spark.operators.advanced import LPA_ITERS

    plan = _plan(spark, "graph_label_propagation")
    assert plan.count("BroadcastHashJoin") >= LPA_ITERS
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert "partial_max" in plan


def test_maxsim_ivf_probe_is_hash_equi_join(spark):
    """The IVF-accelerated MaxSim must probe via a hash EQUI-join on the
    cell key, keep the per-token MAX map-side, and push the top-k
    group-limit — otherwise the pruned path degenerates back into the
    brute-force corpus pass it exists to avoid."""
    plan = _plan(spark, "sim_maxsim_ivf")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan
    assert "WindowGroupLimit" in plan


def test_maxsim_ivf_assignment_is_at_rest(spark):
    """The corpus x centroid cell assignment must NOT run inside the query:
    the corpus side enters the plan only as the session-materialized
    checkpoint (Scan ExistingRDD), and every parquet scan that remains is
    a query-token/centroid scan with its vec_id predicate pushed down —
    never a full-corpus read. This pins the round-8→9 redesign: a pruned
    path that re-assigns the corpus per query is a full-corpus pass to
    avoid a full-corpus pass."""
    import re

    from bert_etl_spark.operators.similarity import (
        MAXSIM_GROUP,
        MAXSIM_IVF_CENTROIDS,
        MAXSIM_QUERY_DOCS,
    )

    df = registry.ALL_QUERIES["sim_maxsim_ivf"](spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Scan ExistingRDD" in plan  # the at-rest assignment table
    bounds = {MAXSIM_QUERY_DOCS * MAXSIM_GROUP, MAXSIM_IVF_CENTROIDS}
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_parquet = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_parquet == len(pushed) > 0
    for filters in pushed:
        m = re.search(r"LessThan\(vec_id,(\d+)\)", filters)
        assert m, f"parquet scan without a pushed vec_id bound: {filters}"
        assert int(m.group(1)) in bounds


def _outer_shuffles(spark, name: str) -> list[str]:
    """ShuffleExchangeExec nodes in the OUTER plan only — tree-walk stops
    at InMemoryTableScan leaves, so exchanges belonging to already-cached
    builds (which execute zero times on reuse) don't count."""
    df = registry.ALL_QUERIES[name](spark, SF)
    out: list[str] = []

    def walk(node):
        if node.getClass().getSimpleName() == "ShuffleExchangeExec":
            out.append(node.toString().splitlines()[0][:80])
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_iterated_graph_loops_have_zero_per_round_shuffles(spark):
    """The dst-partitioned, eagerly-materialized edge cache (_und_by_dst)
    must make every PageRank/LPA round plan WITHOUT an edge-sized
    exchange: label propagation's returned plan has zero outer shuffles
    (both per-round aggregations and the label init are satisfied by the
    cached HashPartitioning(dst)); the PageRank loop's only outer
    shuffles are the k-independent deg build — never one per iteration."""
    from bert_etl_spark.operators.advanced import PAGERANK_ITERS

    assert _outer_shuffles(spark, "graph_label_propagation") == []
    pr = _outer_shuffles(spark, "graph_pagerank_k_iters")
    # deg (groupBy src) is the one legitimate exchange; anything growing
    # with PAGERANK_ITERS means the per-iteration shuffle came back
    assert len(pr) < PAGERANK_ITERS, pr


def test_graph_loops_fall_back_past_broadcast_node_limit(spark):
    """The O(|V|) loop-state broadcasts (PageRank contributions, LPA
    labels, Jaccard degrees) must be SIZE-CONDITIONAL: with the conf'd
    node limit at 0 (and the planner's own threshold disabled, so nothing
    re-broadcasts behind the hint's back) every loop round must plan as a
    shuffle join — a forced F.broadcast here is the OOM class at real
    node counts, because the hint overrides autoBroadcastJoinThreshold."""
    from bert_etl_spark.operators.advanced import GRAPH_BROADCAST_LIMIT_CONF

    saved = {
        GRAPH_BROADCAST_LIMIT_CONF: spark.conf.get(
            GRAPH_BROADCAST_LIMIT_CONF, None
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None
        ),
    }
    spark.conf.set(GRAPH_BROADCAST_LIMIT_CONF, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name in (
            "graph_label_propagation",
            "graph_pagerank_k_iters",
            "graph_jaccard_similarity",
        ):
            plan = _plan(spark, name)
            assert "BroadcastHashJoin" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name
            assert "CartesianProduct" not in plan, name
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_graph_loops_broadcast_below_limit(spark):
    """Below the (default, large) limit the measured-right broadcast plan
    is unchanged — the conditional must not cost the fixture-scale plan
    its zero-per-round-exchange property."""
    from bert_etl_spark.operators.advanced import LPA_ITERS

    plan = _plan(spark, "graph_label_propagation")
    assert plan.count("BroadcastHashJoin") >= LPA_ITERS


def test_kcore_fallback_path_matches_broadcast_path(spark):
    """graph_kcore materializes each peel (localCheckpoint), so its final
    plan hides the per-round joins — pin the fallback by RESULT equality:
    the shuffle-join path must produce the identical core."""
    from bert_etl_spark.operators.advanced import GRAPH_BROADCAST_LIMIT_CONF

    def rows():
        df = registry.ALL_QUERIES["graph_kcore"](spark, SF)
        return sorted((r["node"], r["core_degree"]) for r in df.collect())

    base = rows()
    saved = spark.conf.get(GRAPH_BROADCAST_LIMIT_CONF, None)
    spark.conf.set(GRAPH_BROADCAST_LIMIT_CONF, "0")
    try:
        assert rows() == base and len(base) > 0
    finally:
        if saved is None:
            spark.conf.unset(GRAPH_BROADCAST_LIMIT_CONF)
        else:
            spark.conf.set(GRAPH_BROADCAST_LIMIT_CONF, saved)


def test_profile_correlations_single_pass(spark):
    """The whole correlation matrix must come from ONE scan + ONE
    partial-agg aggregation — an implementation that scans per pair (or
    per column) silently multiplies the 100 TB read cost."""
    plan = _plan(spark, "profile_correlations")
    import re

    scans = re.findall(r"Scan parquet[^\n]*lineitem", plan)
    assert len(scans) == 1, plan
    assert "partial_count" in plan or "partial" in plan


def test_zorder_write_is_one_range_shuffle_no_window(spark):
    """The production z-order write path must be ONE repartitionByRange
    exchange on the z-value plus a LOCAL (non-global) sort — never the
    audit's exact global ntile (two full-sort windows). The cheap path is
    the whole point of registering the sibling."""
    from bert_etl_spark.operators.aggregations import zorder_write_frame

    df = zorder_write_frame(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(zval" in plan, plan
    assert "Window" not in plan
    # the only full-row exchange is the range repartition (the spans agg
    # exchanges one 4-column row for the broadcast)
    import re

    range_ex = [
        line
        for line in plan.splitlines()
        if "Exchange rangepartitioning" in line
    ]
    assert len(range_ex) == 1, plan
    # any Sort present is local (global=false) — the write-side row-group
    # ordering, not a global sort
    for line in plan.splitlines():
        if re.search(r"\bSort \[", line):
            assert "false, 0" in line or "global=false" in line.lower(), line


def test_bloom_prefilter_all_broadcast(spark):
    """The bloom position set and the passed-key list are both bounded
    (O(bits) and O(dim keys)): every join in the plan must be broadcast —
    a sort-merge join here means the 'prefilter' shuffled the fact table,
    defeating its own purpose."""
    plan = _plan(spark, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_graph_broadcast_limit_auto_resolution():
    """"auto" maps deployment → arm: local masters get the shuffle
    fallback (measured faster warm at local[32] — SCALING.md round-10
    A/B), anything else keeps the cluster-safe broadcast limit. Explicit
    integers pass through; garbage falls back to the default."""
    from bert_etl_spark.operators.advanced import (
        GRAPH_BROADCAST_LIMIT_DEFAULT,
        _resolve_broadcast_limit,
    )

    assert _resolve_broadcast_limit("local[32]", "auto") == 0
    assert _resolve_broadcast_limit("local", "AUTO") == 0
    assert (
        _resolve_broadcast_limit("spark://host:7077", "auto")
        == GRAPH_BROADCAST_LIMIT_DEFAULT
    )
    assert (
        _resolve_broadcast_limit("yarn", "auto")
        == GRAPH_BROADCAST_LIMIT_DEFAULT
    )
    assert (
        _resolve_broadcast_limit("local[32]", None)
        == GRAPH_BROADCAST_LIMIT_DEFAULT
    )
    assert _resolve_broadcast_limit("local[32]", "123") == 123
    assert (
        _resolve_broadcast_limit("local[32]", "garbage")
        == GRAPH_BROADCAST_LIMIT_DEFAULT
    )


def test_graph_loops_auto_mode_plans_shuffle_on_local(spark):
    """conf=auto on the local test master must produce the same
    no-forced-broadcast plan as an explicit 0."""
    from bert_etl_spark.operators.advanced import GRAPH_BROADCAST_LIMIT_CONF

    saved = {
        GRAPH_BROADCAST_LIMIT_CONF: spark.conf.get(
            GRAPH_BROADCAST_LIMIT_CONF, None
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None
        ),
    }
    spark.conf.set(GRAPH_BROADCAST_LIMIT_CONF, "auto")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "graph_label_propagation")
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_filtered_topk_pushes_label_predicate_to_scan(spark):
    """Filtered ANN must PRE-filter: the label predicate reaches the
    parquet scan as a pushed filter (at 100 TB it prunes row groups
    before any cosine), never a post-top-k filter (which under-fills k)."""
    plan = _plan(spark, "sim_topk_filtered")
    scans = [
        seg.split("ReadSchema")[0]
        for seg in plan.split("FileScan parquet")[1:]
    ]
    assert any(
        "PushedFilters" in s and "In(label" in s.split("PushedFilters")[1]
        for s in scans
    ), plan


def test_single_query_topk_avoids_one_partition_window(spark):
    """The RRF dense leg and the MMR pool must plan TakeOrderedAndProject
    (per-partition heaps), not a rank window over one q_id partition —
    the 33.1 -> 4.7 s warm fix at the 100x replica (SCALING.md r11
    second wave). The rank window that remains operates on k rows AFTER
    the limit, so the corpus-sized exchange is gone."""
    for name in ("sim_hybrid_rrf", "sim_mmr_diversify"):
        plan = _plan(spark, name) if name != "sim_mmr_diversify" else None
        if plan is None:
            # MMR returns a driver-built frame; assert on the pool builder
            from bert_etl_spark.operators import similarity as sim
            from pyspark.sql import functions as F

            prep = sim._prepared(spark, SF)
            q0 = prep.filter(F.col("vec_id") == 0).select(
                F.col("vec_id").alias("q_id"),
                F.col("e").alias("qe"),
                F.col("nrm").alias("qnrm"),
            )
            pool = sim._topk_single_query(prep, q0, sim.MMR_POOL)
            plan = pool._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan


def test_bm25_scan_prunes_to_needed_columns(spark):
    """The BM25 documents scans must read only (doc_id, text) — a
    retrieval plan that drags source/lang/n_chars through the explode
    multiplies dead bytes by token count."""
    plan = _plan(spark, "text_bm25_topk")
    assert "n_chars" not in plan and "source" not in plan, plan


def test_allpairs_budget_guard_refuses_with_bound(spark):
    """With the candidate budget forced to 1, the prefix join must refuse
    BEFORE emitting any pair, and the message must carry the computed
    bound and the fallback strategies."""
    from bert_etl_spark.operators import dedup

    spark.conf.set(dedup.ALLPAIRS_BUDGET_CONF, "1")
    try:
        with pytest.raises(ValueError, match="candidate bound .* exceeds"):
            registry.ALL_QUERIES["dedup_allpairs_prefix"](spark, SF)
    finally:
        spark.conf.unset(dedup.ALLPAIRS_BUDGET_CONF)


def test_phrase_search_is_single_pass_zero_exchange(spark):
    """text_phrase_search must stay ONE codegen'd corpus pass: a literal
    phrase compiles to a per-row HOF expression — any Exchange, Generate
    (explode) or Join appearing here means the operator regressed to the
    positional-join form its oracle uses. (Round-14 evaluated and
    rejected a spread_scan here: the n_occurrences filter predicate-
    pushes below any exchange, defeating it — see the operator note.)"""
    from bert_etl_spark.operators import registry

    registry.load_all()
    for name in ("text_phrase_search", "text_proximity_search"):
        df = registry.ALL_QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (name, plan)
        assert "Generate" not in plan, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert plan.count("Scan parquet") == 1, (name, plan)
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, name
