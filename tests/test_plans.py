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
