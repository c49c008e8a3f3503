"""Profiling + sketch operators: exact checks where possible, error bounds
for the HLL estimate (implementation-defined, hence rows-only in the
driver gate)."""

from __future__ import annotations

from bert_etl_spark.operators import registry

registry.load_all()


def test_profile_columns_shape(spark, sf_small):
    rows = {
        r.column_name: r
        for r in registry.ALL_QUERIES["profile_columns"](spark, sf_small).collect()
    }
    assert set(rows) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_linestatus", "l_shipdate"
    }
    q = rows["l_quantity"]
    assert q.n_rows == 6000 and q.n_nulls == 0
    assert q.min_value == "1.0" and q.max_value == "50.0"
    assert rows["l_linestatus"].n_distinct == 2


def test_hll_estimates_within_bound(spark, sf_small):
    from bert_etl_spark.operators.profiling import hll_rollup

    rows = hll_rollup(spark, sf_small).collect()
    # lgK=14 gives a relative standard error ~0.8%; 5% is a generous bound
    for r in rows:
        assert abs(r.estimated_distinct - r.exact_distinct) <= max(
            1, 0.05 * r.exact_distinct
        ), r
    all_row = [r for r in rows if r.source == "__ALL__"]
    assert len(all_row) == 1
    # doc_ids are globally unique, so the union estimate must cover the sum
    assert all_row[0].exact_distinct == sum(
        r.exact_distinct for r in rows if r.source != "__ALL__"
    )
