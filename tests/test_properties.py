"""Property-based invariants (hypothesis) for the parity-critical kernels.

Small generated frames, few examples — each case spins Spark jobs, so the
value is breadth of inputs (nulls, unicode, duplicates, extreme floats),
not example count.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bert_etl_spark.functions.deterministic import dsum
from bert_etl_spark.functions.identity import dedup_exact, with_identity

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.one_of(st.none(), st.text(max_size=12)),
    ),
    min_size=1,
    max_size=12,
)


@_slow
@given(rows=rows_strategy)
def test_identity_permutation_invariant(spark, rows):
    """Row identity must not depend on column order or row order."""
    df1 = spark.createDataFrame(rows, "a long, b string")
    df2 = spark.createDataFrame([(b, a) for a, b in reversed(rows)], "b string, a long")
    h1 = sorted(r.identity for r in with_identity(df1).collect())
    h2 = sorted(r.identity for r in with_identity(df2).collect())
    assert h1 == h2


@_slow
@given(rows=rows_strategy)
def test_dedup_exact_idempotent_and_set_semantics(spark, rows):
    df = spark.createDataFrame(rows, "a long, b string")
    doubled = df.union(df)
    once = dedup_exact(doubled)
    assert once.count() == len(set(rows))
    assert dedup_exact(once).count() == once.count()


@_slow
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_dsum_is_partition_order_invariant(spark, vals):
    """The decimal reduction must give identical bits however the rows are
    partitioned — the property plain double SUM does not have."""
    df1 = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    df8 = spark.createDataFrame([(v,) for v in reversed(vals)], "x double").repartition(8)
    s1 = df1.agg(dsum("x", "s")).first().s
    s8 = df8.agg(dsum("x", "s")).first().s
    assert s1 == s8 or (math.isnan(s1) and math.isnan(s8))
    # and it matches the exactly-rounded python sum at 6dp quantization
    expected = sum(round(v, 6) for v in vals)
    assert abs(s1 - expected) <= 1e-6 * max(1.0, abs(expected))
