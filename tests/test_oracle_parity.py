"""Oracle-differential harness: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (row-count + column set + order-
insensitive values) at sf0.001 so regressions surface in seconds. Queries
registered without an oracle get a rows-only smoke check.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from bert_etl_spark.catalog import TABLE_NAMES
from bert_etl_spark.operators import registry

registry.load_all()

# sf0.001 for speed by default; SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
# reproduces the driver's correctness gate exactly
import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact doubles expected; fall back to 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.12g}"
    except ImportError:
        pass
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(registry.ALL_QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = registry.ALL_QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    if name not in registry.ALL_ORACLES:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return

    orel = oracle_con.sql(registry.ALL_ORACLES[name])
    ocols = orel.columns
    orows = orel.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column sets differ"
    assert len(srows) == len(orows), f"{name}: row counts differ ({len(srows)} vs {len(orows)})"

    sset, oset = _rowset(scols, srows), _rowset(ocols, orows)
    mismatches = [(a, b) for a, b in zip(sset, oset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
