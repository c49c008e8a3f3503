"""Type-strict oracle gate: Spark result schema vs DuckDB oracle output types.

Round-1 lesson: the driver's value-hash is TYPE-sensitive where
``test_oracle_parity._norm`` coerces. DuckDB widens ``SUM(BIGINT)`` /
``count_if`` / window ``SUM`` to HUGEINT (int128), which pandas renders as
float64/object — the driver hash-failed two queries whose VALUES were
identical (VERDICT.md round 1, items 1-3).

Two guards, both plan-level (no query execution — Spark schemas come from
analysis, DuckDB types from the lazy relation):

1. No oracle may produce a HUGEINT/UHUGEINT output column.
2. Every oracle output column type must map to the same canonical type as
   the Spark result column with the same name.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from bert_etl_spark.catalog import TABLE_NAMES
from bert_etl_spark.operators import registry

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLED = sorted(registry.ALL_ORACLES)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


# ---------------------------------------------------------------------------
# canonical type mapping
# ---------------------------------------------------------------------------

_DUCK_SIMPLE = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "HUGEINT": "int128",
    "UHUGEINT": "uint128",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
    "INTERVAL": "interval",
    "NULL": "null",
    '"NULL"': "null",
    "JSON": "string",
}


def canon_duck(t: str) -> str:
    """Canonicalize a DuckDB type string (possibly nested)."""
    t = t.strip()
    up = t.upper()
    if up in _DUCK_SIMPLE:
        return _DUCK_SIMPLE[up]
    if up.endswith("[]"):
        return f"list<{canon_duck(t[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),\s*(\d+)\)", up)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if up.startswith("STRUCT("):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        fields = []
        for part in _split_top(inner):
            name, _, ftype = part.strip().partition(" ")
            fields.append(f'{name.strip(chr(34))}:{canon_duck(ftype)}')
        return "struct<" + ",".join(fields) + ">"
    if up.startswith("MAP("):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        k, v = _split_top(inner)
        return f"map<{canon_duck(k)},{canon_duck(v)}>"
    raise AssertionError(f"unmapped DuckDB type: {t!r}")


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (ignores commas inside parens/brackets)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def canon_spark(dt) -> str:
    """Canonicalize a Spark DataType (recursive over containers)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        fields = ",".join(f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields)
        return f"struct<{fields}>"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval"
    raise AssertionError(f"unmapped Spark type: {dt!r}")


# ---------------------------------------------------------------------------
# the gates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_no_hugeint(name, oracle_con):
    """DuckDB must not widen any output column to int128 — the driver's
    pandas-path hash renders HUGEINT differently from Spark's bigint even
    when every value is equal. CAST(... AS BIGINT) in the oracle SQL."""
    rel = oracle_con.sql(registry.ALL_ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — add CAST(... AS BIGINT)"


@pytest.mark.parametrize("name", ORACLED)
def test_result_types_match(name, spark, oracle_con):
    """Spark result column types must canonically equal the oracle's."""
    sdf = registry.ALL_QUERIES[name](spark, SF_DIR)
    stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}

    rel = oracle_con.sql(registry.ALL_ORACLES[name])
    otypes = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}

    assert set(stypes) == set(otypes), f"{name}: column sets differ"
    diffs = {
        c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes[c]
    }
    assert not diffs, f"{name}: type mismatches (spark, oracle): {diffs}"
