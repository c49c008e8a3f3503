"""Fast per-query parity harness for development: run one or more named
queries against the DuckDB oracle at sf0.01 (the driver's comparison,
minus the hashing) without the full pytest sweep.

Usage: python tools/quickcheck.py <query_name> [<query_name> ...]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failed = 0
    for name in sys.argv[1:]:
        sdf = queries[name](spark, sf).toPandas()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        odf = odf.reindex(sorted(odf.columns), axis=1)
        ok = list(sdf.columns) == list(odf.columns) and sdf.shape == odf.shape
        if not ok:
            print(f"{name}: SHAPE/SCHEMA {sdf.shape} {list(sdf.columns)} "
                  f"vs {odf.shape} {list(odf.columns)}")
            failed += 1
            continue
        s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
        o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
        for c in s.columns:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                same = np.array_equal(
                    np.nan_to_num(a.astype(float), nan=-9e99),
                    np.nan_to_num(b.astype(float), nan=-9e99),
                )
            else:
                same = pd.Series(a).astype(object).equals(
                    pd.Series(b).astype(object)
                )
            if not same:
                bad = np.where(a != b)[0][:5] if len(a) == len(b) else []
                print(f"{name}: VALUE MISMATCH col={c} rows={list(bad)} "
                      f"spark={a[:4]} oracle={b[:4]}")
                failed += 1
                break
        else:
            print(f"{name}: OK ({len(s)} rows)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
