"""Synthesize an Nx replica of sf0.1 (default 10x ~ sf1) for scale checks.

No sf1 testdata ships with the harness, so the scaling experiment derives
one: each fact table is unioned N times with copy-shifted keys so key
cardinality grows with volume (a pure row-copy would instead multiply the
duplicate rate and skew every dedup/join measurement). Content columns are
perturbed per copy for the same reason:

- documents.text: per-copy ``translate`` of two frequent letters — token
  sets diverge across copies, so near-dup density stays ~constant instead
  of exploding Nx. The target letter pair is distinct per copy for any N.
- embeddings.embedding: per-copy cyclic rotation — rotated vectors are
  decorrelated, preserving the neighborhood structure's density. Rotation
  repeats at the vector dimension (64), so copies ≥ 64 are additionally
  sign-flipped: (rotation, sign) stays injective up to N = 128 and a
  negated rotation is anti-correlated with its positive twin, never a
  spurious near-duplicate.

Dims (nation, region) keep their real-world fixed cardinality.

Usage: python tools/make_scale10.py [out_dir] [copies]
       (defaults: /tmp/scale10, 10; the round-5 100x dedup validation
        uses  python tools/make_scale10.py /tmp/scale100 100)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
EMB_DIM = 64
# key shift: far above any real key at sf0.1
SHIFT = 100_000_000


def main() -> None:
    global COPIES
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    assert COPIES <= 2 * EMB_DIM, "embedding (rotation, sign) injective only to 2*dim"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def copy(table: str, select: str) -> None:
        con.sql(
            f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    rng = f"(SELECT unnest(range({COPIES})) AS i) c"

    copy("region", f"SELECT * FROM {src('region')}")
    copy("nation", f"SELECT * FROM {src('nation')}")
    copy(
        "customer",
        f"""SELECT c_custkey + i*{SHIFT} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {rng}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + i*{SHIFT} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}, {rng}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + i*{SHIFT} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')}, {rng}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + i*{SHIFT} AS o_orderkey,
                   o_custkey + i*{SHIFT} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {rng}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + i*{SHIFT} AS l_orderkey,
                   l_partkey + i*{SHIFT} AS l_partkey,
                   l_suppkey + i*{SHIFT} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {rng}""",
    )
    copy(
        "events",
        f"""SELECT event_id + i*{SHIFT} AS event_id, ts,
                   user_id + i*{SHIFT} AS user_id, event_type, value, props
            FROM {src('events')}, {rng}""",
    )
    # two frequent letters translated per copy -> copies share few shingles
    copy(
        "documents",
        f"""SELECT doc_id + i*{SHIFT} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE translate(text, 'ea', chr(98 + CAST(i AS INT))
                                               || chr(109 + CAST(i AS INT)))
                   END AS text,
                   lang, source, n_chars
            FROM {src('documents')}, {rng}""",
    )
    # rotate by i mod dim; sign-flip the second 64 copies so the (rotation,
    # sign) pair is injective per copy and no two copies are near-duplicates
    copy(
        "embeddings",
        f"""SELECT vec_id + i*{SHIFT} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        WHEN i < {EMB_DIM} THEN
                             embedding[CAST(i AS INT)+1:]
                             || embedding[:CAST(i AS INT)]
                        ELSE list_transform(
                             embedding[CAST(i % {EMB_DIM} AS INT)+1:]
                             || embedding[:CAST(i % {EMB_DIM} AS INT)],
                             x -> -x)
                   END AS embedding,
                   label
            FROM {src('embeddings')}, {rng}""",
    )


if __name__ == "__main__":
    main()
