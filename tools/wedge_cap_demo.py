"""Skewed-graph demonstration of the degree-cap wedge-join bound (round-9
verdict ask #5's measurement): the synthetic replicas carry no hub above
the cap (graph_triangle_count_capped measured hubs_excluded=0 at 100x), so
this harness PLANTS the skew the cap exists for — a dense co-occurrence
block (every pair of K nodes connected: the "promiscuous co-occurrence"
shape of a boilerplate template or a viral item) unioned onto the 100x
replica's real co-purchase edges — and runs the SAME oriented wedge join
with and without hub exclusion.

The point being measured: wedge fan-out is Sigma_src outdeg(src)^2. Degree
orientation alone caps a SINGLE celebrity (it always orients toward the
hub, never out of it), but a dense BLOCK gives every member ~K/2 oriented
out-edges, so the block alone contributes ~K^3/8 wedges from only K^2/2
edges; hub exclusion (degree cap) removes the block wholesale and restores
edge-proportional work. Usage: python tools/wedge_cap_demo.py [base_dir] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bert_etl_spark.operators import registry
from bert_etl_spark.operators.advanced import (
    WEDGE_DEGREE_CAP,
    copurchase_edges,
)
from bert_etl_spark.session import get_spark

BLOCK_BASE = 2_000_000_000  # node ids far above any replica part key


def wedge_stats(edges: DataFrame, cap: int | None) -> tuple[int, int, float]:
    """(n_wedges, n_triangles, seconds) via the production oriented wedge
    join, optionally hub-excluded at ``cap`` — the graph_triangle_count /
    _capped plan shape on an arbitrary edge list."""
    t0 = time.perf_counter()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    if cap is not None:
        kept = deg.filter(F.col("d") <= cap)
        edges = edges.join(
            kept.select(F.col("node").alias("u")), "u", "left_semi"
        ).join(kept.select(F.col("node").alias("v")), "v", "left_semi")
        deg = kept
    lower = F.struct(F.col("du.d"), F.col("u")) < F.struct(
        F.col("dv.d"), F.col("v")
    )
    oriented = (
        edges.join(deg.alias("du"), F.col("du.node") == F.col("u"))
        .join(deg.alias("dv"), F.col("dv.node") == F.col("v"))
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower, F.col("dv.d")).otherwise(F.col("du.d")).alias("dst_d"),
        )
        .localCheckpoint(eager=True)
    )
    wedges = (
        oriented.alias("o1")
        .join(oriented.alias("o2"), "src")
        .filter(
            F.struct(F.col("o1.dst_d"), F.col("o1.dst"))
            < F.struct(F.col("o2.dst_d"), F.col("o2.dst"))
        )
        .select(F.col("o1.dst").alias("w1"), F.col("o2.dst").alias("w2"))
    )
    closed = wedges.join(
        oriented.alias("o"),
        (F.col("o.src") == F.col("w1")) & (F.col("o.dst") == F.col("w2")),
        "left",
    )
    row = closed.agg(
        F.count("*").alias("w"), F.count(F.col("o.src")).alias("t")
    ).collect()[0]
    return int(row["w"]), int(row["t"]), round(time.perf_counter() - t0, 2)


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    registry.load_all()
    spark = get_spark(app_name="wedge_cap_demo")
    base = copurchase_edges(spark, base_dir)
    # dense block: all pairs of K planted nodes (u < v)
    ids = spark.range(k).select((F.col("id") + BLOCK_BASE).alias("n"))
    block = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .filter(F.col("a.n") < F.col("b.n"))
        .select(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
    )
    skewed = base.unionByName(block).localCheckpoint(eager=True)
    n_edges = skewed.count()
    w0, t0_, s0 = wedge_stats(skewed, None)
    w1, t1_, s1 = wedge_stats(skewed, WEDGE_DEGREE_CAP)
    print(
        f"{base_dir} + K={k} dense block: edges={n_edges} | "
        f"uncapped wedges={w0} tri={t0_} {s0}s | "
        f"capped(cap={WEDGE_DEGREE_CAP}) wedges={w1} tri={t1_} {s1}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
