"""Round-12 scale measurements at the 100x replica
(tools/make_scale10.py /tmp/scale100 100 — ~sf10, 500k docs / 1.5M orders /
600k vectors / 60M lineitem).

Usage: python tools/r12_measurements.py <step> [sf_dir]
  ivfpq   — sim_ivfpq_probe cold (scratch build+probe) then warm probes
            against a conf'd standing index; sim_ivfpq_recall warm
  hybrid  — sim_hybrid_rrf_indexed cold (two scratch index builds) then
            warm probes against conf'd standing indexes; sim_mmr_batch
            cold/warm for the applyInPandas fan-out
  edges   — graph family off the durable edge table: one-time build,
            then warm copurchase_edges scan + graph_pagerank_iter /
            graph_connected_components vs the per-session build path
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _spark():
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "100g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def _run(spark, name, sf_dir, tag):
    from bert_etl_spark.operators import registry

    t0 = time.time()
    n = registry.ALL_QUERIES[name](spark, sf_dir).count()
    dt = time.time() - t0
    registry.release_internals()
    print(f"[{tag}] {name}: {dt:.1f} s ({n} rows)", flush=True)
    return dt


def main() -> None:
    step = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
    spark = _spark()
    from bert_etl_spark.operators import registry

    registry.load_all()
    work = tempfile.mkdtemp(prefix="r12_meas_")
    try:
        if step == "ivfpq":
            _run(spark, "sim_ivfpq_probe", sf_dir, "cold-scratch")
            spark.conf.set("spark.bert_etl.ivfpq.indexDir", f"{work}/ivfpq")
            _run(spark, "sim_ivfpq_probe", sf_dir, "build+probe")
            _run(spark, "sim_ivfpq_probe", sf_dir, "warm")
            _run(spark, "sim_ivfpq_probe", sf_dir, "warm")
            _run(spark, "sim_ivfpq_recall", sf_dir, "warm")
        elif step == "hybrid":
            _run(spark, "sim_hybrid_rrf_indexed", sf_dir, "cold-scratch")
            spark.conf.set("spark.bert_etl.ivf.indexDir", f"{work}/ivf")
            spark.conf.set("spark.bert_etl.textidx.indexDir", f"{work}/tix")
            _run(spark, "sim_hybrid_rrf_indexed", sf_dir, "build+probe")
            _run(spark, "sim_hybrid_rrf_indexed", sf_dir, "warm")
            _run(spark, "sim_hybrid_rrf_indexed", sf_dir, "warm")
            _run(spark, "sim_mmr_batch", sf_dir, "cold")
            _run(spark, "sim_mmr_batch", sf_dir, "warm")
        elif step == "edges":
            _run(spark, "graph_pagerank_iter", sf_dir, "session-build")
            _run(spark, "graph_pagerank_iter", sf_dir, "session-warm")
            spark.conf.set("spark.bert_etl.graph.edgeTableDir", f"{work}/edges")
            registry.release_internals()
            _run(spark, "graph_pagerank_iter", sf_dir, "durable-build")
            _run(spark, "graph_pagerank_iter", sf_dir, "durable-warm")
            _run(spark, "graph_connected_components", sf_dir, "durable-warm")
            # the durable table's actual win: a FRESH session opens the
            # standing table instead of re-paying the O(E) build
            spark.stop()
            spark = _spark()
            spark.conf.set("spark.bert_etl.graph.edgeTableDir", f"{work}/edges")
            _run(spark, "graph_pagerank_iter", sf_dir, "fresh-session-open")
            _run(spark, "graph_pagerank_iter", sf_dir, "fresh-session-warm")
        else:
            raise SystemExit(f"unknown step {step}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
