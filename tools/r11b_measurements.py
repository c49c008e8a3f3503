"""Round-11 second-wave scale measurements at the 100x replica
(tools/make_scale10.py /tmp/scale100 100 — ~sf10, 500k docs / 1.5M orders /
600k vectors / 60M lineitem).

Usage: python tools/r11b_measurements.py <step> [sf_dir]
  retrieval — text_bm25_topk, sim_hybrid_rrf, sim_mmr_diversify,
              sample_weighted_reservoir (cold then warm)
  allpairs  — dedup_allpairs_prefix vs the df-capped inverted-index join
              (dedup_ngram_jaccard) — candidate-volume strategies A/B
  graphcdc  — graph_bfs_hops (warm after the shared edge build),
              cdc_snapshot_diff, streaming_cdc_apply, sim_index_delete
"""

from __future__ import annotations

import os
import sys
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


def _run(spark, name, sf_dir):
    from bert_etl_spark.operators import registry

    t0 = time.time()
    n = registry.ALL_QUERIES[name](spark, sf_dir).count()
    dt = time.time() - t0
    registry.release_internals()
    print(f"{name}: {dt:.1f} s ({n} rows)", flush=True)
    return dt


def main() -> None:
    step = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
    spark = _spark()
    from bert_etl_spark.operators import registry

    registry.load_all()

    if step == "retrieval":
        for name in (
            "text_bm25_topk",
            "sim_hybrid_rrf",
            "sim_mmr_diversify",
            "sample_weighted_reservoir",
        ):
            for tag in ("cold", "warm"):
                print(f"[{tag}]", end=" ", flush=True)
                _run(spark, name, sf_dir)
    elif step == "allpairs":
        for name in ("dedup_allpairs_prefix", "dedup_ngram_jaccard"):
            for tag in ("cold", "warm"):
                print(f"[{tag}]", end=" ", flush=True)
                _run(spark, name, sf_dir)
    elif step == "graphcdc":
        for name in (
            "graph_bfs_hops",
            "cdc_snapshot_diff",
            "streaming_cdc_apply",
            "sim_index_delete",
        ):
            for tag in ("cold", "warm"):
                print(f"[{tag}]", end=" ", flush=True)
                _run(spark, name, sf_dir)
    else:
        raise SystemExit(f"unknown step {step}")


if __name__ == "__main__":
    main()
