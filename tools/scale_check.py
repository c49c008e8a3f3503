"""Scale spot-check: time representative heavy queries at sf0.1 vs an
Nx synthetic replica (tools/make_scale10.py) and report per-query scaling
exponents alpha = log(t_Nx / t_1x) / log(N).

alpha ~ 1 is linear scaling (ideal for scan/agg), < 1 means fixed overhead
still dominates, > 1.2 flags super-linear growth worth a design review.
Results land in SCALING.md's scale-exponent tables.

Usage: python tools/scale_check.py [big_dir] [factor] [queries_csv]
       (defaults: /tmp/scale10, 10, the built-in QUERIES list; the
        round-5 100x dedup/similarity validation runs
        python tools/scale_check.py /tmp/scale100 100 dedup_minhash_lsh,...)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bert_etl_spark.operators import registry
from bert_etl_spark.session import get_spark

QUERIES = [
    "revenue_by_nation",
    "pricing_summary",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume",
    "window_sessionize",
    "events_dau_wau",
    "profile_columns",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "graph_triangle_count",
    "sim_topk_bruteforce",
    "text_tfidf_top_terms",
    "corpus_token_budget_select",
    "histogram_equi_depth",
    # round-8 families. NOTE: shared family tables (copurchase edges,
    # shingles, jac, spans) are checkpoint_once memos that clearCache()
    # does NOT drop — within one run the FIRST query of a family carries
    # the build and later members measure warm-family; attribute
    # accordingly when recording alphas.
    "graph_label_propagation",
    "graph_pagerank_k_iters",
    "sim_maxsim_topk",
    "sketch_quantile_mergeable",
]


def time_all(
    spark, sf_dir: str, queries: list[str] | None = None
) -> dict[str, float]:
    out: dict[str, float] = {}
    # SCALE_CHECK_PASSES=1 for big-replica runs where a second pass would
    # blow the wall-clock budget (the alpha estimate tolerates one sample)
    for _pass in range(int(os.environ.get("SCALE_CHECK_PASSES", "2"))):
        registry.release_internals()
        spark.catalog.clearCache()
        for name in queries or QUERIES:
            fn = registry.ALL_QUERIES[name]
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as ex:
                # one failing query must not zero out the whole scale report
                # (same isolation bench.py applies); report it and move on
                print(
                    f"QUERY FAILED: {name}@{sf_dir}: {type(ex).__name__}: "
                    f"{(str(ex).splitlines() or [''])[0][:200]}",
                    file=sys.stderr,
                )
                continue
            dt = round(time.perf_counter() - t0, 3)
            # progress on stderr: the 100x pass runs minutes per query, so a
            # silent 30-minute run is indistinguishable from a hang without it
            print(f"PASS {_pass} {name}@{sf_dir} {dt}", file=sys.stderr, flush=True)
            out[name] = min(out.get(name, dt), dt)
    return out


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    registry.load_all()
    spark = get_spark(app_name="scale_check")
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm codegen per plan shape at the tiny SF
    for name in queries:
        try:
            registry.ALL_QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as ex:
            print(f"warmup failed: {name}: {ex}", file=sys.stderr)
    spark.catalog.clearCache()

    t_small = time_all(spark, "/root/testdata/sf0.1", queries)
    t_big = time_all(spark, big, queries)

    # Two-level offset path (global_order._offsets, P > 256): P=32 runs the
    # one-array-row prefix, P=2048 the blocked triangular join a 100 TB
    # scan's ~200k partitions would use. Flat overhead between the two =
    # the offsets machinery is metadata-scale, not data-scale. (Only in the
    # default full report — a custom query list asks for just those alphas.)
    offsets_report = {}
    if len(sys.argv) <= 3:
        try:
            from pyspark.sql import functions as F

            from bert_etl_spark.operators.global_order import with_ntile

            ev = registry.tbl(spark, big, "events").select("value", "event_id")
            order = [F.asc("value"), F.asc("event_id")]
            for p in (32, 2048):
                best = float("inf")
                for _ in range(2):
                    registry.release_internals()
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    with_ntile(ev, 10, order, "decile", partitions=p).groupBy(
                        "decile"
                    ).count().write.format("noop").mode("overwrite").save()
                    best = min(best, round(time.perf_counter() - t0, 3))
                offsets_report[f"ntile_partitions_{p}"] = best
        except Exception as ex:
            print(f"offsets stress failed: {ex}", file=sys.stderr)
    report = {
        name: {
            "t_sf0.1": t_small.get(name),
            f"t_{factor:g}x": t_big.get(name),
            "alpha": round(
                math.log(max(t_big[name], 1e-3) / max(t_small[name], 1e-3))
                / math.log(factor),
                3,
            )
            if name in t_small and name in t_big
            else None,
        }
        for name in queries
    }
    if offsets_report:
        report["_two_level_offsets_10x"] = offsets_report
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
