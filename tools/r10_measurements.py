"""Round-10 scale measurements at the 100x replica (/tmp/scale100):

A. Graph-loop join-strategy A/B: the size-conditional broadcast
   (spark.bert_etl.graph.broadcastNodeLimit) default (broadcast) vs
   forced-fallback (limit=0 → shuffle joins), same session, same memoized
   edge build — isolates the per-round join strategy (verdict r9 ask #1's
   "one 100x-replica measurement of the fallback path").
B. MaxSim warm-probe A/B: session-lifetime localCheckpoint assignment vs
   the durable partitionBy(cell) parquet index (ask #2's "warm-probe
   measurement vs the current 6.3 s at 100x").
C. Wedge fan-out bound: graph_triangle_count vs graph_triangle_count_capped
   (ask #5's "skewed-replica measurement showing the wedge fan-out bound").

Usage: python tools/r10_measurements.py [big_dir] [A|B|C ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bert_etl_spark.operators import registry
from bert_etl_spark.session import get_spark


def _run(spark, name: str, sf: str) -> float:
    t0 = time.perf_counter()
    registry.ALL_QUERIES[name](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    el = round(time.perf_counter() - t0, 2)
    registry.release_internals()
    return el


def section_a(spark, big: str) -> None:
    from bert_etl_spark.operators.advanced import GRAPH_BROADCAST_LIMIT_CONF

    loops = [
        "graph_pagerank_k_iters",
        "graph_label_propagation",
        "graph_kcore",
        "graph_jaccard_similarity",
    ]
    # warm the family edge build once so both arms measure the LOOPS
    _run(spark, "graph_degree_distribution", big)
    for name in loops:
        t_bcast = _run(spark, name, big)
        spark.conf.set(GRAPH_BROADCAST_LIMIT_CONF, "0")
        try:
            t_fallback = _run(spark, name, big)
        finally:
            spark.conf.unset(GRAPH_BROADCAST_LIMIT_CONF)
        print(
            f"A {name}: broadcast={t_bcast}s shuffle-fallback={t_fallback}s",
            flush=True,
        )


def section_b(spark, big: str) -> None:
    from bert_etl_spark.operators.similarity import MAXSIM_INDEX_DIR_CONF

    # session-lifetime path: first run pays the build, then warm probes
    t_build_session = _run(spark, "sim_maxsim_ivf", big)
    print(f"B session build+first={t_build_session}s", flush=True)
    for i in range(3):
        print(f"B session warm[{i}]={_run(spark, 'sim_maxsim_ivf', big)}s",
              flush=True)
    idx = f"/tmp/maxsim_index_r10_{os.getpid()}"
    spark.conf.set(MAXSIM_INDEX_DIR_CONF, idx)
    try:
        t_build_atrest = _run(spark, "sim_maxsim_ivf", big)  # writes table
        print(f"B at-rest build+first={t_build_atrest}s ({idx})", flush=True)
        for i in range(3):
            print(
                f"B at-rest warm[{i}]={_run(spark, 'sim_maxsim_ivf', big)}s",
                flush=True,
            )
        print(
            f"B at-rest incremental={_run(spark, 'sim_maxsim_incremental', big)}s",
            flush=True,
        )
    finally:
        spark.conf.unset(MAXSIM_INDEX_DIR_CONF)


def section_c(spark, big: str) -> None:
    t_full = _run(spark, "graph_triangle_count", big)
    t_capped = _run(spark, "graph_triangle_count_capped", big)
    full = registry.ALL_QUERIES["graph_triangle_count"](spark, big).collect()[0]
    capped = registry.ALL_QUERIES["graph_triangle_count_capped"](
        spark, big
    ).collect()[0]
    registry.release_internals()
    print(
        f"C triangle full: {t_full}s n_edges={full['n_edges']} "
        f"n_wedges={full['n_wedges']} tri={full['n_triangles']} | "
        f"capped: {t_capped}s hubs_excluded={capped['n_hubs_excluded']} "
        f"edges_kept={capped['n_edges_kept']} n_wedges={capped['n_wedges']} "
        f"tri={capped['n_triangles']}",
        flush=True,
    )


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100"
    sections = [s.upper() for s in sys.argv[2:]] or ["A", "B", "C"]
    registry.load_all()
    spark = get_spark(app_name="r10_measurements")
    if "A" in sections:
        section_a(spark, big)
    if "B" in sections:
        section_b(spark, big)
    if "C" in sections:
        section_c(spark, big)
    spark.stop()


if __name__ == "__main__":
    main()
