"""Per-verb wall-clock profile of one registered query (round-14 opt).

Runs the named query once at the warmup SF (codegen) and once profiled at
the target SF, then prints cumulative time per bert_etl_spark function —
the measurement step the optimization guide §1 demands before touching a
lifecycle verb. Every py4j action is synchronous, so cumtime per verb IS
its wall share.

Usage: python tools/r14_profile.py <query_name> [sf_dir]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

from bert_etl_spark.operators import registry
from bert_etl_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark(app_name=f"profile_{name}")
    fn = registry.ALL_QUERIES[name]
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        fn(spark, warm).write.format("noop").mode("overwrite").save()
        registry.release_internals()
        spark.catalog.clearCache()
    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    prof.disable()
    wall = time.perf_counter() - t0
    registry.release_internals()
    print(f"\n=== {name} at {sf_dir}: {wall:.2f}s (cold, this session) ===")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    print("--- bert_etl_spark frames ---")
    st.print_stats("bert_etl_spark", 40)
    print("--- py4j/action frames (top) ---")
    st.print_stats(r"(readwriter|dataframe)\.py", 25)
    # second, warm run timed plainly (what bench's min-of-2 reports)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm_s = time.perf_counter() - t0
    registry.release_internals()
    print(f"warm rerun: {warm_s:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
