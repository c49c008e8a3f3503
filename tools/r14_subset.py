"""Bench-methodology subset timer: warm at sf0.001, two timed noop-sink
passes at sf0.1 per query, min-of-2 — for quick touched-set comparisons
against a full-bench record taken the same day.

Usage: python tools/r14_subset.py q1,q2,... [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from bert_etl_spark.operators import registry
    from bert_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="r14_subset")
    spark.range(1000).selectExpr("sum(id)").collect()
    total = 0.0
    for name in names:
        fn = registry.ALL_QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}")
            continue
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        registry.release_internals()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            registry.release_internals()
        best = min(ts)
        total += best
        print(f"{name}: min {best:.2f}  runs {[round(t,2) for t in ts]}")
    print(f"TOTAL(min): {total:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
