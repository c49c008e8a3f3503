"""Multi-query stage sweep: run queries in one session with event log on,
report each query's wall time and its stages >= 0.4s with task counts —
the single-task-stage detector (round-14).

Usage: python tools/r14_sweep.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="evsweep_")
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir};"
        "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
    )
    from bert_etl_spark.operators import registry
    from bert_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="sweep")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = "/root/testdata/sf0.001"
    windows = []
    for name in names:
        fn = registry.ALL_QUERIES.get(name)
        if fn is None:
            continue
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        registry.release_internals()
    spark.catalog.clearCache()
    for name in names:
        fn = registry.ALL_QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time() * 1000
        tp = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}")
            continue
        wall = time.perf_counter() - tp
        registry.release_internals()
        windows.append((name, t0, time.time() * 1000, wall))
    app_id = spark.sparkContext.applicationId
    spark.stop()
    path = os.path.join(evdir, app_id)
    stages = []
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            if sub is None:
                continue
            dur = (si.get("Completion Time", sub) - sub) / 1000.0
            stages.append((sub, dur, si["Number of Tasks"], si["Stage ID"]))
    for name, a, b, wall in windows:
        print(f"=== {name}: {wall:.2f}s")
        for sub, dur, ntask, sid in stages:
            if a <= sub <= b and dur >= 0.4:
                print(f"    stage {sid}: {dur:.2f}s tasks={ntask}")


if __name__ == "__main__":
    main()
