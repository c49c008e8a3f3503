"""Dump .explain('formatted') for named queries to plans/r14/<q>_<tag>.txt.

Usage: python tools/r14_plans.py <tag> q1,q2,... [sf_dir] [out_dir]

Runs each registered query builder (side effects included — lifecycle verbs
build their indexes exactly as the bench does) and writes the FORMATTED plan
of the returned DataFrame. Not a timing tool: safe to run while other work
is in flight.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)

    from bert_etl_spark.operators import registry
    from bert_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name=f"plans_{tag}")
    for name in names:
        fn = registry.ALL_QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown query: {name}")
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # record the failure, keep going
            plan = f"ERROR building plan: {type(ex).__name__}: {ex}"
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} [{tag}]\n")
            fh.write(plan)
            if not plan.endswith("\n"):
                fh.write("\n")
        print(f"wrote {path}")
        registry.release_internals()
    spark.stop()


if __name__ == "__main__":
    main()
