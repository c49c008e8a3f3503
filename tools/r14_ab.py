"""Within-session A/B of runtime confs per query.

Usage: python tools/r14_ab.py "k=v;k=v" q1,q2,... [sf_dir] [reps]

For each query: warm at sf0.001, then alternate A (default confs) and
B (the given conf overrides) timed runs at sf_dir, `reps` times each,
releasing internals between runs. Prints per-run times and min/median.
Interleaving inside ONE session controls for box drift, which measured
±0.3-0.5 s/query run-to-run on this machine.
"""

from __future__ import annotations

import statistics
import sys
import time


def main() -> None:
    confs = dict(
        p.split("=", 1) for p in sys.argv[1].split(";") if "=" in p
    )
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from bert_etl_spark.operators import registry
    from bert_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="r14_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    defaults = {k: spark.conf.get(k, None) for k in confs}

    def set_b() -> None:
        for k, v in confs.items():
            spark.conf.set(k, v)

    def set_a() -> None:
        for k, v in defaults.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    for name in names:
        fn = registry.ALL_QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}")
            continue
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:
            print(f"{name}: WARM FAILED {type(ex).__name__}: {ex}")
            continue
        registry.release_internals()
        times: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(reps):
            for side in ("A", "B"):
                (set_a if side == "A" else set_b)()
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as ex:
                    print(f"{name} {side}: FAILED {type(ex).__name__}: {ex}")
                    break
                times[side].append(time.perf_counter() - t0)
                registry.release_internals()
        set_a()
        fmt = lambda xs: "/".join(f"{x:.2f}" for x in xs)  # noqa: E731
        if times["A"] and times["B"]:
            print(
                f"{name:38s} A[{fmt(times['A'])}] B[{fmt(times['B'])}]  "
                f"minA={min(times['A']):.2f} minB={min(times['B']):.2f} "
                f"medA={statistics.median(times['A']):.2f} "
                f"medB={statistics.median(times['B']):.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
