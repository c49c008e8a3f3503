"""Round-11 scale measurements (run one step at a time; flush per step).

Usage: python tools/r11_measurements.py <step> [sf_dir]
  incr        — bounded sim_maxsim_incremental, session path (COMPLETED run;
                the round-10 doc%7 form was killed, not timed, at 100x)
  incr_atrest — same through the durable index (build + 2 warm probes)
  ivf         — sim_ivf warm probes: session path vs durable index
  salt        — advised per-key salting vs uniform salting on a planted-skew
                join (the advisor's factors beating the guessed constant)

Defaults to the 100x replica at /tmp/scale100 (tools/make_scale10.py).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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

    if step == "incr":
        # session-lifetime path; first run pays the family warmup + the
        # shared assignment build, second run is the warm number
        for i in range(2):
            print(f"run {i}:", flush=True)
            _run(spark, "sim_maxsim_incremental", sf_dir)

    elif step == "incr_atrest":
        from bert_etl_spark.operators.similarity import MAXSIM_INDEX_DIR_CONF

        idx = "/tmp/r11_maxsim_index"
        shutil.rmtree(idx, ignore_errors=True)
        spark.conf.set(MAXSIM_INDEX_DIR_CONF, idx)
        for i in range(3):  # run 0 includes the index build+write
            print(f"run {i}:", flush=True)
            _run(spark, "sim_maxsim_incremental", sf_dir)

    elif step == "ivf":
        from bert_etl_spark.operators.similarity import IVF_INDEX_DIR_CONF

        print("session path:", flush=True)
        for i in range(3):
            _run(spark, "sim_ivf", sf_dir)
        idx = "/tmp/r11_ivf_index"
        shutil.rmtree(idx, ignore_errors=True)
        spark.conf.set(IVF_INDEX_DIR_CONF, idx)
        print("durable path (run 0 builds):", flush=True)
        for i in range(3):
            _run(spark, "sim_ivf", sf_dir)

    elif step == "salt":
        # planted skew: one mega-key owning ~50% of a big fact table,
        # joined to a dim too big to broadcast. Uniform salting replicates
        # the WHOLE dim by the guessed factor; advised salting replicates
        # each key by ITS factor (1 for the cold tail).
        from bert_etl_spark.functions.skew import (
            advised_salt_plan,
            advised_salted_join,
            salted_join,
        )

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "false"
        )  # measure the salting itself, not AQE's rescue
        # dim sized so uniform replication is a real cost (5M rows x32 =
        # 160M shuffled dim rows; advised replicates hot keys only)
        n_fact, n_keys = 50_000_000, 5_000_000
        fact = spark.range(n_fact).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        dim = spark.range(n_keys).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("w")
        )
        plan = advised_salt_plan(fact, "k", 32).localCheckpoint(eager=True)
        hot = plan.filter(F.col("salts") > 1).count()
        print(f"advisor: {hot} hot keys of {n_keys}", flush=True)

        def timed(tag, df):
            for i in range(2):  # second run is the warm number
                t0 = time.time()
                n = df.groupBy().agg(F.sum("v"), F.sum("w")).collect()
                print(
                    f"{tag} run{i}: {time.time() - t0:.1f} s {n}", flush=True
                )

        timed("unsalted  ", fact.join(dim, "k"))
        timed("uniform x32", salted_join(fact, dim, on=["k"], buckets=32))
        timed("advised   ", advised_salted_join(fact, dim, "k", plan))
    else:
        raise SystemExit(f"unknown step {step}")
    spark.stop()


if __name__ == "__main__":
    main()
