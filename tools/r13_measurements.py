"""Round-13 scale measurements at the 100x replica
(tools/make_scale10.py /tmp/scale100 100 — ~sf10, 500k docs / 1.5M orders /
600k vectors / 60M lineitem).

Usage: python tools/r13_measurements.py <step> [sf_dir]
  phrase — text_phrase_search / text_proximity_search corpus-scan forms
           cold+warm, then the INDEXED forms against a conf'd standing
           positional index (build+probe, warm probes)
  cdc    — per-epoch apply cost of the bucketed CDC op log as state
           grows 10x (fixed 1000-op trickle batch against 0.94M- and
           9.4M-key standing states), plus one fold (compact) at each
           size — the round-12 "What's wrong #1" flatness proof; the
           old full-rewrite design measured 41.2 s/epoch warm at the
           same 9.4M-row state (SCALING.md round-12 table)
  drift  — sim_ivfpq_recall_drift cold (replica build + ingest + audit)
           then warm re-run (both no-op maintenance, pure measurement)
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


def _cdc_state_case(spark, work, state_keys: int) -> None:
    from pyspark.sql import functions as F

    from bert_etl_spark.streaming import events as ev

    case = f"{work}/cdc_{state_keys}"
    os.makedirs(case)
    state = f"{case}/state"
    # seed the standing state: one apply of state_keys upserts
    seed = spark.range(state_keys).select(
        F.col("id").alias("k"),
        F.lit(0).cast("int").alias("seq"),
        F.lit("U").alias("op"),
        F.col("id").cast("double").alias("price"),
    )
    seed.repartition(32).write.parquet(f"{case}/seed")
    t0 = time.time()
    ev.cdc_apply_stream(
        spark.readStream.schema("k long, seq int, op string, price double")
        .parquet(f"{case}/seed"),
        state,
        f"{case}/ck_seed",
    ).awaitTermination()
    print(
        f"[cdc seed] {state_keys} keys: {time.time() - t0:.1f} s",
        flush=True,
    )
    # trickle epochs: fixed 1000-op batch (mixed update/delete), timed
    # end-to-end (stream start + apply + commit); flat across the 10x
    # state growth is the claim
    times = []
    for i in range(1, 4):
        feed = f"{case}/trickle{i}"
        spark.range(1000).select(
            ((F.col("id") * 9973 + i) % state_keys).alias("k"),
            F.lit(i).cast("int").alias("seq"),
            F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
            F.col("id").cast("double").alias("price"),
        ).coalesce(1).write.parquet(feed)
        t0 = time.time()
        ev.cdc_apply_stream(
            spark.readStream.schema(
                "k long, seq int, op string, price double"
            ).parquet(feed),
            state,
            f"{case}/ck{i}",
        ).awaitTermination()
        times.append(time.time() - t0)
    print(
        f"[cdc epoch] state={state_keys}: "
        + ", ".join(f"{t:.1f}" for t in times)
        + f" s (min {min(times):.1f})",
        flush=True,
    )
    t0 = time.time()
    n = ev.cdc_compact_state(spark, state)
    print(
        f"[cdc fold] state={state_keys}: {time.time() - t0:.1f} s "
        f"({n} rows)",
        flush=True,
    )
    shutil.rmtree(case, ignore_errors=True)


def main() -> None:
    step = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
    spark = _spark()
    from bert_etl_spark.operators import registry

    registry.load_all()
    work = tempfile.mkdtemp(prefix="r13_meas_")
    try:
        if step == "phrase":
            _run(spark, "text_phrase_search", sf_dir, "scan-cold")
            _run(spark, "text_phrase_search", sf_dir, "scan-warm")
            _run(spark, "text_proximity_search", sf_dir, "scan-warm")
            spark.conf.set("spark.bert_etl.textidx.indexDir", f"{work}/tix")
            _run(spark, "text_phrase_search_indexed", sf_dir, "build+probe")
            _run(spark, "text_phrase_search_indexed", sf_dir, "warm")
            _run(spark, "text_phrase_search_indexed", sf_dir, "warm")
            _run(spark, "text_proximity_search_indexed", sf_dir, "warm")
        elif step == "cdc":
            _cdc_state_case(spark, work, 940_000)
            _cdc_state_case(spark, work, 9_400_000)
        elif step == "lookup":
            from pyspark.sql import functions as F

            from bert_etl_spark.streaming import events as ev

            state_keys = 9_400_000
            state = f"{work}/state"
            seed = spark.range(state_keys).select(
                F.col("id").alias("k"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.col("id").cast("double").alias("price"),
            )
            seed.repartition(32).write.parquet(f"{work}/seed")
            ev.cdc_apply_stream(
                spark.readStream.schema(
                    "k long, seq int, op string, price double"
                ).parquet(f"{work}/seed"),
                state,
                f"{work}/ck",
            ).awaitTermination()
            keys = spark.range(1000).select(
                (F.col("id") * 9973 % state_keys).alias("k")
            )
            for tag in ("cold", "warm", "warm"):
                t0 = time.time()
                n = ev.cdc_lookup(spark, state, keys).count()
                print(
                    f"[lookup-{tag}] 1000 keys of {state_keys}: "
                    f"{time.time() - t0:.1f} s ({n} rows)",
                    flush=True,
                )
            t0 = time.time()
            n = ev.latest_cdc_state(spark, state).count()
            print(
                f"[full-view] {n} rows: {time.time() - t0:.1f} s",
                flush=True,
            )
        elif step == "drift":
            _run(spark, "sim_ivfpq_recall_drift", sf_dir, "cold-replica")
            _run(spark, "sim_ivfpq_recall_drift", sf_dir, "warm")
        else:
            raise SystemExit(f"unknown step {step}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
