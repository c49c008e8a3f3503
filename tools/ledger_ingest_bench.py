"""Streaming LSH ledger ingest cost vs ledger size — the 100x number for
the always-on near-dup pipeline (streaming/events.py:lsh_band_ledger_stream).

The scale question: does ingesting one trickle micro-batch cost
O(touched buckets) (the bucketed-probe design) or O(ledger) (a full
re-scan per batch, quadratic total ingest)? We measure the SAME one-epoch
ingest against pre-seeded ledgers of growing size, with the probe's
partition pruning engaged (many buckets) vs disabled (1 bucket == the
old full-scan shape), and report the per-epoch cost curve for each.

The seeded ledger lands in epoch=-1 (any id < the stream's first epoch 0)
using the exact (epoch, bkt) layout the writer produces; band hashes are
synthetic uniform md5s, so the batch's bands collide with ~nothing and
the time measured is the probe + orchestration, not candidate handling.

Usage: python tools/ledger_ingest_bench.py [rows_csv] [buckets_csv]
       (defaults: 2000000,20000000 and 1,1024)
Emits one JSON line per (ledger_rows, n_buckets) with the one-epoch
ingest seconds (min of 3); results are recorded in SCALING.md.

Isolation: each (rows, buckets) case runs in its OWN subprocess/JVM —
measured 6-8x inflation on a case that follows a 200M-row full-scan
case in the same JVM (GC/executor-memory pollution), which inverts the
curve the bench exists to show.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bert_etl_spark.session import get_spark
from bert_etl_spark.streaming.events import (
    LEDGER_BUCKETS_CONF,
    lsh_band_ledger_stream,
)

BATCH_DOCS = 10  # a trickle batch: the always-on steady state


def seed_ledger(spark, path: str, rows: int, n_buckets: int) -> None:
    """Synthetic prior ledger, epoch=-1, in the writer's exact layout."""
    bands = (
        spark.range(rows)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("int").alias("band"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .withColumn(
            "bkt", F.pmod(F.xxhash64("band", "h"), F.lit(n_buckets)).cast("int")
        )
    )
    # hash by bkt when there are buckets to separate (one file per dir);
    # round-robin for the degenerate 1-bucket layout (a single hash
    # partition would funnel the whole seed through one writer task)
    seed = bands.repartition("bkt") if n_buckets > 1 else bands.repartition(32)
    seed.write.partitionBy("bkt").mode("overwrite").parquet(f"{path}/epoch=-1")


def one_epoch_ingest(spark, workdir: str, ledger_dir: str) -> float:
    docs = spark.range(BATCH_DOCS).select(
        (F.col("id") + 10_000_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(30)),
                lambda i: F.concat(
                    F.lit("u"), F.col("id").cast("string"), F.lit("_"), i.cast("string")
                ),
            ),
        ).alias("text"),
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{workdir}/in")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{workdir}/in")
    )
    t0 = time.perf_counter()
    q = lsh_band_ledger_stream(
        stream, ledger_dir, f"{workdir}/out", f"{workdir}/ckpt"
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def run_one_case(rows: int, n_buckets: int) -> None:
    spark = get_spark()
    spark.conf.set(LEDGER_BUCKETS_CONF, str(n_buckets))
    base = tempfile.mkdtemp(prefix="ledger_bench_")
    try:
        ledger = f"{base}/ledger"
        seed_ledger(spark, ledger, rows, n_buckets)
        times = []
        for i in range(3):  # first run warms FS caches/codegen; min-of-3
            run = f"{base}/run{i}"
            os.makedirs(run)
            times.append(one_epoch_ingest(spark, run, ledger))
        print(
            json.dumps(
                {
                    "ledger_rows": rows,
                    "n_buckets": n_buckets,
                    "epoch_sec": round(min(times), 3),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one_case(int(sys.argv[2]), int(sys.argv[3]))
        return
    import subprocess

    rows_list = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2000000,20000000").split(",")
    ]
    buckets_list = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,1024").split(",")
    ]
    for n_buckets in buckets_list:
        for rows in rows_list:
            # fresh JVM per case — see module docstring
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(rows), str(n_buckets)],
                check=True,
            )


if __name__ == "__main__":
    main()
