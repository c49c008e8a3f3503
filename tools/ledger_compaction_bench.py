"""Per-epoch ingest cost vs ACCUMULATED EPOCH COUNT — the metadata/file
axis that in-query-path compaction (lsh_band_ledger_stream's
compact_every) bounds; the companion to ledger_ingest_bench.py, which
measures the DATA axis (probe cost vs ledger row count).

The scale question: an always-on trickle ingest writes one ledger epoch
dir per micro-batch, so after E batches a probe enumerates O(E x touched
buckets) directories and opens O(E) parquet footers even when the probed
ROW count is tiny. Uncompacted, per-epoch cost therefore grows linearly
in E; with compact_every=N the committed history keeps folding into one
base epoch and per-epoch cost stays flat. We ingest E unique single-doc
micro-batches (no band collisions — the time measured is probe +
orchestration, not candidate handling) and compare the mean trigger
duration of the FIRST and LAST quarter of epochs for each case, plus the
final epoch-dir/file counts.

Usage: python tools/ledger_compaction_bench.py [epochs] [compact_every_csv]
       (defaults: 64 and none,8; "none" = compaction off)
Emits one JSON line per case; results are recorded in SCALING.md.

Isolation: each case runs in its OWN subprocess/JVM — cross-case JVM
pollution measured 6-8x inflation on the ingest bench this tool extends.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCH_DEFAULT = 64


def run_one_case(epochs: int, compact_every: int | None) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bert_etl_spark.session import get_spark
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    spark = get_spark()
    # recentProgress retains only the LAST N updates (default 100): at
    # higher epoch counts the "first quarter" would silently measure late
    # batches and flatten the very growth curve this bench exists to show
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(epochs + 8)
    )
    work = tempfile.mkdtemp(prefix="ledger_compact_bench_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    # one file per epoch, each a unique document (pyarrow directly: E tiny
    # sequential Spark writes would dominate setup time)
    for i in range(epochs):
        text = " ".join(f"tok{i}w{j}" for j in range(40))
        pq.write_table(
            pa.table({"doc_id": pa.array([i], pa.int64()),
                      "text": pa.array([text])}),
            os.path.join(src, f"doc-{i:05d}.parquet"),
        )
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = lsh_band_ledger_stream(
            stream,
            os.path.join(work, "ledger"),
            os.path.join(work, "out"),
            os.path.join(work, "ckpt"),
            compact_every=compact_every,
        )
        q.awaitTermination()
        wall = time.time() - t0
        durs = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        # first two batches carry plan/codegen warmup (~7 s measured) —
        # exclude them so the first-quarter mean reflects steady shape,
        # not compilation
        durs = durs[2:] if len(durs) > 8 else durs
        quarter = max(len(durs) // 4, 1)
        ledger_dir = os.path.join(work, "ledger")
        epoch_dirs = [
            d for d in os.listdir(ledger_dir) if d.startswith("epoch=")
        ]
        n_files = sum(len(fs) for _, _, fs in os.walk(ledger_dir))
        print(
            json.dumps(
                {
                    "epochs": epochs,
                    "compact_every": compact_every,
                    "measured_batches": len(durs),
                    "first_quarter_mean_s": round(
                        sum(durs[:quarter]) / quarter, 3
                    ),
                    "last_quarter_mean_s": round(
                        sum(durs[-quarter:]) / quarter, 3
                    ),
                    "total_wall_s": round(wall, 1),
                    "final_epoch_dirs": len(epoch_dirs),
                    "final_ledger_files": n_files,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        ce = None if sys.argv[3] == "none" else int(sys.argv[3])
        run_one_case(int(sys.argv[2]), ce)
        return
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else EPOCH_DEFAULT
    cases = (sys.argv[2] if len(sys.argv) > 2 else "none,8").split(",")
    for c in cases:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             str(epochs), c],
            check=True,
        )


if __name__ == "__main__":
    main()
