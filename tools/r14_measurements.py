"""Round-14 scale measurements at the 100x replica
(tools/make_scale10.py /tmp/scale100 100 — ~sf10, 500k docs / 1.5M orders /
600k vectors / 60M lineitem). One JVM per step (the r12/r13 pattern);
release_internals between queries.

Usage: python tools/r14_measurements.py <step> [sf_dir]
  mmr      — sim_mmr_batch_indexed against a conf'd standing IVF-PQ index:
             build+probe cold, then warm probes; sim_ivfpq_rerank warm as
             the comparator (the indexed-MMR pool is the ADC shortlist +
             one bounded exact fetch — warm cost should sit near the warm
             rerank). Round-13 'next round' item #6.
  textdel  — textidx_delete with a BARE doc_id feed against the standing
             100x positional index: the slim one-column key scan is the
             documented honest cost of not knowing the doc's buckets
             (a doc's postings span many token buckets, so the
             single-part keymap cannot help) — this row prices it.
             Round-13 'next round' item #5 (text-index leg).
  rebuild  — ivfpq_index_rebuild at the 100x index (600k vectors):
             standing build, seed-delete + drifted ingest, then the
             in-place re-train/re-encode/swap; fresh build time as the
             comparator (rebuild ~ build + resolve join is the expected
             shape). Round-13 'next round' item #1.
  rebucket — cdc_rebucket at a 9.4M-key standing op log: 64 -> 256
             buckets (fold + re-hash + swap), with point-lookup timings
             before and after (the verb exists so a saturated modulus
             can grow — lookups prune under the new modulus).
             Round-13 'next round' item #3.
  refresh  — textidx_compact(refresh_stats=True) vs plain compact at the
             100x index after an ingest epoch: the stats recompute rides
             the rewrite (one extra distinct-doc aggregate over the tmp
             table). Round-13 'next round' item #2.
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


def main() -> None:
    step = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100"
    spark = _spark()
    from pyspark.sql import functions as F

    from bert_etl_spark.operators import registry

    registry.load_all()
    work = tempfile.mkdtemp(prefix="r14_meas_")
    try:
        if step == "mmr":
            spark.conf.set("spark.bert_etl.ivfpq.indexDir", f"{work}/ivfpq")
            _run(spark, "sim_mmr_batch_indexed", sf_dir, "build+probe")
            _run(spark, "sim_mmr_batch_indexed", sf_dir, "warm")
            _run(spark, "sim_mmr_batch_indexed", sf_dir, "warm")
            _run(spark, "sim_ivfpq_rerank", sf_dir, "rerank-warm")
        elif step == "textdel":
            from bert_etl_spark.operators import text as tx

            spark.conf.set("spark.bert_etl.textidx.indexDir", f"{work}/tix")
            tx._textidx_open_or_build(spark, sf_dir, f"{work}/tix")
            print("[build] standing positional index built", flush=True)
            for i, tag in enumerate(("cold", "warm", "warm")):
                doomed = spark.range(100).select(
                    (F.col("id") * 997 + i * 131).alias("doc_id")
                )
                t0 = time.time()
                n = tx.textidx_delete(spark, doomed, f"{work}/tix")
                print(
                    f"[textdel-{tag}] 100 bare doc_ids: "
                    f"{time.time() - t0:.1f} s ({n} tombstones)",
                    flush=True,
                )
            # comparator: one ingest epoch (the touched-bucket cost)
            docs = registry.tbl(spark, sf_dir, "documents").limit(1000)
            batch = docs.select(
                (F.col("doc_id") + 90_000_000).alias("doc_id"), "text"
            )
            t0 = time.time()
            n = tx.textidx_ingest(spark, batch, f"{work}/tix")
            print(
                f"[ingest-epoch] 1000 docs: {time.time() - t0:.1f} s "
                f"({n} postings)",
                flush=True,
            )
        elif step == "rebuild":
            import bert_etl_spark.operators.similarity as sim

            idx = f"{work}/ivfpq"
            t0 = time.time()
            sim.ivfpq_build_or_open(spark, sf_dir, idx)
            print(f"[build] standing IVF-PQ: {time.time() - t0:.1f} s", flush=True)
            emb = registry.tbl(spark, sf_dir, "embeddings")
            t0 = time.time()
            nd = sim.ivfpq_index_delete(
                spark,
                spark.range(sim.PQ_K).select(F.col("id").alias("vec_id")),
                idx,
            )
            print(
                f"[seed-delete] {nd} bare keys: {time.time() - t0:.1f} s",
                flush=True,
            )
            shifted = emb.filter(
                (F.col("vec_id") >= sim.DRIFT_SRC_START)
                & (F.col("vec_id") < sim.DRIFT_SRC_START + 10_000)
            ).select(
                (F.col("vec_id") + sim.DRIFT_OFFSET).alias("vec_id"),
                "label",
                F.transform(
                    "embedding",
                    lambda x: (x.cast("double") + F.lit(sim.DRIFT_DELTA)).cast(
                        "float"
                    ),
                ).alias("embedding"),
            )
            t0 = time.time()
            ni = sim.ivfpq_index_ingest(spark, shifted, idx)
            print(f"[ingest] {ni} drifted: {time.time() - t0:.1f} s", flush=True)
            vectors = emb.select("vec_id", "embedding").unionByName(
                shifted.select("vec_id", "embedding")
            )
            t0 = time.time()
            nr = sim.ivfpq_index_rebuild(spark, idx, vectors)
            print(
                f"[rebuild] {nr} live rows re-trained/re-encoded/swapped: "
                f"{time.time() - t0:.1f} s",
                flush=True,
            )
            t0 = time.time()
            n = sim._ivfpq_topk(spark, sf_dir, idx).count()
            print(
                f"[probe-after] {n} rows: {time.time() - t0:.1f} s",
                flush=True,
            )
        elif step == "rebucket":
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
            t0 = time.time()
            ev.cdc_apply_stream(
                spark.readStream.schema(
                    "k long, seq int, op string, price double"
                ).parquet(f"{work}/seed"),
                state,
                f"{work}/ck",
            ).awaitTermination()
            print(f"[seed] {state_keys} keys: {time.time() - t0:.1f} s", flush=True)
            keys = spark.range(1000).select(
                (F.col("id") * 9973 % state_keys).alias("k")
            )
            t0 = time.time()
            n = ev.cdc_lookup(spark, state, keys).count()
            print(
                f"[lookup-before 64bkt] 1000 keys: {time.time() - t0:.1f} s "
                f"({n} rows)",
                flush=True,
            )
            t0 = time.time()
            n = ev.cdc_rebucket(spark, state, 256)
            print(
                f"[rebucket 64->256] {n} rows: {time.time() - t0:.1f} s",
                flush=True,
            )
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = ev.cdc_lookup(spark, state, keys).count()
                print(
                    f"[lookup-after-{tag} 256bkt] 1000 keys: "
                    f"{time.time() - t0:.1f} s ({n} rows)",
                    flush=True,
                )
        elif step == "refresh":
            from bert_etl_spark.operators import text as tx

            idx = f"{work}/tix"
            spark.conf.set("spark.bert_etl.textidx.indexDir", idx)
            tx._textidx_open_or_build(spark, sf_dir, idx)
            docs = registry.tbl(spark, sf_dir, "documents").limit(5000)
            batch = docs.select(
                (F.col("doc_id") + 90_000_000).alias("doc_id"), "text"
            )
            n = tx.textidx_ingest(spark, batch, idx)
            print(f"[ingest] {n} postings", flush=True)
            t0 = time.time()
            n = tx.textidx_compact(spark, idx)
            print(f"[compact-plain] {n} rows: {time.time() - t0:.1f} s", flush=True)
            batch2 = docs.select(
                (F.col("doc_id") + 95_000_000).alias("doc_id"), "text"
            )
            tx.textidx_ingest(spark, batch2, idx)
            t0 = time.time()
            n = tx.textidx_compact(spark, idx, refresh_stats=True)
            print(
                f"[compact-refresh] {n} rows: {time.time() - t0:.1f} s",
                flush=True,
            )
            st = tx.read_collection_stats(spark, idx).first()
            print(
                f"[stats] n_docs={st['n_docs']} avgdl={st['avgdl']:.2f}",
                flush=True,
            )
        else:
            raise SystemExit(f"unknown step {step}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
