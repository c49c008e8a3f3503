"""Structured Streaming tests: the §2A queue-machinery equivalents.

File-source micro-batches stand in for DynamoDB-Streams batches; memory
sinks + availableNow triggers make the runs synchronous and deterministic.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bert_etl_spark.operators.registry import tbl
from bert_etl_spark.streaming import (
    enrich_with_dim,
    events_stream,
    run_to_memory,
    stream_dedup,
    tumbling_counts,
    write_stream_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """events sf0.001 re-sharded into 3 files → 3 observable micro-batches."""
    out = str(tmp_path / "events_in")
    tbl(spark, SF, "events").withColumn(
        "ts", F.unix_micros("ts") * 1000  # back to long nanos, matches file schema
    ).repartition(3).write.parquet(out)
    return out


def _stream(spark, events_dir, **kw):
    df = events_stream(spark, events_dir, **kw)
    return df


def test_tumbling_counts_match_batch(spark, events_dir):
    stream_out = run_to_memory(
        tumbling_counts(_stream(spark, events_dir)), "t_tumble", "update"
    ).collect()
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {(r.window_start, r.event_type): r.n for r in stream_out}
    want = {(r.window.start, r.event_type): r.n for r in batch}
    assert got == want


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    # two micro-batch files with overlapping event_ids (at-least-once input)
    base = tbl(spark, SF, "events").limit(100).withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    d = str(tmp_path / "dup_in")
    base.coalesce(1).write.mode("append").parquet(d)
    base.limit(40).coalesce(1).write.mode("append").parquet(d)  # replayed subset

    out = run_to_memory(
        stream_dedup(events_stream(spark, d), ["event_id"]), "t_dedup", "update"
    )
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == 100


def test_stream_static_join(spark, events_dir):
    customers = tbl(spark, SF, "customer")
    stream = _stream(spark, events_dir)
    joined = enrich_with_dim(
        stream, customers, stream.user_id == customers.c_custkey
    ).select("event_id", "user_id", "c_mktsegment")
    out = run_to_memory(joined, "t_enrich", "append")
    n_events = spark.read.parquet(events_dir).count()
    rows = out.collect()
    assert len(rows) == n_events  # left join keeps every event
    assert any(r.c_mktsegment is not None for r in rows)


def test_foreachbatch_checkpoint_restart_exactly_once(spark, tmp_path):
    """Restarting from the checkpoint must not duplicate or lose rows —
    the upgrade over the reference's at-least-once delivery."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = tbl(spark, SF, "events").withColumn("ts", F.unix_micros("ts") * 1000)

    base.limit(60).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_parquet(events_stream(spark, src), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 60

    # restart with no new input: nothing re-emitted
    q = write_stream_parquet(events_stream(spark, src), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 60

    # new file arrives; restart picks up only the delta
    base.limit(90).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_parquet(events_stream(spark, src), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 150  # 60 + 90, no dups of batch 1


def test_watermark_bounds_state(spark, events_dir):
    # watermarked session/window agg runs clean over file micro-batches
    agg = tumbling_counts(
        events_stream(spark, events_dir, max_files_per_trigger=1),
        window="6 hours",
        watermark="1 hour",
    )
    out = run_to_memory(agg, "t_wm", "update").collect()
    assert len(out) > 0
    total = sum(r.n for r in out if r.n is not None)
    assert total >= spark.read.parquet(events_dir).count() * 0  # ran, emitted


def test_stateful_running_counts_across_batches(spark, events_dir):
    from bert_etl_spark.streaming import stateful_running_counts

    out = run_to_memory(
        stateful_running_counts(
            events_stream(spark, events_dir, max_files_per_trigger=1)
        ),
        "t_state",
        "update",
    )
    # update mode emits one row per user per batch; the LAST emission per
    # user must equal the total batch count (state survived across batches)
    final = {
        r.user_id: r.n_events
        for r in out.orderBy("n_events").collect()  # last write wins per key
    }
    batch = {
        r.user_id: r.n
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == batch


def test_streaming_session_windows(spark, events_dir):
    from bert_etl_spark.streaming import session_windows

    out = run_to_memory(
        session_windows(events_stream(spark, events_dir), gap="30 minutes"),
        "t_sess",
        "append",
    ).collect()
    assert out, "watermark should close most sessions over a month of data"
    # every emitted session matches the batch sessionization computed the
    # window_session_native way
    from bert_etl_spark.operators import registry

    registry.load_all()
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in registry.ALL_QUERIES["window_session_native"](spark, SF).collect()
    }
    for r in out:
        key = (r.user_id, r.session_start, r.session_end)
        assert batch.get(key) == r.n_events, f"session {key} mismatch"


def test_dedup_within_watermark_drops_recent_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark with bounded state: duplicates arriving
    within the watermark horizon are dropped across micro-batches. A long
    watermark covers the whole fixture, so replays must all be suppressed
    while the state store still evicts on horizon at scale."""
    src = str(tmp_path / "wm_src")
    base = tbl(spark, SF, "events").orderBy(F.desc("ts")).limit(100).withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    base.coalesce(1).write.mode("append").parquet(src)
    base.limit(25).coalesce(1).write.mode("append").parquet(src)  # replayed

    out = run_to_memory(
        stream_dedup(
            events_stream(spark, src, max_files_per_trigger=1),
            ["event_id"],
            watermark="60 days",
        ),
        "t_wmdedup",
        "append",
    )
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == 100  # replays within horizon dropped


def test_rate_source_pubsub_standin(spark):
    """Rate source: the pub/sub (SNS, SURVEY 2A#9) stand-in — synthetic
    timestamped rows at a fixed rate through the same streaming surface."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .withColumn("event_type", F.concat(F.lit("type_"), F.col("value") % 3))
    )
    q = (
        stream.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("complete")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time as _time

    rows = []
    try:
        deadline = _time.time() + 30
        while _time.time() < deadline:
            rows = spark.table("t_rate").collect()
            if rows and sum(r["count"] for r in rows) > 0:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    assert {r.event_type for r in rows} <= {"type_0", "type_1", "type_2"}
    assert sum(r["count"] for r in rows) > 0


def test_stream_stream_join_matches_batch(spark, events_dir):
    from bert_etl_spark.streaming import stream_stream_join

    clicks = _stream(spark, events_dir).filter(F.col("event_type") == "click")
    purchases = _stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_join(
        clicks, purchases, key="user_id", interval="1 hour", watermark="2 hours"
    ).select("l_event_id", "r_event_id")
    got = {
        (r.l_event_id, r.r_event_id)
        for r in run_to_memory(joined, "t_ssj", "append").collect()
    }

    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"),
        F.col("user_id").alias("l_user_id"),
        F.col("ts").alias("l_ts"),
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    )
    want = {
        (r.l_event_id, r.r_event_id)
        for r in c.join(
            p,
            (F.col("l_user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want and len(want) > 0


def _ledger_docs(spark):
    """Small corpus with planted near-dups: three exact-ish families whose
    members share most shingles (guaranteed band collisions) plus unique
    filler docs."""
    fam_a = "the quick brown fox jumps over the lazy dog again and again"
    fam_b = "spark structured streaming processes micro batches of documents"
    rows = [
        (0, fam_a),
        (1, fam_a + " tail"),
        (2, fam_a),
        (3, fam_b),
        (4, fam_b + " with state"),
        (5, "completely unrelated text about volcanic rock formations"),
        (6, "another singleton document mentioning medieval manuscripts"),
        (7, fam_b),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_ledger_stream_equals_batch_candidates(spark, tmp_path):
    """The union of per-epoch ledger emissions must equal the batch
    pipeline's (uncapped) candidate set for ANY batch split — per-doc
    signatures don't depend on arrival grouping."""
    from bert_etl_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles_df,
    )
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    # 4 files -> 4 micro-batches, deliberately splitting each family across
    # batches so candidates MUST come from the cross (ledger) path
    for lo, hi in ((0, 2), (2, 4), (4, 6), (6, 8)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lsh_band_ledger_stream(
        stream,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = sorted(
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_i", "doc_j")
        .collect()
    )
    want = sorted(
        (r.doc_i, r.doc_j)
        for r in candidate_pairs(
            lsh_bands(minhash_signatures(shingles_df(docs)))
        ).collect()
    )
    assert got == want
    # the planted families must actually collide (non-vacuous test)
    assert (0, 2) in want and (3, 7) in want
    # cross-batch pairs exist: (0,2) spans batches 1 and 2 by construction
    # — they can only be emitted through the persisted ledger join. The
    # ledger carries the (epoch, bkt) partition layout the probe prunes on.
    assert sorted(spark.read.parquet(str(tmp_path / "ledger")).columns) == [
        "band",
        "bkt",
        "doc_id",
        "epoch",
        "h",
    ]


def test_lsh_ledger_restart_is_exactly_once(spark, tmp_path):
    """Restarting the ledger stream from its checkpoint must not re-emit
    prior epochs' pairs; a late-arriving file is checked against the FULL
    persisted ledger (including pre-restart epochs)."""
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "out")
    docs.filter(F.col("doc_id") < 6).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = lsh_band_ledger_stream(
            stream, str(tmp_path / "ledger"), out, str(tmp_path / "ckpt")
        )
        q.awaitTermination()

    run()
    first = sorted(
        (r.doc_i, r.doc_j) for r in spark.read.parquet(out).collect()
    )
    assert (0, 2) in first  # within the first file's batch

    # restart with no new input: nothing re-emitted, nothing lost
    run()
    assert (
        sorted((r.doc_i, r.doc_j) for r in spark.read.parquet(out).collect())
        == first
    )

    # doc 7 (family b) arrives after restart: only the delta is processed,
    # and it pairs with docs 3 and 4 from the PRE-restart ledger epochs
    docs.filter(F.col("doc_id") >= 6).coalesce(1).write.mode("append").parquet(src)
    run()
    after = sorted(
        (r.doc_i, r.doc_j) for r in spark.read.parquet(out).collect()
    )
    assert set(first) <= set(after)
    assert (3, 7) in after and (4, 7) in after


def test_lsh_ledger_redelivered_doc_is_exactly_once(spark, tmp_path):
    """At-least-once producers re-deliver: the same doc arriving in a
    LATER epoch band-matches its own prior ledger entry and must be
    dropped ENTIRELY — no (d, d) self pairs, no re-emission of pairs
    already written at its first epoch (the out_dir union stays a SET),
    and no duplicate ledger entry."""
    from bert_etl_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles_df,
    )
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    # epoch 0: docs 0-3; epoch 1: docs 0 AND 2 AGAIN (re-delivery of a
    # colliding pair — the worst case: without the drop, (0, 2) would be
    # re-emitted at epoch 1) plus the fresh docs 4-7
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(
        F.col("doc_id").isin(0, 2) | (F.col("doc_id") >= 4)
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lsh_band_ledger_stream(
        stream,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    pairs = [
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    ]
    assert all(i < j for i, j in pairs), pairs
    # exactly-once even as a MULTISET: the union of epoch emissions equals
    # the batch candidate set with no duplicates across epochs
    want = sorted(
        (r.doc_i, r.doc_j)
        for r in candidate_pairs(
            lsh_bands(minhash_signatures(shingles_df(docs)))
        ).collect()
    )
    assert sorted(pairs) == want
    assert (0, 2) in pairs  # the real near-dup still surfaces (once)
    # the re-delivered docs' bands were not appended a second time
    ledger = spark.read.parquet(str(tmp_path / "ledger"))
    per_doc_epochs = (
        ledger.groupBy("doc_id")
        .agg(F.count_distinct("epoch").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert per_doc_epochs == 0


def test_lsh_ledger_redelivery_broadcast_fallback(spark, tmp_path, monkeypatch):
    """Force REDELIVERED_INLINE_MAX below the re-delivered set size so the
    broadcast anti-join fallback executes (the path a pathological mass
    re-delivery takes), and assert the identical exactly-once outcome as
    the inline-filter hot path."""
    from bert_etl_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles_df,
    )
    from bert_etl_spark.streaming import events

    monkeypatch.setattr(events, "REDELIVERED_INLINE_MAX", 0)
    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(
        F.col("doc_id").isin(0, 2) | (F.col("doc_id") >= 4)
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = events.lsh_band_ledger_stream(
        stream, str(tmp_path / "ledger"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    pairs = sorted(
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    want = sorted(
        (r.doc_i, r.doc_j)
        for r in candidate_pairs(
            lsh_bands(minhash_signatures(shingles_df(docs)))
        ).collect()
    )
    assert pairs == want


def test_lsh_ledger_probe_prunes_partitions(spark, tmp_path):
    """The per-batch prior-ledger probe must be a directory-pruned scan —
    PartitionFilters on BOTH epoch (< current) and bkt (the batch's own
    band-hash buckets), with no row-level PushedFilters doing the work.
    At 100 TB this is the difference between O(touched buckets) and
    re-reading the whole band ledger every micro-batch."""
    from bert_etl_spark.streaming.events import (
        ledger_probe,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    docs.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lsh_band_ledger_stream(
        stream,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    ledger_root = tmp_path / "ledger"
    all_bkts = sorted(
        int(d.name.split("=")[1])
        for d in (ledger_root / "epoch=0").iterdir()
        if d.name.startswith("bkt=")
    )
    assert len(all_bkts) >= 2  # non-vacuous: there is something to prune
    want = all_bkts[:2]
    probe = ledger_probe(spark, str(ledger_root), 1, want)
    assert probe is not None
    # the LISTING itself is pruned: only the requested buckets' dirs reach
    # the relation — a root read would list every bucket of every epoch
    files = probe.inputFiles()
    assert files
    assert all(
        int(f.split("/bkt=")[1].split("/")[0]) in want for f in files
    ), files
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "epoch" in pf and "bkt" in pf, plan
    assert "PushedFilters: []" in plan, plan
    # behavior: only the requested buckets' rows are materialized
    got_bkts = {r.bkt for r in probe.select("bkt").distinct().collect()}
    assert got_bkts <= set(want)
    # a probe for buckets with no committed dirs short-circuits to None
    assert ledger_probe(spark, str(ledger_root), 0, want) is None


def test_ledger_compaction_preserves_probe_and_ingest(spark, tmp_path):
    """compact_ledger_epochs folds the whole committed history into ONE
    epoch partition: the probe sees identical (doc_id, band, h, bkt) rows
    through one _SUCCESS glob entry, and a RESUMED ingest (same
    checkpoint) still finds cross-epoch pairs against the compacted
    ledger — the metadata-axis fix for an always-on ingest accumulating
    one epoch dir per micro-batch."""
    import os

    from bert_etl_spark.streaming.events import (
        compact_ledger_epochs,
        committed_prior_epochs,
        ledger_probe,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    # two epochs: docs 0-3, then 4-6 (doc 7 held back for the post-compact
    # ingest)
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id").between(4, 6)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    assert committed_prior_epochs(spark, ledger, 10**9) == [0, 1]

    all_bkts = sorted(
        {
            int(d.name.split("=")[1])
            for e in (0, 1)
            for d in (tmp_path / "ledger" / f"epoch={e}").iterdir()
            if d.name.startswith("bkt=")
        }
    )
    key = lambda r: (r.doc_id, r.band, r.h, r.bkt)  # noqa: E731
    before = sorted(
        key(r) for r in ledger_probe(spark, ledger, 2, all_bkts).collect()
    )
    assert compact_ledger_epochs(spark, ledger, 1) == 2
    # one committed epoch dir now holds the whole history
    assert committed_prior_epochs(spark, ledger, 10**9) == [1]
    assert not (tmp_path / "ledger" / "epoch=0").exists()
    after = sorted(
        key(r) for r in ledger_probe(spark, ledger, 2, all_bkts).collect()
    )
    assert after == before and before  # identical rows, non-vacuous
    # re-running is a no-op (single committed epoch left)
    assert compact_ledger_epochs(spark, ledger, 1) == 0

    # resumed ingest (same checkpoint -> epoch 2) probes the compacted
    # ledger: doc 7 is a planted near-dup of doc 3 (epoch 0's data), so
    # the cross-epoch pair MUST surface through the compacted partition
    docs.filter(F.col("doc_id") == 7).coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream2, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    pairs = {
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert (3, 7) in pairs
    assert os.path.isdir(str(tmp_path / "ledger" / "epoch=2"))


def test_ledger_compaction_recovers_interrupted_swap(spark, tmp_path):
    """Crash window: the compacted span was fully written (tmp dir with
    _SUCCESS) but the old-epochs delete + rename never ran. Re-running
    compact_ledger_epochs must complete the swap instead of re-compacting
    (which would read the about-to-be-deleted dirs again)."""
    import shutil

    from bert_etl_spark.streaming.events import (
        committed_prior_epochs,
        compact_ledger_epochs,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= 4).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    want = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    # manufacture the crash state: a COMPLETE tmp span, old dirs intact
    span = spark.read.option("basePath", ledger).parquet(
        f"{ledger}/epoch=0", f"{ledger}/epoch=1"
    )
    span.select("doc_id", "band", "h", "bkt").repartition(4, "bkt").write.partitionBy(
        "bkt"
    ).mode("overwrite").parquet(f"{ledger}/_compact_tmp_1")
    # recovery completes the swap
    assert compact_ledger_epochs(spark, ledger, 1) == 2
    assert committed_prior_epochs(spark, ledger, 10**9) == [1]
    assert not (tmp_path / "ledger" / "_compact_tmp_1").exists()
    got = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    assert got == want


def test_ledger_compaction_refuses_uncommitted_target(spark, tmp_path):
    """Compacting into an epoch id ABOVE the committed history would make
    probes with epoch_id <= target silently exclude the whole compacted
    span (epoch < epoch_id filter) — the function must refuse, not lose
    data."""
    import pytest as _pytest

    from bert_etl_spark.streaming.events import (
        compact_ledger_epochs,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= 4).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    with _pytest.raises(ValueError, match="committed"):
        compact_ledger_epochs(spark, ledger, 5)
    # the ledger is untouched by the refusal
    assert (tmp_path / "ledger" / "epoch=0").exists()
    assert (tmp_path / "ledger" / "epoch=1").exists()


def test_lsh_ledger_in_path_compaction(spark, tmp_path):
    """compact_every=N runs compaction INSIDE the foreachBatch lane: after
    a 4-epoch ingest with compact_every=2 at least one size-tiered fold
    has collapsed the early history (epoch 0's dir is gone, fewer dirs
    than epochs), while the emitted pairs still equal the batch
    pipeline's candidate set exactly — compaction in the query path
    changes layout, never results. (The exact fold boundaries are a
    function of on-disk parquet sizes — the policy itself is pinned by
    the pure _fold_suffix tests.)"""
    from bert_etl_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles_df,
    )
    from bert_etl_spark.streaming.events import (
        committed_prior_epochs,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    for lo, hi in ((0, 2), (2, 4), (4, 6), (6, 8)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream,
        ledger,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        compact_every=2,
    ).awaitTermination()
    committed = committed_prior_epochs(spark, ledger, 10**9)
    # a fold happened (fewer dirs than epochs) and it swallowed epoch 0;
    # the newest epoch is never folded (strictly below the in-flight id)
    assert len(committed) < 4 and 0 not in committed and 3 in committed
    got = sorted(
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_i", "doc_j")
        .collect()
    )
    want = sorted(
        (r.doc_i, r.doc_j)
        for r in candidate_pairs(
            lsh_bands(minhash_signatures(shingles_df(docs)))
        ).collect()
    )
    assert got == want
    # cross-epoch pairs must have survived the mid-stream folds
    assert (0, 2) in got and (3, 7) in got


def test_in_path_compaction_recovers_leftover_tmp(spark, tmp_path):
    """The worst crash window: compaction deleted the old epoch dirs but
    died before the rename, leaving FEWER committed epochs than any
    threshold. A threshold-gated trigger would never fire again and the
    history would stay invisible — _recover_interrupted_compaction (run
    unconditionally at the top of every micro-batch) must complete the
    swap."""
    import shutil

    from bert_etl_spark.streaming.events import (
        _recover_interrupted_compaction,
        committed_prior_epochs,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= 4).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    want = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    # crash state: full tmp span written, old dirs already DELETED
    span = spark.read.option("basePath", ledger).parquet(
        f"{ledger}/epoch=0", f"{ledger}/epoch=1"
    )
    span.select("doc_id", "band", "h", "bkt").repartition(4, "bkt").write.partitionBy(
        "bkt"
    ).mode("overwrite").parquet(f"{ledger}/_compact_tmp_1")
    shutil.rmtree(str(tmp_path / "ledger" / "epoch=0"))
    shutil.rmtree(str(tmp_path / "ledger" / "epoch=1"))
    assert committed_prior_epochs(spark, ledger, 10**9) == []
    # no threshold involved — recovery is unconditional in _process
    assert _recover_interrupted_compaction(spark, ledger) == 1
    assert committed_prior_epochs(spark, ledger, 10**9) == [1]
    assert not (tmp_path / "ledger" / "_compact_tmp_1").exists()
    got = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    assert got == want


def test_fold_suffix_policy():
    """Pure-function pins of the size-tiered merge policy: equal trickles
    fold fully (binary pattern), a base larger than the trickle run is
    NEVER rewritten by it (the O(total-ledger)-per-window failure a
    fold-everything trigger has), and a run shorter than min_run is
    deferred."""
    from bert_etl_spark.streaming.events import _fold_suffix

    # equal trickles: the whole history is one tier — full fold
    assert _fold_suffix([(0, 10), (1, 10), (2, 10)], 2) == [0, 1, 2]
    # big base + short trickle run: base excluded, run below min_run
    assert _fold_suffix([(5, 100), (6, 10)], 2) == []
    # big base + long-enough trickle run: fold the run, NOT the base
    assert _fold_suffix([(5, 100), (6, 10), (7, 10), (8, 10)], 2) == [6, 7, 8]
    # run sum reaching the base size pulls the base in (next tier)
    assert _fold_suffix([(5, 30), (6, 10), (7, 10), (8, 10)], 2) == [
        5, 6, 7, 8,
    ]
    # empty history
    assert _fold_suffix([], 2) == []


def test_recover_interrupted_span_fold(spark, tmp_path):
    """Span-fold crash recovery: a _compact_tmp_<from>_<through> leftover
    with _SUCCESS is swapped into epoch=<through> deleting ONLY the span
    members — epochs older than <from> are untouched."""
    from bert_etl_spark.streaming.events import (
        _recover_interrupted_compaction,
        committed_prior_epochs,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    assert committed_prior_epochs(spark, ledger, 10**9) == [0, 1, 2]
    want = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    # crash state for a [1,2] span fold: complete tmp, old dirs intact
    span = spark.read.option("basePath", ledger).parquet(
        f"{ledger}/epoch=1", f"{ledger}/epoch=2"
    )
    span.select("doc_id", "band", "h", "bkt").repartition(4, "bkt").write.partitionBy(
        "bkt"
    ).mode("overwrite").parquet(f"{ledger}/_compact_tmp_1_2")
    assert _recover_interrupted_compaction(spark, ledger) == 1
    # epoch 0 untouched; [1,2] folded into 2
    assert committed_prior_epochs(spark, ledger, 10**9) == [0, 2]
    got = sorted(
        (r.doc_id, r.band, r.h, r.bkt)
        for r in spark.read.parquet(ledger).collect()
    )
    assert got == want


def test_recover_deletes_garbage_tmp(spark, tmp_path):
    """A tmp dir WITHOUT _SUCCESS is a fold that died mid-write: its
    source epoch dirs are intact, so recovery deletes the partial output
    instead of swapping it in."""
    import os

    from bert_etl_spark.streaming.events import (
        _recover_interrupted_compaction,
        committed_prior_epochs,
        lsh_band_ledger_stream,
    )

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    ledger = str(tmp_path / "ledger")
    docs.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    lsh_band_ledger_stream(
        stream, ledger, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).awaitTermination()
    os.makedirs(f"{ledger}/_compact_tmp_0/bkt=0")
    with open(f"{ledger}/_compact_tmp_0/bkt=0/part-0.parquet", "wb") as f:
        f.write(b"partial garbage")
    assert _recover_interrupted_compaction(spark, ledger) == 1
    assert not (tmp_path / "ledger" / "_compact_tmp_0").exists()
    assert committed_prior_epochs(spark, ledger, 10**9) == [0]


def test_lsh_ledger_edited_redelivery_is_new_version(spark, tmp_path):
    """A doc_id re-arriving with EDITED text is a near-dup of its own
    prior version — it collides with its prior ledger entry on SOME bands
    (that is LSH's premise) but not all. It must NOT be treated as a
    re-delivery: its updated bands enter the ledger and its candidate
    pairs against other docs are emitted (round-8 advice — the any-band
    drop silently discarded both)."""
    from bert_etl_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
        shingles_df,
    )
    from bert_etl_spark.streaming.events import lsh_band_ledger_stream

    fam_a = "the quick brown fox jumps over the lazy dog again and again"
    edited = fam_a + " with a fresh appended clause"
    # precondition: the edit shares >= 1 but < all bands with the original
    # (otherwise the test is vacuous / degenerates to exact re-delivery)
    pre = spark.createDataFrame(
        [(0, fam_a), (1, edited)], "doc_id long, text string"
    )
    rows = lsh_bands(minhash_signatures(shingles_df(pre))).collect()
    b0 = {(r.band, r.h) for r in rows if r.doc_id == 0}
    b1 = {(r.band, r.h) for r in rows if r.doc_id == 1}
    assert 1 <= len(b0 & b1) < len(b0), (len(b0 & b1), len(b0))

    src = str(tmp_path / "docs_in")
    # epoch 0: original doc 0 + unrelated filler
    spark.createDataFrame(
        [(0, fam_a), (5, "completely unrelated text about volcanic rocks")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    # epoch 1: doc 0 re-arrives EDITED, plus doc 9 = exact copy of the
    # NEW content (so the edited version owes a within-batch pair)
    spark.createDataFrame(
        [(0, edited), (9, edited)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lsh_band_ledger_stream(
        stream,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    pairs = sorted(
        (r.doc_i, r.doc_j)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert (0, 9) in pairs, pairs  # the edited version's pair IS emitted
    assert (0, 0) not in pairs, pairs  # no degenerate self pair
    # the edited version's bands ENTERED the ledger (two epochs of doc 0)
    ledger = spark.read.parquet(str(tmp_path / "ledger"))
    n_epochs_doc0 = (
        ledger.filter(F.col("doc_id") == 0).select("epoch").distinct().count()
    )
    assert n_epochs_doc0 == 2


def test_ledger_bucket_marker_blocks_modulus_drift(spark, tmp_path):
    """The bucket modulus is a persistent layout property: a stream
    restarted over an existing ledger with a different
    spark.bert_etl.lshLedger.buckets must FAIL LOUDLY instead of silently
    mis-pruning every cross-epoch probe (round-8 advice). Also: an
    unparseable conf value raises instead of defaulting."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bert_etl_spark.streaming import events

    docs = _ledger_docs(spark)
    src = str(tmp_path / "docs_in")
    docs.filter(F.col("doc_id") < 4).coalesce(1).write.mode("append").parquet(src)

    def _run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = events.lsh_band_ledger_stream(
            stream,
            str(tmp_path / "ledger"),
            str(tmp_path / "out"),
            str(tmp_path / ckpt),
        )
        q.awaitTermination()

    try:
        _run("ckpt1")  # stamps _n_buckets with the default (16)
        assert (
            events.read_ledger_bucket_marker(spark, str(tmp_path / "ledger"))
            == events.LEDGER_BUCKETS_DEFAULT
        )
        spark.conf.set(events.LEDGER_BUCKETS_CONF, "8")
        with pytest.raises(StreamingQueryException, match="n_buckets"):
            _run("ckpt2")
        spark.conf.set(events.LEDGER_BUCKETS_CONF, "not-a-number")
        with pytest.raises(ValueError, match="not an integer"):
            events._ledger_buckets(spark)
    finally:
        spark.conf.unset(events.LEDGER_BUCKETS_CONF)


def test_marker_write_is_atomic_and_read_errors_are_clear(spark, tmp_path):
    """The layout-marker helpers (round-9 advice): writes go temp+rename
    (no half-written marker can survive a crash at the final path), and a
    corrupt marker raises an explanatory error instead of a raw int()
    ValueError."""
    import pytest

    from bert_etl_spark.functions import markers

    path = str(tmp_path / "idx" / "_n_buckets")
    assert markers.read_int_marker(spark, path) is None
    markers.write_int_marker(spark, path, 16)
    assert markers.read_int_marker(spark, path) == 16
    # overwrite (prior-crash leftovers) still lands atomically
    markers.write_int_marker(spark, path, 32)
    assert markers.read_int_marker(spark, path) == 32
    # no temp residue
    assert not (tmp_path / "idx" / "_n_buckets._tmp").exists()
    # a corrupt (e.g. truncated) marker explains itself
    (tmp_path / "idx" / "_n_buckets").write_text("")
    with pytest.raises(ValueError, match="corrupted|rebuild"):
        markers.read_int_marker(spark, path)


def test_markerless_ledger_with_committed_epochs_refuses_stamp(
    spark, tmp_path
):
    """A pre-marker ledger that already holds committed epochs must NOT be
    silently stamped with the CURRENT conf (round-9 advice): if the conf
    drifted across the upgrade, stamping locks the mis-pruning in
    permanently. validate_ledger_buckets refuses and names the migration."""
    import pytest

    from bert_etl_spark.streaming import events

    ledger = tmp_path / "ledger"
    # fabricate a committed pre-marker epoch partition
    epoch = ledger / "epoch=0" / "bkt=3"
    epoch.mkdir(parents=True)
    (ledger / "epoch=0" / "_SUCCESS").touch()
    with pytest.raises(ValueError, match="[Mm]igrate"):
        events.validate_ledger_buckets(spark, str(ledger))
    # a genuinely NEW ledger still gets stamped with the conf
    fresh = tmp_path / "fresh"
    assert (
        events.validate_ledger_buckets(spark, str(fresh))
        == events.LEDGER_BUCKETS_DEFAULT
    )
    assert (
        events.read_ledger_bucket_marker(spark, str(fresh))
        == events.LEDGER_BUCKETS_DEFAULT
    )


def test_cdc_apply_converges_and_replay_is_idempotent(spark, tmp_path):
    """cdc_apply_stream: (1) the streamed merge over randomly-split files
    equals the one-shot argmax over all ops; (2) a full replay through a
    FRESH checkpoint (worst-case re-delivery: every batch again) leaves
    the state unchanged; (3) a late lower-seq upsert cannot resurrect a
    deleted key (the tombstone row wins the argmax)."""
    from bert_etl_spark.operators.advanced import _cdc_ops_frame
    from bert_etl_spark.streaming.events import cdc_apply_stream, latest_cdc_state

    ops = _cdc_ops_frame(spark, SF)
    ops.repartition(3).write.parquet(str(tmp_path / "in"))
    stream = lambda: (  # noqa: E731
        spark.readStream.schema("k long, seq int, op string, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    state = str(tmp_path / "state")
    cdc_apply_stream(stream(), state, str(tmp_path / "ckpt")).awaitTermination()

    def snapshot():
        return sorted(
            tuple(r)
            for r in latest_cdc_state(spark, state)
            .filter(F.col("op") == "U")
            .select("k", "price", "seq")
            .collect()
        )

    from pyspark.sql import Window

    expect = sorted(
        tuple(r)
        for r in ops.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.desc("seq"), "op")
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("k", "price", "seq")
        .collect()
    )
    first = snapshot()
    assert first == expect and first
    # full replay, fresh checkpoint: every batch re-delivered
    cdc_apply_stream(stream(), state, str(tmp_path / "ckpt2")).awaitTermination()
    assert snapshot() == first
    # a deleted key (op D at its max seq) must not resurrect from a late
    # lower-seq upsert
    deleted = (
        latest_cdc_state(spark, state)
        .filter(F.col("op") == "D")
        .select("k", "seq")
        .first()
    )
    late = spark.createDataFrame(
        [(deleted["k"], deleted["seq"] - 1, "U", 1.0)],
        schema="k long, seq int, op string, price double",
    )
    late.write.parquet(str(tmp_path / "in2"))
    s2 = (
        spark.readStream.schema("k long, seq int, op string, price double")
        .parquet(str(tmp_path / "in2"))
    )
    cdc_apply_stream(s2, state, str(tmp_path / "ckpt3")).awaitTermination()
    assert snapshot() == first


def test_cdc_apply_replay_safe_with_aqe_off(spark, tmp_path):
    """Round-11 HIGH advice: a fresh-checkpoint replay re-delivers the
    last epoch, so the apply writes v=N while the lazy merge still reads
    v=N. The old overwrite-in-place only survived because AQE happened to
    materialize the shuffle before the delete; with AQE off it emptied
    the committed dir and then failed. The tmp-write + rename commit must
    make the replay safe regardless of AQE."""
    from bert_etl_spark.operators.advanced import _cdc_ops_frame
    from bert_etl_spark.streaming.events import cdc_apply_stream, latest_cdc_state

    ops = _cdc_ops_frame(spark, SF)
    ops.coalesce(1).write.parquet(str(tmp_path / "in"))
    stream = lambda: (  # noqa: E731
        spark.readStream.schema("k long, seq int, op string, price double")
        .parquet(str(tmp_path / "in"))
    )
    state = str(tmp_path / "state")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cdc_apply_stream(stream(), state, str(tmp_path / "ck1")).awaitTermination()
        first = sorted(
            tuple(r)
            for r in latest_cdc_state(spark, state)
            .select("k", "seq", "op", "price")
            .collect()
        )
        assert first
        # one-file feed + fresh checkpoint => the replayed epoch_id
        # COLLIDES with the committed version dir it reads from
        cdc_apply_stream(stream(), state, str(tmp_path / "ck2")).awaitTermination()
        after = sorted(
            tuple(r)
            for r in latest_cdc_state(spark, state)
            .select("k", "seq", "op", "price")
            .collect()
        )
        assert after == first
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


# ---------------------------------------------------------------------------
# round-13: bucketed CDC op log — O(batch) epochs, fold-on-compact
# ---------------------------------------------------------------------------


def _cdc_feed(spark, rows, path):
    spark.createDataFrame(
        rows, schema="k long, seq int, op string, price double"
    ).coalesce(1).write.parquet(path)
    return (
        spark.readStream.schema("k long, seq int, op string, price double")
        .parquet(path)
    )


def _state_mtimes(state_dir):
    out = {}
    for b in sorted(os.listdir(state_dir)):
        if not b.startswith("bkt="):
            continue
        d = os.path.join(state_dir, b)
        out[b] = sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )
    return out


def test_cdc_epoch_touches_only_its_buckets(spark, tmp_path):
    """Round-12 top ask: a CDC epoch must read and write ONLY the bucket
    dirs its batch touches. Proof is behavioral (the ingest-test idiom):
    garbage planted in an untouched bucket would crash any full-log scan;
    the epoch neither reads it nor rewrites any untouched dir (mtimes
    frozen)."""
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    base = [(k, 0, "U", float(k)) for k in range(200)]
    ev.cdc_apply_stream(
        _cdc_feed(spark, base, str(tmp_path / "in1")),
        state,
        str(tmp_path / "ck1"),
    ).awaitTermination()
    # pick a second batch and a garbage bucket disjoint from it
    batch_keys = [1000, 1001, 1002]
    tb = {
        r["b"]
        for r in spark.createDataFrame(
            [(k,) for k in batch_keys], schema="k long"
        )
        .select(ev._cdc_bucket(ev.CDC_BUCKETS_DEFAULT).alias("b"))
        .collect()
    }
    victim = next(
        b
        for b in sorted(os.listdir(state))
        if b.startswith("bkt=") and int(b.split("=")[1]) not in tb
    )
    with open(f"{state}/{victim}/part-garbage.parquet", "w") as fh:
        fh.write("this is not parquet")
    before = _state_mtimes(state)
    try:
        ev.cdc_apply_stream(
            _cdc_feed(
                spark,
                [(k, 1, "U", 9.0) for k in batch_keys],
                str(tmp_path / "in2"),
            ),
            state,
            str(tmp_path / "ck2"),
        ).awaitTermination()
        after = _state_mtimes(state)
        touched = {f"bkt={b}" for b in tb}
        for b, files in before.items():
            if b not in touched:
                assert after[b] == files, f"untouched {b} was rewritten"
    finally:
        os.remove(f"{state}/{victim}/part-garbage.parquet")
    got = {
        r["k"]: (r["seq"], r["price"])
        for r in ev.latest_cdc_state(spark, state)
        .filter(F.col("k").isin(batch_keys))
        .collect()
    }
    assert got == {k: (1, 9.0) for k in batch_keys}


def test_cdc_compact_folds_log_and_keeps_view(spark, tmp_path):
    """cdc_compact_state folds the op log to one argmax row per key (D
    tombstones kept), one file per bucket; the reader's view is unchanged
    before/after, and an interrupted fold recovers on next read."""
    from bert_etl_spark.functions.markers import write_int_marker
    from bert_etl_spark.operators import index_lifecycle as life
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ops = (
        [(k, 0, "U", float(k)) for k in range(100)]
        + [(k, 1, "U", float(k) + 0.5) for k in range(0, 100, 2)]
        + [(k, 2, "D", None) for k in range(0, 100, 5)]
    )
    ev.cdc_apply_stream(
        _cdc_feed(spark, ops, str(tmp_path / "in")),
        state,
        str(tmp_path / "ck"),
    ).awaitTermination()
    view = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in ev.latest_cdc_state(spark, state)
        .select("k", "seq", "op", "price")
        .collect()
    )
    before = view()
    log_rows = (
        spark.read.option("basePath", state).parquet(state).count()
    )
    assert log_rows == len(ops)  # pure append: every op exactly once
    n_keys = 100
    assert ev.cdc_compact_state(spark, state) == n_keys
    assert view() == before
    assert (
        spark.read.option("basePath", state).parquet(state).count()
        == n_keys
    )
    # deletes survived the fold as tombstone rows
    assert any(r[2] == "D" for r in view())
    # interrupted fold: tmp written + sentinel stamped + marker deleted,
    # crash before the swap — the next reader recovers via open_index
    log = spark.read.option("basePath", state).parquet(state)
    tmp = f"{state}{life.TMP_SUFFIX}"
    log.repartition(4, "bkt").write.partitionBy("bkt").mode(
        "overwrite"
    ).parquet(tmp)
    write_int_marker(
        spark, f"{state}/{life.PENDING_SENTINEL}", ev.CDC_BUCKETS_DEFAULT
    )
    os.remove(f"{state}/{ev.CDC_MARKER}")
    assert view() == before
    assert not os.path.exists(tmp)
    assert not os.path.exists(f"{state}/{life.PENDING_SENTINEL}")


def test_cdc_inpath_fold_on_file_debt(spark, tmp_path):
    """compact_when_log_files_over=F: epochs below the file-debt
    threshold only append; once the log's data files exceed it, the
    in-path fold runs and resets the debt."""
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    rows = [(k, 0, "U", 1.0) for k in range(64)]
    for i, threshold in enumerate((10_000, 10_000, 1)):
        ev.cdc_apply_stream(
            _cdc_feed(
                spark,
                [(k, i + 1, "U", float(i)) for k, *_ in rows],
                str(tmp_path / f"in{i}"),
            ),
            state,
            str(tmp_path / f"ck{i}"),
            compact_when_log_files_over=threshold,
        ).awaitTermination()
    # three epochs of 64 keys: two appends survived untouched, the third
    # crossed the 1-file debt bar and folded everything to argmax rows
    assert (
        spark.read.option("basePath", state).parquet(state).count() == 64
    )
    assert ev._cdc_log_files(spark, state) <= ev.CDC_BUCKETS_DEFAULT
    got = {
        r["k"]: r["seq"] for r in ev.latest_cdc_state(spark, state).collect()
    }
    assert got == {k: 3 for k in range(64)}


def test_cdc_lookup_reads_only_request_buckets(spark, tmp_path):
    """cdc_lookup: the point read prunes to the request keys' bucket
    dirs (garbage in any other bucket is never touched) and returns the
    same rows the full argmax view holds for those keys."""
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ops = [(k, 0, "U", float(k)) for k in range(300)] + [
        (7, 1, "D", None),
        (11, 1, "U", 99.0),
    ]
    ev.cdc_apply_stream(
        _cdc_feed(spark, ops, str(tmp_path / "in")),
        state,
        str(tmp_path / "ck"),
    ).awaitTermination()
    req_keys = [7, 11, 250]
    req = spark.createDataFrame([(k,) for k in req_keys], schema="k long")
    tb = {
        r["b"]
        for r in req.select(
            ev._cdc_bucket(ev.CDC_BUCKETS_DEFAULT).alias("b")
        ).collect()
    }
    victim = next(
        b
        for b in sorted(os.listdir(state))
        if b.startswith("bkt=") and int(b.split("=")[1]) not in tb
    )
    with open(f"{state}/{victim}/part-garbage.parquet", "w") as fh:
        fh.write("this is not parquet")
    try:
        df = ev.cdc_lookup(spark, state, req)
        got = sorted(tuple(r) for r in df.collect())
        files = df.inputFiles()
        assert files and all(
            any(f"/bkt={b}/" in f for b in tb) for f in files
        ), files
    finally:
        os.remove(f"{state}/{victim}/part-garbage.parquet")
    # the full view (which WOULD have read the garbage) agrees once the
    # garbage is gone
    want = sorted(
        tuple(r)
        for r in ev.latest_cdc_state(spark, state)
        .filter(F.col("k").isin(req_keys))
        .collect()
    )
    assert got == want
    assert ("D" in {r[2] for r in got})  # the deleted key surfaces as D


def test_cdc_rebucket_migrates_layout_in_place(spark, tmp_path):
    """cdc_rebucket: the state re-buckets under the new modulus (marker
    re-stamped, every surviving dir holds only keys hashing there, the
    old-modulus-only dirs are gone), the argmax view is unchanged, and
    cdc_lookup prunes under the NEW modulus (garbage planted in an
    un-requested new-modulus bucket is never touched)."""
    from bert_etl_spark.functions.markers import read_int_marker
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ops = [(k, 0, "U", float(k)) for k in range(200)] + [
        (3, 1, "D", None),
        (5, 1, "U", 50.0),
    ]
    ev.cdc_apply_stream(
        _cdc_feed(spark, ops, str(tmp_path / "in")),
        state,
        str(tmp_path / "ck"),
        n_buckets=8,
    ).awaitTermination()
    before = sorted(
        tuple(r) for r in ev.latest_cdc_state(spark, state).collect()
    )
    n = ev.cdc_rebucket(spark, state, 64)
    assert n == 200
    assert read_int_marker(spark, f"{state}/{ev.CDC_MARKER}") == 64
    # every remaining dir is a new-modulus dir holding only its own keys
    log = spark.read.option("basePath", state).parquet(state)
    bad = log.filter(
        F.pmod(F.xxhash64(F.col("k")), F.lit(64)).cast("int")
        != F.col("bkt")
    ).count()
    assert bad == 0
    assert (
        sorted(tuple(r) for r in ev.latest_cdc_state(spark, state).collect())
        == before
    )
    # lookup prunes under the NEW modulus
    req_keys = [3, 5, 77]
    req = spark.createDataFrame([(k,) for k in req_keys], schema="k long")
    tb = {r["b"] for r in req.select(ev._cdc_bucket(64).alias("b")).collect()}
    victim = next(
        b
        for b in sorted(os.listdir(state))
        if b.startswith("bkt=") and int(b.split("=")[1]) not in tb
    )
    with open(f"{state}/{victim}/part-garbage.parquet", "w") as fh:
        fh.write("this is not parquet")
    try:
        df = ev.cdc_lookup(spark, state, req)
        got = sorted(tuple(r) for r in df.collect())
        files = df.inputFiles()
        assert files and all(
            any(f"/bkt={b}/" in f for b in tb) for f in files
        ), files
    finally:
        os.remove(f"{state}/{victim}/part-garbage.parquet")
    assert {r[0] for r in got} == set(req_keys)
    assert ("D" in {r[2] for r in got})


def test_cdc_rebucket_crash_mid_swap_recovers(spark, tmp_path):
    """A crash inside the re-bucket's sentinel window (tmp written,
    sentinel carrying the NEW modulus stamped, marker deleted) is
    finished by the next reader via open_index: the marker re-stamps at
    the NEW modulus and the view is correct. Old-modulus dirs that
    survive the recovery hold pure duplicates (argmax-masked); the next
    cdc_compact_state removes them physically."""
    import os as _os

    from bert_etl_spark.functions.markers import read_int_marker, write_int_marker
    from bert_etl_spark.operators.index_lifecycle import PENDING_SENTINEL, TMP_SUFFIX
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ops = [(k, 0, "U", float(k)) for k in range(100)]
    ev.cdc_apply_stream(
        _cdc_feed(spark, ops, str(tmp_path / "in")),
        state,
        str(tmp_path / "ck"),
        n_buckets=4,
    ).awaitTermination()
    before = sorted(
        tuple(r) for r in ev.latest_cdc_state(spark, state).collect()
    )
    # construct the crash window by hand: the exact state cdc_rebucket
    # leaves if killed right after deleting the old marker
    new_nb = 16
    log = spark.read.option("basePath", state).parquet(state)
    folded = ev._cdc_argmax(log).withColumn("bkt", ev._cdc_bucket(new_nb))
    tmp = f"{state}{TMP_SUFFIX}"
    folded.repartition(8, "bkt").write.partitionBy("bkt").mode(
        "overwrite"
    ).parquet(tmp)
    write_int_marker(spark, f"{state}/{PENDING_SENTINEL}", new_nb)
    _os.remove(f"{state}/{ev.CDC_MARKER}")
    # next reader recovers: marker at NEW modulus, view unchanged
    after = sorted(
        tuple(r) for r in ev.latest_cdc_state(spark, state).collect()
    )
    assert after == before
    assert read_int_marker(spark, f"{state}/{ev.CDC_MARKER}") == new_nb
    # stale old-modulus dirs may remain (duplicates, argmax-masked);
    # the next fold re-hashes bkt and removes them
    ev.cdc_compact_state(spark, state)
    log2 = spark.read.option("basePath", state).parquet(state)
    assert log2.filter(
        F.pmod(F.xxhash64(F.col("k")), F.lit(new_nb)).cast("int")
        != F.col("bkt")
    ).count() == 0
    assert (
        sorted(tuple(r) for r in ev.latest_cdc_state(spark, state).collect())
        == before
    )


def test_cdc_schema_evolution_and_replay(spark, tmp_path):
    """A later batch that GROWS the payload schema surfaces the new
    column NULL-backfilled on older rows, in the full view, the point
    lookup, and across a fold; a fresh-checkpoint replay of the evolved
    stream is a no-op (round-13 'next round' item #4 — the reference's
    work items are schemaless dicts, /root/reference/bert/queues.py)."""
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ev.cdc_apply_stream(
        _cdc_feed(
            spark, [(k, 0, "U", float(k)) for k in range(40)],
            str(tmp_path / "in1"),
        ),
        state,
        str(tmp_path / "ck1"),
    ).awaitTermination()

    def evolved_feed(path):
        spark.createDataFrame(
            [(k, 1, "U", float(k) + 5.0, "eur") for k in range(0, 40, 2)],
            schema="k long, seq int, op string, price double, currency string",
        ).coalesce(1).write.mode("ignore").parquet(path)
        return (
            spark.readStream.schema(
                "k long, seq int, op string, price double, currency string"
            ).parquet(path)
        )

    ev.cdc_apply_stream(
        evolved_feed(str(tmp_path / "in2")), state, str(tmp_path / "ck2")
    ).awaitTermination()

    def snapshot():
        return sorted(
            tuple(r)
            for r in ev.latest_cdc_state(spark, state)
            .select("k", "seq", "price", "currency")
            .collect()
        )

    first = snapshot()
    assert (0, 1, 5.0, "eur") in first  # evolved row carries the column
    assert (1, 0, 1.0, None) in first  # pre-evolution row NULL-backfills
    # point lookup sees the merged schema
    lk = ev.cdc_lookup(
        spark, state, spark.createDataFrame([(0,), (1,)], "k long")
    )
    assert sorted((r.k, r.currency) for r in lk.collect()) == [
        (0, "eur"),
        (1, None),
    ]
    # replay of the evolved stream through a FRESH checkpoint: no-op
    ev.cdc_apply_stream(
        evolved_feed(str(tmp_path / "in2")), state, str(tmp_path / "ck3")
    ).awaitTermination()
    assert snapshot() == first
    # fold across the schema boundary keeps the merged schema + values
    ev.cdc_compact_state(spark, state)
    assert snapshot() == first


def test_cdc_stamped_but_empty_state_readers(spark, tmp_path):
    """The first-contact crash window (marker + _schema stamped, no data
    yet): latest_cdc_state and cdc_lookup return EMPTY frames typed from
    the schema artifact instead of a parquet-inference error, and
    cdc_compact_state is a no-op returning 0 (round-13 advice, 'low'
    items; VERDICT r13 robustness nit)."""
    import json as _json

    from pyspark.sql import functions as F  # noqa: F811

    from bert_etl_spark.functions.markers import write_int_marker, write_text_marker
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    os.makedirs(state)
    ops_schema = (
        spark.createDataFrame(
            [], "k long, seq int, op string, price double"
        )
        .select(
            "*",
            F.lit("x").alias("opkey"),
            F.lit(0).cast("int").alias("bkt"),
        )
        .schema
    )
    write_text_marker(
        spark, f"{state}/{ev.CDC_SCHEMA_ARTIFACT}", ops_schema.json()
    )
    write_int_marker(spark, f"{state}/{ev.CDC_MARKER}", 8)
    st = ev.latest_cdc_state(spark, state)
    assert st.count() == 0
    assert st.columns == ["k", "seq", "op", "price"]
    lk = ev.cdc_lookup(
        spark, state, spark.createDataFrame([(1,)], "k long")
    )
    assert lk.count() == 0 and lk.columns == ["k", "seq", "op", "price"]
    assert ev.cdc_compact_state(spark, state) == 0
    # a pre-artifact dir (no _schema) raises the DESCRIPTIVE error
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    write_int_marker(spark, f"{bare}/{ev.CDC_MARKER}", 8)
    with pytest.raises(ValueError, match="stamped but holds no data"):
        ev.latest_cdc_state(spark, bare)


def test_cdc_first_contact_stamps_schema_artifact(spark, tmp_path):
    """cdc_apply_stream's first contact writes the _schema artifact (the
    ops schema, opkey/bkt included) before the layout marker."""
    import json as _json

    from pyspark.sql.types import StructType

    from bert_etl_spark.functions.markers import read_text_marker
    from bert_etl_spark.streaming import events as ev

    state = str(tmp_path / "state")
    ev.cdc_apply_stream(
        _cdc_feed(spark, [(1, 0, "U", 1.0)], str(tmp_path / "in")),
        state,
        str(tmp_path / "ck"),
    ).awaitTermination()
    txt = read_text_marker(spark, f"{state}/{ev.CDC_SCHEMA_ARTIFACT}")
    assert txt is not None
    schema = StructType.fromJson(_json.loads(txt))
    assert [f.name for f in schema.fields] == [
        "k", "seq", "op", "price", "opkey", "bkt",
    ]


def test_cdc_index_sync_watermark_and_replay(spark, tmp_path):
    """cdc_index_sync: the first sync applies the full state to the
    standing IVF index (delete + replace); an immediate re-sync is a
    watermark no-op; wiping the watermark (crash before it was written)
    replays a superset delta and converges to the IDENTICAL index
    state; a second CDC epoch syncs only its delta keys."""
    import bert_etl_spark.operators.similarity as sim
    from bert_etl_spark.operators import index_lifecycle as life
    from bert_etl_spark.streaming import events as ev

    idx = str(tmp_path / "ivf")
    sim._ivf_assign(spark, SF, index_dir=idx)
    emb = tbl(spark, SF, "embeddings")
    schema = "k long, seq int, op string, embedding array<float>, label int"

    def ops(seq, delta):
        upd = emb.filter(F.col("vec_id") == 100).select(
            F.col("vec_id").alias("k"),
            F.lit(seq).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.transform(
                "embedding",
                lambda x: (x.cast("double") + F.lit(delta)).cast("float"),
            ).alias("embedding"),
            F.col("label").cast("int").alias("label"),
        )
        return upd

    dele = spark.createDataFrame([(40,)], "k long").select(
        "k",
        F.lit(1).cast("int").alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(None).cast("int").alias("label"),
    )
    state = str(tmp_path / "state")

    def drain(df, name):
        df.coalesce(1).write.parquet(str(tmp_path / name))
        ev.cdc_apply_stream(
            spark.readStream.schema(schema).parquet(str(tmp_path / name)),
            state,
            str(tmp_path / f"ck_{name}"),
        ).awaitTermination()

    up = lambda b: sim.ivf_index_upsert(spark, b, idx)  # noqa: E731
    de = lambda ks: sim.ivf_index_delete(spark, ks, idx)  # noqa: E731

    def sync():
        return ev.cdc_index_sync(
            spark, state, idx, up, de, payload_cols=("embedding", "label")
        )

    def live_rows():
        phys = spark.read.option("basePath", idx).parquet(idx)
        return sorted(
            (r.vec_id, r.cell, tuple(r.e))
            for r in life.apply_tombstones(spark, idx, phys, "vec_id")
            .select("vec_id", "cell", "e")
            .collect()
        )

    drain(ops(1, 1.5).unionByName(dele), "in1")
    assert sync() == (1, 1, 0)  # 40 deleted, 100 replaced
    snap1 = live_rows()
    assert not any(v == 40 for v, _c, _e in snap1)
    assert sync() == (0, 0, 0)  # watermark no-op
    # crash before the watermark landed: replay the superset delta
    os.remove(f"{idx}/{ev.CDC_SYNCED_SEQ}")
    # re-applied delta: the delete is a no-op (40 already tombstoned),
    # the upsert a deterministic rewrite...
    assert sync() == (0, 1, 0)
    assert live_rows() == snap1  # ...converging to the identical state
    # epoch 2: only the re-updated key rides the delta
    drain(ops(2, 4.5), "in2")
    assert sync() == (0, 1, 0)
    got = dict((v, e) for v, _c, e in live_rows())
    want = [
        float(x) + 4.5
        for x in emb.filter(F.col("vec_id") == 100).first()["embedding"]
    ]
    assert got[100] == pytest.approx(want)
