"""Reference-parity tests (SURVEY §5.2): identity determinism, dataset
sinks, incremental-ingest ledger idempotence, ndarray codec round-trip,
function-result cache, and the canonical generate→map→consume pipeline."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bert_etl_spark import pipeline as P
from bert_etl_spark.functions.cache import cached_table
from bert_etl_spark.functions.codecs import (
    decode_ndarray,
    decode_ndarray_value,
    encode_ndarray,
    encode_ndarray_value,
)
from bert_etl_spark.functions.identity import with_identity
from bert_etl_spark.sources.sinks import (
    append_dataset,
    incremental_ingest,
    overwrite_dataset,
    read_dataset,
)


def test_identity_is_deterministic_and_column_order_free(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([("x", 1), ("y", 2)], "v string, id long").select("v", "id")
    ha = {r.identity for r in with_identity(a).collect()}
    hb = {r.identity for r in with_identity(b).collect()}
    assert ha == hb  # canonical JSON sorts columns → same content, same hash
    assert ha == {r.identity for r in with_identity(a).collect()}  # stable re-run


def test_dataset_append_vs_overwrite(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(5)
    append_dataset(df, path)
    append_dataset(df, path)
    assert read_dataset(spark, path).count() == 10  # ETLDataset.add semantics
    overwrite_dataset(df, path)
    assert read_dataset(spark, path).count() == 5  # ETLDataset.update semantics


def test_incremental_ingest_is_idempotent(spark, tmp_path):
    ds, ledger = str(tmp_path / "data"), str(tmp_path / "ledger")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "id long, v string"
    )
    assert incremental_ingest(batch, ds, ledger) == 3  # within-batch dup collapsed
    assert incremental_ingest(batch, ds, ledger) == 0  # re-ingest is a no-op
    assert read_dataset(spark, ds).count() == 3

    batch2 = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
    assert incremental_ingest(batch2, ds, ledger) == 1  # only the new row
    assert read_dataset(spark, ds).count() == 4


def test_ndarray_codec_roundtrip_local():
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    assert (decode_ndarray_value(encode_ndarray_value(arr)) == arr).all()
    # rank-1 float32 → exact too
    v = np.array([1.5, -2.25, 3.0], dtype=np.float32)
    out = decode_ndarray_value(encode_ndarray_value(v))
    assert out.dtype == np.float32 and (out == v).all()


def test_ndarray_codec_roundtrip_spark(spark):
    vecs = [[1.0, 2.5, -3.0], [0.0, 4.0, 8.0], None]
    df = spark.createDataFrame([(v,) for v in vecs], "vec array<double>")
    back = (
        df.withColumn("wire", encode_ndarray("vec"))
        .withColumn("decoded", decode_ndarray("wire"))
        .collect()
    )
    for row in back:
        assert row.decoded == row.vec


def test_cached_table_builds_once(spark, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).withColumn("sq", F.pow("id", 2))

    d = str(tmp_path / "cache")
    a = cached_table(spark, d, ("square", 10), build)
    b = cached_table(spark, d, ("square", 10), build)
    assert a.count() == b.count() == 10
    assert len(calls) == 1  # second call served from the materialized table


def test_canonical_pipeline_chain(spark):
    """The reference's doc example (docs/index.rst:44-76): generate idx →
    square via pow → consume. Jobs become DataFrame transforms; the chain is
    one fused lazy plan."""
    P.clear_registry()

    @P.follow(None)
    def generate(df):
        return df  # root: the seeded generator is the input DataFrame

    @P.follow(generate)
    def square(df):
        return df.withColumn("calculated-result", F.pow("idx", 2))

    @P.follow(square)
    def inspect(df):
        return df.select("idx", "calculated-result")

    chain = P.build_job_chain()
    assert [f.__name__ for f in chain] == ["generate", "square", "inspect"]

    out = P.Pipeline(*chain).run(spark.range(10).withColumnRenamed("id", "idx"))
    rows = {r["idx"]: r["calculated-result"] for r in out.collect()}
    assert rows[3] == 9.0 and len(rows) == 10

    # reference rule: one child per parent (bert/binding.py:125-126)
    import pytest as _pytest

    with _pytest.raises(P.PipelineError):

        @P.follow(generate)
        def second_child(df):
            return df


def test_pipeline_checkpoint_replay(spark, tmp_path):
    P.clear_registry()
    stages = [
        lambda df: df.withColumn("a", F.col("id") + 1),
        lambda df: df.withColumn("b", F.col("a") * 2),
    ]
    pipe = P.Pipeline(*stages, checkpoint_dir=str(tmp_path / "ckpt"))
    out = pipe.run(spark.range(5), checkpoint_stages={0})
    assert out.select(F.sum("b")).first()[0] == 30
    # stage-0 materialization exists → downstream can be re-run from it
    replay = spark.read.parquet(str(tmp_path / "ckpt" / "stage_0"))
    assert replay.columns == ["id", "a"]


def test_streaming_query_listener_observability(spark, tmp_path):
    """Execution tracking / stalled-job liveness (SURVEY 2A#30/31): the
    reference's monitor reads run-records; Spark surfaces query lifecycle
    via StreamingQueryListener."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    events = {"started": [], "progress": [], "terminated": []}

    class Tracker(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"].append(e.id)

        def onQueryProgress(self, e):
            events["progress"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"].append(e.id)

    spark.streams.addListener(listener := Tracker())
    try:
        src = str(tmp_path / "obs_src")
        spark.range(10).write.parquet(src)
        q = (
            spark.readStream.schema("id long").parquet(src)
            .writeStream.format("memory").queryName("t_obs")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        deadline = time.time() + 15
        while not events["terminated"] and time.time() < deadline:
            time.sleep(0.2)
        assert events["started"], "listener saw query start"
        assert events["terminated"], "listener saw query terminate"
    finally:
        spark.streams.removeListener(listener)


def test_follow_schema_validation(spark):
    """follow(schema=...) — the marshmallow ingest-validation parity
    (/root/reference/bert/binding.py:38,95-96): input conformed via
    DataFrame.to before the stage body; missing columns fail analysis."""
    from pyspark.sql import functions as F

    from bert_etl_spark import pipeline

    pipeline.clear_registry()

    @pipeline.follow(schema="idx long, score double")
    def scale(df):
        return df.withColumn("scaled", F.col("score") * 2)

    good = spark.createDataFrame(
        # extra column is pruned; int idx upcast to long
        [(1, 0.5, "x"), (2, 1.5, "y")], "idx int, score double, extra string"
    )
    rows = pipeline.build_job_chain()[0](good).orderBy("idx").collect()
    assert [r.scaled for r in rows] == [1.0, 3.0]
    assert "extra" not in rows[0].asDict()

    bad = spark.createDataFrame([(1,)], "idx int")  # score missing
    try:
        scale(bad)
        raise AssertionError("expected PipelineError for missing column")
    except pipeline.PipelineError as e:
        assert "score" in str(e)
    finally:
        pipeline.clear_registry()


def test_maxsim_ivf_recall_floor(spark):
    """The pruned MaxSim path must stay trustworthy: average recall@5 of
    sim_maxsim_ivf vs the exact scorer >= 0.8 at the registered knobs
    (P=1, 64 cells — measured 0.93 at all three fixture SFs when the
    two-stage candidate/rerank design landed). A knob or design change
    that silently degrades the candidate generation fails here, not in
    production."""
    from bert_etl_spark.operators.registry import ALL_QUERIES, load_all

    load_all()
    rows = ALL_QUERIES["sim_maxsim_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    avg = sum(r.recall_at_k for r in rows) / len(rows)
    assert avg >= 0.8, f"maxsim IVF recall fell to {avg:.2f}"
