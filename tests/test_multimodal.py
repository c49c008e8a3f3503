"""Multimodal plumbing: Arrow batch shapes, binary payload integrity,
1→N frame fan-out through mapInPandas."""

from __future__ import annotations

from bert_etl_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    DECODE_SCHEMA,
    decode_media_batch,
    frame_sample_batch,
    with_media,
)


def _docs(spark):
    texts = [("x" * 100,), ("ab" * 300,), ("q" * (FRAME_BYTES * 9),)]
    return spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_media_payload_is_exact_bytes(spark):
    media = with_media(_docs(spark)).collect()
    assert bytes(media[0].media) == b"x" * 100
    assert media[0].media_meta.n_bytes == 100
    assert media[0].media_meta.mime == "fake/gray8"


def test_decode_batch_schema_and_values(spark):
    out = with_media(_docs(spark)).mapInPandas(decode_media_batch, DECODE_SCHEMA)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].n_pixels == 100
    assert rows[0].width == 16 + 100 % 16
    assert rows[0].mean_intensity == float(ord("x"))
    # geometry covers all pixels
    for r in rows.values():
        assert r.width * r.height >= r.n_pixels > r.width * (r.height - 1)


def test_frame_sample_fanout(spark):
    out = with_media(_docs(spark)).mapInPandas(
        frame_sample_batch, "doc_id long, frame_idx int, frame_md5 string"
    )
    rows = [r for r in out.collect() if r.doc_id == 2]
    # doc 2 has exactly 9 frames → kept frames 0,4,8
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 4, 8]
    assert len({r.frame_md5 for r in rows}) == 1  # identical bytes → same digest
