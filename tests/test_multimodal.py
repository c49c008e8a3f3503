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


def test_dhash_near_identical_payloads_collide(spark):
    from bert_etl_spark.operators.multimodal import dhash_band_pairs, dhash_bits

    base = "".join(chr(97 + (i * 7) % 26) for i in range(130))
    # one-byte intensity edit at a fixed position: same length means the
    # same sampled positions, so at most 2 dHash bits flip -> at least 3 of
    # 4 bands still match (pigeonhole) and the pair MUST surface
    edited = base[:50] + chr(ord(base[50]) + 1) + base[51:]
    unrelated = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(130))
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, base), (3, unrelated)],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_i, r.doc_j): r.hamming
        for r in dhash_band_pairs(dhash_bits(df)).collect()
    }
    assert pairs.get((0, 2)) == 0  # identical payloads: hamming 0
    assert (0, 1) in pairs and pairs[(0, 1)] <= 2  # near-identical
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    # unrelated payload may band-collide by chance but never at near-dup
    # distance
    for (i, j), h in pairs.items():
        if 3 in (i, j):
            assert h > 3, ((i, j), h)


def test_dhash_band_width_scales_with_corpus_size():
    """Pin the adaptive width at representative corpus sizes: the floor
    (classic 64-bit dHash) at test SFs, ~log2 N past saturation, and the
    BIGINT packing cap. w = clamp(ceil(log2(N/occ)), 16, 63), occ = 4."""
    from bert_etl_spark.operators.multimodal import dhash_band_bits

    assert dhash_band_bits(500) == 16           # test-SF corpus: floor
    assert dhash_band_bits(4 * 2**16) == 16     # exactly at saturation
    assert dhash_band_bits(4 * 2**16 + 1) == 17  # first doc past it widens
    assert dhash_band_bits(500_000) == 17       # the 100x replica
    assert dhash_band_bits(10**10) == 32        # ~100 TB of ~10 KB docs
    assert dhash_band_bits(2**80) == 63         # packing cap: signed BIGINT
    # the knob: halving target occupancy widens by one bit
    assert dhash_band_bits(500_000, 2.0) == 18


def test_occupancy_ratio_bounded_for_non_dyadic_knobs():
    """Round-9 advice: a non-dyadic knob (3.3) must yield a SMALL exact
    ratio (33/10), not float.as_integer_ratio()'s ~2^50 denominator that
    overflows the oracle's COUNT(*) * denom in DuckDB BIGINT. Dyadic
    sub-unit knobs (2^-12, used by the adaptive-width test) stay exact;
    degenerate knobs clamp safely."""
    from bert_etl_spark.operators.multimodal import (
        _occupancy_ratio,
        dhash_band_bits,
    )

    assert _occupancy_ratio(4.0) == (4, 1)
    assert _occupancy_ratio(3.3) == (33, 10)
    assert _occupancy_ratio(1.0 / 4096) == (1, 4096)
    n, d = _occupancy_ratio(1e-9)  # below the bound: clamps, never 0/1
    assert n >= 1 and d <= 10**6
    assert _occupancy_ratio(0.0) == (1, 1)
    assert _occupancy_ratio(-2.0) == (1, 1)
    # the downstream integer derivation stays sane at 100 TB scale
    assert 16 <= dhash_band_bits(10**10, 3.3) <= 63


def test_dhash_adaptive_width_matches_duckdb_oracle(spark):
    """Run the WHOLE pipeline with the adaptive width genuinely ENGAGED
    (occupancy forced tiny so w > the 16-bit floor on a small corpus) and
    value-check Spark against the DuckDB oracle generated with the same
    knob — proving the width parameter threads both engines identically,
    not just at the floor the registered query hits at test SFs."""
    import duckdb

    from bert_etl_spark.operators.multimodal import (
        dhash_band_bits,
        dhash_band_pairs,
        dhash_bits,
        dhash_oracle_sql,
    )

    occ = 1.0 / 4096  # 40 docs / 2^-12 -> w = ceil(log2(163840)) = 18
    texts = [
        (i, "".join(chr(97 + (i * k + 7 * k * k) % 26) for k in range(80 + i)))
        for i in range(38)
    ] + [(100, "".join(chr(97 + (k * 5) % 26) for k in range(90)))] * 1 + [
        (101, "".join(chr(97 + (k * 5) % 26) for k in range(90)))
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    w = dhash_band_bits(df.count(), occ)
    assert w > 16  # non-vacuous: the adaptive branch is engaged
    got = sorted(
        (r.doc_i, r.doc_j, r.hamming)
        for r in dhash_band_pairs(dhash_bits(df, band_w=w)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in texts)
        + ") AS t(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            dhash_oracle_sql(target_occupancy=occ)
        ).fetchall()
    )
    assert got == want
    assert (100, 101, 0) in got  # the planted exact pair survives widening
