"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched ``mapInPandas``
operators (SURVEY §2B north-star; reference pattern: bytes payloads in queue
items, /root/reference bert/encoders/base.py:31-32,124-125).

The container has no image/audio codecs, so the decode step is a
deterministic STUB: media bytes are synthesized from document text (UTF-8),
"pixels" are the raw bytes, geometry is derived arithmetically from the byte
length. The Spark-side plumbing — binary columns, metadata struct, UDF
signatures, Arrow batch iteration, partitioning — is real and tested; a real
decoder drops into ``decode_media_batch`` behind the import-try.

Because the fake decode is pure arithmetic on bytes (and the corpus is
ASCII), the Pandas-UDF path itself is oracle-checked: DuckDB reproduces the
same features from character codes. That pins the batch shape, schema, and
per-row semantics of the Python boundary — the part that usually goes
untested.

Scale: mapInPandas streams Arrow batches (spark.sql.execution.arrow.
maxRecordsPerBatch) — constant memory per task regardless of table size;
media blobs never pass through a shuffle (metadata-only columns do).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bert_etl_spark.operators.registry import query, tbl

# Real decoders (PIL/libvips/ffmpeg) are intentionally NOT used even when
# importable: the deterministic byte-stub below is the contract this
# container tests against. Swapping in a real decoder means replacing the
# np.frombuffer line in decode_media_batch — schema, Arrow batching, and
# downstream plumbing stay identical.

FRAME_BYTES = 256  # fake "frame" size for the video-sampling stand-in
FRAME_STRIDE = 4   # keep every 4th frame


def with_media(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("fake/gray8").alias("mime"),
        ).alias("media_meta"),
    )


def _geometry(n_bytes: int) -> tuple[int, int]:
    """Deterministic fake geometry: width from byte length, height = rows."""
    width = 16 + n_bytes % 16
    height = (n_bytes + width - 1) // width
    return width, height


def decode_media_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: binary → per-media features.

    STUB decode: treats bytes as 8-bit gray pixels. A real image decoder
    (PIL/libvips) would replace the `np.frombuffer` line only — schema,
    batching, and downstream plumbing stay identical.
    """
    for pdf in it:
        rows = []
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            buf = np.frombuffer(media, dtype=np.uint8)
            width, height = _geometry(len(buf))
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": width,
                    "height": height,
                    "n_pixels": len(buf),
                    "mean_intensity": float(buf.sum()) / len(buf) if len(buf) else None,
                }
            )
        yield pd.DataFrame(rows)


DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, mean_intensity double"
)


def frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video-sampling stand-in: split bytes into FRAME_BYTES chunks, keep
    every FRAME_STRIDE-th chunk, emit a digest per kept frame (1→N fan-out
    through the Arrow boundary)."""
    import hashlib

    for pdf in it:
        out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            n_frames = len(media) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                chunk = media[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


RESIZE_STRIDE = 4  # keep every 4th pixel — the downsample stand-in


def resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize stub: stride-downsample the pixel buffer (a real implementation
    would interpolate via PIL/OpenCV — same signature, same plumbing)."""
    import hashlib

    for pdf in it:
        rows = []
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            buf = np.frombuffer(media, dtype=np.uint8)
            small = buf[::RESIZE_STRIDE]
            rows.append(
                {
                    "doc_id": doc_id,
                    "orig_bytes": len(buf),
                    "resized_bytes": len(small),
                    "resized_md5": hashlib.md5(small.tobytes()).hexdigest(),
                }
            )
        yield pd.DataFrame(rows)


RESIZE_SCHEMA = "doc_id long, orig_bytes long, resized_bytes long, resized_md5 string"

HIST_BINS = 16


def histogram_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature extraction stub: 16-bin intensity histogram per media blob —
    the fixed-length feature-vector pattern (real: embeddings/SIFT/etc.)."""
    for pdf in it:
        out = {"doc_id": [], "bin": [], "n": []}
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            buf = np.frombuffer(media, dtype=np.uint8)
            counts = np.bincount(buf // HIST_BINS, minlength=HIST_BINS)[:HIST_BINS]
            for b, n in enumerate(counts):
                if n:
                    out["doc_id"].append(doc_id)
                    out["bin"].append(b)
                    out["n"].append(int(n))
        yield pd.DataFrame(out)


HIST_SCHEMA = "doc_id long, bin int, n long"


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'fake/gray8' AS mime
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.mime").alias("mime"),
    )


# The Pandas-UDF decode path, oracle-checked: ASCII text ⇒ byte == code
# point, so DuckDB recomputes mean intensity from character codes.
@query(
    "multimodal_decode",
    oracle="""
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               list_aggregate(list_transform(range(length(text)),
                   i -> ord(substr(text, i + 1, 1))), 'sum') AS total
        FROM documents
    )
    SELECT doc_id,
           CAST(16 + n % 16 AS INT) AS width,
           CAST((n + (16 + n % 16) - 1) // (16 + n % 16) AS INT) AS height,
           n AS n_pixels,
           CAST(total AS DOUBLE) / n AS mean_intensity
    FROM b
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.mapInPandas(decode_media_batch, DECODE_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, text,
               unnest(range(octet_length(encode(text)) // {FRAME_BYTES})) AS frame_idx
        FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM frames WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.mapInPandas(frame_sample_batch, FRAME_SCHEMA)


# Resize through the Arrow boundary; stride-sampling of ASCII bytes is
# reproducible in SQL (every 4th character), so the resized digest is
# value-checked too.
@query(
    "multimodal_resize",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               array_to_string(list_transform(
                   range(0, octet_length(encode(text)), {RESIZE_STRIDE}),
                   i -> substr(text, i + 1, 1)), '') AS small
        FROM documents
    )
    SELECT doc_id, n AS orig_bytes,
           length(small) AS resized_bytes,
           md5(small) AS resized_md5
    FROM s
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.mapInPandas(resize_batch, RESIZE_SCHEMA)


@query(
    "multimodal_histogram",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               ord(substr(text, unnest(range(length(text))) + 1, 1)) // {HIST_BINS} AS bin
        FROM documents
    )
    SELECT doc_id, CAST(bin AS INT) AS bin, COUNT(*) AS n
    FROM px GROUP BY doc_id, bin
    """,
)
def multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.mapInPandas(histogram_batch, HIST_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality: bytes as 16-bit little-endian PCM at a fake sample rate.
# The stub "decoder" is np.frombuffer('<i2') — a real one (soundfile/ffmpeg)
# replaces that one line; schema, Arrow batching, and the per-blob feature
# shape (duration/RMS/peak — the triage features of an audio-corpus
# pipeline) stay identical. Pure map over mapInPandas: no shuffle at any
# corpus size.
# ---------------------------------------------------------------------------

SAMPLE_RATE = 8000


def audio_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
            n = len(media) // 2
            if n == 0:
                rows.append(
                    {"doc_id": doc_id, "n_samples": 0, "duration_s": None,
                     "rms": None, "peak": None}
                )
                continue
            pcm = np.frombuffer(media[: n * 2], dtype="<i2").astype(np.int64)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_samples": n,
                    "duration_s": round(n / SAMPLE_RATE, 6),
                    # integer sum of squares is exact → double math at the
                    # end only (deterministic across engines)
                    "rms": round(float(np.sqrt(int((pcm * pcm).sum()) / n)), 6),
                    "peak": int(np.abs(pcm).max()),
                }
            )
        yield pd.DataFrame(rows)


AUDIO_SCHEMA = "doc_id long, n_samples long, duration_s double, rms double, peak long"


@query(
    "multimodal_audio_features",
    oracle=f"""
    WITH pcm AS (
        SELECT doc_id,
               octet_length(encode(text)) // 2 AS n,
               list_transform(range(octet_length(encode(text)) // 2),
                   i -> CASE WHEN ord(substr(text, 2*i + 2, 1)) >= 128
                             THEN ord(substr(text, 2*i + 1, 1))
                                  + 256 * ord(substr(text, 2*i + 2, 1)) - 65536
                             ELSE ord(substr(text, 2*i + 1, 1))
                                  + 256 * ord(substr(text, 2*i + 2, 1)) END
               ) AS samples
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CASE WHEN n = 0 THEN NULL
                ELSE ROUND(n / {SAMPLE_RATE}.0, 6) END AS duration_s,
           CASE WHEN n = 0 THEN NULL
                ELSE ROUND(sqrt(CAST(list_aggregate(
                         list_transform(samples, s -> s * s), 'sum')
                     AS DOUBLE) / n), 6) END AS rms,
           CASE WHEN n = 0 THEN NULL
                ELSE CAST(list_aggregate(
                         list_transform(samples, s -> abs(s)), 'max')
                     AS BIGINT) END AS peak
    FROM pcm
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    return media.mapInPandas(audio_features_batch, AUDIO_SCHEMA)


# Two-stage byte-dedup over the opaque media column — the first pass of
# every image/audio dedup pipeline (perceptual hashing only runs on what
# survives byte-level collapse). Stage 1 hashes only the HEADER BLOCK
# (first 64 bytes): at 100 TB this reads a fraction of each blob (or just
# the stored header chunk) and is the cheap prefilter. Stage 2 confirms
# candidates with the full-payload sha2 — only rows whose header collided
# pay for the full hash in a real deployment. Both hashes shuffle by
# uniformly-distributed digests: no skew by construction. Output: one row
# per header-collision group with how many members are byte-identical
# (n_dup_copies = 0 means the prefilter collided but stage 2 cleared it).
HEADER_BYTES = 64


@query(
    "multimodal_dedup_exact",
    oracle=f"""
    WITH h AS (
        -- sha256 over VARCHAR hashes the UTF-8 bytes = sha2(binary) Spark-side
        SELECT doc_id, sha256(substr(text, 1, {HEADER_BYTES})) AS header_hash,
               sha256(text) AS content_hash
        FROM documents
    )
    SELECT header_hash,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(COUNT(DISTINCT content_hash) AS BIGINT) AS n_distinct_payloads,
           CAST(COUNT(*) - COUNT(DISTINCT content_hash) AS BIGINT)
               AS n_dup_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
    FROM h GROUP BY header_hash
    HAVING COUNT(*) > 1
    """,
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media(tbl(spark, sf_dir, "documents"))
    h = media.select(
        "doc_id",
        F.sha2(F.expr(f"substring(media, 1, {HEADER_BYTES})"), 256).alias(
            "header_hash"
        ),
        F.sha2(F.col("media"), 256).alias("content_hash"),
    )
    return (
        h.groupBy("header_hash")
        .agg(
            F.count("*").alias("n_candidates"),
            F.count_distinct("content_hash").alias("n_distinct_payloads"),
            (F.count("*") - F.count_distinct("content_hash")).alias("n_dup_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_candidates") > 1)
    )


# ---------------------------------------------------------------------------
# perceptual near-dup: dHash over the gray8 payload + banded Hamming
# ---------------------------------------------------------------------------

# Difference-hash (dHash), the classic perceptual image fingerprint: sample
# 4w+1 evenly-spaced "pixels" (bytes of the gray8 payload), each bit records
# whether intensity rises between neighbors; near-identical images differ
# in few bits. Candidate generation reuses the SimHash trick — 4 bands of w
# exact bits, exact for Hamming <= 3 by pigeonhole — so the join is banded,
# never all-pairs. The band width w is ADAPTIVE in corpus size: w =
# clamp(ceil(log2(N / occupancy)), 16, 63), i.e. ~log2 N bits per band, so
# expected bucket occupancy stays CONSTANT as the corpus grows instead of
# the within-bucket quadratic term exploding past ~occupancy*2^16 docs (the
# r6/r7 static-band saturation SCALING.md measured at alpha 0.71). Band
# keys are the w-bit slices PACKED INTO BIGINTs — the join key is 8 bytes,
# not a 32-char md5 string, and verification ships the same four packed
# longs + bit_count(xor) (the round-5 SimHash shuffle-volume lesson).
# Because the fake decode is pure byte arithmetic, the WHOLE pipeline
# (sampling, adaptive width, banding, verification) is SQL-expressible and
# value-checked — the oracle derives the SAME w from COUNT(*) inline, so
# the two engines cannot drift. The synthetic corpus plants no
# visually-near payloads, so the registered query emits every band
# candidate WITH its verified Hamming distance (the banding false-positive
# floor — what an index tuner inspects); the <=3 near-dup behavior itself
# is pinned by a unit test with planted near-identical payloads.
DHASH_BANDS = 4  # pigeonhole: Hamming <= 3 over 4 bands shares >= 1 band
DHASH_MIN_BAND_BITS = 16  # never narrower than the classic 64-bit dHash
DHASH_MAX_BAND_BITS = 63  # a packed band slice must fit a signed BIGINT
DHASH_TARGET_OCCUPANCY = 4.0  # expected docs per band bucket
DHASH_OCCUPANCY_CONF = "spark.bert_etl.dhash.targetOccupancy"


def _occupancy_ratio(target_occupancy: float) -> tuple[int, int]:
    """The occupancy knob as a SMALL exact integer ratio (numer, denom).
    Both engines derive the band width from ceil(N * denom / numer) in
    pure integer arithmetic — float only names the knob, it never enters
    the lockstep computation.

    The ratio is bounded via Fraction.limit_denominator(10**6) rather than
    raw float.as_integer_ratio(): a non-dyadic knob like 3.3 is really
    3.3000000000000000444... in binary, whose exact ratio has a ~2^50
    denominator — Python's big ints shrug, but the oracle's
    ``COUNT(*) * denom`` overflows DuckDB's BIGINT and the engines desync
    on a perfectly legal knob value (round-9 advice). The 10^6 bound
    recovers the intended ratio exactly for every knob anyone writes
    (3.3 → 33/10; dyadic sub-unit knobs like 2^-12 stay exact) while
    keeping COUNT(*) * denom inside 64 bits up to ~9e12 docs — far past
    the 1e10-doc 100 TB profile. A knob below 1e-6 clamps to 1/10^6
    (occupancy that small is already degenerate: one doc per million
    buckets)."""
    from fractions import Fraction

    if not (float(target_occupancy) > 0):
        return 1, 1
    frac = Fraction(float(target_occupancy)).limit_denominator(10**6)
    if frac.numerator == 0:
        return 1, 10**6
    return frac.numerator, frac.denominator


def dhash_band_bits(
    n_docs: int, target_occupancy: float = DHASH_TARGET_OCCUPANCY
) -> int:
    """Adaptive bits-per-band: the smallest w with 2^w >= ceil(N /
    occupancy), clamped to [16, 63]. Constant expected bucket occupancy
    means the within-bucket candidate term stays O(N * occupancy) instead
    of O(N^2 / 2^w) — at 100 TB (~1e10 docs) w = 32, at the test SFs the
    floor 16 applies (the classic 64-bit dHash).

    INTEGER-ONLY derivation (bit_length of an exact ceil-div, never float
    log2): the oracle computes the identical integer expression from
    COUNT(*), so a one-ULP log2 difference between Python and DuckDB at
    exact power-of-two corpus sizes can never flip ceil() in one engine
    only and desynchronize every band key (round-8 advice)."""
    n = max(int(n_docs), 1)
    numer, denom = _occupancy_ratio(target_occupancy)
    target = max(-(-(n * denom) // numer), 2)  # ceil(n/occ), floored at 2
    raw = (target - 1).bit_length()
    return max(DHASH_MIN_BAND_BITS, min(DHASH_MAX_BAND_BITS, raw))


def dhash_oracle_sql(
    table: str = "documents", target_occupancy: float = DHASH_TARGET_OCCUPANCY
) -> str:
    """Full DuckDB oracle for the adaptive dHash near-dup pipeline. The
    band width comes from the same INTEGER-ONLY derivation the engine
    computes — clamp(bit_length(ceil(N/occ) - 1), 16, 63), where
    bit_length is the binary-digit count (length of the base-2 rendering)
    and the ceil-div runs on the knob's exact integer ratio — threaded
    through every CTE as a column. No float log2 anywhere in the lockstep
    contract, so engines cannot diverge by one ULP at exact power-of-two
    corpus sizes (round-8 advice)."""
    numer, denom = _occupancy_ratio(target_occupancy)
    return f"""
    WITH params AS (
        SELECT GREATEST({DHASH_MIN_BAND_BITS}, LEAST({DHASH_MAX_BAND_BITS},
                   CAST(length(format('{{:b}}',
                       GREATEST((COUNT(*) * {denom} + {numer - 1}) // {numer},
                                2) - 1))
                        AS INT))) AS w
        FROM {table}
    ),
    bits AS (
        SELECT doc_id, w,
               list_transform(range({DHASH_BANDS}*w), i -> CASE WHEN
                   ascii(substr(text, 1 + ((len(text)-1) * i)     // ({DHASH_BANDS}*w), 1)) <
                   ascii(substr(text, 1 + ((len(text)-1) * (i+1)) // ({DHASH_BANDS}*w), 1))
                   THEN 1 ELSE 0 END) AS b
        FROM {table}, params WHERE len(text) >= 2
    ),
    slices AS (
        SELECT doc_id, band,
               list_aggregate(list_transform(range(w),
                   i -> CAST(b[band*w + i + 1] AS BIGINT) * (CAST(1 AS BIGINT) << i)),
                   'sum') AS s
        FROM bits, unnest(range({DHASH_BANDS})) AS t(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
        FROM slices a JOIN slices b ON a.band = b.band AND a.s = b.s
                                   AND a.doc_id < b.doc_id
    ),
    packs AS (
        SELECT doc_id,
               MAX(CASE WHEN band = 0 THEN s END) AS s0,
               MAX(CASE WHEN band = 1 THEN s END) AS s1,
               MAX(CASE WHEN band = 2 THEN s END) AS s2,
               MAX(CASE WHEN band = 3 THEN s END) AS s3
        FROM slices GROUP BY doc_id
    )
    SELECT c.doc_i, c.doc_j,
           CAST(bit_count(xor(x.s0, y.s0)) + bit_count(xor(x.s1, y.s1)) +
                bit_count(xor(x.s2, y.s2)) + bit_count(xor(x.s3, y.s3))
                AS BIGINT) AS hamming
    FROM cand c JOIN packs x ON x.doc_id = c.doc_i
                JOIN packs y ON y.doc_id = c.doc_j
    """


def dhash_bits(
    docs: DataFrame, text_col: str = "text", band_w: int = DHASH_MIN_BAND_BITS
) -> DataFrame:
    """(doc_id, s0..s3) — the 4w-bit dHash as four packed w-bit band
    slices, one BIGINT each. Narrow, JVM-side byte arithmetic, zero
    shuffles. The packed longs ARE both the band join keys and the
    verification payload: an 8-byte key replaces the old 32-char md5
    digest on the biggest shuffled table, and verification is four
    bit_count(xor) terms (the round-5 SimHash lesson: shipping a bit
    ARRAY per candidate side dominated the 100x shuffle).

    (length-1)*i runs in BIGINT: int32 arithmetic would wrap for payloads
    past ~2^31/(4w) bytes and, with ANSI off, silently sample from the
    string's END via substring's negative-start semantics — the oracle's
    len() is already BIGINT. The final position is <= length, so the
    outer INT cast for substring is safe."""
    bits = DHASH_BANDS * band_w
    bits_expr = (
        f"transform(sequence(0, {bits - 1}), i -> CASE WHEN "
        f"ascii(substring({text_col}, CAST(1 + ((CAST(length({text_col}) AS BIGINT)-1) * i) div {bits} AS INT), 1)) < "
        f"ascii(substring({text_col}, CAST(1 + ((CAST(length({text_col}) AS BIGINT)-1) * (i+1)) div {bits} AS INT), 1)) "
        f"THEN 1 ELSE 0 END)"
    )
    pack = (
        f"aggregate(transform(sequence(0, {band_w - 1}), i -> "
        "CAST(element_at(b, {off} + i + 1) AS BIGINT) * shiftleft(CAST(1 AS BIGINT), i)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        docs.filter(F.length(text_col) >= 2)
        .select("doc_id", F.expr(bits_expr).alias("b"))
        .select(
            "doc_id",
            *[
                F.expr(pack.format(off=band * band_w)).alias(f"s{band}")
                for band in range(DHASH_BANDS)
            ],
        )
    )


def dhash_band_pairs(bits: DataFrame) -> DataFrame:
    """Banded candidate pairs with verified Hamming: (doc_i, doc_j, hamming).

    Bands are an equi-join on (band, packed w-bit slice) — the quadratic
    term only materializes inside a bucket, exactly as in SimHash, and
    adaptive w keeps expected bucket occupancy constant as N grows; the
    verification xor runs once per CANDIDATE pair, not per pair of docs.
    """
    slices = F.array(
        *[
            F.struct(F.lit(band).alias("band"), F.col(f"s{band}").alias("s"))
            for band in range(DHASH_BANDS)
        ]
    )
    bands = bits.select("doc_id", F.explode(slices).alias("bh")).select(
        "doc_id", F.col("bh.band").alias("band"), F.col("bh.s").alias("s")
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "s"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j")
        )
        .distinct()
    )
    x = bits.select(
        F.col("doc_id").alias("doc_i"),
        *[F.col(f"s{band}").alias(f"x{band}") for band in range(DHASH_BANDS)],
    )
    y = bits.select(
        F.col("doc_id").alias("doc_j"),
        *[F.col(f"s{band}").alias(f"y{band}") for band in range(DHASH_BANDS)],
    )
    ham = F.expr(
        " + ".join(f"bit_count(x{band} ^ y{band})" for band in range(DHASH_BANDS))
    )
    return (
        cand.join(x, "doc_i")
        .join(y, "doc_j")
        .select("doc_i", "doc_j", ham.cast("long").alias("hamming"))
    )


@query(
    "multimodal_dedup_phash",
    oracle=f"{dhash_oracle_sql()}",
)
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.operators.registry import persist_once

    # the gray8 payload IS the text's bytes (with_media encodes exactly
    # this column); dHash reads the text directly so the oracle can mirror
    # the byte arithmetic (ascii == byte for this ASCII-safe corpus, the
    # same equivalence multimodal_dedup_exact's oracle uses)
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    # adaptive width from the corpus size (metadata-only count on parquet);
    # the conf knob is a library tuner — the registered oracle assumes the
    # default occupancy, so the driver's parity gate always runs in lockstep
    occ = float(
        spark.conf.get(DHASH_OCCUPANCY_CONF, str(DHASH_TARGET_OCCUPANCY))
    )
    w = dhash_band_bits(docs.count(), occ)
    # spread_scan before the 128-substring-per-row dHash expression: the
    # single-file fixture scans as ONE split, so the whole hash pass (the
    # query's dominant cost) ran in one task (measured 1.9 s single-task
    # at sf0.1); a natural multi-split scan at scale is left untouched
    from bert_etl_spark.operators.registry import spread_scan

    bits = persist_once(
        dhash_bits(spread_scan(docs), band_w=w)
    )  # bands + both verify sides
    return dhash_band_pairs(bits)
