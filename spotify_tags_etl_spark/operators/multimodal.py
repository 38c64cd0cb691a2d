"""Multimodal (binary) column handling for training-data pipelines.

Media payloads (image/audio/video) are opaque ``binary`` columns with
typed metadata structs. The Spark-side plumbing — schemas, batch shapes,
``mapInPandas`` decode stage, partition sizing — is real and tested, and
since round 5 the codec stage is REAL for every format pure stdlib can
parse: PNG (zlib + full scanline-filter reconstruction) and RIFF/WAVE
PCM16 via functions/codecs.py, proven end-to-end by the ym02/ym03
round-trip queries whose oracles predict the decoded numbers in closed
form. Only codec families that genuinely require native libraries
(JPEG/MP3/H.264) remain gated: ``decode_image_batch`` raises
``NotImplementedError`` for those unless ``fake=True``, in which case a
deterministic fake decoder derives "decoded" features from the payload
hash so tests have stable oracles.

At 100 TB: binary columns dominate row size — keep them out of shuffles
(metadata-only projections for joins/filters, payload re-joined by key at
the end), cap ``spark.sql.files.maxPartitionBytes`` so a partition of
blobs fits executor memory, and let ``mapInPandas`` stream Arrow batches
instead of materializing a partition at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

#: A multimodal record: opaque payload + typed metadata.
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256_hex", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def to_multimodal(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a multimodal frame: payload = utf-8
    bytes of the text (a stand-in for image/audio bytes)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256_hex"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool) -> pd.DataFrame:
    """Decode payload bytes → (width, height, n_frames, feature_hash).

    With ``fake=False`` this now performs REAL decoding for the formats
    pure stdlib can parse — PNG (zlib inflate + full scanline-filter
    reconstruction) and RIFF/WAVE PCM16 — via functions/codecs.py; only
    payloads in formats that genuinely require native libraries
    (JPEG/MP3/H.264...) still raise ``NotImplementedError``. ``fake=True``
    keeps the deterministic digest-derived stub for synthetic payloads
    (the mm01–mm05 fixtures are UTF-8 text stand-ins, not media bytes).
    """
    if not fake:
        from spotify_tags_etl_spark.functions.codecs import decode_png, decode_wav

        rows = []
        for p in payloads:
            if p is None:
                rows.append((None, None, None, None))
                continue
            b = bytes(p)
            if b.startswith(b"\x89PNG\r\n\x1a\n"):
                px = decode_png(b)
                rows.append(
                    (px.shape[1], px.shape[0], 1, hashlib.sha256(px.tobytes()).hexdigest()[:16])
                )
            elif b.startswith(b"RIFF") and b[8:12] == b"WAVE":
                samples, _fr = decode_wav(b)
                rows.append(
                    (None, None, len(samples), hashlib.sha256(samples.tobytes()).hexdigest()[:16])
                )
            else:
                raise NotImplementedError(
                    "real decoding beyond PNG/WAV (JPEG, MP3, video codecs) requires "
                    "native libraries not present in this container; pass fake=True "
                    "for the deterministic stub"
                )
        return pd.DataFrame(rows, columns=["width", "height", "n_frames", "feature_hash"])
    digests = [hashlib.sha256(bytes(p)).digest() if p is not None else None for p in payloads]
    return pd.DataFrame(
        {
            "width": [d[0] * 16 + 16 if d else None for d in digests],
            "height": [d[1] * 16 + 16 if d else None for d in digests],
            "n_frames": [d[2] + 1 if d else None for d in digests],
            "feature_hash": [d.hex()[:16] if d else None for d in digests],
        }
    )


def decode_multimodal(mm: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched, payload never shuffled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = decode_image_batch(batch["payload"], fake=fake)
            out = pd.concat([batch[["doc_id", "modality", "byte_len"]].reset_index(drop=True), feats], axis=1)
            yield out

    return mm.mapInPandas(run, schema=DECODED_SCHEMA)


@register(
    "mm01_binary_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           sha256(text) AS sha256_hex
    FROM documents
    """,
    doc=(
        "Multimodal metadata projection: typed (modality, byte_len, sha256) "
        "over opaque binary payloads; payload column pruned out of the plan "
        "entirely (check ReadSchema) — the join/filter-friendly view."
    ),
    tags=("multimodal",),
)
def mm01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return to_multimodal(docs).select("doc_id", "modality", "byte_len", "sha256_hex")


@register(
    "mm02_decode_stub",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           ('0x' || substr(sha256(text), 1, 2))::INT * 16 + 16 AS width,
           ('0x' || substr(sha256(text), 3, 2))::INT * 16 + 16 AS height,
           ('0x' || substr(sha256(text), 5, 2))::INT + 1 AS n_frames,
           substr(sha256(text), 1, 16) AS feature_hash
    FROM documents
    """,
    doc=(
        "mapInPandas decode stage over binary payloads with the deterministic "
        "fake decoder (real codecs stubbed behind NotImplementedError). The "
        "oracle replays the sha256-derived fake dimensions and feature hash."
    ),
    tags=("multimodal", "udf"),
)
def mm02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_multimodal(to_multimodal(docs), fake=True)


# ---------------------------------------------------------------------------
# resize + frame-sample stages
# ---------------------------------------------------------------------------

RESIZE_TARGET = 224
FRAME_STEP = 10

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("new_width", IntegerType(), True),
        StructField("new_height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_hash", StringType(), True),
    ]
)


def resize_multimodal(mm: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize stage (mapInPandas; the real PIL/opencv
    call is what the stub's integer math stands in for). Pure integer
    arithmetic — ``new = dim * target // max(w, h)`` — so the plumbing is
    oracle-checkable and no float rounding can diverge."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = decode_image_batch(batch["payload"], fake=True)
            w, h = feats["width"], feats["height"]
            mx = pd.concat([w, h], axis=1).max(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].reset_index(drop=True),
                    "width": w,
                    "height": h,
                    "new_width": (w * target // mx).clip(lower=1),
                    "new_height": (h * target // mx).clip(lower=1),
                }
            )

    return mm.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(mm: DataFrame, step: int = FRAME_STEP) -> DataFrame:
    """Frame-sampling stage for video payloads: every ``step``-th frame of
    the decoded stream, one output row per sampled frame (1→N explode
    inside mapInPandas — the ffmpeg-shaped batch contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = decode_image_batch(batch["payload"], fake=True)
            out_doc, out_idx, out_hash = [], [], []
            for doc_id, sha_hex, n_frames in zip(
                batch["doc_id"], batch["sha256_hex"], feats["n_frames"]
            ):
                if n_frames is None or pd.isna(n_frames):
                    continue  # null payload: nothing decodable, no frames
                for i in range(0, int(n_frames), step):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_hash.append(hashlib.md5(f"{sha_hex}:{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": out_doc, "frame_idx": out_idx, "frame_hash": out_hash})

    return mm.where(F.col("modality") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


@register(
    "mm03_resize_stub",
    oracle=f"""
    SELECT doc_id,
           ('0x' || substr(sha256(text), 1, 2))::INT * 16 + 16 AS width,
           ('0x' || substr(sha256(text), 3, 2))::INT * 16 + 16 AS height,
           greatest(1, (('0x' || substr(sha256(text), 1, 2))::INT * 16 + 16) * {RESIZE_TARGET}
             // greatest(('0x' || substr(sha256(text), 1, 2))::INT * 16 + 16,
                         ('0x' || substr(sha256(text), 3, 2))::INT * 16 + 16)) AS new_width,
           greatest(1, (('0x' || substr(sha256(text), 3, 2))::INT * 16 + 16) * {RESIZE_TARGET}
             // greatest(('0x' || substr(sha256(text), 1, 2))::INT * 16 + 16,
                         ('0x' || substr(sha256(text), 3, 2))::INT * 16 + 16)) AS new_height
    FROM documents
    """,
    doc=(
        "Aspect-preserving resize plumbing (mapInPandas, stubbed codec): "
        "integer-exact target-box math, payload never shuffled. The "
        "oracle reproduces the fake decoder's sha256-derived dimensions."
    ),
    tags=("multimodal", "udf"),
)
def mm03(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_multimodal(to_multimodal(docs))


@register(
    "mm04_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, sha256(text) AS sha_hex,
             ('0x' || substr(sha256(text), 5, 2))::INT + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           md5(sha_hex || ':' || CAST(f AS VARCHAR)) AS frame_hash
    FROM (SELECT doc_id, sha_hex, unnest(range(0, n_frames, {FRAME_STEP})) AS f FROM v)
    """,
    doc=(
        "Frame sampling for video payloads: every 10th frame, 1→N row "
        "explode inside mapInPandas (the ffmpeg batch shape). Oracle "
        "replays the sha256-derived frame count and md5 frame ids."
    ),
    tags=("multimodal", "udf"),
)
def mm04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(to_multimodal(docs))


# ---------------------------------------------------------------------------
# audio windowed-energy stage
# ---------------------------------------------------------------------------

AUDIO_WINDOW = 256  # samples per analysis window

ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("energy", LongType(), False),
    ]
)


def audio_energy(mm: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Windowed signal energy for audio payloads: the payload byte stream
    is treated as the decoded PCM sample stream (the torchaudio/ffmpeg
    call the stub stands in for), cut into fixed windows, Σ sample² per
    window — the feature-extraction shape of VAD / loudness filtering.

    Integer sums of byte values: exact in any engine. 1→N window fan-out
    happens inside mapInPandas (Arrow-batched); the payload never
    shuffles — at 100 TB the audio bytes stay in the scan stage and only
    (doc, window, energy) rows leave it."""

    import numpy as np

    def run(batches):
        for batch in batches:
            d, w, n, e = [], [], [], []
            for doc_id, p in zip(batch["doc_id"], batch["payload"]):
                if p is None or len(p) == 0:
                    continue  # null/empty payload: no windows (oracle: strlen ⇒ empty series)
                # Vectorized: the per-byte work is the hot path on the
                # largest column — a Python per-byte loop would be ~100×
                # slower than the numpy squared-sum per window.
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                starts = range(0, len(arr), window)
                sums = np.add.reduceat(arr * arr, list(starts))
                for i, off in enumerate(starts):
                    d.append(doc_id)
                    w.append(off // window)
                    n.append(min(window, len(arr) - off))
                    e.append(int(sums[i]))
            yield pd.DataFrame({"doc_id": d, "window_idx": w, "n_samples": n, "energy": e})

    return mm.where(F.col("modality") == "audio").mapInPandas(run, schema=ENERGY_SCHEMA)


@register(
    "mm05_audio_energy",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    w AS (
      SELECT doc_id, text,
             unnest(generate_series(1, strlen(text), {AUDIO_WINDOW})) AS st
      FROM a
    )
    SELECT doc_id,
           CAST((st - 1) // {AUDIO_WINDOW} AS INT) AS window_idx,
           CAST(least({AUDIO_WINDOW}, strlen(text) - st + 1) AS INT) AS n_samples,
           CAST(list_sum([ascii(substr(text, i, 1)) * ascii(substr(text, i, 1))
                          for i in generate_series(st, least(st + {AUDIO_WINDOW} - 1, strlen(text)))])
                AS BIGINT) AS energy
    FROM w
    """,
    doc=(
        f"Audio windowed-energy stage ({AUDIO_WINDOW}-sample windows, "
        "Σ sample² per window) over the stubbed PCM stream — mapInPandas "
        "fan-out inside the scan stage, payload never shuffled. Oracle "
        "reproduces the byte math character-wise (corpus is ASCII, so "
        "byte == char)."
    ),
    tags=("multimodal", "udf", "audio"),
)
def mm05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return audio_energy(to_multimodal(docs))


# ---------------------------------------------------------------------------
# ym02/ym03 — REAL codec round trips (pure-stdlib PNG / WAV)
# ---------------------------------------------------------------------------
#
# The decode features are computed from the DECODED payload, never the
# generator — but the generator's parameters are relational, so the
# oracle predicts every output in closed form without any codec: a
# failed parse, filter reconstruction, or sample extraction shows up as
# a hash mismatch. This is how the multimodal plumbing proves its codec
# stage is real, not a stub.


@register(
    "ym02_png_roundtrip_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w,
             8 + doc_id % 7 AS h
      FROM documents
    )
    SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(SUM((d.doc_id * 7 + y.y * 31 + x.x * 13 + c.c * 5) % 256) AS BIGINT)
             AS pix_sum
    FROM d,
         generate_series(0, 13) AS y(y),
         generate_series(0, 16) AS x(x),
         generate_series(0, 2) AS c(c)
    WHERE y.y < d.h AND x.x < d.w
    GROUP BY d.doc_id, d.w, d.h
    """,
    doc=(
        "REAL PNG round trip: per document, synthesize a small RGB "
        "image from a closed-form pixel function, encode it as an "
        "actual PNG (zlib deflate; the encoder cycles scanline filters "
        "0-4 so every reconstruction branch runs), then DECODE the "
        "bytes (functions/codecs.py — signature/chunk walk, inflate, "
        "Sub/Up/Average/Paeth unfiltering) and report width, height, "
        "and the pixel-value sum OF THE DECODED ARRAY. The oracle "
        "computes the same numbers relationally from the generator "
        "parameters — any codec defect breaks the hash. Arrow-batched "
        "mapInPandas; payload bytes never shuffle (mm01's discipline). "
        "Closes the 'codecs are stubbed' gap for formats stdlib can "
        "parse; PIL/ffmpeg families remain env-gated."
    ),
    tags=("multimodal", "codec", "llm-pipeline"),
)
def ym02(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from spotify_tags_etl_spark.functions.codecs import decode_png, encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    schema = "doc_id LONG, width INT, height INT, pix_sum LONG"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id in batch["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((doc_id * 7 + y * 31 + x * 13 + c * 5) % 256).astype(np.uint8)
                decoded = decode_png(encode_png(px))  # the REAL codec path
                rows.append(
                    (doc_id, decoded.shape[1], decoded.shape[0], int(decoded.sum()))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "pix_sum"])

    return docs.mapInPandas(run, schema=schema)


#: ym03 WAV parameters: framerate and per-doc sample-count base.
_WAV_RATE, _WAV_BASE = 8000, 400


@register(
    "ym03_wav_roundtrip_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_WAV_BASE} + doc_id % 100 AS n FROM documents
    )
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_frames,
           CAST(d.n * 1000 // {_WAV_RATE} AS BIGINT) AS duration_ms,
           CAST(SUM(ABS(((d.doc_id * 131 + t.t * 17) % 65536) - 32768)) AS BIGINT)
             AS sum_abs
    FROM d, generate_series(0, 499) AS t(t)
    WHERE t.t < d.n
    GROUP BY d.doc_id, d.n
    """,
    doc=(
        "REAL WAV round trip: per document, synthesize int16 PCM "
        "samples from a closed-form wave, encode an actual RIFF/WAVE "
        "payload, then DECODE it (stdlib wave: header parse + PCM16 "
        "frame extraction) and report frame count, duration, and the "
        "absolute-amplitude sum OF THE DECODED SAMPLES — all "
        "predicted relationally by the oracle, so a header "
        "misparse or sample-width bug breaks the hash. The audio "
        "sibling of ym02's PNG proof; together they convert the "
        "multimodal decode stage from stub to real for every format "
        "pure stdlib can parse."
    ),
    tags=("multimodal", "codec", "llm-pipeline"),
)
def ym03(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from spotify_tags_etl_spark.functions.codecs import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    schema = "doc_id LONG, n_frames LONG, duration_ms LONG, sum_abs LONG"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id in batch["doc_id"]:
                doc_id = int(doc_id)
                n = _WAV_BASE + doc_id % 100
                t = np.arange(n, dtype=np.int64)
                samples = (((doc_id * 131 + t * 17) % 65536) - 32768).astype(np.int16)
                decoded, rate = decode_wav(encode_wav(samples, _WAV_RATE))
                rows.append(
                    (
                        doc_id,
                        len(decoded),
                        len(decoded) * 1000 // rate,
                        int(np.abs(decoded.astype(np.int64)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "duration_ms", "sum_abs"]
            )

    return docs.mapInPandas(run, schema=schema)
