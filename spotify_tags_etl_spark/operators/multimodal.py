"""Multimodal (binary) column handling for training-data pipelines.

Media payloads (image/audio/video) are opaque ``binary`` columns with
typed metadata structs. The Spark-side plumbing — schemas, batch shapes,
``mapInPandas`` decode stage, partition sizing — is real and tested; the
actual codec calls are STUBBED (the container has no image/audio libs):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder derives
"decoded" features from the payload hash so tests have stable oracles.

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

    Real decoding (PIL/ffmpeg/torchaudio) is NOT available in this
    environment; ``fake=True`` derives deterministic pseudo-dimensions
    from the payload digest so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not present "
            "in this container; pass fake=True for the deterministic stub"
        )
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
           CAST(length(text) AS BIGINT) AS byte_len,
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
    oracle=None,  # pandas-UDF decode stage → rows-only (unit-tested for determinism)
    doc=(
        "mapInPandas decode stage over binary payloads with the deterministic "
        "fake decoder (real codecs stubbed behind NotImplementedError)."
    ),
    tags=("multimodal", "udf"),
)
def mm02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_multimodal(to_multimodal(docs), fake=True)
