"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The real decoders (PIL/librosa/ffmpeg) are NOT in this container, so
the decode step is stubbed: ``decode_image`` raises NotImplementedError
unless a decoder import succeeds, and ``fake_features`` provides a
deterministic stand-in so the Spark-side plumbing — schema, batch
iteration, partitioning — is real and testable end-to-end.

At scale: binary payloads ride in their own column so column pruning
keeps them out of metadata-only scans; feature extraction is
mapInPandas (one Arrow batch at a time — bounded memory regardless of
partition size).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — stubbed: the container ships no imaging
    libraries. The import-try keeps the API honest: drop in PIL and
    this works unchanged."""
    try:
        from PIL import Image  # noqa: F401  (not installed here)
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. PIL); "
            "not available in this environment — use fake_features for plumbing tests"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: normalized byte values
    sampled at fixed strides — stable across runs/engines, shaped like
    a real embedding so downstream operators are exercised honestly."""
    if not payload:
        return [0.0] * dim
    n = len(payload)
    return [payload[(i * n) // dim] / 255.0 for i in range(dim)]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media table: the UTF-8 payload
    plays the role of an opaque binary blob (the testdata ships no real
    image bytes; every transformation below treats payload as opaque)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("byte_len"),
        F.md5(payload).alias("checksum"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "byte_len": [len(p) if p is not None else 0 for p in batch["payload"]],
                    "features": [
                        fake_features(bytes(p)) if p is not None else [0.0] * FEATURE_DIM
                        for p in batch["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURES_SCHEMA)
