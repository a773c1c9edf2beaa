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
    from simplemapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

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


N_FRAMES = 4

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_hashes", T.ArrayType(T.StringType()), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("resized_len", T.LongType(), True),
        T.StructField("resized_checksum", T.StringType(), True),
    ]
)


def frame_slices(payload: bytes, n_frames: int = N_FRAMES) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: the payload is
    cut into n contiguous chunks (floor boundaries) — the same slices
    any engine computes, so frame fingerprints are oracle-checkable.
    A real implementation decodes with ffmpeg and samples keyframes;
    the Spark-side contract (binary in, per-frame records out, Arrow
    batches) is identical."""
    n = len(payload)
    return [payload[(i * n) // n_frames : ((i + 1) * n) // n_frames] for i in range(n_frames)]


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Arrow-batched frame sampling over the binary column."""
    import hashlib

    from simplemapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hashes = [
                [hashlib.md5(fr).hexdigest() for fr in frame_slices(bytes(p), n_frames)]
                if p is not None
                else []
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_frames": [len(h) for h in hashes],
                    "frame_hashes": hashes,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Deterministic fake resize: stride-sample the payload down to
    out_w*out_h bytes (a real decoder+resampler slots in unchanged —
    binary in, binary-derived features out, bounded memory per Arrow
    batch). Python-slice semantics are not SQL-expressible, so the
    catalog registers this rows-only; tests pin the deterministic
    output shape instead."""
    import hashlib

    from simplemapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    target = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_len: list[int] = []
            out_sum: list[str] = []
            for p in batch["payload"]:
                if p is None:
                    out_len.append(0)
                    out_sum.append("")
                    continue
                b = bytes(p)
                stride = max(1, len(b) // target)
                small = b[::stride][:target]
                out_len.append(len(small))
                out_sum.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized_len": out_len,
                    "resized_checksum": out_sum,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


N_AUDIO_FRAMES = 4

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("e0", T.LongType(), True),
        T.StructField("e1", T.LongType(), True),
        T.StructField("e2", T.LongType(), True),
        T.StructField("e3", T.LongType(), True),
        T.StructField("peak_frame", T.LongType(), True),
    ]
)


def audio_frame_energy(media: DataFrame) -> DataFrame:
    """Arrow-batched per-frame 'audio' energy over the binary payload:
    treat each byte as a centered PCM sample (b - 128) and sum squares
    within N_AUDIO_FRAMES frames. Frame membership is the pure formula
    frame = (j * k) // n over the 0-based byte index — the SAME
    expression the SQL oracle uses, so there is no slicing-boundary
    ambiguity to disagree on. Integer math end-to-end; peak_frame is
    the argmax with lowest-index tie-break. Empty payloads are
    filtered on both engines. The real decoder slot stays stubbed
    (operators/multimodal.py decode_image) — this is the plumbing +
    windowed-reduction shape a real PCM pipeline has."""
    import numpy as np

    from simplemapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    k = N_AUDIO_FRAMES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                if p is None or len(p) == 0:
                    continue
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n = len(arr)
                idx = (np.arange(n, dtype=np.int64) * k) // n
                sq = (arr - 128) ** 2
                e = np.bincount(idx, weights=sq, minlength=k).astype(np.int64)
                rows.append(
                    (int(mid), n, int(e[0]), int(e[1]), int(e[2]), int(e[3]), int(np.argmax(e)))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "e0", "e1", "e2", "e3", "peak_frame"]
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=AUDIO_SCHEMA)
