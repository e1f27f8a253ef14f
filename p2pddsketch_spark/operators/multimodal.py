"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side machinery — schemas, partitioning, UDF signatures, batch
shapes — is real and tested; the codec step is STUBBED (this container
ships no image/audio libraries): `decode_features` uses a deterministic
byte-statistics extractor as the stand-in, and `decode_image` /
`sample_frames` raise NotImplementedError behind an import-try so a real
deployment drops in PIL/av without touching the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

__all__ = ["MEDIA_SCHEMA", "attach_payload", "decode_features",
           "payload_stats", "resize_image", "decode_image", "sample_frames"]

# canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),      # image|audio|video
    StructField("payload", BinaryType(), False),       # encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   modality: str = "image") -> DataFrame:
    """Deterministic synthetic media table from any string column (the
    payload is the UTF-8 bytes) — exercises the binary-column path with
    zero external data."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM byte-level stats (size, crc32) — the cheap pre-filter a
    100 TB media pipeline runs before any decode."""
    return df.select(
        "media_id", "modality",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.crc32("payload").alias("crc"),
    )


_FEATURE_DIM = 8


def decode_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode → fixed-dim float feature vector per payload.

    STUB CODEC: features are deterministic byte statistics (length,
    mean, std, quartiles of the byte distribution) — the real decoder
    (PIL/torchvision/librosa) replaces `_featurize` only; schema,
    batching, and partition behavior are production-shaped.
    """
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ])

    def _featurize(payload: bytes) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8)
        if b.size == 0:
            return np.zeros(_FEATURE_DIM, dtype=np.float32)
        qs = np.percentile(b, [25, 50, 75])
        return np.array([b.size, b.mean(), b.std(), qs[0], qs[1], qs[2],
                         b.min(), b.max()], dtype=np.float32)

    def run(batches):
        for pdf in batches:
            feats = [_featurize(p) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "features": feats})

    return df.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover - stub
    """Real image resize — unavailable in this container. The Spark-side
    shape is `decode_features`' mapInPandas plumbing with a (payload,
    width, height) → payload signature; drop PIL in here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "image codec not installed; payload plumbing is exercised by "
            "decode_features/payload_stats") from ex
    raise NotImplementedError("wire PIL resize here in a full deployment")


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode — unavailable in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "image codec not installed; decode_features provides the "
            "deterministic stand-in feature path") from ex
    raise NotImplementedError("wire PIL decode here in a full deployment")


def sample_frames(payload: bytes, every_ms: int = 1000):  # pragma: no cover - stub
    """Real video frame sampling — unavailable in this container."""
    try:
        import av  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "video codec not installed; payload_stats/decode_features "
            "cover the pipeline plumbing") from ex
    raise NotImplementedError("wire PyAV frame sampling here in a full deployment")
