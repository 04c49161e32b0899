"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery (schemas, batch shapes, partition-preserving
signatures, metadata propagation) is real and tested; the codec step is a
clearly marked stub because no image/audio libraries exist in this container
— :func:`decode_image` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested, which produces seed-stable pixel
statistics so downstream pipelines (dedup by content hash, feature
extraction, resize bookkeeping) can be exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: schema fragment for an attached media column
MEDIA_SCHEMA = (
    "media binary, media_type string, media_w int, media_h int, media_ms int"
)

FEATURE_DIM = 64


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Attach a deterministic synthetic media blob per row (stands in for a
    real binary payload; derived from xxhash64 of the id so it is stable)."""
    h = F.xxhash64(F.col(id_col))
    return (
        df.withColumn("media", F.sha2(F.conv(F.hex(h), 16, 16), 256).cast("binary"))
        .withColumn("media_type", F.lit(kind))
        .withColumn("media_w", (F.pmod(h, F.lit(512)) + 32).cast("int"))
        .withColumn("media_h", (F.pmod(h, F.lit(384)) + 32).cast("int"))
        .withColumn("media_ms", F.lit(None).cast("int"))
    )


def _fake_decode(buf: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: seed from the blob
    bytes, emit a (h, w) float32 'luma plane'.  STUB — replace with a real
    codec (PIL/ffmpeg) outside this container."""
    seed = int.from_bytes(buf[:8] if buf else b"\0" * 8, "little")
    rng = np.random.default_rng(seed)
    return rng.random((max(h, 1), max(w, 1)), dtype=np.float32)


def decode_image(buf: bytes, w: int, h: int, allow_fake: bool = False) -> np.ndarray:
    if allow_fake:
        return _fake_decode(buf, w, h)
    raise NotImplementedError(
        "no image codec available in this environment; pass allow_fake=True "
        "for the deterministic stub or plug a real decoder here"
    )


def extract_media_features(
    df: DataFrame, allow_fake: bool = True, batch_rows: int = 1024
) -> DataFrame:
    """Append ``feat array<float>`` (FEATURE_DIM) per media row via
    ``mapInPandas`` — the real Arrow plumbing for a decode/feature stage:
    bounded batch memory, null-safe, schema-checked."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("feat", T.ArrayType(T.FloatType()))]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf, w, h in zip(pdf["media"], pdf["media_w"], pdf["media_h"]):
                if buf is None:
                    feats.append(None)
                    continue
                plane = decode_image(bytes(buf), int(w), int(h), allow_fake=allow_fake)
                # 8x8 mean-pool grid as the feature (deterministic, size-fixed)
                gh = np.array_split(plane, 8, axis=0)
                pooled = [c.mean() for row in gh for c in np.array_split(row, 8, axis=1)]
                feats.append([float(x) for x in pooled])
            pdf = pdf.copy()
            pdf["feat"] = feats
            yield pdf

    return df.mapInPandas(stage, out_schema)


def media_content_hash(df: DataFrame, output_col: str = "media_hash") -> DataFrame:
    """Exact-dedup key for binary payloads (JVM-side sha2 — no Python)."""
    return df.withColumn(output_col, F.sha2(F.col("media"), 256))


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling bookkeeping for video rows: explode per-frame offsets
    (metadata only — decoding is the stubbed stage above)."""
    n_frames = F.greatest(F.ceil(F.col("media_ms") / every_ms).cast("int"), F.lit(1))
    return df.filter(F.col("media_type") == "video").withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))),
    )
