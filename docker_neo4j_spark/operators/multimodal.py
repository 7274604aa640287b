"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* steps are stubs
behind ``NotImplementedError`` or a clearly-marked deterministic fake —
but the Spark-side contract is real and tested: schema, Arrow batch shape,
``mapInPandas`` partition flow, and metadata extraction all run.

Design for 100 TB of media:
- payloads live in a ``binary`` column next to a typed metadata struct, so
  predicate pushdown on metadata (format, size, dims) prunes row groups
  without touching the bytes;
- per-record work rides ``mapInPandas`` (Arrow batches, one Python worker
  per partition — not per row);
- derived features (embeddings, frame samples) are new columns, keeping
  lineage in one table rather than side files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Synthesize a media table from text payloads (test harness for the
    binary-column contract — real deployments ingest actual bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(key).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(key) % 2 == 0, "png").otherwise("wav").alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires a codec library not in this container."""
    raise NotImplementedError("image decode requires PIL/ffmpeg; not available here")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector: byte-histogram folded to ``dim``
    buckets, L1-normalized. Stands in for a real encoder; same signature."""
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    total = max(sum(counts), 1)
    return [c / total for c in counts]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    One Python worker per partition, whole Arrow batches in/out — the shape
    a real decoder (resize / frame-sample / embed) plugs into. Swap
    ``_fake_feature`` for the real codec per format.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "format", "n_bytes"]].copy()
            out["feature"] = pdf["payload"].map(lambda p: _fake_feature(bytes(p), dim))
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)
