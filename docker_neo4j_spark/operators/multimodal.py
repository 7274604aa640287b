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

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
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


try:  # import-guarded real codec: present in deployments, not this container
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None
    HAS_PIL = False


def decode_image(payload: bytes) -> object:
    """Image decode: real (PIL) when the codec library is importable —
    the same code runs unmodified in a codec-equipped environment —
    else the explicit stub this container documents."""
    if HAS_PIL:
        import io

        return _PILImage.open(io.BytesIO(payload))
    raise NotImplementedError("image decode requires PIL/ffmpeg; not available here")


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize: decode, nearest-neighbor resize, re-encode as PNG."""
    import io

    img = decode_image(payload)
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format="PNG")
    return buf.getvalue()


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


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: nearest-neighbor byte subsample of the
    payload to exactly width·height bytes (cycled if short). Stands in for
    a real PIL ``Image.resize``; same signature and output contract (a
    payload of the target pixel count)."""
    n = width * height
    if not payload:
        return bytes(n)
    step = max(len(payload) // n, 1)
    out = (payload[::step] * ((n // max(len(payload[::step]), 1)) + 1))[:n]
    return bytes(out)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, codec: str = "fake"
) -> DataFrame:
    """Batch image resize over ``mapInPandas`` (Arrow in/out, one worker
    per partition): payload → width×height payload + dims metadata.

    ``codec``: ``"fake"`` (default) uses the clearly-marked deterministic
    byte-subsample (`_fake_resize` — environment-independent, so the
    contract tests run anywhere); ``"pil"`` decodes/resizes/re-encodes
    with PIL and fails loud if the library is absent. The Spark-side
    schema, partitioning, and batch flow are identical either way — the
    real contract this module exists to pin.
    """
    if codec not in ("fake", "pil"):
        raise ValueError(f"codec must be 'fake' or 'pil', got {codec!r}")
    if codec == "pil" and not HAS_PIL:
        raise NotImplementedError("codec='pil' requires PIL; not available here")
    resize = (
        _pil_resize
        if codec == "pil"
        else _fake_resize
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "format"]].copy()
            out["payload"] = pdf["payload"].map(
                lambda p: resize(bytes(p), width, height)
            )
            out["n_bytes"] = out["payload"].map(len).astype("int64")
            out["width"] = width
            out["height"] = height
            yield out[["media_id", "payload", "format", "n_bytes", "width", "height"]]

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling over ``mapInPandas``: one input row fans out to
    one row per sampled frame (media_id, frame_idx, frame).

    The payload is treated as concatenated fixed-size frames (the fake
    container format); every ``every_n``-th frame is kept up to
    ``max_frames``. Real deployments swap the slicer for an ffmpeg
    keyframe extractor — the row-fan-out shape (Arrow batches in, MORE
    rows out) is the part Spark cares about.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                n_frames = max(len(p) // frame_bytes, 1)
                kept = 0
                for i in range(0, n_frames, every_n):
                    if kept >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
                    kept += 1
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
