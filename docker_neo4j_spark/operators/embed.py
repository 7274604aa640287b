"""Embedding generation (the reference's genai.vector.encode surface,
SURVEY.md §2.B.11) as an Arrow-batched ``pandas_udf``.

The real encoder is an external model service / local model neither of
which exists in this container, so the default encoder is a clearly
deterministic fake (feature-hashed bag-of-words, L2-normalized) with the
same signature a real one plugs into: ``list[str] -> list[list[float]]``
per Arrow batch. The Spark-side contract — batched Arrow transfer, one
Python worker per partition, output ``array<float>`` column — is real
and benchmarked; swapping in a model client changes one function.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def _fake_encode_batch(texts: list[str], dim: int) -> list[list[float]]:
    """Deterministic feature-hashing encoder (stand-in for a model)."""
    out = []
    for t in texts:
        v = [0.0] * dim
        for tok in (t or "").lower().split():
            v[_stable_hash(tok) % dim] += 1.0
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / norm for x in v])
    return out


def _stable_hash(s: str) -> int:
    # FNV-1a (Python's hash() is salted per process — useless for determinism)
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def embed_text(dim: int = 32) -> Column:
    """``genai.vector.encode(text)`` → ``array<float>`` column factory."""

    @F.pandas_udf(ArrayType(FloatType()))
    def enc(texts: pd.Series) -> pd.Series:
        return pd.Series(_fake_encode_batch(texts.tolist(), dim))

    return enc


def embed_documents(df: DataFrame, text_col: str = "text", dim: int = 32) -> DataFrame:
    """Attach an embedding column to a document frame (Arrow-batched)."""
    return df.withColumn("embedding", embed_text(dim)(F.col(text_col)))
