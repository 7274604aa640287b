"""Embedding generation (the reference's genai.vector.encode surface,
SURVEY.md §2.B.11) as an Arrow-batched ``pandas_udf``.

The real encoder is an external model service / local model neither of
which exists in this container, so the default encoder is a clearly
deterministic fake (feature-hashed bag-of-words, L2-normalized) with the
same signature a real one plugs into: ``list[str] -> list[list[float]]``
per Arrow batch. The Spark-side contract — batched Arrow transfer, one
Python worker per partition, output ``array<float>`` column — is real
and benchmarked; a real model client plugs in via the
``SPARK_GRAFT_ENCODER_MODULE`` hook below without code changes.

Reference surface: the genai plugin's encode procedure
(docker-image-src calver/coredb/neo4j-plugins.json:31-36).
"""

from __future__ import annotations

import importlib
import math
import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

# Pluggable real encoder (r8 verdict item): name a module via
# SPARK_GRAFT_ENCODER_MODULE exposing ``encode_batch(texts: list[str],
# dim: int) -> list[list[float]]``. The module NAME is read on the
# driver at udf construction and shipped through the closure (a string,
# not the function — cloudpickle would serialize a foreign module's
# function by reference anyway); each executor imports it per Arrow
# batch (cached in sys.modules), the same import-guard pattern as the
# PIL codecs in multimodal.py. Ship the file itself with
# ``spark.sparkContext.addPyFile`` when it isn't on the executors'
# PYTHONPATH. Unset → the deterministic FNV stub below, keeping the
# oracle rows stable.
_ENCODER_ENV = "SPARK_GRAFT_ENCODER_MODULE"


def _encoder_module() -> str | None:
    """Driver-side: the configured encoder module name, if any."""
    return os.environ.get(_ENCODER_ENV) or None


def _load_encoder(mod_name: str):
    """Executor-side: import the named module's encode_batch, loud on
    misconfiguration (a silent stub fallback would fake real encodings)."""
    try:
        mod = importlib.import_module(mod_name)
        return getattr(mod, "encode_batch")
    except (ImportError, AttributeError) as exc:
        raise RuntimeError(
            f"{_ENCODER_ENV}={mod_name!r} must name an importable module "
            f"exposing encode_batch(texts, dim)"
        ) from exc


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
    """``genai.vector.encode(text)`` → ``array<float>`` column factory.
    The configured encoder module name (driver env, see hook above) rides
    the closure; executors import it per batch."""
    mod_name = _encoder_module()

    @F.pandas_udf(ArrayType(FloatType()))
    def enc(texts: pd.Series) -> pd.Series:
        encode = _load_encoder(mod_name) if mod_name else _fake_encode_batch
        return pd.Series(encode(texts.tolist(), dim))

    return enc


def embed_documents(df: DataFrame, text_col: str = "text", dim: int = 32) -> DataFrame:
    """Attach an embedding column to a document frame (Arrow-batched)."""
    return df.withColumn("embedding", embed_text(dim)(F.col(text_col)))
