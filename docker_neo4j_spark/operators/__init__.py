"""Operator layer: pattern joins, GDS algorithms, LLM-pipeline ops."""

from . import dedup, gds, multimodal, patterns, similarity, text

__all__ = ["dedup", "gds", "multimodal", "patterns", "similarity", "text"]
