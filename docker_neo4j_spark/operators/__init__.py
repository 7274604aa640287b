"""Operator layer: pattern joins, GDS algorithms, LLM-pipeline ops."""

from . import dedup, embed, gds, multimodal, paths, patterns, similarity, text

__all__ = ["dedup", "embed", "gds", "multimodal", "paths", "patterns", "similarity", "text"]
