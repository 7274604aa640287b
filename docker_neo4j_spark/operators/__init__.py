"""Operator layer: pattern joins, GDS algorithms, LLM-pipeline ops."""

from . import dedup, gds, multimodal, paths, patterns, similarity, text

__all__ = ["dedup", "gds", "multimodal", "paths", "patterns", "similarity", "text"]
