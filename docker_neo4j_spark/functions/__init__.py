"""Scalar-function surface: Cypher built-ins mapped to Spark expressions."""

from . import cypher

__all__ = ["cypher"]
