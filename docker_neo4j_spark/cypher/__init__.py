"""Cypher serving surface: string queries via :class:`Session`."""

from .session import Session

__all__ = ["Session"]
