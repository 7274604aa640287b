"""Procedure registry: CALL ... YIELD, SHOW PROCEDURES, scalar plugin fns."""

from .registry import call, procedure, scalar_function, show_procedures

__all__ = ["call", "procedure", "scalar_function", "show_procedures"]
