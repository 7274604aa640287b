"""Physical-plan introspection: audit helpers for scale-readiness checks."""

from .audit import PlanFacts, assert_columns_pruned, assert_no_cartesian, audit

__all__ = ["PlanFacts", "assert_columns_pruned", "assert_no_cartesian", "audit"]
