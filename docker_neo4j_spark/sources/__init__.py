"""Data sources: TPC-H-ish parquet loaders and the graph projection."""

from .tpch import build_graph, load_tables

__all__ = ["build_graph", "load_tables"]
