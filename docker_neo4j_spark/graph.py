"""Property-graph data model on DataFrames.

Reference data model: nodes with labels + property maps, directed typed
relationships (/root/reference/src/test/java/com/neo4j/docker/utils/
DatabaseIO.java:42 — ``CREATE (arne:dog {name:'Arne'})-[:SNIFFS]->(bosse:dog
{name:'Bosse'})``).

Spark realization (SURVEY.md §1.1): two DataFrames —

- ``nodes``: ``id: long, labels: array<string>``, plus one top-level column per
  property.  Properties are top-level columns (NOT one big map) so Catalyst
  column pruning and parquet predicate pushdown work (SURVEY.md §4.2).
- ``rels``: ``id: long, src: long, dst: long, type: string`` plus property
  columns.

Scale notes (100 TB): rels are stored partitioned by ``type`` and bucketable
by ``src`` so type-scans partition-prune and src-joins can co-locate; nodes
partition by primary label. At query time, expand joins broadcast the small
side when the planner knows it is a dimension-sized label.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_FIXED_COLS = ("id", "labels")
REL_FIXED_COLS = ("id", "src", "dst", "type")


@dataclass
class PropertyGraph:
    """An immutable snapshot of a property graph as two DataFrames."""

    nodes: DataFrame
    rels: DataFrame

    # ---- scans (SURVEY.md §2.B.1) -------------------------------------
    def nodes_by_label(self, label: str) -> DataFrame:
        """``MATCH (n:Label)`` — label scan (DatabaseIO.java:51)."""
        return self.nodes.where(F.array_contains(F.col("labels"), label))

    def rels_by_type(self, rel_type: str) -> DataFrame:
        """``-[:TYPE]->`` — relationship-type scan (DatabaseIO.java:51)."""
        return self.rels.where(F.col("type") == rel_type)

    # ---- property accessors -------------------------------------------
    def node_property_columns(self) -> list[str]:
        return [c for c in self.nodes.columns if c not in NODE_FIXED_COLS]

    def rel_property_columns(self) -> list[str]:
        return [c for c in self.rels.columns if c not in REL_FIXED_COLS]

    # ---- expand (the join layer, SURVEY.md §2.B.3) --------------------
    def expand(
        self,
        src_label: str | None = None,
        rel_type: str | None = None,
        dst_label: str | None = None,
        src_alias: str = "a",
        rel_alias: str = "r",
        dst_alias: str = "b",
    ) -> DataFrame:
        """One-hop pattern ``(a:SrcLabel)-[r:TYPE]->(b:DstLabel)``.

        Compiles to two equi-joins; Catalyst/AQE picks broadcast vs
        sort-merge per side. Columns come back prefixed ``alias_``.
        """
        a = self.nodes_by_label(src_label) if src_label else self.nodes
        b = self.nodes_by_label(dst_label) if dst_label else self.nodes
        r = self.rels_by_type(rel_type) if rel_type else self.rels
        a = prefix_columns(a, src_alias)
        b = prefix_columns(b, dst_alias)
        r = prefix_columns(r, rel_alias)
        return a.join(r, F.col(f"{src_alias}_id") == F.col(f"{rel_alias}_src")).join(
            b, F.col(f"{rel_alias}_dst") == F.col(f"{dst_alias}_id")
        )

    def degrees(self, direction: str = "out") -> DataFrame:
        """``gds.degree`` — per-node degree (SURVEY.md §2.B.10)."""
        key = {"out": "src", "in": "dst"}[direction]
        return self.rels.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("degree"))


def prefix_columns(df: DataFrame, alias: str) -> DataFrame:
    """Rename every column to ``alias_col`` for join-ambiguity-free plans."""
    return df.select([F.col(c).alias(f"{alias}_{c}") for c in df.columns])
