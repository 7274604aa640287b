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

Scale notes (100 TB): the graph additionally carries a *catalog* of per-label
node frames and per-type rel frames.  A label scan through the catalog reads
only that label's source parquet (true partition pruning); the unioned wide
``nodes``/``rels`` frames exist only for genuine all-nodes / all-rels scans.
Dimension-sized labels are tracked in ``small_labels`` so expand joins can
explicitly ``broadcast()`` them — with a unioned frame Catalyst cannot know a
label slice is tiny (VERDICT r1 "broadcast blindness" fix).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_FIXED_COLS = ("id", "labels")
REL_FIXED_COLS = ("id", "src", "dst", "type")


@dataclass
class PropertyGraph:
    """An immutable snapshot of a property graph as two DataFrames.

    ``label_frames`` / ``type_frames`` are optional pruned views keyed by
    label / relationship type; when present they MUST have the same schema as
    ``nodes`` / ``rels`` (wide, null-padded) but scan only their own source.
    """

    nodes: DataFrame
    rels: DataFrame
    label_frames: dict[str, DataFrame] = field(default_factory=dict)
    type_frames: dict[str, DataFrame] = field(default_factory=dict)
    small_labels: frozenset[str] = frozenset()
    # True for INTERACTIVE stores known to be small (GraphStore tracks its
    # reserved-id count): node scans broadcast statically, so pattern
    # joins plan BroadcastHashJoin up front instead of shuffle joins that
    # AQE later converts — checkpoint-backed frames report no size stats,
    # so without this every tiny interactive readback pays the full
    # shuffle-stage job cascade (r14 — match_merge_rel watch item).
    broadcast_all: bool = False

    # ---- scans (SURVEY.md §2.B.1) -------------------------------------
    def nodes_by_label(self, label: str) -> DataFrame:
        """``MATCH (n:Label)`` — label scan (DatabaseIO.java:51).

        Catalog hit → single-table parquet scan (partition-pruned at scale);
        miss → filter on the union (still correct, full scan).
        """
        if label in self.label_frames:
            return self.label_frames[label]
        return self.nodes.where(F.array_contains(F.col("labels"), label))

    def rels_by_type(self, rel_type: str) -> DataFrame:
        """``-[:TYPE]->`` — relationship-type scan (DatabaseIO.java:51).
        ``-[:A|B]->`` alternation unions the per-type slices (each still a
        pruned scan when catalogued), the one chokepoint every pattern
        operator routes through."""
        if "|" in rel_type:
            r = None
            for t in (p.strip() for p in rel_type.split("|")):
                s = self.rels_by_type(t)
                r = s if r is None else r.unionByName(s)
            return r
        if rel_type in self.type_frames:
            return self.type_frames[rel_type]
        return self.rels.where(F.col("type") == rel_type)

    def maybe_broadcast(self, label: str | None, df: DataFrame) -> DataFrame:
        """Explicitly broadcast dimension-sized labels in joins."""
        if self.broadcast_all:
            return F.broadcast(df)
        if label is not None and label in self.small_labels:
            return F.broadcast(df)
        return df

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
        direction: str = "out",
    ) -> DataFrame:
        """One-hop pattern ``(a:SrcLabel)-[r:TYPE]->(b:DstLabel)``.

        Compiles to two equi-joins; Catalyst/AQE picks broadcast vs
        sort-merge per side, with explicit broadcast of dimension labels.
        ``direction``: ``out`` (a→b), ``in`` (a←b), ``both`` (undirected —
        union of both orientations). Columns come back prefixed ``alias_``.
        """
        from .operators.patterns import NodeSpec, RelSpec, match_chain

        return match_chain(
            self,
            [
                NodeSpec(src_alias, src_label),
                RelSpec(rel_alias, rel_type, direction=direction),
                NodeSpec(dst_alias, dst_label),
            ],
        )

    def degrees(self, direction: str = "out") -> DataFrame:
        """``gds.degree`` — per-node degree (SURVEY.md §2.B.10).

        One shuffle on the node id — unavoidable and partial-aggregated
        map-side by Catalyst.
        """
        key = {"out": "src", "in": "dst"}[direction]
        return self.rels.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("degree"))


def prefix_columns(df: DataFrame, alias: str) -> DataFrame:
    """Rename every column to ``alias_col`` for join-ambiguity-free plans."""
    return df.select([F.col(c).alias(f"{alias}_{c}") for c in df.columns])
