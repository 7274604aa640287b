"""Index DDL surface: CREATE/DROP/SHOW INDEX (SURVEY §4.2 "index lookup
on (label, property)").

Neo4j's b-tree/range/text indexes (the packaged engine's lookup
accelerators; the reference image exercises them implicitly through every
property-map MATCH) have no 1:1 Spark object. The honest Spark-native
translation is **data clustering**: Parquet keeps min/max statistics per
row group, and Spark's scan skips row groups whose stats exclude the
predicate — but only if the data is clustered on the filtered column.
``CREATE INDEX`` therefore does two things here:

1. registers catalog metadata (name, label, properties, type, state —
   the ``SHOW INDEXES`` introspection contract), and
2. marks the property so ``GraphStore.dump`` sorts node rows *within
   partitions* by it — after which the parquet row-group pruning that
   Spark already does IS the index (same contract as a clustered index:
   faster lookups after the next data (re)write, no extra structure to
   keep transactionally consistent).

Query plans don't change shape — predicate pushdown happens with or
without the index (``test_plan_audit.py::test_property_filter_pushes_down``);
what changes is how many row groups the pushed filter can skip.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Index:
    name: str
    label: str
    properties: list[str]
    index_type: str = "RANGE"  # RANGE | TEXT | POINT | VECTOR (openCypher 5 DDL)
    state: str = "ONLINE"
    # NODE (label) or RELATIONSHIP (the `FOR ()-[r:T]-()` DDL form — r12)
    entity: str = "NODE"
    # VECTOR indexes carry their config here (dimensions, similarity,
    # cells, nprobe); empty for the clustering index types.
    options: dict = field(default_factory=dict)


@dataclass
class IndexCatalog:
    """In-store index registry; serialized into dump ``_meta`` so indexes
    survive dump/load like any other catalog state."""

    indexes: dict[str, Index] = field(default_factory=dict)

    def create(
        self,
        name: str,
        label: str,
        properties: list[str],
        index_type: str = "RANGE",
        if_not_exists: bool = False,
        options: dict | None = None,
        entity: str = "NODE",
    ) -> Index:
        if name in self.indexes:
            if if_not_exists:
                return self.indexes[name]
            raise ValueError(f"An equivalent index already exists: {name}")
        idx = Index(
            name, label, list(properties), index_type.upper(),
            options=dict(options or {}), entity=entity,
        )
        self.indexes[name] = idx
        return idx

    def drop(self, name: str, if_exists: bool = False) -> None:
        if name not in self.indexes:
            if if_exists:
                return
            raise ValueError(f"Unable to drop index: No such index {name}")
        del self.indexes[name]

    def cluster_columns(self) -> list[str]:
        """Properties to sort dumps by (first property of each index, in
        creation order) — the physical clustering side of CREATE INDEX."""
        cols: list[str] = []
        for idx in self.indexes.values():
            if idx.index_type == "VECTOR" or idx.entity != "NODE":
                continue  # embedding arrays are IVF-indexed, not sort keys;
                # relationship indexes don't cluster the NODE dump
            p = idx.properties[0]
            if p not in cols:
                cols.append(p)
        return cols

    def rows(self) -> list[tuple]:
        """SHOW INDEXES shape: (id, name, state, type, entityType,
        labelsOrTypes, properties) — the columns the reference's cypher
        surface yields."""
        return [
            (
                i + 1,
                x.name,
                x.state,
                x.index_type,
                x.entity,
                [x.label],
                list(x.properties),
            )
            for i, x in enumerate(self.indexes.values())
        ]

    def to_json(self) -> list[dict]:
        return [
            {
                "name": x.name,
                "label": x.label,
                "properties": x.properties,
                "index_type": x.index_type,
                "options": x.options,
                "entity": x.entity,
            }
            for x in self.indexes.values()
        ]

    @classmethod
    def from_json(cls, rows: list[dict]) -> "IndexCatalog":
        cat = cls()
        for r in rows:
            cat.create(
                r["name"], r["label"], r["properties"],
                r.get("index_type", "RANGE"), options=r.get("options"),
                entity=r.get("entity", "NODE"),
            )
        return cat


SHOW_SCHEMA = (
    "id long, name string, state string, type string, entityType string, "
    "labelsOrTypes array<string>, properties array<string>"
)
