"""Constraint DDL surface: CREATE/DROP/SHOW CONSTRAINT (the reference's
schema surface alongside indexes — uniqueness constraints are what its
MERGE semantics lean on).

Spark has no transactional uniqueness enforcement; the honest translation
is a DISTRIBUTED VALIDATION on every constrained write: before appending
nodes of a constrained label, the write path runs one groupBy-count over
(new ∪ existing) keys and refuses the batch if any key collides — the
same one-aggregation cost profile as the left-anti merge the batch write
already pays, and the only uniqueness guarantee a shared-nothing engine
can give without a serializing coordinator. A uniqueness constraint also
implies the clustering an index would declare (neo4j backs unique
constraints with an index), so constrained properties join the dump's
cluster columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Constraint:
    name: str
    label: str
    properties: list[str]
    constraint_type: str = "UNIQUENESS"
    state: str = "ONLINE"
    entity: str = "NODE"


@dataclass
class ConstraintCatalog:
    """In-store constraint registry; serialized into dump ``_meta`` so
    constraints survive dump/load like the index catalog."""

    constraints: dict[str, Constraint] = field(default_factory=dict)

    def create(
        self,
        name: str,
        label: str,
        properties: list[str],
        if_not_exists: bool = False,
        constraint_type: str = "UNIQUENESS",
        entity: str = "NODE",
    ) -> Constraint:
        if name in self.constraints:
            if if_not_exists:
                return self.constraints[name]
            raise ValueError(f"An equivalent constraint already exists: {name}")
        c = Constraint(name, label, list(properties), constraint_type, entity=entity)
        self.constraints[name] = c
        return c

    def drop(self, name: str, if_exists: bool = False) -> None:
        if name not in self.constraints:
            if if_exists:
                return
            raise ValueError(f"Unable to drop constraint: No such constraint {name}")
        del self.constraints[name]

    def for_label(self, label: str) -> list[Constraint]:
        return [c for c in self.constraints.values() if c.label == label]

    def rows(self) -> list[tuple]:
        """SHOW CONSTRAINTS shape: (id, name, state, type, entityType,
        labelsOrTypes, properties) — the reference's yield columns."""
        return [
            (
                i + 1,
                x.name,
                x.state,
                x.constraint_type,
                x.entity,
                [x.label],
                list(x.properties),
            )
            for i, x in enumerate(self.constraints.values())
        ]

    def to_json(self) -> list[dict]:
        # constraint_type/entity MUST round-trip — an existence
        # constraint reloading as UNIQUENESS would enforce the wrong rule
        # after dump/load (r12 fix; was silently dropped)
        return [
            {
                "name": x.name,
                "label": x.label,
                "properties": x.properties,
                "constraint_type": x.constraint_type,
                "entity": x.entity,
            }
            for x in self.constraints.values()
        ]

    @classmethod
    def from_json(cls, rows: list[dict]) -> "ConstraintCatalog":
        cat = cls()
        for r in rows:
            cat.create(
                r["name"], r["label"], r["properties"],
                constraint_type=r.get("constraint_type", "UNIQUENESS"),
                entity=r.get("entity", "NODE"),
            )
        return cat


SHOW_SCHEMA = (
    "id long, name string, state string, type string, entityType string, "
    "labelsOrTypes array<string>, properties array<string>"
)
