"""GraphQL query surface (the reference's ``graphql`` plugin manifest key).

Reference anchor: the GraphQL plugin declared in
/root/reference/docker-image-src/3.5/coredb/neo4j-plugins.json:28-32
(dropped from calver manifests, but the 3.5/4.x surface) serves
read-only GraphQL queries over the property graph: top-level fields are
node labels, scalar selections are properties, nested selections
traverse relationships.

Spark realization: the query document compiles to ONE DataFrame plan —
label-frame scan → equality-argument filters → property projection;
nested selections become a relationship equi-join plus either a flat
column (to-one) or a per-parent ``collect_list``/``array_sort`` + comma
string (to-many, pinned order so results are deterministic and
oracle-comparable). Catalyst sees plain filters/joins/aggregates, so
pushdown/broadcast behave exactly like the Cypher paths.

Supported subset (fail-loud outside it): one top-level field, scalar
int/string/bool arguments (equality filters; ``limit`` caps rows with a
deterministic name order), one nesting level.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<punct>[{}():,])
           |(?P<str>"(?:[^"\\]|\\.)*")
           |(?P<num>-?\d+)
           |(?P<bool>(?:true|false)(?![A-Za-z0-9_]))
           |(?P<name>[A-Za-z_][A-Za-z0-9_]*))""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        if src[i].isspace():
            i += 1
            continue
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"GraphQL parse error at {src[i:i+20]!r}")
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
        i = m.end()
    return out


@dataclass
class _Field:
    name: str
    args: dict
    selections: list["_Field"] = field(default_factory=list)


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _eat(self, kind=None, val=None):
        k, v = self._peek()
        if (kind and k != kind) or (val and v != val):
            raise ValueError(f"GraphQL parse error: expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def document(self) -> _Field:
        # optional `query` operation keyword
        if self._peek() == ("name", "query"):
            self._eat()
        self._eat("punct", "{")
        fields = self._fields()
        self._eat("punct", "}")
        if len(fields) != 1:
            raise ValueError("GraphQL subset: exactly one top-level field")
        return fields[0]

    def _fields(self) -> list[_Field]:
        out = []
        while self._peek()[1] not in ("}", None):
            out.append(self._field())
        return out

    def _field(self) -> _Field:
        name = self._eat("name")
        args: dict = {}
        if self._peek() == ("punct", "("):
            self._eat()
            while self._peek()[1] != ")":
                k = self._eat("name")
                self._eat("punct", ":")
                kind, v = self._peek()
                self._eat()
                if kind == "str":
                    args[k] = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
                elif kind == "num":
                    args[k] = int(v)
                elif kind == "bool":
                    args[k] = v == "true"
                else:
                    raise ValueError(f"GraphQL subset: unsupported argument {v!r}")
                if self._peek() == ("punct", ","):
                    self._eat()
            self._eat("punct", ")")
        sels: list[_Field] = []
        if self._peek() == ("punct", "{"):
            self._eat()
            sels = self._fields()
            self._eat("punct", "}")
        return _Field(name, args, sels)


@dataclass
class Relation:
    """A traversable GraphQL field: follow ``rel_type`` from the parent
    label ('out' = parent is src) to ``target`` (a type name in the
    schema); ``many`` selects list (collect) vs scalar (flat) shape."""

    rel_type: str
    direction: str  # 'out' | 'in'
    target: str
    many: bool


@dataclass
class GraphQLType:
    label: str
    props: dict[str, str]  # graphql field -> node property column
    relations: dict[str, Relation] = field(default_factory=dict)


class GraphQLEngine:
    """Executes the GraphQL read subset against a PropertyGraph's
    label/type frames. ``types`` maps top-level field names (and relation
    targets) to GraphQLType entries."""

    def __init__(self, label_frames, type_frames, types: dict[str, GraphQLType]):
        self.label_frames = label_frames
        self.type_frames = type_frames
        self.types = types

    def execute(self, query: str) -> DataFrame:
        root = _Parser(_tokenize(query)).document()
        t = self.types.get(root.name)
        if t is None:
            raise ValueError(f"unknown GraphQL field {root.name!r}")
        df = self.label_frames[t.label]
        limit = None
        for k, v in root.args.items():
            if k == "limit":
                limit = int(v)
                continue
            if k not in t.props:
                raise ValueError(f"unknown argument {k!r} on {root.name!r}")
            df = df.where(F.col(t.props[k]) == F.lit(v))
        if not root.selections:
            raise ValueError("GraphQL subset: a selection set is required")
        cols, joins = [], []
        for sel in root.selections:
            if sel.name in t.props:
                cols.append(F.col(t.props[sel.name]).alias(sel.name))
            elif sel.name in t.relations:
                joins.append(sel)
            else:
                raise ValueError(f"unknown selection {sel.name!r} on {root.name!r}")
        out = df.select(F.col("id").alias("_gid"), *cols)
        for sel in joins:
            out = self._join_relation(out, t.relations[sel.name], sel)
        out = out.drop("_gid")
        if limit is not None:
            # deterministic page: order by the selected columns
            out = out.orderBy(*[c for c in out.columns]).limit(limit)
        return out

    def _join_relation(self, parent: DataFrame, rel: Relation, sel: _Field) -> DataFrame:
        child_t = self.types[rel.target]
        if any(s.selections for s in sel.selections):
            raise ValueError("GraphQL subset: one nesting level")
        child_cols = []
        for s in sel.selections:
            if s.name not in child_t.props:
                raise ValueError(f"unknown selection {s.name!r} on {rel.target!r}")
            child_cols.append(child_t.props[s.name])
        edges = self.type_frames[rel.rel_type]
        near, far = ("src", "dst") if rel.direction == "out" else ("dst", "src")
        child = self.label_frames[child_t.label]
        hop = (
            edges.select(F.col(near).alias("_gid"), F.col(far).alias("_cid"))
            .join(child.withColumnRenamed("id", "_cid"), "_cid")
        )
        if rel.many:
            # to-many: collect ONE struct per child and sort the struct
            # array once (lexicographic over fields in selection order),
            # so sibling fields of the same child object stay row-aligned
            # — sorting each column independently would decorrelate them.
            # Serialized as comma strings: deterministic AND hashable for
            # differential gates.
            kids = F.array_sort(
                F.collect_list(
                    F.struct(
                        *[
                            F.col(c).alias(s.name)
                            for c, s in zip(child_cols, sel.selections)
                        ]
                    )
                )
            )
            def _getter(fname):
                return lambda kid: kid[fname]

            agg = hop.groupBy("_gid").agg(
                *[
                    F.concat_ws(",", F.transform(kids, _getter(s.name))).alias(
                        f"{sel.name}_{s.name}"
                    )
                    for s in sel.selections
                ]
            )
            joined = parent.join(agg, "_gid", "left")
            for s in sel.selections:
                joined = joined.withColumn(
                    f"{sel.name}_{s.name}",
                    F.coalesce(F.col(f"{sel.name}_{s.name}"), F.lit("")),
                )
            return joined
        flat = hop.select(
            "_gid", *[F.col(c).alias(f"{sel.name}_{s.name}") for c, s in zip(child_cols, sel.selections)]
        )
        return parent.join(flat, "_gid", "left")


def tpch_engine(graph) -> GraphQLEngine:
    """GraphQL schema over the TPC-H-ish property graph (sources/tpch.py):
    the wiring a deployment's schema config would provide."""
    types = {
        "region": GraphQLType(
            label="Region",
            props={"name": "r_name"},
            relations={
                "nations": Relation("IN_REGION", "in", "nation", many=True)
            },
        ),
        "nation": GraphQLType(
            label="Nation",
            props={"name": "n_name"},
            relations={
                "region": Relation("IN_REGION", "out", "region", many=False),
                "customers": Relation("IN_NATION", "in", "customer", many=True),
            },
        ),
        "customer": GraphQLType(
            label="Customer",
            props={"name": "c_name", "mktsegment": "c_mktsegment"},
            relations={
                "nation": Relation("IN_NATION", "out", "nation", many=False)
            },
        ),
    }
    return GraphQLEngine(graph.label_frames, graph.type_frames, types)
