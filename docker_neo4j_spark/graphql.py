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

Supported subset (fail-loud outside it): scalar int/string/bool
arguments (equality filters; ``limit`` caps rows with a deterministic
name order), arbitrary nesting depth (each level one more equi-join /
collect), multiple top-level fields via ``execute_document`` (one
DataFrame plan per root field — GraphQL's response is a map of root
keys, and Spark's unit of result is a DataFrame).

To-many serialization: child rows collect into a struct array sorted
once (so sibling columns stay row-aligned), then each selected field
serializes to a comma-joined string with ``\\``/``,`` escaped (``\\\\``
and ``\\,``) — unambiguous to split, deterministic, hashable, and
nested to-many lists (whose serialized values contain commas) survive
re-serialization at the level above. Values cast to string first, so
non-string properties serialize instead of failing analysis.
"""

from __future__ import annotations
from .localframe import local_df

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<punct>[{}():,\[\]])
           |(?P<str>"(?:[^"\\]|\\.)*")
           |(?P<num>-?\d+(?:\.\d+)?)
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
    alias: str | None = None  # `alias: field` — output name override

    @property
    def out_name(self) -> str:
        return self.alias or self.name


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

    def document(self) -> tuple[str, list[_Field]]:
        # optional `query` / `mutation` operation keyword
        op = "query"
        if self._peek() in (("name", "query"), ("name", "mutation")):
            op = self._eat()
        self._eat("punct", "{")
        fields = self._fields()
        self._eat("punct", "}")
        if not fields:
            raise ValueError("GraphQL subset: at least one top-level field")
        return op, fields

    def _fields(self) -> list[_Field]:
        out = []
        while self._peek()[1] not in ("}", None):
            out.append(self._field())
        return out

    def _field(self) -> _Field:
        name = self._eat("name")
        alias = None
        # GraphQL field alias: `alias: field(...)` — renames the output
        if self._peek() == ("punct", ":"):
            self._eat()
            alias, name = name, self._eat("name")
        args: dict = {}
        if self._peek() == ("punct", "("):
            self._eat()
            while self._peek()[1] != ")":
                k = self._eat("name")
                self._eat("punct", ":")
                args[k] = self._value()
                if self._peek() == ("punct", ","):
                    self._eat()
            self._eat("punct", ")")
        sels: list[_Field] = []
        if self._peek() == ("punct", "{"):
            self._eat()
            sels = self._fields()
            self._eat("punct", "}")
        return _Field(name, args, sels, alias)

    def _value(self):
        """Argument value: scalar, ``{…}`` input object (where filters),
        or ``[…]`` list (the _in operator)."""
        kind, v = self._peek()
        if (kind, v) == ("punct", "{"):
            self._eat()
            obj: dict = {}
            while self._peek()[1] != "}":
                k = self._eat("name")
                self._eat("punct", ":")
                obj[k] = self._value()
                if self._peek() == ("punct", ","):
                    self._eat()
            self._eat("punct", "}")
            return obj
        if (kind, v) == ("punct", "["):
            self._eat()
            lst: list = []
            while self._peek()[1] != "]":
                lst.append(self._value())
                if self._peek() == ("punct", ","):
                    self._eat()
            self._eat("punct", "]")
            return lst
        self._eat()
        if kind == "str":
            return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if kind == "num":
            return float(v) if "." in v else int(v)
        if kind == "bool":
            return v == "true"
        raise ValueError(f"GraphQL subset: unsupported argument {v!r}")


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


_MUTATION_RE = re.compile(r"^(create|update|delete)([A-Z]\w*)$")


class GraphQLEngine:
    """Executes the GraphQL subset against a PropertyGraph's label/type
    frames. ``types`` maps top-level field names (and relation targets)
    to GraphQLType entries. With a ``store`` (GraphStore), mutation
    documents run too: ``create<Type>(props…)``, ``update<Type>(match,
    updates…)``, ``delete<Type>(match…)`` — the graphql plugin's
    auto-generated mutation surface. Pair with ``store_frames`` so query
    fields read the live store (read-your-writes)."""

    def __init__(
        self,
        label_frames,
        type_frames,
        types: dict[str, GraphQLType],
        store=None,
    ):
        self.label_frames = label_frames
        self.type_frames = type_frames
        self.types = types
        self.store = store

    def _run_mutation(self, root: _Field) -> DataFrame:
        if self.store is None:
            raise ValueError(
                "mutations require a GraphStore-backed engine "
                "(pass store= to GraphQLEngine)"
            )
        m = _MUTATION_RE.match(root.name)
        if not m:
            raise ValueError(
                f"unknown mutation {root.name!r} — the subset is "
                f"create<Type> / update<Type> / delete<Type>"
            )
        verb, raw = m.group(1), m.group(2)
        tname = raw[0].lower() + raw[1:]
        t = self.types.get(tname)
        if t is None:
            raise ValueError(f"unknown GraphQL type {tname!r} in {root.name!r}")

        def col(k: str) -> str:
            if k not in t.props:
                raise ValueError(f"unknown argument {k!r} on {root.name!r}")
            return t.props[k]

        cols = []
        for sel in root.selections:
            if sel.name not in t.props or sel.selections:
                raise ValueError(
                    "mutation selections are scalar fields only "
                    f"(got {sel.name!r})"
                )
            cols.append(F.col(t.props[sel.name]).alias(sel.name))
        if verb == "delete":
            if root.selections:
                raise ValueError("delete mutations take no selection set")
            if not root.args:
                raise ValueError(f"{root.name}: match arguments required")
            match = {col(k): v for k, v in root.args.items()}
            n = self.store.match_nodes(t.label, **match).count()
            self.store.delete_nodes(t.label, **match)
            return local_df(self.store.spark, [(n,)], "deleted bigint")
        if not cols:
            raise ValueError(f"{root.name}: a selection set is required")
        if verb == "create":
            if not root.args:
                raise ValueError(f"{root.name}: property arguments required")
            ids = self.store.create_nodes(
                t.label, [{col(k): v for k, v in root.args.items()}]
            )
            out = self.store.match_nodes(t.label).where(F.col("id") == ids[0])
            return out.select(*cols)
        # update: first argument matches, the rest set (documented subset)
        args = list(root.args.items())
        if len(args) < 2:
            raise ValueError(
                f"{root.name}: needs one match argument and at least one update"
            )
        (mk, mv) = args[0]
        self.store.set_props(
            t.label, {col(mk): mv}, {col(k): v for k, v in args[1:]}
        )
        return self.store.match_nodes(t.label, **{col(mk): mv}).select(*cols)

    def execute(self, query: str) -> DataFrame:
        op, roots = _Parser(_tokenize(query)).document()
        if len(roots) != 1:
            raise ValueError(
                "execute() compiles one top-level field; use "
                "execute_document() for a multi-root document"
            )
        if op == "mutation":
            return self._run_mutation(roots[0])
        return self._compile_root(roots[0])

    def execute_document(self, query: str) -> dict[str, DataFrame]:
        """Multi-root documents: GraphQL's response is a map of root field
        names; each root compiles to its own DataFrame plan. Mutation
        documents run their root fields in document order (the GraphQL
        serial-execution rule for mutations)."""
        op, roots = _Parser(_tokenize(query)).document()
        seen = set()
        for r in roots:
            if r.name in seen:
                raise ValueError(f"duplicate top-level field {r.name!r}")
            seen.add(r.name)
        if op == "mutation":
            return {r.name: self._run_mutation(r) for r in roots}
        return {r.name: self._compile_root(r) for r in roots}

    # where-filter operator suffixes, the neo4j-graphql library's input
    # shape: { field: eq, field_gt: v, …, field_in: […] } — longest
    # suffix matched first so `_starts_with` never parses as a field
    # named `…_starts` with `_with`
    _WHERE_OPS = (
        ("_starts_with", lambda c, v: c.startswith(str(v))),
        ("_ends_with", lambda c, v: c.endswith(str(v))),
        ("_contains", lambda c, v: c.contains(str(v))),
        ("_gte", lambda c, v: c >= F.lit(v)),
        ("_lte", lambda c, v: c <= F.lit(v)),
        ("_gt", lambda c, v: c > F.lit(v)),
        ("_lt", lambda c, v: c < F.lit(v)),
        ("_in", lambda c, v: c.isin(list(v))),
        ("_not", lambda c, v: c != F.lit(v)),
    )

    def _where_filter(self, t: "GraphQLType", fname: str, where: dict) -> F.Column:
        """Compile a ``where:`` input object to one boolean Column (terms
        AND-ed, the library's semantics)."""
        if not isinstance(where, dict) or not where:
            raise ValueError(f"where on {fname!r} must be a non-empty input object")
        cond = None
        for k, v in where.items():
            prop, op = k, None
            for suffix, fn in self._WHERE_OPS:
                if k.endswith(suffix) and k[: -len(suffix)] in t.props:
                    prop, op = k[: -len(suffix)], fn
                    break
            if prop not in t.props:
                raise ValueError(f"unknown where field {k!r} on {fname!r}")
            c = F.col(t.props[prop])
            term = (c == F.lit(v)) if op is None else op(c, v)
            cond = term if cond is None else cond & term
        return cond

    def _compile_root(self, root: _Field) -> DataFrame:
        t = self.types.get(root.name)
        if t is None:
            raise ValueError(f"unknown GraphQL field {root.name!r}")
        df = self.label_frames[t.label]
        limit = None
        for k, v in root.args.items():
            if k == "limit":
                limit = int(v)
                continue
            if k == "where":
                df = df.where(self._where_filter(t, root.name, v))
                continue
            if k not in t.props:
                raise ValueError(f"unknown argument {k!r} on {root.name!r}")
            df = df.where(F.col(t.props[k]) == F.lit(v))
        out = self._select(t, root.name, df, root.selections).drop("_gid")
        if limit is not None:
            # deterministic page: order by the selected columns
            out = out.orderBy(*[c for c in out.columns]).limit(limit)
        return out

    def _select(self, t: GraphQLType, fname: str, df: DataFrame, selections: list[_Field]) -> DataFrame:
        """Compile a selection set over ``df`` (a label frame) into a frame
        of ``_gid`` + one output column per selected field; relation
        selections recurse (each nesting level is one more equi-join plus,
        for to-many, one collect), so depth is bounded only by the query."""
        if not selections:
            raise ValueError(f"GraphQL subset: a selection set is required on {fname!r}")
        cols, joins = [], []
        for sel in selections:
            if sel.name in t.props:
                if sel.selections:
                    raise ValueError(f"scalar field {sel.name!r} takes no selection set")
                cols.append(F.col(t.props[sel.name]).alias(sel.out_name))
            elif sel.name in t.relations:
                joins.append(sel)
            else:
                raise ValueError(f"unknown selection {sel.name!r} on {fname!r}")
        out = df.select(F.col("id").alias("_gid"), *cols)
        for sel in joins:
            out = self._join_relation(out, t.relations[sel.name], sel)
        return out

    @staticmethod
    def _esc(c: F.Column) -> F.Column:
        """Escape the serialization metacharacters (backslash first), so a
        comma inside a child value — including a nested to-many list
        serialized one level down — survives the level-above join
        unambiguously: split on unescaped commas, then unescape."""
        return F.replace(
            F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit(","), F.lit("\\,")
        )

    def _join_relation(self, parent: DataFrame, rel: Relation, sel: _Field) -> DataFrame:
        child_t = self.types[rel.target]
        child = self.label_frames[child_t.label]
        # nested-field arguments filter the child set before the join
        # (GraphQL's per-field argument semantics); `limit` is root-only —
        # a per-parent limit needs an ordering contract the subset
        # doesn't define, so fail loud rather than pick one silently
        for k, v in sel.args.items():
            if k == "where":
                child = child.where(self._where_filter(child_t, sel.name, v))
                continue
            if k not in child_t.props:
                raise ValueError(f"unknown argument {k!r} on {sel.name!r}")
            child = child.where(F.col(child_t.props[k]) == F.lit(v))
        # recurse: the child frame already carries any deeper nesting as
        # serialized columns, so this level only sees scalar strings
        child_frame = self._select(child_t, rel.target, child, sel.selections)
        child_cols = [c for c in child_frame.columns if c != "_gid"]
        edges = self.type_frames[rel.rel_type]
        near, far = ("src", "dst") if rel.direction == "out" else ("dst", "src")
        hop = (
            edges.select(F.col(near).alias("_pid"), F.col(far).alias("_cid"))
            .join(child_frame.withColumnRenamed("_gid", "_cid"), "_cid")
        )
        if rel.many:
            # to-many: collect ONE struct per child and sort the struct
            # array once (lexicographic over fields in selection order),
            # so sibling fields of the same child object stay row-aligned
            # — sorting each column independently would decorrelate them.
            # Values cast to string BEFORE collect (non-string props
            # serialize instead of failing concat_ws analysis), sorted on
            # the raw strings, escaped at join time.
            kids = F.array_sort(
                F.collect_list(
                    F.struct(*[F.col(c).cast("string").alias(c) for c in child_cols])
                )
            )

            def _getter(fname):
                return lambda kid: self._esc(kid[fname])

            agg = hop.groupBy("_pid").agg(
                *[
                    F.concat_ws(",", F.transform(kids, _getter(c))).alias(
                        f"{sel.out_name}_{c}"
                    )
                    for c in child_cols
                ]
            )
            joined = parent.join(
                agg.withColumnRenamed("_pid", "_gid"), "_gid", "left"
            )
            for c in child_cols:
                joined = joined.withColumn(
                    f"{sel.out_name}_{c}",
                    F.coalesce(F.col(f"{sel.out_name}_{c}"), F.lit("")),
                )
            return joined
        flat = hop.select(
            F.col("_pid").alias("_gid"),
            *[F.col(c).alias(f"{sel.out_name}_{c}") for c in child_cols],
        )
        return parent.join(flat, "_gid", "left")


class _StoreLabelFrames:
    """Lazy label → frame mapping over the LIVE store, so query fields
    observe mutations (read-your-writes, the Bolt façade's contract)."""

    def __init__(self, store):
        self._store = store

    def __getitem__(self, label):
        return self._store.match_nodes(label)


class _StoreTypeFrames:
    def __init__(self, store):
        self._store = store

    def __getitem__(self, rtype):
        return self._store.graph.rels_by_type(rtype)


def store_engine(store, types: dict[str, GraphQLType]) -> GraphQLEngine:
    """GraphQL engine over a live GraphStore: queries read the current
    graph, mutation documents write through the store."""
    return GraphQLEngine(
        _StoreLabelFrames(store), _StoreTypeFrames(store), types, store=store
    )


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
            props={
                "name": "c_name",
                "mktsegment": "c_mktsegment",
                # non-string prop: exercises the cast-to-string path of
                # to-many serialization
                "acctbal": "c_acctbal",
            },
            relations={
                "nation": Relation("IN_NATION", "out", "nation", many=False)
            },
        ),
    }
    return GraphQLEngine(graph.label_frames, graph.type_frames, types)
