"""Pattern matching — the join layer (SURVEY.md §2.B.3).

Cypher pattern matching compiles to relational joins: a chain pattern
``(a:L1)-[r1:T1]->(b:L2)-[r2:T2]->(c:L3)`` is two expand steps, each an
equi-join of the frontier against the rels table then the nodes table
(reference semantics exercised at /root/reference/src/test/java/com/neo4j/
docker/utils/DatabaseIO.java:51,76).

Scale design:
- every join is a plain equi-join → Catalyst/AQE picks broadcast vs
  sort-merge; dimension-sized labels are explicitly broadcast via
  ``PropertyGraph.maybe_broadcast``.
- undirected expands are the union of the two orientations *before* the node
  join (one extra scan of the rel slice, no crossJoin).
- Cypher relationship-uniqueness (a single MATCH never binds the same
  relationship twice) is injected as pairwise ``r_i.id != r_j.id`` filters —
  SURVEY.md §2.B.3 "easy to forget" rule.
- variable-length expansion is an iterative loop (Catalyst has no fixpoint
  operator, SURVEY.md §4.2); each round is one join, frontier unioned with
  depth column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import prefix_columns

if TYPE_CHECKING:
    from ..graph import PropertyGraph


@dataclass(frozen=True)
class NodeSpec:
    """``(alias:Label {prop: value, ...})``."""

    alias: str
    label: str | None = None
    props: dict[str, object] | None = None
    # general label-expression tree (("lab", n) / ("and", [...]) /
    # ("or", [...]) / ("not", t) / ("any",)) for the |/&/!/% forms —
    # compiled to a boolean over the labels array on top of the (label-
    # pruned, when a required positive label exists) scan. None for plain
    # single/AND label patterns. Hashable requirement: pass tuples.
    label_expr: object = None


def label_expr_col(tree, labels_col: F.Column) -> F.Column:
    """Label-expression tree → boolean Column over a labels array."""
    kind = tree[0]
    if kind == "lab":
        return F.array_contains(labels_col, tree[1])
    if kind == "not":
        return ~label_expr_col(tree[1], labels_col)
    if kind == "any":
        return F.size(labels_col) > 0
    terms = [label_expr_col(t, labels_col) for t in tree[1]]
    out = terms[0]
    for t in terms[1:]:
        out = (out & t) if kind == "and" else (out | t)
    return out


@dataclass(frozen=True)
class RelSpec:
    """``-[alias:TYPE {prop: value}]->`` / ``<-[...]-`` / ``-[...]-``
    (direction both). ``props`` filter on relationship property columns
    — pushed into the type-pruned rel scan like node props."""

    alias: str
    rel_type: str | None = None
    direction: str = "out"  # out | in | both
    props: dict[str, object] | None = None


def _prop_lit(k: str, v: object) -> F.Column:
    """Literal for a pattern property filter. Map-valued literals are stored
    by CREATE (via ``_lit_map``) but Spark defines no ordering/equality on
    MapType, so a ``{k: {…}}`` filter cannot compile to ``col == lit`` —
    fail loud instead of the opaque AssertionError ``F.lit(dict)`` raises."""
    if isinstance(v, dict):
        raise ValueError(
            f"map-valued property filters are unsupported in patterns "
            f"(property {k!r}): Spark defines no equality on map columns; "
            f"filter on individual keys instead"
        )
    from ..cypher.lexer import ExprText

    if isinstance(v, ExprText):
        raise ValueError(
            f"property filter {k!r} references unbound variables: "
            f"{v.src!r} — only literals and variable-free expressions "
            f"filter inside a pattern"
        )
    return F.lit(v)


def _node_frame(graph: PropertyGraph, spec: NodeSpec) -> DataFrame:
    df = graph.nodes_by_label(spec.label) if spec.label else graph.nodes
    if spec.label_expr is not None:
        df = df.where(label_expr_col(spec.label_expr, F.col("labels")))
    if spec.props:
        from ..storage.store import esc_prop

        for k, v in spec.props.items():
            # map-valued filters fail loud whether or not the column exists
            # (consistent with _rel_frame); a scalar filter on a property
            # column no write has introduced matches nothing (Cypher:
            # n.missing is null, null = x is never true). Reserved prop
            # names (id/labels/…) filter their ESCAPED store column (r13).
            k = esc_prop(k)
            lit = _prop_lit(k, v)
            df = df.where(F.col(k) == lit) if k in df.columns else df.where(F.lit(False))
    return graph.maybe_broadcast(spec.label, df)


def _rel_frame(graph: PropertyGraph, spec: RelSpec) -> DataFrame:
    """Rel slice oriented so that joining ``src`` always means 'from the
    previous node' — for ``in`` we swap src/dst; for ``both`` we union both
    orientations (rel id preserved, so uniqueness filters still work)."""
    r = graph.rels_by_type(spec.rel_type) if spec.rel_type else graph.rels
    if spec.props:
        from ..storage.store import esc_prop

        for k, v in spec.props.items():
            # map-valued filters are unsupported whether or not the column
            # exists (consistent fail-loud surface); a scalar filter on a
            # property column no write has introduced matches nothing
            k = esc_prop(k)
            lit = _prop_lit(k, v)
            r = r.where(F.col(k) == lit) if k in r.columns else r.where(F.lit(False))
    fwd = r
    rev = r.withColumn("_tmp", F.col("src")).withColumn("src", F.col("dst")).withColumn(
        "dst", F.col("_tmp")
    ).drop("_tmp")
    if spec.direction == "out":
        return fwd
    if spec.direction == "in":
        return rev
    if spec.direction == "both":
        return fwd.unionByName(rev)
    raise ValueError(f"bad direction {spec.direction!r}")


def match_chain(graph: PropertyGraph, pattern: list, with_rel_ids: bool | None = None) -> DataFrame:
    """Compile an alternating [NodeSpec, RelSpec, NodeSpec, ...] chain to a
    DataFrame of all bindings. Columns prefixed ``alias_``.

    Injects Cypher relationship-uniqueness: pairwise ``id !=`` filters over
    every pair of rel aliases in the pattern.

    Rel ``id`` columns are pruned for single-rel patterns (``with_rel_ids``
    defaults to "only when uniqueness filters need them"): the lineitem-
    derived rel ids carry a window over the source table, and keeping the
    column would drag that shuffle into every 1-hop expand that never looks
    at the id.
    """
    if not pattern or not isinstance(pattern[0], NodeSpec):
        raise ValueError("pattern must start with a NodeSpec")
    # Uniqueness filters are only needed between rel pairs that could bind
    # the same relationship — same declared type, or untyped. Statically
    # distinct types can never collide, so their ids (and the shuffle the
    # lineitem rel-id window carries) are prunable.
    rel_specs = [p for p in pattern if isinstance(p, RelSpec)]
    unique_pairs = {
        (a.alias, b.alias)
        for x, a in enumerate(rel_specs)
        for b in rel_specs[x + 1 :]
        if a.rel_type is None or b.rel_type is None or a.rel_type == b.rel_type
    }
    keep_ids = with_rel_ids if with_rel_ids is not None else bool(unique_pairs)
    first = pattern[0]
    out = prefix_columns(_node_frame(graph, first), first.alias)
    prev_node = first
    rel_aliases: list[str] = []
    seen_nodes = {first.alias}
    i = 1
    while i < len(pattern):
        rel, node = pattern[i], pattern[i + 1]
        if not isinstance(rel, RelSpec) or not isinstance(node, NodeSpec):
            raise ValueError("pattern must alternate NodeSpec/RelSpec")
        rf = _rel_frame(graph, rel)
        if not keep_ids:
            rf = rf.drop("id")
        if i == 1 and len(rel_specs) >= 3:
            # Deep chains fan out multiplicatively with every many-to-many
            # hop, so downstream join work dwarfs the input bytes Catalyst
            # sizes stages by — a single-task scan spine serializes the
            # whole expansion (r14, guide §8/§2.5: measured 6.6 s → 2.6 s
            # on the 3-hop headline, whose probe spine ran as ONE task over
            # an ~18 M-row fan-out). Spread the first rel frame (the spine
            # every later join streams through) across the cores when its
            # scan is narrower than the session's parallelism; the hash
            # exchange on src is narrow, deterministic under retries, and a
            # no-op on cluster-sized inputs that already scan wide.
            par = rf.sparkSession.sparkContext.defaultParallelism
            if rf.rdd.getNumPartitions() < par:
                rf = rf.repartition(par, F.col("src"))
        r = prefix_columns(rf, rel.alias)
        if node.alias in seen_nodes:
            # repeated variable closes a cycle — (a)-[:X]->(a): join the
            # rel slice and require its dst to BE the existing binding
            # instead of re-prefixing the alias (duplicate columns); any
            # label/prop constraints on the re-occurrence semi-filter the
            # bound ids
            out = out.join(
                r, F.col(f"{prev_node.alias}_id") == F.col(f"{rel.alias}_src")
            ).where(F.col(f"{rel.alias}_dst") == F.col(f"{node.alias}_id"))
            if node.label or node.props:
                ok = _node_frame(graph, node).select(
                    F.col("id").alias("_rep_id")
                )
                out = out.join(
                    ok,
                    F.col(f"{node.alias}_id") == F.col("_rep_id"),
                    "left_semi",
                )
        else:
            n = prefix_columns(_node_frame(graph, node), node.alias)
            out = out.join(
                r, F.col(f"{prev_node.alias}_id") == F.col(f"{rel.alias}_src")
            ).join(n, F.col(f"{rel.alias}_dst") == F.col(f"{node.alias}_id"))
            seen_nodes.add(node.alias)
        rel_aliases.append(rel.alias)
        prev_node = node
        i += 2
    # Cypher uniqueness semantics: no rel bound twice in one MATCH.
    if keep_ids:
        for j in range(len(rel_aliases)):
            for k in range(j + 1, len(rel_aliases)):
                if (rel_aliases[j], rel_aliases[k]) in unique_pairs:
                    out = out.where(
                        F.col(f"{rel_aliases[j]}_id") != F.col(f"{rel_aliases[k]}_id")
                    )
    return out


def optional_expand(
    graph: PropertyGraph,
    left: DataFrame,
    left_id_col: str,
    rel: RelSpec,
    node: NodeSpec,
    rel_filter: F.Column | None = None,
    node_filter: F.Column | None = None,
) -> DataFrame:
    """``OPTIONAL MATCH`` — left outer join expand (SURVEY.md §2.B.3).

    ``left`` keeps all its rows; unmatched bindings come back null.
    ``rel_filter`` / ``node_filter`` are predicates over the *raw* rel/node
    columns, applied inside the optional side (Cypher WHERE attached to the
    OPTIONAL MATCH, not a post-filter).
    """
    r = _rel_frame(graph, rel)
    if rel_filter is not None:
        r = r.where(rel_filter)
    n = _node_frame(graph, node)
    if node_filter is not None:
        n = n.where(node_filter)
    r = prefix_columns(r, rel.alias)
    n = prefix_columns(n, node.alias)
    hop = r.join(n, F.col(f"{rel.alias}_dst") == F.col(f"{node.alias}_id"))
    return left.join(hop, F.col(left_id_col) == F.col(f"{rel.alias}_src"), "left")


def pattern_predicate(
    graph: PropertyGraph,
    left: DataFrame,
    left_id_col: str,
    rel: RelSpec,
    node: NodeSpec,
    anti: bool = False,
    rel_filter: F.Column | None = None,
    node_filter: F.Column | None = None,
) -> DataFrame:
    """``WHERE (a)-[:T]->(:L)`` (semi join) / ``WHERE NOT (...)`` (anti join).

    Compiled straight to left_semi/left_anti — Catalyst's subquery-decorrelated
    form (SURVEY.md §4.2), no row duplication, no post-dedup needed.
    """
    r = _rel_frame(graph, rel)
    if rel_filter is not None:
        r = r.where(rel_filter)
    if node.label or node.props or node_filter is not None:
        n = _node_frame(graph, node)
        if node_filter is not None:
            n = n.where(node_filter)
        r = r.join(n.select(F.col("id").alias("_nid")), F.col("dst") == F.col("_nid"), "left_semi")
    keys = r.select(F.col("src").alias("_src")).distinct()
    how = "left_anti" if anti else "left_semi"
    return left.join(keys, F.col(left_id_col) == F.col("_src"), how)


def var_length_expand(
    graph: PropertyGraph,
    start: DataFrame,
    start_id_col: str,
    rel_types: list[str] | None,
    min_hops: int,
    max_hops: int,
    direction: str = "out",
    rel_props: dict | None = None,
) -> DataFrame:
    """Variable-length ``-[:T1|T2*min..max]->`` expansion.

    Returns (start_id, node_id, hops) for every node reachable in
    ``min..max`` hops, keeping the *minimum* hop count per (start, node)
    pair (BFS semantics; path-multiplicity collapsed — matches reachability
    queries; full path enumeration is `paths.enumerate_paths`).

    Iterative joins with per-round distinct to stop frontier blow-up;
    ``localCheckpoint`` would be used past ~10 rounds to cut lineage (here
    max_hops is small by contract).
    """
    if rel_types:
        r = None
        for t in rel_types:
            s = graph.rels_by_type(t)
            r = s if r is None else r.unionByName(s)
    else:
        r = graph.rels
    if rel_props:
        # `-[:T*1..2 {k: v}]->` — every traversed edge must carry the
        # property filter (r12; pushed into the pruned rel scan)
        for k, v in rel_props.items():
            lit = _prop_lit(k, v)
            r = r.where(F.col(k) == lit) if k in r.columns else r.where(F.lit(False))
    edges = _orient(r, direction).select("src", "dst")

    frontier = start.select(F.col(start_id_col).alias("start_id"), F.col(start_id_col).alias("node_id")).distinct()
    # min_hops=0 — the QPP `*` / `{0,n}` quantifier: the start node itself
    # is a zero-hop match (r12)
    out = frontier.withColumn("hops", F.lit(0)) if min_hops == 0 else None
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(edges, frontier["node_id"] == edges["src"])
            .select("start_id", F.col("dst").alias("node_id"))
            .distinct()
        )
        if hop >= min_hops:
            step = frontier.withColumn("hops", F.lit(hop))
            out = step if out is None else out.unionByName(step)
        if hop >= 8:
            frontier = frontier.localCheckpoint(eager=False)
    if out is None:
        raise ValueError("max_hops must be >= min_hops >= 1")
    return out.groupBy("start_id", "node_id").agg(F.min("hops").alias("hops"))


def _orient(r: DataFrame, direction: str) -> DataFrame:
    if direction == "out":
        return r
    if direction == "in":
        return r.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *[c for c in r.columns if c not in ("src", "dst")])
    if direction == "both":
        fwd = r.select("src", "dst")
        rev = r.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return fwd.unionByName(rev)
    raise ValueError(f"bad direction {direction!r}")
