"""RDF import (neosemantics/n10s surface, minimal N-Triples subset).

Reference anchor: the ``n10s`` plugin in the reference's plugin manifest
(/root/reference/docker-image-src/3.5/coredb/neo4j-plugins.json:48-53)
imports RDF triples into the property graph: IRI-object triples become
relationships, literal-object triples become node properties, and every
IRI becomes a node carrying its ``uri``.

Spark realization: a plain distributed text scan + JVM-side regex
extraction (``regexp_extract`` — no Python UDFs), so the parse
parallelizes over file splits exactly like any other line format. The
supported grammar is the N-Triples core:

    <s> <p> <o> .                         # relationship triple
    <s> <p> "lit" .                       # string property
    <s> <p> "lit"@lang .                  # language-tagged (tag dropped)
    <s> <p> "lit"^^<datatype> .           # typed literal (kept as string)
    # comment lines and blank lines are ignored

Escaped ``\\"``, ``\\\\``, ``\\n``, ``\\t`` inside literals are unescaped.
Blank nodes (``_:label``) are accepted under ``accept_blank_nodes=True``
and mapped to synthetic document-scoped IRIs (``bnode://label`` — the
n10s ``Shorten``-style deterministic mapping). ``read_turtle`` extends
the grammar with Turtle's ``@prefix``/``PREFIX`` declarations, prefixed
names in any term position, and the ``a`` keyword (still one triple per
line). Anything outside these subsets (``;``/``,`` predicate lists,
multi-line literals) fails loud rather than importing silently-wrong
data. The export half lives below: ``graph_to_triples`` /
``to_ntriples`` / ``shorten_iris``.

Fail-loud is LAZY (r8, was an eager extra scan per import): the
validity checks are ``raise_error`` branches inside a WHERE clause, so
the first Spark action over the parsed frame raises on the first bad
line and a clean import costs exactly one pass. A filter determines
cardinality, so Catalyst cannot prune the guard (a check riding an
output column would vanish under ``count()``'s column pruning).

Scale shape: one narrow projection per frame, no shuffle until the
caller aggregates/joins; property pivot is a groupBy on subject — one
shuffle keyed on the (uniform) IRI hash.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (<s> | _:b) <p> (object-term) .   — object classified afterwards
_BNODE = r"_:[A-Za-z0-9][A-Za-z0-9_.\-]*"
_LINE = rf"^\s*(?:<([^>]+)>|({_BNODE}))\s+<([^>]+)>\s+(.+?)\s*\.\s*$"
_LITERAL = r'^"((?:[^"\\]|\\.)*)"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]+>)?$'


def _unescape_literal(col):
    """Unescape N-Triples literal escapes in one logical pass: '\\\\'
    first via a NUL sentinel (never present in text data) so a backslash
    freed by it can't re-trigger '\\n'/'\\t'/'\\"'."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(col, r"\\\\", "\x00"),
                    r'\\"',
                    '"',
                ),
                r"\\n",
                "\n",
            ),
            r"\\t",
            "\t",
        ),
        "\x00",
        "\\\\",
    )


def _bnode_iri(label_col):
    """``_:b0`` → ``bnode://b0`` — deterministic synthetic IRI, so blank
    nodes join/group like any other node identity."""
    return F.concat(F.lit("bnode://"), F.substring(label_col, 3, 2**30))


def read_ntriples(
    spark: SparkSession, path: str, accept_blank_nodes: bool = False
) -> DataFrame:
    """Parse an N-Triples file into (subject, predicate, obj_iri,
    obj_literal) — exactly one of the obj_* columns is non-null per row.
    Unparseable non-comment lines raise from the FIRST action over the
    result (lazy fail-loud import: one scan, no eager validation pass)."""
    lines = spark.read.text(path).where(
        (F.trim("value") != "") & ~F.trim("value").startswith("#")
    )
    subj_iri = F.regexp_extract("value", _LINE, 1)
    subj_bnode = F.regexp_extract("value", _LINE, 2)
    parsed = lines.select(
        subj_iri.alias("_s_iri"),
        subj_bnode.alias("_s_bnode"),
        F.regexp_extract("value", _LINE, 3).alias("predicate"),
        F.regexp_extract("value", _LINE, 4).alias("_obj"),
        "value",
    )
    iri = F.regexp_extract("_obj", r"^<([^>]+)>$", 1)
    obj_bnode = F.regexp_extract("_obj", rf"^({_BNODE})$", 1)
    lit_raw = F.regexp_extract("_obj", _LITERAL, 1)
    obj_iri = F.when(iri != "", iri)
    if accept_blank_nodes:
        obj_iri = obj_iri.when(obj_bnode != "", _bnode_iri(obj_bnode))
    obj_literal = F.when(
        # full _LITERAL match, not just a leading quote: a malformed
        # literal (e.g. unterminated quote) must surface as NULL so
        # the fail-loud guard below catches it — regexp_extract's
        # no-match '' would otherwise import a silent empty property
        F.col("_obj").rlike(_LITERAL),
        _unescape_literal(lit_raw),
    )
    out = parsed.select(
        F.col("_s_iri").alias("subject"),
        "predicate",
        obj_iri.alias("obj_iri"),
        obj_literal.alias("obj_literal"),
        "value",
        F.col("_s_bnode").alias("_s_bnode"),
    )
    # Lazy fail-loud: the guard is a WHERE clause — a filter determines
    # cardinality, so Catalyst can never prune it (a guard riding an
    # output column would vanish under count()'s column pruning). The
    # first action over the frame raises on the first bad line and a
    # clean import costs ONE pass, not an eager validation scan.
    bad_line = (F.col("subject") == "") & (F.col("_s_bnode") == "")
    guard = F.when(
        bad_line,
        F.raise_error(F.concat(F.lit("not an N-Triples line: "), F.col("value"))),
    ).when(
        F.col("obj_iri").isNull() & F.col("obj_literal").isNull(),
        F.raise_error(
            F.concat(F.lit("unsupported RDF object term: "), F.col("value"))
        ),
    )
    if accept_blank_nodes:
        subject_out = F.when(
            F.col("_s_bnode") != "", _bnode_iri(F.col("_s_bnode"))
        ).otherwise(F.col("subject"))
    else:
        guard = guard.when(
            F.col("_s_bnode") != "",
            F.raise_error(
                F.concat(
                    F.lit("blank-node subject (pass accept_blank_nodes=True): "),
                    F.col("value"),
                )
            ),
        )
        subject_out = F.col("subject")
    return out.where(guard.otherwise(F.lit(True))).select(
        subject_out.alias("subject"),
        "predicate",
        "obj_iri",
        "obj_literal",
    )


def _local_name(col):
    """IRI → local name: the segment after the last '/' or '#'."""
    return F.element_at(F.split(col, r"[/#]"), -1)


def rels_from_triples(triples: DataFrame) -> DataFrame:
    """IRI-object triples → (src, type, dst) with IRI endpoints and the
    predicate's local name as the relationship type (the n10s default
    mapping)."""
    return triples.where(F.col("obj_iri").isNotNull()).select(
        F.col("subject").alias("src"),
        _local_name("predicate").alias("type"),
        F.col("obj_iri").alias("dst"),
    )


def props_from_triples(triples: DataFrame) -> DataFrame:
    """Literal-object triples → one row per subject with a properties map
    keyed by the predicate's local name (last-write-wins on duplicate
    keys via max — deterministic). One shuffle on subject."""
    return (
        triples.where(F.col("obj_literal").isNotNull())
        .groupBy(F.col("subject").alias("uri"))
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            _local_name("predicate").alias("key"),
                            F.col("obj_literal").alias("value"),
                        )
                    )
                )
            ).alias("properties")
        )
    )


def nodes_from_triples(triples: DataFrame) -> DataFrame:
    """Every IRI that appears as a subject or object becomes a node
    (uri, properties) — properties from its literal triples, empty map
    otherwise."""
    uris = (
        triples.select(F.col("subject").alias("uri"))
        .unionByName(
            triples.where(F.col("obj_iri").isNotNull()).select(
                F.col("obj_iri").alias("uri")
            )
        )
        .distinct()
    )
    props = props_from_triples(triples)
    return uris.join(props, "uri", "left").select(
        "uri",
        F.coalesce(
            "properties", F.map_from_arrays(F.array(), F.array())
        ).alias("properties"),
    )


# ---- namespaces + export (the n10s surface's other half) -----------------
#
# Real n10s maps namespace prefixes (semantics.addNamespacePrefix) and
# exports the graph back to RDF (semantics/n10s RDF export endpoints);
# reference manifest: 3.5/coredb/neo4j-plugins.json:48-53.


def shorten_iris(triples: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """n10s ``Shorten`` mapping: replace each IRI's longest matching
    namespace with ``prefix:`` (``{"rdf": "http://…#"}`` →
    ``rdf:type``). Literals untouched; unmatched IRIs pass through. One
    map-only projection — a chain of prefix-tested replaces, no UDFs."""
    # longest namespace first so nested namespaces shorten deterministically
    ordered = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def short(col):
        out = F.col(col) if isinstance(col, str) else col
        for pfx, ns in ordered:
            out = F.when(
                out.startswith(ns),
                F.concat(F.lit(pfx + ":"), F.substring(out, len(ns) + 1, 2**30)),
            ).otherwise(out)
        return out

    return triples.select(
        short("subject").alias("subject"),
        short("predicate").alias("predicate"),
        short(F.col("obj_iri")).alias("obj_iri"),
        "obj_literal",
    )


def _escape_literal(col):
    """Inverse of the reader's unescape: backslash first, then the
    quote/newline/tab metacharacters."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    return F.regexp_replace(out, "\t", r"\\t")


def to_ntriples(triples: DataFrame) -> DataFrame:
    """(subject, predicate, obj_iri, obj_literal) → one ``value`` column
    of N-Triples lines (the export sink: ``df.write.text(path)``).
    Map-only; literals re-escaped so export∘import is the identity on
    the supported subset."""
    obj_term = F.when(
        F.col("obj_iri").isNotNull(), F.concat(F.lit("<"), F.col("obj_iri"), F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), _escape_literal(F.col("obj_literal")), F.lit('"')))
    return triples.select(
        F.concat(
            F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"),
            F.lit("> "), obj_term, F.lit(" ."),
        ).alias("value")
    )


def graph_to_triples(
    nodes: DataFrame,
    rels: DataFrame,
    base: str = "urn:graph/",
) -> DataFrame:
    """Property graph → RDF triples (the n10s export mapping, inverted
    import): every node id becomes ``<base>node/<id>``, every rel type a
    ``<base>rel/<TYPE>`` predicate, every scalar node property a literal
    triple under ``<base>prop/<key>``. Null properties are skipped.

    ``nodes``: (id, <prop columns…>); ``rels``: (src, dst, type).
    Map-only per frame; one union — no shuffle introduced by export."""
    node_iri = lambda c: F.concat(F.lit(base + "node/"), F.col(c).cast("string"))  # noqa: E731
    rel_triples = rels.select(
        node_iri("src").alias("subject"),
        F.concat(F.lit(base + "rel/"), F.col("type")).alias("predicate"),
        node_iri("dst").alias("obj_iri"),
        F.lit(None).cast("string").alias("obj_literal"),
    )
    prop_cols = [c for c in nodes.columns if c not in ("id", "labels")]
    out = rel_triples
    if prop_cols:
        props = nodes.select(
            node_iri("id").alias("subject"),
            F.explode(
                F.map_filter(
                    F.map_from_arrays(
                        F.array(*[F.lit(c) for c in prop_cols]),
                        F.array(*[F.col(c).cast("string") for c in prop_cols]),
                    ),
                    lambda _, v: v.isNotNull(),
                )
            ).alias("key", "val"),
        ).select(
            "subject",
            F.concat(F.lit(base + "prop/"), F.col("key")).alias("predicate"),
            F.lit(None).cast("string").alias("obj_iri"),
            F.col("val").alias("obj_literal"),
        )
        out = out.unionByName(props)
    return out


# ---- Turtle prefix subset (the n10s import format beyond N-Triples) ------

_PNAME = r"[A-Za-z_][\w.\-]*:[\w.\-]*"
_PREFIX_LINE = re.compile(
    r"^\s*(?:@prefix|PREFIX)\s+([A-Za-z_][\w.\-]*):\s*<([^>]+)>\s*\.?\s*$",
    re.IGNORECASE,
)
_TTL_TERMS = r"^\s*(\S+)\s+(\S+)\s+(.+?)\s*\.\s*$"


def read_turtle(
    spark: SparkSession, path: str, accept_blank_nodes: bool = False
) -> DataFrame:
    """Turtle PREFIX subset → the same (subject, predicate, obj_iri,
    obj_literal) frame as ``read_ntriples``: ``@prefix``/``PREFIX``
    declarations, prefixed names (``p:local``) in any term position, the
    ``a`` keyword (rdf:type), plus everything the N-Triples core
    accepts. Still line-oriented (one triple per line — no ``;``/``,``
    predicate lists; fail-loud outside the subset, the n10s contract).

    Two passes by necessity: prefix declarations are collected first (a
    filtered scan; the collect is bounded by the prefix count), then the
    data lines parse distributed with prefixes expanded as a chain of
    startswith projections — no UDFs. Terms are sliced BEFORE expansion,
    so a literal containing ``p:x`` is never rewritten."""
    lines = spark.read.text(path).where(
        (F.trim("value") != "") & ~F.trim("value").startswith("#")
    )
    is_prefix = F.trim("value").rlike(r"(?i)^(@prefix|PREFIX)\s")
    prefixes: dict[str, str] = {}
    for r in lines.where(is_prefix).collect():
        m = _PREFIX_LINE.match(r["value"])
        if not m:
            raise ValueError(f"bad prefix declaration: {r['value']!r}")
        prefixes[m.group(1)] = m.group(2)

    def expand(term):
        """IRI-position term → IRI string (or '' when not an IRI form).
        Handles <iri>, p:local (declared prefixes only), and bnodes
        (passed through for the caller's bnode handling)."""
        out = F.regexp_extract(term, r"^<([^>]+)>$", 1)
        for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[0])):
            out = F.when(
                term.rlike(rf"^{re.escape(pfx)}:[\w.\-]*$"),
                F.concat(F.lit(ns), F.substring(term, len(pfx) + 2, 2**30)),
            ).otherwise(out)
        return out

    data = lines.where(~is_prefix)
    s_t = F.regexp_extract("value", _TTL_TERMS, 1)
    p_t = F.regexp_extract("value", _TTL_TERMS, 2)
    o_t = F.regexp_extract("value", _TTL_TERMS, 3)
    s_iri = expand(s_t)
    s_bnode = F.regexp_extract(s_t, rf"^({_BNODE})$", 1)
    p_iri = F.when(
        p_t == "a", F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    ).otherwise(expand(p_t))
    o_iri = expand(o_t)
    o_bnode = F.regexp_extract(o_t, rf"^({_BNODE})$", 1)
    lit_raw = F.regexp_extract(o_t, _LITERAL, 1)
    obj_iri = F.when(o_iri != "", o_iri)
    if accept_blank_nodes:
        obj_iri = obj_iri.when(o_bnode != "", _bnode_iri(o_bnode))
    obj_literal = F.when(o_t.rlike(_LITERAL), _unescape_literal(lit_raw))
    parsed = data.select(
        s_iri.alias("subject"),
        s_bnode.alias("_s_bnode"),
        p_iri.alias("predicate"),
        obj_iri.alias("obj_iri"),
        obj_literal.alias("obj_literal"),
        "value",
    )
    # same lazy WHERE-guard as read_ntriples: one data pass, first action
    # raises on the first bad line
    guard = F.when(
        ((F.col("subject") == "") & (F.col("_s_bnode") == ""))
        | (F.col("predicate") == ""),
        F.raise_error(F.concat(F.lit("not a Turtle-subset line: "), F.col("value"))),
    ).when(
        F.col("obj_iri").isNull() & F.col("obj_literal").isNull(),
        F.raise_error(
            F.concat(F.lit("unsupported RDF object term: "), F.col("value"))
        ),
    )
    if accept_blank_nodes:
        subject_out = F.when(
            F.col("_s_bnode") != "", _bnode_iri(F.col("_s_bnode"))
        ).otherwise(F.col("subject"))
    else:
        guard = guard.when(
            F.col("_s_bnode") != "",
            F.raise_error(
                F.concat(
                    F.lit("blank-node subject (pass accept_blank_nodes=True): "),
                    F.col("value"),
                )
            ),
        )
        subject_out = F.col("subject")
    return parsed.where(guard.otherwise(F.lit(True))).select(
        subject_out.alias("subject"), "predicate", "obj_iri", "obj_literal"
    )
