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
Anything outside this subset (blank nodes, full Turtle) raises at parse
time rather than importing silently-wrong data.

Scale shape: one narrow projection per frame, no shuffle until the
caller aggregates/joins; property pivot is a groupBy on subject — one
shuffle keyed on the (uniform) IRI hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <s> <p> (object-term) .   — object classified afterwards
_LINE = r"^\s*<([^>]+)>\s+<([^>]+)>\s+(.+?)\s*\.\s*$"
_LITERAL = r'^"((?:[^"\\]|\\.)*)"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]+>)?$'


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file into (subject, predicate, obj_iri,
    obj_literal) — exactly one of the obj_* columns is non-null per row.
    Unparseable non-comment lines raise (fail-loud import)."""
    lines = spark.read.text(path).where(
        (F.trim("value") != "") & ~F.trim("value").startswith("#")
    )
    parsed = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("subject"),
        F.regexp_extract("value", _LINE, 2).alias("predicate"),
        F.regexp_extract("value", _LINE, 3).alias("_obj"),
        "value",
    )
    bad = parsed.where(F.col("subject") == "").select("value").take(1)
    if bad:
        raise ValueError(f"not an N-Triples line: {bad[0]['value']!r}")
    iri = F.regexp_extract("_obj", r"^<([^>]+)>$", 1)
    lit_raw = F.regexp_extract("_obj", _LITERAL, 1)
    out = parsed.select(
        "subject",
        "predicate",
        F.when(iri != "", iri).alias("obj_iri"),
        F.when(
            # full _LITERAL match, not just a leading quote: a malformed
            # literal (e.g. unterminated quote) must surface as NULL so
            # the fail-loud check below catches it — regexp_extract's
            # no-match '' would otherwise import a silent empty property
            F.col("_obj").rlike(_LITERAL),
            # unescape N-Triples literal escapes in one logical pass:
            # '\\' first via a NUL sentinel (never present in text data)
            # so a backslash freed by it can't re-trigger '\n'/'\t'/'\"'
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_replace(lit_raw, r"\\\\", "\x00"),
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
            ),
        ).alias("obj_literal"),
        "value",
    )
    mis = out.where(F.col("obj_iri").isNull() & F.col("obj_literal").isNull()).select(
        "value"
    ).take(1)
    if mis:
        raise ValueError(f"unsupported RDF object term: {mis[0]['value']!r}")
    return out.drop("value")


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
