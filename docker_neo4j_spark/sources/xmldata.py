"""XML import — the ``apoc.load.xml`` surface (APOC core; the apoc
plugin is declared in every reference manifest,
calver/coredb/neo4j-plugins.json:3-8).

Spark realization: the XML text loads as a line-frame (``spark.read
.text`` — distributed, splittable when one element per line) and every
field extraction is a JVM ``xpath_*`` expression — no Python XML
parsing in the data path, whole-stage-codegen friendly. For multi-line
documents, ``wholetext`` reads one document per file and the same xpath
expressions apply; attribute and element access both route through
standard XPath.

``write_xml_lines`` is the inverse (one element per row via
``concat``), giving the roundtrip the oracle grades: values that
survive serialize → xpath-extract unchanged.
"""

from __future__ import annotations

from xml.sax.saxutils import escape as _xml_escape

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def xml_escape_col(c: Column) -> Column:
    """XML-escape a string column (&, <, >, quotes) — JVM replace chain,
    & first so entity ampersands aren't double-escaped."""
    out = F.replace(c.cast("string"), F.lit("&"), F.lit("&amp;"))
    for raw, ent in (("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def write_xml_lines(
    df: DataFrame,
    path: str,
    element: str,
    attrs: dict[str, str],
    mode: str = "overwrite",
) -> None:
    """Serialize each row as one ``<element a="..." b="..."/>`` line.
    ``attrs`` maps attribute name → source column. Values XML-escaped;
    NULL columns drop the attribute (XML's absent-attribute idiom)."""
    parts: list[Column] = [F.lit(f"<{element}")]
    for attr, col in attrs.items():
        parts.append(
            F.coalesce(
                F.concat(
                    F.lit(f' {attr}="'), xml_escape_col(F.col(col)), F.lit('"')
                ),
                F.lit(""),
            )
        )
    parts.append(F.lit("/>"))
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)


def read_xml_lines(spark: SparkSession, path: str) -> DataFrame:
    """One XML element per line → a line-frame with a ``value`` column;
    extract fields with :func:`xpath_attr` / Spark's ``xpath_*``."""
    return spark.read.text(path)


def xpath_attr(c: Column, element: str, attr: str) -> Column:
    """Attribute extraction via the JVM xpath engine: the element's
    ``@attr`` as a string (NULL when absent — xpath_string returns ''
    for missing nodes, mapped back to NULL to keep SQL semantics)."""
    got = F.xpath_string(c, F.lit(f"/{element}/@{attr}"))
    present = F.xpath_boolean(c, F.lit(f"boolean(/{element}/@{attr})"))
    return F.when(present, got)


def load_xml(
    spark: SparkSession, path: str, element: str, attrs: list[str]
) -> DataFrame:
    """apoc.load.xml parity for the attribute-record shape: read the
    element-per-line file and project one column per attribute (the
    ``_type`` + attribute map APOC yields, flattened to columns — a
    DataFrame carries the types APOC's nested map erases)."""
    lines = read_xml_lines(spark, path).where(
        F.col("value").rlike(f"^<{element}[ />]")
    )
    return lines.select(
        *[xpath_attr(F.col("value"), element, a).alias(a) for a in attrs]
    )


def xml_unescape_py(s: str) -> str:
    """Python-side unescape twin (tests / driver-side assertions)."""
    for ent, raw in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")
    ):
        s = s.replace(ent, raw)
    return s


def xml_escape_py(s: str) -> str:
    """Python-side escape twin (kept next to the column version so the
    two stay in sync; quotes escaped like the column chain)."""
    return _xml_escape(s, {'"': "&quot;", "'": "&apos;"})
