"""GraphML export/import — the apoc.export.graphml / apoc.import.graphml
surface (apoc plugin manifest:
/root/reference/docker-image-src/3.5/coredb/neo4j-plugins.json:3-8).

Export is map-only: every node/edge becomes ONE self-contained XML line
(`<node id="nID">…</node>`), so the document is a distributed DataFrame of
lines until the final ordered single-file write — the same shape as the
N-Triples exporter. Ordering columns (section, k1, k2) make the line order
deterministic without a global rank.

Import uses Spark's built-in XML source (Spark 4 ships spark-xml natively):
two reads of the same file with rowTag=node / rowTag=edge. Properties come
back as a map<string,string> plus the declared attr.type per key — the
generic contract (APOC's import also restores by declared key types).
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_XML_TYPES = {
    "string": "string",
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
}


def _xml_type(dtype: str) -> str:
    return _XML_TYPES.get(dtype, "string")


def _esc(c):
    """XML attribute/text escaping as a Column chain (amp first)."""
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def graph_to_graphml(nodes: DataFrame, rels: DataFrame) -> DataFrame:
    """Property graph → GraphML lines: (section, k1, k2, line).

    section 0 = header + <key> declarations (sorted), 1 = nodes (by id),
    2 = edges (by src, dst, type), 3 = footer. Null properties are
    skipped; labels render as APOC's ``:A:B`` convention under the
    ``labels`` key, the relationship type under the edge ``label`` key.
    """
    spark = nodes.sparkSession
    from ..storage.store import unesc_prop

    node_props = sorted(c for c in nodes.columns if c not in ("id", "labels"))
    rel_props = sorted(
        c for c in rels.columns if c not in ("id", "src", "dst", "type")
    )
    ndt = dict(nodes.dtypes)
    rdt = dict(rels.dtypes)

    head = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<key id="labels" for="node" attr.name="labels" attr.type="string"/>',
        '<key id="label" for="edge" attr.name="label" attr.type="string"/>',
    ]
    for c in node_props:
        head.append(
            f'<key id="{unesc_prop(c)}" for="node" '
            f'attr.name="{unesc_prop(c)}" '
            f'attr.type="{_xml_type(ndt[c])}"/>'
        )
    for c in rel_props:
        head.append(
            f'<key id="{unesc_prop(c)}" for="edge" '
            f'attr.name="{unesc_prop(c)}" '
            f'attr.type="{_xml_type(rdt[c])}"/>'
        )
    head.append('<graph id="G" edgedefault="directed">')
    header = local_df(spark, 
        [(0, i, 0, line) for i, line in enumerate(head)],
        "section int, k1 long, k2 long, line string",
    )

    def data_elems(cols: list[str]) -> F.Column:
        parts = []
        for c in cols:
            parts.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.concat(
                        F.lit(f'<data key="{unesc_prop(c)}">'),
                        _esc(F.col(c).cast("string")),
                        F.lit("</data>"),
                    ),
                ).otherwise(F.lit(""))
            )
        return F.concat(*parts) if parts else F.lit("")

    labels_data = F.concat(
        F.lit('<data key="labels">:'),
        F.concat_ws(":", F.col("labels")),
        F.lit("</data>"),
    ) if "labels" in nodes.columns else F.lit("")
    node_lines = nodes.select(
        F.lit(1).alias("section"),
        F.col("id").alias("k1"),
        F.lit(0).cast("long").alias("k2"),
        F.concat(
            F.lit('<node id="n'),
            F.col("id").cast("string"),
            F.lit('">'),
            labels_data,
            data_elems(node_props),
            F.lit("</node>"),
        ).alias("line"),
    )
    edge_lines = rels.select(
        F.lit(2).alias("section"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.concat(
            F.lit('<edge source="n'),
            F.col("src").cast("string"),
            F.lit('" target="n'),
            F.col("dst").cast("string"),
            F.lit('">'),
            F.concat(
                F.lit('<data key="label">'), _esc(F.col("type")), F.lit("</data>")
            ),
            data_elems(rel_props),
            F.lit("</edge>"),
        ).alias("line"),
    )
    footer = local_df(spark, 
        [(3, 0, 0, "</graph>"), (3, 1, 0, "</graphml>")],
        "section int, k1 long, k2 long, line string",
    )
    return header.unionByName(node_lines).unionByName(edge_lines).unionByName(footer)


def write_graphml(nodes: DataFrame, rels: DataFrame, path: str) -> None:
    """Ordered single-document write (a GraphML file is inherently one
    XML document; the DataFrame stays distributed until this sink)."""
    (
        graph_to_graphml(nodes, rels)
        .orderBy("section", "k1", "k2", "line")
        .select("line")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_graphml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """GraphML file → (nodes, rels) with the generic contract:
    nodes (id, labels array<string>, props map<string,string>),
    rels (src, dst, type, props map<string,string>). Fails loud on
    elements without the required attributes."""
    def props_map(data_col: F.Column, drop_keys: list[str]) -> F.Column:
        entries = F.filter(
            data_col,
            lambda d: ~d["_key"].isin(*[F.lit(k) for k in drop_keys]),
        )
        return F.map_from_arrays(
            F.transform(entries, lambda d: d["_key"]),
            F.transform(entries, lambda d: d["_VALUE"].cast("string")),
        )

    raw_nodes = (
        spark.read.format("xml")
        .option("rowTag", "node")
        .schema("_id string, data array<struct<_key:string,_VALUE:string>>")
        .load(path)
    )
    bad = F.when(
        F.col("_id").isNull() | ~F.col("_id").startswith("n"),
        F.raise_error(F.lit("graphml: node without a well-formed id")),
    )
    data = F.coalesce(
        F.col("data"),
        F.array().cast("array<struct<_key:string,_VALUE:string>>"),
    )
    nodes = raw_nodes.select(
        F.coalesce(bad, F.substring("_id", 2, 2_000_000).cast("long")).alias("id"),
        F.coalesce(
            F.split(
                F.regexp_replace(
                    F.element_at(
                        F.filter(data, lambda d: d["_key"] == "labels"), 1
                    )["_VALUE"],
                    "^:",
                    "",
                ),
                ":",
            ),
            F.array().cast("array<string>"),
        ).alias("labels"),
        props_map(data, ["labels"]).alias("props"),
    )
    raw_edges = (
        spark.read.format("xml")
        .option("rowTag", "edge")
        .schema(
            "_source string, _target string, "
            "data array<struct<_key:string,_VALUE:string>>"
        )
        .load(path)
    )
    edata = F.coalesce(
        F.col("data"),
        F.array().cast("array<struct<_key:string,_VALUE:string>>"),
    )
    ebad = F.when(
        F.col("_source").isNull() | F.col("_target").isNull(),
        F.raise_error(F.lit("graphml: edge without source/target")),
    )
    rels = raw_edges.select(
        F.coalesce(ebad, F.substring("_source", 2, 2_000_000).cast("long")).alias(
            "src"
        ),
        F.substring("_target", 2, 2_000_000).cast("long").alias("dst"),
        F.element_at(F.filter(edata, lambda d: d["_key"] == "label"), 1)[
            "_VALUE"
        ].cast("string").alias("type"),
        props_map(edata, ["label"]).alias("props"),
    )
    return nodes, rels
