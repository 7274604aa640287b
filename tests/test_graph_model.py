from __future__ import annotations

from pyspark.sql import functions as F

from docker_neo4j_spark.sources.tpch import build_graph, load_tables


def test_load_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    assert t["region"].count() == 5
    assert t["nation"].count() == 25


def test_graph_projection_counts(spark, sf_dir):
    g = build_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    n_expected = sum(t[x].count() for x in ("region", "nation", "customer", "supplier", "part", "orders"))
    assert g.nodes.count() == n_expected
    assert g.nodes_by_label("Nation").count() == 25
    assert g.rels_by_type("IN_REGION").count() == 25
    assert g.rels_by_type("PLACED").count() == t["orders"].count()
    # node ids unique across labels
    assert g.nodes.select("id").distinct().count() == n_expected


def test_expand_one_hop(spark, sf_dir):
    g = build_graph(spark, sf_dir)
    # (c:Customer)-[:PLACED]->(o:Order) row count == orders with a valid customer
    hop = g.expand("Customer", "PLACED", "Order", "c", "r", "o")
    t = load_tables(spark, sf_dir)
    assert hop.count() == t["orders"].count()
    # properties survive the expand with alias prefixes
    row = hop.select("c_c_name", "o_o_totalprice").first()
    assert row["c_c_name"].startswith("Customer#")


def test_degrees(spark, sf_dir):
    g = build_graph(spark, sf_dir)
    d = g.degrees("out")
    assert d.where(F.col("degree") <= 0).count() == 0


def test_map_valued_pattern_prop_filter_fails_loudly(spark, sf_dir):
    """A {k: {…}} property filter cannot compile (Spark defines no equality
    on MapType) — it must raise a clear ValueError, not F.lit's opaque
    AssertionError (ADVICE r7)."""
    import pytest

    from docker_neo4j_spark.operators.patterns import NodeSpec, RelSpec, match_chain
    from docker_neo4j_spark.sources.tpch import build_graph

    g = build_graph(spark, sf_dir)
    with pytest.raises(ValueError, match="map-valued property filters"):
        match_chain(g, [NodeSpec("n", "Nation", props={"meta": {"a": 1}})])
    with pytest.raises(ValueError, match="map-valued property filters"):
        match_chain(
            g,
            [
                NodeSpec("a", "Customer"),
                RelSpec("r", "IN_NATION", props={"meta": {"a": 1}}),
                NodeSpec("b", "Nation"),
            ],
        )


def test_graphml_roundtrip(spark, tmp_path):
    """Export → native-XML import reproduces ids, labels, types, and
    props (as strings), including XML-special characters."""
    from docker_neo4j_spark.sources import graphml as gm

    nodes = spark.createDataFrame(
        [
            (1, ["A"], 'x & <y> "q"', 3.5),
            (2, ["A", "B"], None, 7.0),
            (3, ["C"], "plain", None),
        ],
        "id long, labels array<string>, name string, score double",
    )
    rels = spark.createDataFrame(
        [(1, 2, "KNOWS", 5), (2, 3, "LIKES", None)],
        "src long, dst long, type string, since int",
    )
    path = str(tmp_path / "g.xml")
    gm.write_graphml(nodes, rels, path)
    n2, r2 = gm.read_graphml(spark, path)
    got_n = {r.id: (tuple(r.labels), dict(r.props)) for r in n2.collect()}
    assert got_n == {
        1: (("A",), {"name": 'x & <y> "q"', "score": "3.5"}),
        2: (("A", "B"), {"score": "7.0"}),
        3: (("C",), {"name": "plain"}),
    }
    got_r = {(r.src, r.dst): (r.type, dict(r.props)) for r in r2.collect()}
    assert got_r == {
        (1, 2): ("KNOWS", {"since": "5"}),
        (2, 3): ("LIKES", {}),
    }


def test_graphml_export_procedure(spark, tmp_path):
    """CALL apoc.export.graphml.all writes the single ordered document
    and reports counts."""
    from docker_neo4j_spark.cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:T {k: 1})")
    s.run("CREATE (:T {k: 2})")
    path = str(tmp_path / "out.xml")
    out = s.run(
        f"CALL apoc.export.graphml.all('{path}', {{}}) "
        "YIELD file, nodes, relationships RETURN file, nodes, relationships"
    )
    row = out.collect()[0]
    assert row.nodes == 2 and row.relationships == 0
    text = "\n".join(
        r.value
        for r in spark.read.text(path).withColumnRenamed("value", "value").collect()
    )
    assert text.startswith('<?xml version="1.0"')
    assert "<node id=" in text and text.rstrip().endswith("</graphml>")
