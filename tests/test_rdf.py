"""N-Triples reader (sources/rdf.py — the n10s import surface,
neo4j-plugins.json:48-53)."""

import pytest

from docker_neo4j_spark.sources.rdf import (
    nodes_from_triples,
    props_from_triples,
    read_ntriples,
    rels_from_triples,
)


def _write(tmp_path, text):
    p = tmp_path / "g.nt"
    p.write_text(text)
    return str(p)


def test_ntriples_rels_props_nodes(spark, tmp_path):
    path = _write(
        tmp_path,
        "\n".join(
            [
                "# a comment line",
                "<urn:a> <urn:rel/KNOWS> <urn:b> .",
                '<urn:a> <urn:prop/name> "Arne" .',
                '<urn:b> <urn:prop/name> "Bosse"@sv .',
                '<urn:b> <urn:prop/age> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .',
                "",
                "<urn:b> <urn:rel/KNOWS> <urn:c> .",
            ]
        ),
    )
    t = read_ntriples(spark, path)
    rels = {(r["src"], r["type"], r["dst"]) for r in rels_from_triples(t).collect()}
    assert rels == {("urn:a", "KNOWS", "urn:b"), ("urn:b", "KNOWS", "urn:c")}
    props = {r["uri"]: dict(r["properties"]) for r in props_from_triples(t).collect()}
    assert props == {
        "urn:a": {"name": "Arne"},
        "urn:b": {"name": "Bosse", "age": "7"},
    }
    nodes = {r["uri"]: dict(r["properties"]) for r in nodes_from_triples(t).collect()}
    # urn:c appears only as an object → node with empty property map
    assert nodes["urn:c"] == {}
    assert set(nodes) == {"urn:a", "urn:b", "urn:c"}


def test_ntriples_literal_escapes(spark, tmp_path):
    path = _write(
        tmp_path,
        "\n".join(
            [
                r'<urn:a> <urn:p/quote> "say \"hi\"" .',
                r'<urn:a> <urn:p/newline> "l1\nl2" .',
                r'<urn:a> <urn:p/backslash> "a\\n" .',  # escaped \ then plain n
            ]
        ),
    )
    t = read_ntriples(spark, path)
    got = {r["predicate"]: r["obj_literal"] for r in t.collect()}
    assert got["urn:p/quote"] == 'say "hi"'
    assert got["urn:p/newline"] == "l1\nl2"
    # '\\' + 'n' unescapes to backslash-n, NOT a newline (ordering trap)
    assert got["urn:p/backslash"] == "a\\n"


def test_ntriples_rejects_garbage_and_blank_nodes(spark, tmp_path):
    # r8: fail-loud is lazy — the error surfaces from the first ACTION
    # (one scan per import), as a Spark raise_error, not an eager pass
    with pytest.raises(Exception, match="not an N-Triples line"):
        read_ntriples(spark, _write(tmp_path, "this is not rdf\n")).collect()
    with pytest.raises(Exception, match="unsupported RDF object"):
        read_ntriples(
            spark, _write(tmp_path, "<urn:a> <urn:p> _:blank .\n")
        ).collect()
    with pytest.raises(Exception, match="blank-node subject"):
        read_ntriples(
            spark, _write(tmp_path, '_:b0 <urn:p> "x" .\n')
        ).collect()


def test_ntriples_validation_is_lazy_one_pass(spark, tmp_path):
    """Building the frame over a bad file must NOT raise (no eager
    validation scan); only an action does."""
    df = read_ntriples(spark, _write(tmp_path, "this is not rdf\n"))
    with pytest.raises(Exception, match="not an N-Triples line"):
        df.count()


def test_ntriples_blank_nodes_under_flag(spark, tmp_path):
    path = _write(
        tmp_path,
        "\n".join(
            [
                "_:b0 <urn:rel/KNOWS> <urn:a> .",
                "<urn:a> <urn:rel/KNOWS> _:b1 .",
                '_:b0 <urn:prop/name> "Anon" .',
            ]
        ),
    )
    t = read_ntriples(spark, path, accept_blank_nodes=True)
    rels = {(r["src"], r["type"], r["dst"]) for r in rels_from_triples(t).collect()}
    assert rels == {
        ("bnode://b0", "KNOWS", "urn:a"),
        ("urn:a", "KNOWS", "bnode://b1"),
    }
    nodes = {r["uri"]: dict(r["properties"]) for r in nodes_from_triples(t).collect()}
    assert nodes["bnode://b0"] == {"name": "Anon"}
    assert set(nodes) == {"bnode://b0", "bnode://b1", "urn:a"}


def test_export_import_identity_on_escapes(spark, tmp_path):
    """export ∘ import is the identity on the supported subset, including
    literals holding every escape metacharacter."""
    from docker_neo4j_spark.sources.rdf import to_ntriples

    src = spark.createDataFrame(
        [
            ("urn:a", "urn:p/x", "urn:b", None),
            ("urn:a", "urn:p/q", None, 'say "hi"'),
            ("urn:a", "urn:p/n", None, "l1\nl2\tend"),
            ("urn:a", "urn:p/b", None, "a\\n raw backslash"),
        ],
        "subject string, predicate string, obj_iri string, obj_literal string",
    )
    p = str(tmp_path / "out.nt")
    to_ntriples(src).coalesce(1).write.mode("overwrite").text(p)
    back = read_ntriples(spark, p)
    got = {
        (r["subject"], r["predicate"], r["obj_iri"], r["obj_literal"])
        for r in back.collect()
    }
    want = {tuple(r) for r in src.collect()}
    assert got == want


def test_graph_to_triples_and_shorten(spark, tmp_path):
    from docker_neo4j_spark.sources.rdf import graph_to_triples, shorten_iris

    nodes = spark.createDataFrame(
        [(1, "Arne", None), (2, None, 7)], "id long, name string, age int"
    )
    rels = spark.createDataFrame([(1, 2, "KNOWS")], "src long, dst long, type string")
    t = graph_to_triples(nodes, rels, base="urn:g/")
    rows = {
        (r["subject"], r["predicate"], r["obj_iri"], r["obj_literal"])
        for r in t.collect()
    }
    # null props skipped; rel endpoints become node IRIs
    assert rows == {
        ("urn:g/node/1", "urn:g/rel/KNOWS", "urn:g/node/2", None),
        ("urn:g/node/1", "urn:g/prop/name", None, "Arne"),
        ("urn:g/node/2", "urn:g/prop/age", None, "7"),
    }
    short = shorten_iris(t, {"g": "urn:g/"})
    srows = {(r["subject"], r["predicate"]) for r in short.collect()}
    assert ("g:node/1", "g:rel/KNOWS") in srows
    # longest-namespace-first: a nested namespace wins over its parent
    short2 = shorten_iris(t, {"g": "urn:g/", "gn": "urn:g/node/"})
    assert ("gn:1", "g:rel/KNOWS") in {
        (r["subject"], r["predicate"]) for r in short2.collect()
    }


def test_turtle_prefix_subset(spark, tmp_path):
    """@prefix declarations, prefixed names in every term position, the
    'a' keyword, and plain N-Triples forms all in one Turtle file."""
    from docker_neo4j_spark.sources.rdf import read_turtle

    path = _write(
        tmp_path,
        "\n".join(
            [
                "@prefix ex: <urn:example/> .",
                "PREFIX foaf: <http://xmlns.com/foaf/0.1/>",
                "# a comment",
                "ex:arne a foaf:Person .",
                'ex:arne foaf:name "Arne" .',
                "ex:arne ex:knows ex:bosse .",
                "<urn:raw/x> <urn:raw/p> ex:bosse .",
                '<urn:raw/x> foaf:name "Raw, with ttl prefix ex:inside literal" .',
            ]
        ),
    )
    t = read_turtle(spark, path)
    got = {
        (r["subject"], r["predicate"], r["obj_iri"], r["obj_literal"])
        for r in t.collect()
    }
    assert got == {
        (
            "urn:example/arne",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://xmlns.com/foaf/0.1/Person",
            None,
        ),
        ("urn:example/arne", "http://xmlns.com/foaf/0.1/name", None, "Arne"),
        ("urn:example/arne", "urn:example/knows", "urn:example/bosse", None),
        ("urn:raw/x", "urn:raw/p", "urn:example/bosse", None),
        (
            "urn:raw/x",
            "http://xmlns.com/foaf/0.1/name",
            None,
            "Raw, with ttl prefix ex:inside literal",
        ),
    }


def test_turtle_fails_loud_outside_subset(spark, tmp_path):
    from docker_neo4j_spark.sources.rdf import read_turtle

    # undeclared prefix → not an IRI form → fail loud
    with pytest.raises(Exception, match="not a Turtle-subset line"):
        read_turtle(
            spark, _write(tmp_path, "nope:x <urn:p> <urn:y> .\n")
        ).collect()
    # malformed prefix declaration
    with pytest.raises(ValueError, match="bad prefix declaration"):
        read_turtle(spark, _write(tmp_path, "@prefix broken <urn:p> .\n"))
