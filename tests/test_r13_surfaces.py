"""r13 surface pins — the VERDICT r12 findings as regression tests:

1. correlated UNWIND over computed expressions (range over a prior
   binding or a property arithmetic expression);
2. Cypher division/modulo-by-zero semantics (float never errors —
   Infinity/-Infinity/NaN; integral errors with the Cypher shape);
3. statement-opening ``WITH DISTINCT``;
4. the result-boundary error translation (runtime / lazy-analysis
   exceptions re-raise engine-shaped at collect time);
5. the APOC doc-name alias sweep (apoc.text.distance & co).
"""

from __future__ import annotations

import math

import pytest

from docker_neo4j_spark.cypher.session import Session


@pytest.fixture()
def session(spark):
    return Session(spark)


def _vals(session, q):
    return [tuple(r) for r in session.run(q).collect()]


# ---- 1. correlated UNWIND ------------------------------------------------


def test_correlated_unwind_over_prior_binding(session):
    rows = _vals(
        session,
        "UNWIND [1,2,3] AS x UNWIND range(1, x) AS y "
        "RETURN x, y ORDER BY x, y",
    )
    assert rows == [(1, 1), (2, 1), (2, 2), (3, 1), (3, 2), (3, 3)]


def test_correlated_unwind_over_property_expression(session):
    session.run("CREATE (:R13P {born: 1964}), (:R13P {born: 1966})")
    rows = _vals(
        session,
        "MATCH (p:R13P) UNWIND range(1, p.born - 1962) AS i "
        "RETURN p.born AS b, count(*) AS n ORDER BY b",
    )
    assert rows == [(1964, 2), (1966, 4)]


def test_literal_range_and_bare_list_unwind_still_work(session):
    assert _vals(session, "UNWIND range(1, 3) AS x RETURN x ORDER BY x") == [
        (1,),
        (2,),
        (3,),
    ]
    assert _vals(
        session, "WITH [4, 5] AS l UNWIND l AS e RETURN e ORDER BY e"
    ) == [(4,), (5,)]


# ---- 2. division / modulo by zero ----------------------------------------


def test_float_division_by_zero_is_infinity(session):
    (row,) = session.run(
        "RETURN 1.0/0 AS pos, -1.0/0 AS neg, 0.0/0 AS nan, 5.0 % 0 AS m"
    ).collect()
    assert row.pos == math.inf and row.neg == -math.inf
    assert math.isnan(row.nan) and math.isnan(row.m)


def test_integer_division_by_zero_literal_raises_cypher_shape(session):
    with pytest.raises(ValueError, match="/ by zero"):
        session.run("RETURN 1/0 AS x")
    with pytest.raises(ValueError, match="/ by zero"):
        session.run("RETURN 5 % 0 AS x")


def test_integer_division_by_zero_runtime_raises_cypher_shape(session):
    session.run("CREATE (:R13Z {v: 0})")
    with pytest.raises(ValueError, match="/ by zero"):
        session.run("MATCH (z:R13Z) RETURN 10 / z.v AS q").collect()


def test_division_preserves_types_and_null(session):
    (row,) = session.run(
        "RETURN 5/2 AS intdiv, -7 % 3 AS m, null / 2.0 AS nd, 2.0 / null AS dn"
    ).collect()
    assert row.intdiv == 2 and row.m == -1
    assert row.nd is None and row.dn is None


# ---- 3. standalone WITH DISTINCT ------------------------------------------


def test_standalone_with_distinct(session):
    assert _vals(session, "WITH DISTINCT 1 AS one RETURN one") == [(1,)]
    assert _vals(
        session,
        "UNWIND [1, 1, 2] AS x WITH DISTINCT x AS y RETURN y ORDER BY y",
    ) == [(1,), (2,)]


# ---- 4. result-boundary error translation ----------------------------------


def test_runtime_overflow_shaped_at_collect(session):
    with pytest.raises(ValueError, match="integer overflow"):
        session.run(
            "UNWIND [9223372036854775807] AS x RETURN x + 1 AS y"
        ).collect()


def test_shaped_frame_transformations_unwrapped(session):
    df = session.run("UNWIND [1, 2, 3] AS x RETURN x")
    assert df.count() == 3
    assert df.where("x > 1").count() == 2


# ---- 5. APOC doc-name aliases ----------------------------------------------


def test_apoc_text_distance_alias(session):
    assert _vals(
        session, "RETURN apoc.text.distance('kitten', 'sitting') AS d"
    ) == [(3,)]


def test_apoc_r13_alias_sweep(session):
    (row,) = session.run(
        "RETURN apoc.text.compareCleaned('Hello, World!', 'hello world') AS c, "
        "apoc.text.byteCount('héllo') AS b, "
        "apoc.coll.sumLongs([1, 2, 3.5]) AS s, "
        "apoc.coll.containsAll([1, 2, 3], [1, 3]) AS ca, "
        "apoc.coll.different([1, 2, 1]) AS df, "
        "apoc.coll.removeAll([1, 2, 3, 2], [1]) AS ra, "
        "apoc.coll.dropDuplicateNeighbors([1, 1, 2, 2, 1]) AS dd"
    ).collect()
    assert row.c is True and row.b == 6 and row.s == 6
    assert row.ca is True and row.df is False
    assert row.ra == [2, 3, 2] and row.dd == [1, 2, 1]


# ---- 6. knn LSH oversized-bucket split (no silent drops) --------------------


def test_knn_lsh_oversized_bucket_split_keeps_all_nodes(spark, monkeypatch):
    """Dense regions used to lose ALL neighbours when their LSH bucket
    blew past the cap (r13 — ADVICE r12: silent left-semi drop).
    Oversized buckets now hash-split into bounded chunks, so every node
    keeps candidates. Thresholds patched down to exercise the scale path
    on a small graph."""
    from docker_neo4j_spark.cypher.session import Session
    from docker_neo4j_spark.procedures import registry

    monkeypatch.setattr(registry, "_KNN_EXACT_MAX", 10)
    monkeypatch.setattr(registry, "_KNN_BUCKET_CAP", 8)

    s = Session(spark)
    # 40 near-identical vectors: one dense LSH bucket, far over the cap
    s.run(
        "UNWIND range(1, 40) AS i "
        "CREATE (:KnnD {k: i, e: [1.0, 1.0 + i * 0.0001]})"
    )
    s.run("CALL gds.graph.project('knn13', 'KnnD', '*')")
    out = s.run(
        "CALL gds.knn.stream('knn13', {nodeProperties: ['e'], topK: 2}) "
        "YIELD node1, node2, similarity RETURN node1, node2, similarity"
    )
    rows = out.collect()
    nodes_with_neighbours = {r.node1 for r in rows}
    assert len(nodes_with_neighbours) == 40  # nobody silently dropped
    assert all(r.similarity > 0.99 for r in rows)
    s.run("CALL gds.graph.drop('knn13')")


# ---- 7. novel-probe finds (r13 sweep) ----------------------------------------


def test_merge_on_match_self_referencing_counter(session):
    q = ("MERGE (x:R13Cnt {k: 1}) ON CREATE SET x.n = 1 "
         "ON MATCH SET x.n = x.n + 1 RETURN x.n AS n")
    assert _vals(session, q) == [(1,)]
    assert _vals(session, q) == [(2,)]
    assert _vals(session, q) == [(3,)]


def test_to_integer_float_string_truncates(session):
    assert _vals(
        session,
        "RETURN toInteger('3.7') AS a, toInteger('-2.9') AS b, "
        "toInteger('abc') AS c, toFloat('zz') AS d, toInteger(3.7) AS e",
    ) == [(3, -2, None, None, 3)]


def test_count_subquery_with_where(session):
    session.run("CREATE (:R13C {name:'a', age:30}), (:R13C {name:'b', age:40})")
    session.run(
        "MATCH (a:R13C {name:'a'}), (b:R13C {name:'b'}) CREATE (a)-[:R13F]->(b)"
    )
    assert _vals(
        session,
        "MATCH (a:R13C) WHERE COUNT { MATCH (a)-[:R13F]->(x) "
        "WHERE x.age > 35 } > 0 RETURN a.name AS n",
    ) == [("a",)]
    assert _vals(
        session,
        "MATCH (a:R13C) RETURN a.name AS n, "
        "COUNT { (a)-[:R13F]->(x) WHERE x.age > 100 } AS c ORDER BY n",
    ) == [("a", 0), ("b", 0)]


def test_unwind_then_call_subquery(session):
    assert _vals(
        session,
        "UNWIND [1, 2] AS x CALL { WITH x RETURN x * 10 AS y } "
        "RETURN x, y ORDER BY x",
    ) == [(1, 10), (2, 20)]


def test_count_exists_subquery_in_with_position(session):
    session.run("CREATE (:R13W {name:'a', age:30}), (:R13W {name:'b', age:40})")
    session.run(
        "MATCH (a:R13W {name:'a'}), (b:R13W {name:'b'}) CREATE (a)-[:R13WF]->(b)"
    )
    assert _vals(
        session,
        "MATCH (n:R13W) WITH n, COUNT { MATCH (n)-[:R13WF]->(x) "
        "WHERE x.age > 35 } AS big WHERE big > 0 "
        "RETURN n.name AS name, big",
    ) == [("a", 1)]
    assert _vals(
        session,
        "MATCH (n:R13W) WITH n, EXISTS { (n)-[:R13WF]->() } AS has "
        "RETURN n.name AS name, has ORDER BY name",
    ) == [("a", True), ("b", False)]


# ---- 8. novel-probe wave 2 ---------------------------------------------------


def test_stored_temporal_property_accessor(session):
    session.run("CREATE (:R13T {d: date('2024-03-15')})")
    assert _vals(
        session, "MATCH (t:R13T) RETURN t.d.year AS y, t.d.month AS m"
    ) == [(2024, 3)]


def test_varlen_rel_list_predicate(session):
    session.run("CREATE (:R13V {k:1}), (:R13V {k:2}), (:R13V {k:3})")
    for a, b, w in ((1, 2, 1.0), (2, 3, 2.0), (1, 3, 9.0)):
        session.run(
            f"MATCH (a:R13V {{k:{a}}}), (b:R13V {{k:{b}}}) "
            f"CREATE (a)-[:R13E {{w: {w}}}]->(b)"
        )
    assert _vals(
        session,
        "MATCH (a:R13V {k:1})-[rs:R13E*1..2]->(x) "
        "WHERE all(r IN rs WHERE r.w < 5) RETURN count(*) AS n",
    ) == [(2,)]
    # reduce over the rel list
    assert _vals(
        session,
        "MATCH (a:R13V {k:1})-[rs:R13E*2]->(x) "
        "RETURN reduce(acc = 0.0, r IN rs | acc + r.w) AS tw",
    ) == [(3.0,)]
    # size(rs) keeps the min-hop kernel (hop-count contract)
    assert _vals(
        session,
        "MATCH (a:R13V {k:1})-[rs:R13E*1..2]->(x) "
        "RETURN size(rs) AS h ORDER BY h",
    ) == [(1,), (1,)]


def test_function_null_propagation(session):
    assert _vals(
        session,
        "RETURN size(null) AS s, head(null) AS h, toUpper(null) AS u, "
        "abs(-2147483648) AS a",
    ) == [(None, None, None, 2147483648)]


def test_string_number_ordering_comparison(session):
    # openCypher: a KNOWN string vs a number is incomparable → null
    # (r14 — ADVICE r13 scoped the carried-struct try_cast recovery out
    # of plain string-vs-number comparisons); never a raw ANSI cast error
    assert _vals(
        session,
        "RETURN ('9.0' < 5) IS NULL AS a, ('3' < 5) IS NULL AS b",
    ) == [(True, True)]
    assert _vals(
        session, "WITH 'abc' AS s RETURN (s < 5) IS NULL AS incomparable"
    ) == [(True,)]


# ---- 9. reserved property names (the bulk-import idiom) ----------------------


def test_property_named_id_bulk_import_idiom(session):
    """``UNWIND $batch AS row CREATE (:N {id: row.id})`` — THE docs
    bulk-import idiom (r13): user properties named like fixed entity
    columns (id/labels/src/dst/type) store under escaped columns; reads,
    pattern filters, keys()/properties(), SET and WHERE all map back."""
    session.run(
        "UNWIND $batch AS row CREATE (:R13Id {id: row.id, v: row.v})",
        {"batch": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]},
    )
    assert _vals(
        session, "MATCH (b:R13Id) RETURN b.id AS i, b.v AS v ORDER BY i"
    ) == [(1, "a"), (2, "b")]
    assert _vals(session, "MATCH (b:R13Id {id: 2}) RETURN b.v AS v") == [("b",)]
    assert _vals(
        session, "MATCH (b:R13Id {id: 1}) RETURN keys(b) AS k"
    ) == [(["id", "v"],)]
    session.run(
        "UNWIND $batch AS row MERGE (x:R13Id {id: row.id}) "
        "ON MATCH SET x.v = row.v",
        {"batch": [{"id": 1, "v": "A"}, {"id": 3, "v": "c"}]},
    )
    assert _vals(session, "MATCH (b:R13Id) RETURN count(*) AS n") == [(3,)]
    session.run("MATCH (b:R13Id {id: 3}) SET b.id = 30")
    assert _vals(
        session, "MATCH (b:R13Id) WHERE b.id > 2 RETURN b.id AS i"
    ) == [(30,)]
    # the internal entity id stays reachable through id(n)
    assert _vals(
        session,
        "MATCH (b:R13Id {id: 30}) RETURN id(b) IS NOT NULL AS ok",
    ) == [(True,)]


def test_rel_property_named_type(session):
    session.run("CREATE (:R13Ra {k:1}), (:R13Rb {k:2})")
    session.run(
        "MATCH (a:R13Ra), (b:R13Rb) CREATE (a)-[:R13RE {type: 'x', w: 1}]->(b)"
    )
    assert _vals(
        session,
        "MATCH ()-[r:R13RE]->() RETURN r.type AS t, type(r) AS tt, r.w AS w",
    ) == [("x", "R13RE", 1)]


def test_foreach_loop_var_shadowing_prop_names(session):
    """Token-aware FOREACH substitution (r13): a loop variable named like
    a map key / property / label must not rewrite those positions."""
    session.run("FOREACH (v IN [6, 7] | CREATE (:R13Fv {v: v}))")
    assert _vals(
        session, "MATCH (f:R13Fv) RETURN f.v AS v ORDER BY v"
    ) == [(6,), (7,)]


def test_create_set_tail(session):
    assert _vals(
        session, "CREATE (n:R13CS {a: 1}) SET n.b = n.a + 1 RETURN n.b AS b"
    ) == [(2,)]


def test_foreach_over_collected_entities(session):
    session.run("FOREACH (x IN [1, 2, 3] | CREATE (:R13Fc {x: x}))")
    session.run(
        "MATCH (f:R13Fc) WITH collect(f) AS fs "
        "FOREACH (n IN fs | SET n.seen = true)"
    )
    assert _vals(
        session, "MATCH (f:R13Fc {seen: true}) RETURN count(*) AS n"
    ) == [(3,)]


def test_properties_map_equality_against_literal(session):
    """``properties(n) = {literal map}`` (r13): JSON compare handles the
    VARIANT-valued properties map AND the struct-carried heterogeneous
    literal (key-sorted on both sides)."""
    session.run("CREATE (:R13Mq {title: 'A', year: 1999})")
    assert _vals(
        session,
        "MATCH (m:R13Mq) RETURN "
        "properties(m) = {title: 'A', year: 1999} AS eq, "
        "properties(m) = {title: 'A'} AS ne",
    ) == [(True, False)]


def test_graphml_export_unescapes_reserved_props(session):
    """GraphML export presents escaped reserved-prop columns under their
    USER name (r13): a node with an `id` property exports `<data
    key="id">`, not the internal escape."""
    from pyspark.sql import functions as F

    from docker_neo4j_spark.sources.graphml import graph_to_graphml

    session.run("CREATE (:R13Gx {id: 42, name: 'x'})")
    nodes = session.store.graph.nodes.where(
        F.array_contains(F.col("labels"), "R13Gx")
    )
    lines = [
        r.line
        for r in graph_to_graphml(nodes, session.store.graph.rels.limit(0))
        .orderBy("section", "k1", "k2")
        .collect()
    ]
    text = "\n".join(lines)
    assert '<data key="id">42</data>' in text
    assert "id__p" not in text
