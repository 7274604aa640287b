"""r12 surface pins: lexer/grammar breadth, label expressions, inline
pattern WHERE, quantified path patterns, operator semantics, the wider
GDS CALL surface, fulltext DDL, and CALL IN TRANSACTIONS.

These pin the probe-corpus discoveries as regression tests — every shape
here is a public-docs form a reference user would paste verbatim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.cypher.session import Session


@pytest.fixture()
def session(spark):
    return Session(spark)


def _vals(session, q):
    return [tuple(r) for r in session.run(q).collect()]


def _movie_graph(s: Session) -> None:
    s.run("CREATE (:P {name:'ann', age:40})")
    s.run("CREATE (:P {name:'bob', age:30})")
    s.run("CREATE (:P:Admin {name:'cat', age:50})")
    s.run("CREATE (:Q {name:'dot'})")
    s.run("MATCH (a:P {name:'ann'}), (b:P {name:'bob'}) CREATE (a)-[:KNOWS {since:2020}]->(b)")
    s.run("MATCH (b:P {name:'bob'}), (c:P {name:'cat'}) CREATE (b)-[:KNOWS {since:2021}]->(c)")


def test_operator_semantics(session):
    assert _vals(session, "RETURN 5 / 2 AS a, -7 / 2 AS b, 5.0 / 2 AS c") == [(2, -3, 2.5)]
    assert _vals(session, "RETURN 1 < 2 < 3 AS a, 3 < 2 < 5 AS b") == [(True, False)]
    assert _vals(session, "RETURN 'a' || 'b' AS s, [1] || [2] AS l") == [("ab", [1, 2])]
    assert _vals(session, "RETURN 0x1F AS h, 1e3 AS e") == [(31, 1000.0)]
    assert _vals(
        session, "RETURN 1 IS :: INTEGER AS a, 'x' IS NOT :: INTEGER AS b, null IS :: STRING AS c"
    ) == [(True, True, True)]


def test_comments_escapes_backticks(session):
    session.run("CREATE (:C {name:'it\\'s'})")
    assert _vals(session, "MATCH (c:C) // tail comment\nRETURN count(*) AS n") == [(1,)]
    assert _vals(session, "MATCH (c:C) /* block */ RETURN c.name AS n") == [("it's",)]
    assert _vals(session, "MATCH (`the var`:C) RETURN `the var`.name AS n") == [("it's",)]


def test_multilabel_and_label_expressions(session):
    _movie_graph(session)
    assert _vals(session, "MATCH (n:P:Admin) RETURN n.name AS n") == [("cat",)]
    assert _vals(session, "MATCH (n:P|Q) RETURN count(*) AS c") == [(4,)]
    assert _vals(session, "MATCH (n:P&!Admin) RETURN count(*) AS c") == [(2,)]
    assert _vals(session, "MATCH (n) WHERE n:P|Q RETURN count(*) AS c") == [(4,)]
    # multi-label CREATE round-trips through labels()
    labs = session.run("MATCH (n:Admin) RETURN labels(n) AS l").collect()[0]["l"]
    assert sorted(labs) == ["Admin", "P"]


def test_inline_pattern_where(session):
    _movie_graph(session)
    assert _vals(session, "MATCH (p:P WHERE p.age > 35) RETURN count(*) AS c") == [(2,)]
    assert _vals(
        session, "MATCH ()-[r:KNOWS WHERE r.since > 2020]->(b) RETURN b.name AS n"
    ) == [("cat",)]


def test_quantified_path_patterns(session):
    _movie_graph(session)
    assert _vals(
        session,
        "MATCH (a:P {name:'ann'})-[:KNOWS]->{1,2}(b) RETURN b.name AS n ORDER BY n",
    ) == [("bob",), ("cat",)]
    assert _vals(
        session, "MATCH (a:P {name:'ann'})-[:KNOWS]->+(b) RETURN count(*) AS c"
    ) == [(2,)]
    # `*` includes the zero-hop trivial path (start node itself)
    assert _vals(
        session, "MATCH (a:P {name:'ann'})-[:KNOWS]->*(b) RETURN count(*) AS c"
    ) == [(3,)]
    # parenthesized group form
    assert _vals(
        session,
        "MATCH (a:P {name:'ann'})((x)-[:KNOWS]->(y)){1,2}(b) RETURN b.name AS n ORDER BY n",
    ) == [("bob",), ("cat",)]


def test_varlength_property_filter(session):
    _movie_graph(session)
    # only the since-2020 edge may be traversed: cat (via the 2021 edge)
    # must NOT be reachable
    assert _vals(
        session,
        "MATCH (a:P {name:'ann'})-[:KNOWS*1..2 {since: 2020}]->(b) RETURN b.name AS n",
    ) == [("bob",)]


def test_exists_pattern_function_in_return(session):
    _movie_graph(session)
    assert _vals(
        session,
        "MATCH (p:P) RETURN p.name AS n, exists((p)-[:KNOWS]->()) AS k ORDER BY n",
    ) == [("ann", True), ("bob", True), ("cat", False)]


def test_call_in_transactions_and_scope_clause(session):
    session.run(
        "UNWIND range(1, 4) AS i "
        "CALL { WITH i CREATE (:Tx {i: i}) } IN TRANSACTIONS OF 2 ROWS"
    )
    assert _vals(session, "MATCH (t:Tx) RETURN count(*) AS c") == [(4,)]
    assert _vals(
        session, "MATCH (t:Tx) CALL (t) { RETURN t.i * 2 AS d } RETURN sum(d) AS s"
    ) == [(20,)]


def test_unwind_null_and_limit_expressions(session):
    session.run("CREATE (:L {v: 1})")
    session.run("CREATE (:L {v: 2})")
    assert _vals(session, "UNWIND null AS x RETURN x") == []
    assert _vals(session, "MATCH (l:L) RETURN l.v AS v ORDER BY v LIMIT 1 + 1") == [(1,), (2,)]
    assert _vals(session, "MATCH (l:L) RETURN l.v AS v ORDER BY v SKIP 2 - 1") == [(2,)]


def test_fulltext_index_ddl_and_query(session):
    session.run("CREATE (:Doc {title:'spark hash vector spark'})")
    session.run("CREATE (:Doc {title:'nothing relevant'})")
    session.run(
        "CREATE FULLTEXT INDEX doc_ft IF NOT EXISTS FOR (d:Doc) ON EACH [d.title]"
    )
    rows = session.run(
        "CALL db.index.fulltext.queryNodes('doc_ft', 'vector spark') "
        "YIELD node, score RETURN node.title AS t, score > 0 AS ok"
    ).collect()
    assert [(r["t"], r["ok"]) for r in rows] == [("spark hash vector spark", True)]
    # SHOW INDEXES reports the FULLTEXT type
    idx = [tuple(r) for r in session.run("SHOW INDEXES").collect()]
    assert any("FULLTEXT" in r for r in idx)


def test_gds_stats_mutate_and_readback(session):
    _movie_graph(session)
    session.run("CALL gds.graph.project('r12g', '*', '*')")
    try:
        stats = session.run(
            "CALL gds.wcc.stats('r12g') YIELD componentCount, nodeCount "
            "RETURN componentCount, nodeCount"
        ).collect()[0]
        assert stats["nodeCount"] == 4 and stats["componentCount"] == 2
        session.run("CALL gds.wcc.mutate('r12g', {mutateProperty: 'cc'})")
        back = session.run(
            "CALL gds.graph.nodeProperties.stream('r12g', ['cc']) "
            "YIELD nodeId, propertyValue RETURN count(*) AS c"
        ).collect()
        assert back[0]["c"] == 4
        # duplicate mutate property fails loud
        with pytest.raises(Exception, match="already exists"):
            session.run("CALL gds.wcc.mutate('r12g', {mutateProperty: 'cc'})")
    finally:
        session.run("CALL gds.graph.drop('r12g')")


def test_gds_kcore_and_triangle(session):
    # a 3-cycle: every node core 2, one triangle
    session.run("CREATE (:K {k:1})")
    session.run("CREATE (:K {k:2})")
    session.run("CREATE (:K {k:3})")
    session.run("MATCH (a:K {k:1}), (b:K {k:2}) CREATE (a)-[:E]->(b)")
    session.run("MATCH (b:K {k:2}), (c:K {k:3}) CREATE (b)-[:E]->(c)")
    session.run("MATCH (c:K {k:3}), (a:K {k:1}) CREATE (c)-[:E]->(a)")
    session.run("CALL gds.graph.project('kg', 'K', 'E')")
    try:
        k = session.run(
            "CALL gds.kcore.stream('kg') YIELD coreValue RETURN max(coreValue) AS k"
        ).collect()[0]["k"]
        assert k == 2
        t = session.run(
            "CALL gds.triangleCount.stats('kg') YIELD globalTriangleCount "
            "RETURN globalTriangleCount AS t"
        ).collect()[0]["t"]
        assert t == 1
    finally:
        session.run("CALL gds.graph.drop('kg')")


def _road_graph(s: Session, label: str = "Rdt") -> None:
    s.run(f"CREATE (:{label} {{name:'A'}}), (:{label} {{name:'B'}}), "
          f"(:{label} {{name:'C'}}), (:{label} {{name:'D'}})")
    for a, b, c in (("A", "B", 50), ("A", "C", 50), ("B", "D", 40), ("C", "D", 80)):
        s.run(
            f"MATCH (x:{label} {{name:'{a}'}}), (y:{label} {{name:'{b}'}}) "
            f"CREATE (x)-[:RDT {{cost: {c}}}]->(y)"
        )


def test_anonymous_arrows(session):
    """Bracketless `-->` / `--` / `<--` in patterns AND pattern
    predicates (late r12 — every tutorial's first MATCH)."""
    _road_graph(session)
    assert _vals(session, "MATCH (a:Rdt {name:'A'})-->(b) RETURN b.name AS n ORDER BY n") == [
        ("B",), ("C",)
    ]
    assert _vals(session, "MATCH (a:Rdt {name:'D'})<--(b) RETURN b.name AS n ORDER BY n") == [
        ("B",), ("C",)
    ]
    assert _vals(session, "MATCH (a:Rdt {name:'B'})--(b) RETURN count(*) AS c") == [(2,)]
    assert _vals(session, "MATCH (a:Rdt) WHERE (a)-->() RETURN count(*) AS c") == [(3,)]
    assert _vals(session, "MATCH (a:Rdt) WHERE NOT (a)--() RETURN count(*) AS c") == [(0,)]
    assert _vals(
        session, "MATCH (a:Rdt {name:'A'}) RETURN size((a)-->()) AS d"
    ) == [(2,)]


def test_leading_with_and_unwind_match(session):
    """Statements opening with WITH/UNWIND continuing into MATCH/writes
    (late r12): unit-row pipelines; bound-variable property maps hoist."""
    _road_graph(session, "Rdu")
    assert _vals(
        session, "WITH 'A' AS nm MATCH (a:Rdu {name: nm}) RETURN a.name AS n"
    ) == [("A",)]
    assert _vals(
        session,
        "UNWIND ['A','B'] AS nm MATCH (a:Rdu {name: nm}) RETURN a.name AS n ORDER BY n",
    ) == [("A",), ("B",)]
    assert _vals(
        session, "WITH 2 AS x WITH x * 3 AS y MATCH (a:Rdu {name:'A'}) RETURN y"
    ) == [(6,)]
    session.run("WITH 5 AS v CREATE (:WCr {k: v})")
    assert _vals(session, "MATCH (n:WCr) RETURN n.k AS k") == [(5,)]
    # implicit grouping keys in mixed aggregate items
    assert _vals(
        session, "WITH 1 AS x MATCH (a:Rdu) RETURN count(*) + x AS c"
    ) == [(5,)]


def test_match_call_gds_canonical(session):
    """THE public-docs GDS shape (late r12): MATCH a source node, CALL the
    algorithm with {sourceNode: <node>, relationshipWeightProperty},
    YIELD, project through gds.util.asNode."""
    _road_graph(session, "Rdw")
    session.run("CALL gds.graph.project('t_rdw', 'Rdw', {RDT: {properties: 'cost'}})")
    rows = _vals(
        session,
        "MATCH (source:Rdw {name:'A'}) "
        "CALL gds.shortestPath.dijkstra.stream('t_rdw', "
        "{sourceNode: source, relationshipWeightProperty: 'cost'}) "
        "YIELD targetNode, totalCost "
        "RETURN gds.util.asNode(targetNode).name AS n, totalCost ORDER BY n",
    )
    assert rows == [("A", 0.0), ("B", 50.0), ("C", 50.0), ("D", 90.0)]
    # weighted pageRank accepts the canonical config key
    assert _vals(
        session,
        "CALL gds.pageRank.stream('t_rdw', {relationshipWeightProperty: 'cost'}) "
        "YIELD nodeId, score RETURN count(*) AS c",
    ) == [(4,)]
    # legacy cypher projection
    session.run(
        "CALL gds.graph.project.cypher('t_rdc', 'MATCH (n:Rdw) RETURN id(n) AS id', "
        "'MATCH (a:Rdw)-[r:RDT]->(b:Rdw) RETURN id(a) AS source, id(b) AS target')"
    )
    assert _vals(
        session, "CALL gds.degree.stream('t_rdc') YIELD nodeId, score RETURN count(*) AS c"
    ) == [(4,)]
    session.run("CALL gds.graph.drop('t_rdc')")
    session.run("CALL gds.graph.drop('t_rdw')")
    # fan-out bound: >64 distinct bindings fail loud, not 1000 GDS runs
    session.run("UNWIND range(1, 70) AS i CREATE (:Many {i: i})")
    session.run("CALL gds.graph.project('t_many', 'Many', '*')")
    with pytest.raises(ValueError, match="once per binding row"):
        session.run(
            "MATCH (m:Many) CALL gds.bfs.stream('t_many', {sourceNode: m}) "
            "YIELD nodeId RETURN count(*) AS c"
        )
    session.run("CALL gds.graph.drop('t_many')")


def test_trims_slices_use_backticks(session):
    """Two-arg trims, ANSI trim specifiers, negative slice bounds,
    backtick aliases, USE clause (late r12)."""
    assert _vals(
        session,
        "RETURN btrim('xxaxx','x') AS b, ltrim('xxa','x') AS l, "
        "rtrim('axx','x') AS r, trim(BOTH 'y' FROM 'yyayy') AS t",
    ) == [("a", "a", "a", "a")]
    neg = session.run(
        "RETURN [1,2,3,4][-2..] AS a, [1,2,3,4][..-1] AS b"
    ).collect()[0]
    assert list(neg.a) == [3, 4] and list(neg.b) == [1, 2, 3]
    out = session.run("RETURN 1 AS `weird name`")
    assert out.columns == ["weird name"]
    assert _vals(session, "USE neo4j RETURN 1 AS x") == [(1,)]
    with pytest.raises(ValueError, match="Database does not exist"):
        session.run("USE nosuchdb RETURN 1 AS x")


def test_on_set_plus_equals_map(session):
    """ON CREATE / ON MATCH SET `var += {map}` merges keys (late r12 —
    was a parse crash)."""
    for want in ([(True, None)], [(True, True)]):
        assert _vals(
            session,
            "MERGE (c:Cfp {k: 1}) ON CREATE SET c += {made: true} "
            "ON MATCH SET c += {seen: true} RETURN c.made AS m, c.seen AS s",
        ) == want


def test_reserved_property_names_supported(session):
    """A user property named `id` (colliding with the store's fixed
    entity column) stores under an escaped column and reads back —
    r13 replaced the late-r12 loud failure with full support (the
    {id: row.id} bulk-import idiom)."""
    session.run("CREATE (:Clash {id: 7})")
    assert [tuple(r) for r in session.run(
        "MATCH (c:Clash) RETURN c.id AS i"
    ).collect()] == [(7,)]


def test_relationship_index_and_constraint_ddl(session):
    """Relationship index/constraint DDL ``FOR ()-[r:T]-()`` (late r12):
    catalog rows carry entityType RELATIONSHIP; uniqueness and existence
    constraints enforce on the rel write path."""
    session.run("CREATE INDEX ri1 FOR ()-[r:RT]-() ON (r.since)")
    rows = [tuple(r) for r in session.run("SHOW INDEXES WHERE name = 'ri1'").collect()]
    assert rows and rows[0][4] == "RELATIONSHIP" and rows[0][5] == ["RT"]
    session.run("CREATE CONSTRAINT rc1 FOR ()-[r:RT]-() REQUIRE r.rid IS UNIQUE")
    crows = [
        tuple(r)
        for r in session.run("SHOW CONSTRAINTS YIELD name, entityType WHERE name = 'rc1'").collect()
    ]
    assert crows == [("rc1", "RELATIONSHIP")]
    session.run("CREATE (:Ra {k:1}), (:Rb {k:2})")
    session.run("MATCH (a:Ra), (b:Rb) CREATE (a)-[:RT {rid: 1}]->(b)")
    with pytest.raises(ValueError, match="already exists"):
        session.run("MATCH (a:Ra), (b:Rb) CREATE (a)-[:RT {rid: 1}]->(b)")
    session.run("CREATE CONSTRAINT rc2 FOR ()-[r:RT2]-() REQUIRE r.w IS NOT NULL")
    with pytest.raises(ValueError, match="must not be null"):
        session.run("MATCH (a:Ra), (b:Rb) CREATE (a)-[:RT2]->(b)")


def test_constraint_type_survives_dump_load(spark, tmp_path):
    """constraint_type/entity round-trip through dump/load (late r12 fix:
    a NOT NULL constraint used to reload as UNIQUENESS — the wrong rule
    would then enforce)."""
    from docker_neo4j_spark.cypher.session import Session
    from docker_neo4j_spark.storage.store import GraphStore

    s = Session(spark)
    s.run("CREATE CONSTRAINT nn9 FOR (p:DL) REQUIRE p.x IS NOT NULL")
    s.run("CREATE CONSTRAINT ru9 FOR ()-[r:DLR]-() REQUIRE r.k IS UNIQUE")
    s.run("CREATE (:DL {x: 1})")
    d = str(tmp_path / "dump9")
    s.store.dump(d)
    re_store = GraphStore.load(spark, d)
    by_name = {c.name: c for c in re_store.constraints.constraints.values()}
    assert by_name["nn9"].constraint_type == "NODE_PROPERTY_EXISTENCE"
    assert by_name["ru9"].constraint_type == "RELATIONSHIP_UNIQUENESS"
    assert by_name["ru9"].entity == "RELATIONSHIP"


def test_entity_subscript_and_show_where(session):
    """`n['prop']` dynamic property reads on entity variables; SHOW ...
    WHERE without YIELD (late r12)."""
    session.run("CREATE (:Sb {name: 'x', v: 3})")
    assert _vals(session, "MATCH (p:Sb) RETURN p['name'] AS n, p['v'] AS v") == [("x", 3)]
    assert _vals(session, "MATCH (p:Sb) RETURN p['nope'] AS n") == [(None,)]
    out = session.run("SHOW SETTINGS WHERE name STARTS WITH 'spark.sql'")
    assert out.count() > 0


def test_multi_statement_scripts(session):
    """Depth-0 `;` separates statements (browser/cypher-shell paste shape,
    late r12): all run in order, the last result returns; semicolons in
    strings survive."""
    out = session.run(
        "CREATE (:Ms9 {k:1}); CREATE (:Ms9 {k:2}); "
        "MATCH (m:Ms9) RETURN count(*) AS c"
    )
    assert [tuple(r) for r in out.collect()] == [(2,)]
    assert _vals(session, "RETURN 'a;b' AS s") == [("a;b",)]


def test_union_trailing_orderby_and_case_null(session):
    """Trailing ORDER BY/LIMIT after a UNION orders the whole union
    (late r12 — was one-branch-only, a silent row-order divergence);
    CASE WHEN null takes the ELSE branch."""
    session.run("CREATE (:Ux {nm:'b'}), (:Ux {nm:'a'}), (:Uy {nm:'c'})")
    assert _vals(
        session,
        "MATCH (n:Ux) RETURN n.nm AS nm UNION MATCH (m:Uy) RETURN m.nm AS nm "
        "ORDER BY nm",
    ) == [("a",), ("b",), ("c",)]
    assert _vals(
        session,
        "MATCH (n:Ux) RETURN n.nm AS nm UNION ALL MATCH (m:Uy) "
        "RETURN m.nm AS nm ORDER BY nm DESC LIMIT 2",
    ) == [("c",), ("b",)]
    assert _vals(session, "RETURN CASE WHEN null THEN 'y' ELSE 'n' END AS c") == [("n",)]


def test_dynamic_labels(session):
    """Neo4j 5.24 `:$(expr)` dynamic labels (late r12): statement-
    computable expressions splice as plain labels in CREATE/MATCH/SET;
    string lists become multi-label chains; row-dependent expressions
    fail loud; `:$(` inside string literals is untouched text."""
    session.run("CREATE (n:$('Dy1') {k: 1})")
    assert _vals(session, "MATCH (d:Dy1) RETURN count(*) AS c") == [(1,)]
    session.run("CREATE (n:$(['Dy2','Dy3']) {k: 2})")
    assert _vals(session, "MATCH (d:Dy2:Dy3) RETURN count(*) AS c") == [(1,)]
    assert _vals(session, "MATCH (d:Dy1) SET d:$('Dy4') RETURN labels(d) AS l") == [
        (["Dy1", "Dy4"],)
    ]
    assert _vals(session, "MATCH (d:$('Dy1')) RETURN count(*) AS c") == [(1,)]
    with pytest.raises(ValueError, match="compile time"):
        session.run("CREATE (n:$(x.bad) {k: 4})")
    assert _vals(session, "RETURN ':$(kept)' AS s") == [(":$(kept)",)]
