"""Write-path / storage / admin queries for the driver contract.

Write-path rows exercise CREATE → MATCH → read-your-writes, the dump/load
parquet snapshot lifecycle (TestDumpLoad.java:90-133 semantics), and
LOAD CSV (/import contract, docker-entrypoint.sh:502-505) end-to-end
inside a single driver-checkable query. Oracles are plain SQL over the
same inputs (VALUES literals for the in-memory golden graph; the source
tables for roundtrip counts).

Procedure/config queries (CALL…YIELD, dbms.listConfig, SHOW PROCEDURES)
are registered by the procedures layer below in this module.
"""

from __future__ import annotations
from ..localframe import local_df

import tempfile

from pyspark.sql import functions as F

from ..sources.tpch import load_tables
from . import register


@register(
    "write_create_match_return",
    """
    SELECT name FROM (VALUES ('Arne'), ('Armstrong')) AS t(name) ORDER BY name
    """,
)
def write_create_match_return(spark, sf_dir):
    """The reference smoke flow (DatabaseIO.java:42-86) as a query:
    CREATE dogs + SNIFFS rels, MATCH (a:dog)-[:SNIFFS]->(b:dog) RETURN a.name."""
    from ..storage.store import GraphStore

    store = GraphStore(spark)
    arne, bosse = store.create_nodes("dog", [{"name": "Arne"}, {"name": "Bosse"}])
    (armstrong,) = store.create_nodes("dog", [{"name": "Armstrong"}])
    store.create_rels("SNIFFS", [(arne, bosse), (armstrong, arne)])
    return (
        store.expand("dog", "SNIFFS", "dog")
        .select(F.col("a_name").alias("name"))
        .orderBy("name")
    )


@register(
    "write_dump_load_counts",
    """
    SELECT 'Nation' AS label, CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n
    UNION ALL
    SELECT 'Region', CAST((SELECT COUNT(*) FROM region) AS BIGINT)
    """,
)
def write_dump_load_counts(spark, sf_dir):
    """dump → load roundtrip (parquet snapshot): the reloaded store must
    count exactly what was dumped."""
    from ..graph import PropertyGraph
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    g = build_graph(spark, sf_dir)
    small = PropertyGraph(
        nodes=g.label_frames["Nation"].unionByName(g.label_frames["Region"]),
        rels=g.type_frames["IN_REGION"],
    )
    with tempfile.TemporaryDirectory() as tmp:
        GraphStore(spark, small).dump(f"{tmp}/snap")
        again = GraphStore.load(spark, f"{tmp}/snap")
        out = (
            again.graph.nodes.select(F.explode("labels").alias("label"))
            .groupBy("label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        out = out.localCheckpoint(eager=True)  # materialize before tmp vanishes
    return out


@register(
    "cypher_session_smoke",
    """
    SELECT name FROM (VALUES ('Armstrong'), ('Arne')) AS t(name) ORDER BY name
    """,
)
def cypher_session_smoke(spark, sf_dir):
    """The serving façade executing the reference's literal Bolt query
    corpus (DatabaseIO.java:42-86) as strings, end-to-end."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run(
        "CREATE (arne:dog {name:'Arne'})-[:SNIFFS]->(bosse:dog {name:'Bosse'}) RETURN arne.name"
    )
    s.run(
        "MATCH (a:dog {name:'Arne'}) CREATE (armstrong:dog {name:'Armstrong'})-[:SNIFFS]->(a) "
        "return a.name, armstrong.name"
    )
    return s.run("MATCH (a:dog)-[:SNIFFS]->(b:dog) RETURN a.name ORDER BY a.name").select(
        F.col("`a.name`").alias("name")
    )


@register(
    "bolt_roundtrip",
    """
    SELECT name FROM (VALUES ('Armstrong'), ('Arne')) AS t(name) ORDER BY name
    """,
)
def bolt_roundtrip(spark, sf_dir):
    """The same DatabaseIO corpus as ``cypher_session_smoke``, but over the
    REAL network channel: a Bolt v5 server on a TCP socket, driven by the
    in-repo wire client (handshake → HELLO → RUN/PULL with PackStream
    records) — the reference's primary query path
    (DatabaseIO.java:121-132, Dockerfile-trixie:54 ``EXPOSE 7687``)."""
    from ..bolt import BoltClient, BoltServer
    from ..cypher.session import Session

    server = BoltServer(Session(spark)).start()
    try:
        with BoltClient(server.port) as c:
            c.hello()
            c.run(
                "CREATE (arne:dog {name:'Arne'})-[:SNIFFS]->(bosse:dog {name:'Bosse'}) "
                "RETURN arne.name"
            )
            c.run(
                "MATCH (a:dog {name:'Arne'}) "
                "CREATE (armstrong:dog {name:'Armstrong'})-[:SNIFFS]->(a) "
                "return a.name, armstrong.name"
            )
            _, rows = c.run(
                "MATCH (a:dog)-[:SNIFFS]->(b:dog) RETURN a.name ORDER BY a.name"
            )
    finally:
        server.stop()
    return local_df(spark, [(r[0],) for r in rows], "name string")


@register(
    "cypher_where_filter",
    """
    SELECT name FROM (VALUES ('Arne', 4), ('Bosse', 2), ('Armstrong', 7)) AS t(name, age)
    WHERE (age > 3 AND name LIKE 'Ar%') OR name = 'Bosse' ORDER BY name
    """,
)
def cypher_where_filter(spark, sf_dir):
    """Façade WHERE clause: comparison + STARTS WITH + boolean composition
    compiled from the Cypher string to Column predicates."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne', age: 4})")
    s.run("CREATE (b:dog {name:'Bosse', age: 2})")
    s.run("CREATE (c:dog {name:'Armstrong', age: 7})")
    return s.run(
        "MATCH (d:dog) WHERE (d.age > 3 AND d.name STARTS WITH 'Ar') OR d.name = 'Bosse' "
        "RETURN d.name ORDER BY d.name"
    ).select(F.col("`d.name`").alias("name"))


@register(
    "cypher_implicit_grouping",
    """
    SELECT owner, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(age) AS BIGINT) AS sum_age
    FROM (VALUES ('Arne', 4, 'kim'), ('Bosse', 2, 'kim'), ('Armstrong', 7, 'alex'))
      AS t(name, age, owner)
    GROUP BY owner ORDER BY owner
    """,
)
def cypher_implicit_grouping(spark, sf_dir):
    """Façade implicit grouping: non-aggregate RETURN items become the
    grouping keys of the aggregates, straight from the Cypher string."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne', age: 4, owner:'kim'})")
    s.run("CREATE (b:dog {name:'Bosse', age: 2, owner:'kim'})")
    s.run("CREATE (c:dog {name:'Armstrong', age: 7, owner:'alex'})")
    out = s.run(
        "MATCH (d:dog) RETURN d.owner, count(*), sum(d.age) ORDER BY d.owner"
    )
    return out.select(
        F.col("`d.owner`").alias("owner"),
        F.col("`count(*)`").alias("n"),
        F.col("`sum(d.age)`").cast("long").alias("sum_age"),
    )


@register(
    "cypher_optional_match",
    """
    SELECT d AS name, o AS sniffed
    FROM (VALUES ('Arne', 'Bosse'), ('Bosse', NULL), ('Armstrong', NULL)) AS t(d, o)
    ORDER BY name
    """,
)
def cypher_optional_match(spark, sf_dir):
    """Façade OPTIONAL MATCH: left-outer hop from the Cypher string;
    unmatched dogs return null."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne'})-[:SNIFFS]->(b:dog {name:'Bosse'})")
    s.run("CREATE (c:dog {name:'Armstrong'})")
    out = s.run(
        "MATCH (d:dog) OPTIONAL MATCH (d)-[:SNIFFS]->(o:dog) "
        "RETURN d.name AS name, o.name AS sniffed ORDER BY name"
    )
    return out


@register(
    "cypher_with_pipeline",
    """
    SELECT owner AS who, CAST(COUNT(*) AS BIGINT) AS n
    FROM (VALUES ('Arne', 'kim'), ('Bosse', 'kim'), ('Armstrong', 'alex')) AS t(name, owner)
    GROUP BY owner HAVING COUNT(*) > 1
    """,
)
def cypher_with_pipeline(spark, sf_dir):
    """Façade WITH pipeline: mid-query aggregation with a WHERE on the
    aggregate (Cypher's HAVING), straight from the string."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne', owner:'kim'})")
    s.run("CREATE (b:dog {name:'Bosse', owner:'kim'})")
    s.run("CREATE (c:dog {name:'Armstrong', owner:'alex'})")
    return s.run(
        "MATCH (d:dog) WITH d.owner AS who, count(*) AS n WHERE n > 1 RETURN who, n"
    )


@register(
    "cypher_var_length",
    """
    SELECT name, hops FROM (VALUES ('Bosse', CAST(1 AS BIGINT)), ('Cleo', CAST(2 AS BIGINT)))
      AS t(name, hops) ORDER BY hops
    """,
)
def cypher_var_length(spark, sf_dir):
    """Façade var-length pattern: -[:T*1..3]-> BFS reachability with a
    minimum-hops column, straight from the string."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne'})-[:SNIFFS]->(b:dog {name:'Bosse'})")
    s.run("MATCH (b:dog {name:'Bosse'}) CREATE (c:dog {name:'Cleo'})<-[:SNIFFS]-(b)")
    return s.run(
        "MATCH (a:dog {name:'Arne'})-[:SNIFFS*1..3]->(b:dog) "
        "RETURN b.name AS name, hops ORDER BY hops"
    )


@register(
    "write_create_from_match_batch",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tagged FROM customer
    """,
)
def write_create_from_match_batch(spark, sf_dir):
    """Set-based CREATE anchored on a MATCH binding: one Tag node + TAGGED
    rel per customer, id-assigned distributed and appended in ONE batch —
    the binding frame is never collected to the driver. Read back through
    the façade to count the created pattern."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    store = GraphStore(spark, build_graph(spark, sf_dir))
    s = Session(spark, store=store)
    s.run("MATCH (c:Customer) CREATE (t:Tag {kind:'vip'})-[:TAGGED]->(c)")
    return s.run("MATCH (t:Tag)-[:TAGGED]->(c:Customer) RETURN count(*) AS n_tagged")


@register(
    "cypher_unwind",
    """
    SELECT n_name AS name FROM nation ORDER BY name
    """,
)
def cypher_unwind(spark, sf_dir):
    """Façade UNWIND: collect a list mid-pipeline then explode it back to
    rows, straight from the Cypher string (SURVEY §2.B.6)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) WITH collect(n.n_name) AS names "
        "UNWIND names AS name RETURN name ORDER BY name"
    )


@register(
    "cypher_union",
    """
    SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region
    """,
)
def cypher_union(spark, sf_dir):
    """Façade UNION: distinct union of two full statements, split at the
    top level of the Cypher string."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name "
        "UNION MATCH (r:Region) RETURN r.r_name AS name"
    )


@register(
    "cypher_skip_limit",
    """
    SELECT c_name AS name FROM customer ORDER BY name LIMIT 5 OFFSET 10
    """,
)
def cypher_skip_limit(spark, sf_dir):
    """Façade SKIP: ORDER BY … SKIP n LIMIT m pagination (c_name is unique,
    so the page is deterministic)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run("MATCH (c:Customer) RETURN c.c_name AS name ORDER BY name SKIP 10 LIMIT 5")


@register(
    "cypher_exists_pattern",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders) AND c_acctbal > 1000
    """,
)
def cypher_exists_pattern(spark, sf_dir):
    """Façade pattern predicate: ``WHERE (c)-[:PLACED]->()`` compiles to a
    left-semi join mixed with a plain column predicate in the same WHERE."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) WHERE (c)-[:PLACED]->() AND c.c_acctbal > 1000 "
        "RETURN count(*) AS n"
    )


@register(
    "cypher_not_exists_pattern",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def cypher_not_exists_pattern(spark, sf_dir):
    """Façade NOT pattern predicate → left-anti join."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run("MATCH (c:Customer) WHERE NOT (c)-[:PLACED]->() RETURN count(*) AS n")


@register(
    "cypher_optional_chain",
    """
    SELECT c_custkey AS ck, CAST(COUNT(l_partkey) AS BIGINT) AS n
    FROM customer
    LEFT JOIN (SELECT o_custkey, l_partkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def cypher_optional_chain(spark, sf_dir):
    """Façade multi-hop OPTIONAL MATCH: the optional side is a full
    match_chain, left-joined on the anchor; customers with no orders
    count 0 parts."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part) "
        "RETURN c.c_custkey AS ck, count(p.p_partkey) AS n"
    )


@register(
    "cypher_shortest_path",
    """
    SELECT r_name AS name, CAST(2 AS BIGINT) AS hops
    FROM region JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey WHERE c_custkey = 1
    """,
)
def cypher_shortest_path(spark, sf_dir):
    """Façade shortestPath((a)-[*..k]->(b)) in MATCH, wired to the paths
    operator: customer 1 reaches its region in exactly 2 hops
    (IN_NATION → IN_REGION)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH p = shortestPath((c:Customer {c_custkey: 1})-[*..3]->(r:Region)) "
        "RETURN r.r_name AS name, length(p) AS hops"
    )


@register(
    "cypher_set_delete_readback",
    """
    SELECT name FROM (VALUES ('Arne')) AS t(name)
    """,
)
def cypher_set_delete_readback(spark, sf_dir):
    """Façade SET / DETACH DELETE statements (mutate-then-verify flow,
    TestBackupRestore.java:143-146 shape): flag young dogs, delete the
    others, read back what survived the combination."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne', age: 4})-[:SNIFFS]->(b:dog {name:'Bosse', age: 9})")
    s.run("CREATE (c:dog {name:'Cleo', age: 11})")
    s.run("MATCH (d:dog) WHERE d.age < 5 SET d.young = true")
    s.run("MATCH (d:dog) WHERE d.age >= 5 DETACH DELETE d")
    return s.run("MATCH (d:dog) WHERE d.young = true RETURN d.name AS name")


@register(
    "cypher_call_subquery",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
    """,
)
def cypher_call_subquery(spark, sf_dir):
    """Façade CALL { subquery }: the braced statement runs as its own
    query; the outer RETURN aggregates over it (SURVEY §2.B.6)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run("CALL { MATCH (n:Nation) RETURN n.n_name AS name } RETURN count(*) AS n")


@register(
    "proc_vector_query_nodes",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id AS node FROM embeddings, q
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id ASC
    LIMIT 5
    """,
)
def proc_vector_query_nodes(spark, sf_dir):
    """``CALL db.index.vector.queryNodes(...)`` through the string façade
    over a store whose nodes carry an ``embedding`` property — id set of
    the cosine top-5 must match DuckDB's (scores omitted: float-fold
    ordering is compared, bit patterns are not)."""
    from ..cypher.session import Session
    from ..graph import PropertyGraph
    from ..storage.store import GraphStore

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nodes = emb.select(
        F.col("vec_id").alias("id"), F.array(F.lit("Doc")).alias("labels"), "embedding"
    )
    rels = local_df(spark, [], "id long, src long, dst long, type string")
    s = Session(spark, store=GraphStore(spark, PropertyGraph(nodes=nodes, rels=rels)))
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qstr = "[" + ", ".join(f"{float(x):.9g}" for x in qvec) + "]"
    return s.run(
        f"CALL db.index.vector.queryNodes('Doc', 5, {qstr}) YIELD node, score RETURN node"
    )


@register(
    "proc_fulltext_query_nodes",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM nd) AS a FROM dl),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ('vector', 'hash', 'spark') GROUP BY doc_id, token),
    dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    per_term AS (
      SELECT t.doc_id,
             ln(1e0 + ((SELECT n FROM nd) - CAST(d.df AS DOUBLE) + 0.5e0)
                      / (CAST(d.df AS DOUBLE) + 0.5e0))
             * (CAST(t.tf AS DOUBLE) * 2.2e0)
             / (CAST(t.tf AS DOUBLE)
                + 1.2e0 * (0.25e0 + 0.75e0 * CAST(l.dl AS DOUBLE)
                                    / (SELECT a FROM avgdl))) AS s
      FROM tf t JOIN dfq d USING (token) JOIN dl l USING (doc_id)),
    scored AS (
      SELECT doc_id AS node, CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(ROUND(SUM(s) * 1e3) AS BIGINT) AS score_milli
      FROM per_term GROUP BY doc_id)
    SELECT node, n_hits, score_milli FROM scored
    ORDER BY score_milli DESC, node ASC LIMIT 10
    """,
)
def proc_fulltext_query_nodes(spark, sf_dir):
    """``CALL db.index.fulltext.queryNodes(...)`` through the string
    façade over a store whose Doc nodes carry the documents' ``text``
    property: BM25 top-10 for 'vector hash spark' — identical closed-form
    scoring to llm_bm25_search, so the milli-rounded scores hash-match."""
    from ..cypher.session import Session
    from ..graph import PropertyGraph
    from ..storage.store import GraphStore

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nodes = docs.select(
        F.col("doc_id").alias("id"), F.array(F.lit("Doc")).alias("labels"), "text"
    )
    rels = local_df(spark, [], "id long, src long, dst long, type string")
    s = Session(spark, store=GraphStore(spark, PropertyGraph(nodes=nodes, rels=rels)))
    return s.run(
        "CALL db.index.fulltext.queryNodes('Doc', 'vector hash spark', 10) "
        "YIELD nodeId, n_hits, score_milli "
        "RETURN nodeId AS node, n_hits, score_milli"
    )


@register(
    "proc_apoc_path_expand",
    """
    WITH RECURSIVE e AS (
      SELECT CAST(3000000000000 + o_custkey AS BIGINT) AS src,
             CAST(6000000000000 + o_orderkey AS BIGINT) AS dst FROM orders
      UNION ALL
      SELECT CAST(6000000000000 + l_orderkey AS BIGINT),
             CAST(5000000000000 + l_partkey AS BIGINT) FROM lineitem),
    seed AS (SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, 0 AS lvl FROM seed
      UNION
      SELECT e.dst, walk.lvl + 1 FROM walk JOIN e ON e.src = walk.id
      WHERE walk.lvl < 2)
    SELECT id AS node, CAST(MIN(lvl) AS BIGINT) AS level FROM walk
    WHERE id >= 5000000000000 AND id < 6000000000000
    GROUP BY id HAVING MIN(lvl) >= 1
    ORDER BY node
    """,
)
def proc_apoc_path_expand(spark, sf_dir):
    """``CALL apoc.path.expand('Customer', 'PLACED>|CONTAINS>', '>Part',
    1, 2)`` through the façade: BFS levels over the typed-pruned edge
    frame, end-label terminated — every Part reachable from any customer
    within two hops, at its shortest level."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "CALL apoc.path.expand('Customer', 'PLACED>|CONTAINS>', '>Part', 1, 2) "
        "YIELD node, level RETURN node, level"
    )


@register(
    "proc_genai_encode_dim",
    """
    SELECT CAST(32 AS BIGINT) AS dim
    """,
)
def proc_genai_encode_dim(spark, sf_dir):
    """``genai.vector.encode`` wired as a registered scalar function (the
    genai plugin surface): encoding returns a fixed-width array<float>.
    Values are the engine's deterministic stub (pytest-covered); the
    oracle grades the registered-function plumbing and width contract."""
    from ..procedures.registry import fn

    return spark.range(1).select(
        F.size(fn("genai.vector.encode", "hello")).cast("long").alias("dim")
    )


@register(
    "cypher_expression_projection",
    """
    SELECT c_name AS name, c_acctbal * 2 + 1 AS x,
           CONCAT(c_mktsegment, '!') AS seg
    FROM customer
    """,
)
def cypher_expression_projection(spark, sf_dir):
    """Façade expression projection: arithmetic with precedence and string
    concatenation compiled from the RETURN item text (SURVEY §2.B.2)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) RETURN c.c_name AS name, c.c_acctbal * 2 + 1 AS x, "
        "c.c_mktsegment + '!' AS seg"
    )


@register(
    "cypher_multi_match_pipeline",
    """
    WITH t AS (
      SELECT o_custkey AS ck, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
    )
    SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders
    FROM t JOIN customer ON c_custkey = ck
           JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name ORDER BY nation
    """,
)
def cypher_multi_match_pipeline(spark, sf_dir):
    """Façade multi-MATCH pipeline: aggregate per customer, filter on the
    aggregate, then MATCH again from the kept binding into a second
    pattern — WITH carries the whole node binding forward."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, count(*) AS n_orders "
        "WHERE n_orders >= 20 MATCH (c)-[:IN_NATION]->(nt:Nation) "
        "RETURN nt.n_name AS nation, count(*) AS n_cust, sum(n_orders) AS total_orders "
        "ORDER BY nation"
    )


@register(
    "cypher_scalar_functions",
    """
    SELECT UPPER(n_name) AS u, SUBSTRING(n_name, 1, 3) AS pre,
           CAST(LENGTH(n_name) AS INTEGER) AS n
    FROM nation ORDER BY u
    """,
)
def cypher_scalar_functions(spark, sf_dir):
    """Façade scalar function calls in RETURN items (toUpper / substring /
    size), resolved against functions/cypher.py — Cypher's 0-based
    substring maps to SQL's 1-based."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) RETURN toUpper(n.n_name) AS u, "
        "substring(n.n_name, 0, 3) AS pre, size(n.n_name) AS n ORDER BY u"
    )


@register(
    "layout_bucketed_expand",
    """
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def layout_bucketed_expand(spark, sf_dir):
    """Bucketed storage layout (storage/layout.py): Customer nodes and
    PLACED rels persisted bucketBy(id)/bucketBy(src), re-read, and
    expanded with a shuffle-free co-located join (plan-audited in
    test_plan_audit)."""
    from ..graph import PropertyGraph
    from ..sources.tpch import build_graph
    from ..storage.layout import bucketed_expand, save_bucketed_graph

    g = build_graph(spark, sf_dir)
    small = PropertyGraph(nodes=g.label_frames["Customer"], rels=g.type_frames["PLACED"])
    save_bucketed_graph(small, "cat_bucketed", buckets=16)
    out = (
        bucketed_expand(spark, "cat_bucketed")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("segment")
    )
    return out


@register(
    "source_jsonl_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def source_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink → source roundtrip (sources/textdata.py): the documents
    table written as JSON-Lines and read back with an explicit schema must
    aggregate identically to the parquet original."""
    import tempfile

    from ..sources.textdata import read_jsonl, write_jsonl

    d = load_tables(spark, sf_dir)["documents"]
    with tempfile.TemporaryDirectory() as tmp:
        write_jsonl(d, f"{tmp}/docs")
        back = read_jsonl(spark, f"{tmp}/docs", schema=d.schema)
        out = (
            back.groupBy("lang")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("n_chars").cast("long").alias("chars"),
            )
            .orderBy("lang")
            .localCheckpoint(eager=True)  # materialize before tmp vanishes
        )
    return out


@register(
    "proc_export_csv_roundtrip",
    """
    SELECT CAST((SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS BIGINT) AS nodes,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS relationships
    """,
)
def proc_export_csv_roundtrip(spark, sf_dir):
    """``CALL apoc.export.csv.all(path)`` through the string façade over
    the Nation/Region subgraph, then re-read the exported CSV and count —
    the export surface graded end-to-end."""
    import tempfile

    from ..cypher.session import Session
    from ..graph import PropertyGraph
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    g = build_graph(spark, sf_dir)
    small = PropertyGraph(
        nodes=g.label_frames["Nation"].unionByName(g.label_frames["Region"]),
        rels=g.type_frames["IN_REGION"],
    )
    s = Session(spark, store=GraphStore(spark, small))
    with tempfile.TemporaryDirectory() as tmp:
        s.run(f"CALL apoc.export.csv.all('{tmp}/exp')")
        nodes = spark.read.option("header", True).csv(f"{tmp}/exp/nodes")
        rels = spark.read.option("header", True).csv(f"{tmp}/exp/rels")
        out = local_df(spark, 
            [(nodes.count(), rels.count())], "nodes bigint, relationships bigint"
        ).localCheckpoint(eager=True)
    return out


@register(
    "proc_apoc_load_csv_json",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
           CAST(MAX(n_nationkey) AS BIGINT) AS max_key,
           MIN(n_name) AS min_name
    FROM nation
    """,
)
def proc_apoc_load_csv_json(spark, sf_dir):
    """r8 apoc file-load surface: write nation to CSV, ``CALL
    apoc.load.csv`` (dense distributed lineNo, list, header map), and
    aggregate the map values — loads must reproduce the source table.
    Also exercises apoc.load.json on the same data via the JSONL sink."""
    import tempfile

    from ..cypher.session import Session

    nation = load_tables(spark, sf_dir)["nation"]
    s = Session(spark)
    with tempfile.TemporaryDirectory() as tmp:
        nation.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{tmp}/nation_csv"
        )
        loaded = s.run(
            f"CALL apoc.load.csv('{tmp}/nation_csv') YIELD lineNo, map RETURN lineNo, map"
        )
        out = loaded.select(
            F.col("map")["n_nationkey"].cast("long").alias("k"),
            F.col("map")["n_name"].alias("name"),
        ).agg(
            F.count("*").cast("long").alias("n_lines"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
            F.min("name").alias("min_name"),
        ).localCheckpoint(eager=True)
    return out


@register(
    "proc_call_default_values",
    """
    SELECT 'a string' AS string, CAST(42 AS BIGINT) AS integer,
           CAST(3.14 AS DOUBLE) AS aFloat, true AS aBoolean
    UNION ALL
    SELECT 'hello', CAST(7 AS BIGINT), CAST(3.14 AS DOUBLE), false
    """,
)
def proc_call_default_values(spark, sf_dir):
    """CALL example.defaultValues() — once with defaults, once with
    overrides (ExampleNeo4jPlugin.java:52-59 parity)."""
    from ..procedures.registry import call

    a = call(spark, "example.defaultValues")
    b = call(spark, "example.defaultValues", args={"string": "hello", "integer": 7, "aBoolean": False})
    return a.unionByName(b)


@register(
    "proc_list_config_yield_where",
    """
    SELECT 'true' AS value
    """,
)
def proc_list_config_yield_where(spark, sf_dir):
    """CALL dbms.listConfig() YIELD name, value WHERE name=… RETURN value
    (DatabaseIO.java:92 shape) against an engine-default setting."""
    from pyspark.sql import functions as F

    from ..procedures.registry import call

    return call(
        spark,
        "dbms.listConfig",
        yield_cols=["name", "value"],
        where=F.col("name") == "spark.sql.adaptive.enabled",
    ).select("value")


@register(
    "proc_show_procedures",
    """
    SELECT 'apoc.cypher.doIt' AS name
    UNION ALL SELECT 'apoc.cypher.run'
    UNION ALL SELECT 'apoc.help'
    UNION ALL SELECT 'dbms.procedures'
    UNION ALL SELECT 'apoc.create.node'
    UNION ALL SELECT 'apoc.create.relationship'
    UNION ALL SELECT 'apoc.merge.node'
    UNION ALL SELECT 'apoc.refactor.mergeNodes'
    UNION ALL SELECT 'apoc.schema.assert'
    UNION ALL SELECT 'apoc.refactor.rename.label'
    UNION ALL SELECT 'apoc.refactor.rename.type'
    UNION ALL SELECT 'apoc.export.csv.all'
    UNION ALL SELECT 'apoc.export.json.all'
    UNION ALL SELECT 'apoc.export.graphml.all'
    UNION ALL SELECT 'apoc.load.csv'
    UNION ALL SELECT 'apoc.load.json'
    UNION ALL SELECT 'apoc.load.xml'
    UNION ALL SELECT 'apoc.meta.stats'
    UNION ALL SELECT 'apoc.periodic.commit'
    UNION ALL SELECT 'apoc.util.sleep'
    UNION ALL SELECT 'apoc.util.validate'
    UNION ALL SELECT 'apoc.periodic.iterate'
    UNION ALL SELECT 'apoc.path.expand'
    UNION ALL SELECT 'db.index.fulltext.queryNodes'
    UNION ALL SELECT 'db.index.vector.queryNodes'
    UNION ALL SELECT 'db.labels'
    UNION ALL SELECT 'db.propertyKeys'
    UNION ALL SELECT 'db.relationshipTypes'
    UNION ALL SELECT 'db.schema.visualization'
    UNION ALL SELECT 'dbms.components'
    UNION ALL SELECT 'gds.graph.drop'
    UNION ALL SELECT 'gds.graph.exists'
    UNION ALL SELECT 'gds.graph.list'
    UNION ALL SELECT 'gds.graph.project'
    UNION ALL SELECT 'gds.pageRank.stream'
    UNION ALL SELECT 'gds.shortestPath.dijkstra.stream'
    UNION ALL SELECT 'gds.wcc.stream'
    UNION ALL SELECT 'gds.labelPropagation.stream'
    UNION ALL SELECT 'gds.labelPropagation.write'
    UNION ALL SELECT 'gds.louvain.stream'
    UNION ALL SELECT 'gds.louvain.write'
    UNION ALL SELECT 'gds.degree.stream'
    UNION ALL SELECT 'gds.degree.write'
    UNION ALL SELECT 'gds.nodeSimilarity.stream'
    UNION ALL SELECT 'gds.wcc.write'
    UNION ALL SELECT 'gds.pageRank.write'
    UNION ALL SELECT 'gds.bfs.stream'
    UNION ALL SELECT 'dbms.listConfig'
    UNION ALL SELECT 'example.defaultValues'
    UNION ALL SELECT 'apoc.case'
    UNION ALL SELECT 'apoc.coll.zipToRows'
    UNION ALL SELECT 'apoc.do.when'
    UNION ALL SELECT 'apoc.export.cypher.all'
    UNION ALL SELECT 'db.indexes'
    UNION ALL SELECT 'db.info'
    UNION ALL SELECT 'db.schema.nodeTypeProperties'
    UNION ALL SELECT 'dbms.info'
    UNION ALL SELECT 'gds.articleRank.stream'
    UNION ALL SELECT 'gds.betweenness.stream'
    UNION ALL SELECT 'gds.closeness.stream'
    UNION ALL SELECT 'gds.eigenvector.stream'
    UNION ALL SELECT 'gds.graph.nodeProperties.stream'
    UNION ALL SELECT 'gds.kcore.stream'
    UNION ALL SELECT 'gds.leiden.stream'
    UNION ALL SELECT 'gds.localClusteringCoefficient.stream'
    UNION ALL SELECT 'gds.louvain.stats'
    UNION ALL SELECT 'gds.pageRank.mutate'
    UNION ALL SELECT 'gds.pageRank.stats'
    UNION ALL SELECT 'gds.scc.stream'
    UNION ALL SELECT 'gds.triangleCount.stats'
    UNION ALL SELECT 'gds.triangleCount.stream'
    UNION ALL SELECT 'gds.wcc.mutate'
    UNION ALL SELECT 'gds.wcc.stats'
    UNION ALL SELECT 'gds.graph.project.cypher'
    UNION ALL SELECT 'gds.knn.stream'
    UNION ALL SELECT 'apoc.meta.schema'
    UNION ALL SELECT 'apoc.path.subgraphNodes'
    UNION ALL SELECT 'apoc.path.spanningTree'
    UNION ALL SELECT 'gds.allShortestPaths.dijkstra.stream'
    UNION ALL SELECT 'gds.bellmanFord.stream'
    UNION ALL SELECT 'gds.shortestPath.yens.stream'
    UNION ALL SELECT 'gds.shortestPath.astar.stream'
    UNION ALL SELECT 'gds.fastRP.stream'
    UNION ALL SELECT 'gds.closeness.harmonic.stream'
    UNION ALL SELECT 'gds.randomWalk.stream'
    UNION ALL SELECT 'gds.sllpa.stream'
    UNION ALL SELECT 'gds.dag.topologicalSort.stream'
    UNION ALL SELECT 'db.ping'
    UNION ALL SELECT 'db.awaitIndexes'
    UNION ALL SELECT 'db.resampleOutdatedIndexes'
    UNION ALL SELECT 'dbms.listTransactions'
    """,
)
def proc_show_procedures(spark, sf_dir):
    """SHOW PROCEDURES (StubPluginHelper.java:113 assertion shape)."""
    from ..procedures.registry import show_procedures

    return show_procedures(spark).select("name")


@register(
    "proc_gds_wcc_stream",
    """
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS nodeId,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS componentId
    FROM nation
    UNION ALL
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT),
           CAST(1000000000000 + r_regionkey AS BIGINT)
    FROM region
    ORDER BY nodeId
    """,
)
def proc_gds_wcc_stream(spark, sf_dir):
    """The GDS CALL execution surface (r11): ``CALL gds.graph.project``
    then ``CALL gds.wcc.stream('g')`` — the same BSP kernel the
    DataFrame catalog uses, driven entirely through the Cypher façade.
    Components of the Nation–Region star graph are each region with its
    nations (componentId = min node id = the region's id — exact)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    _graphs_for(spark).pop("wccg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('wccg', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.wcc.stream('wccg') YIELD nodeId, componentId "
        "RETURN nodeId, componentId ORDER BY nodeId"
    )


@register(
    "proc_gds_wcc_write",
    """
    SELECT n_name AS name,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS comp
    FROM nation ORDER BY name
    """,
)
def proc_gds_wcc_write(spark, sf_dir):
    """GDS WRITE mode (r11): ``CALL gds.wcc.write('g', 'comp')`` lands the
    component labels on the live store via one set-based conditional
    update; the next MATCH reads them back typed."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    _graphs_for(spark).pop("wwg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('wwg', ['Nation', 'Region'], ['IN_REGION'])")
    s.run("CALL gds.wcc.write('wwg', 'comp')")
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, n.comp AS comp ORDER BY name"
    )


@register(
    "proc_gds_degree_stream",
    """
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS nodeId,
           CAST((SELECT count(*) FROM nation n
                 WHERE n.n_regionkey = r.r_regionkey) AS DOUBLE) AS score
    FROM region r ORDER BY nodeId
    """,
)
def proc_gds_degree_stream(spark, sf_dir):
    """``CALL gds.degree.stream('g', 'REVERSE') YIELD … WHERE score > 0``
    (r11): in-degree over the projected star graph — regions carry their
    nation counts, zero-degree nations filtered by the general YIELD-WHERE
    expression (itself new in r11; was key=value only)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    _graphs_for(spark).pop("degg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('degg', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.degree.stream('degg', 'REVERSE') YIELD nodeId, score "
        "WHERE score > 0 RETURN nodeId, score ORDER BY nodeId"
    )


@register(
    "admin_show_databases",
    """
    SELECT 'movies' AS name, 'offline' AS status
    UNION ALL SELECT 'neo4j', 'online'
    UNION ALL SELECT 'system', 'online'
    """,
)
def admin_show_databases(spark, sf_dir):
    """SHOW DATABASES through the Cypher surface, after a CREATE/STOP/
    CREATE/DROP sequence (r10: database DDL): the reference boots with
    neo4j + system online (docker-entrypoint.sh main flow); `movies` is
    created and stopped, `scratch` created and dropped."""
    from ..admin import Dbms
    from ..cypher.session import Session

    dbms = Dbms.bootstrap("none")
    s = Session(spark, dbms=dbms)
    s.run("CREATE DATABASE movies")
    s.run("STOP DATABASE movies")
    s.run("CREATE DATABASE scratch")
    s.run("DROP DATABASE scratch")
    return s.run("SHOW DATABASES")


@register(
    "load_csv_nation_agg",
    """
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def load_csv_nation_agg(spark, sf_dir):
    """LOAD CSV end-to-end: export nation to CSV, re-ingest with the CSV
    source (header + schema inference), aggregate — proving the /import
    path yields the same data as the parquet original."""
    from ..storage.store import load_csv

    nation = load_tables(spark, sf_dir)["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    with tempfile.TemporaryDirectory() as tmp:
        nation.coalesce(1).write.mode("overwrite").option("header", True).csv(f"{tmp}/nation")
        out = (
            load_csv(spark, f"{tmp}/nation")
            .groupBy("n_regionkey")
            .agg(
                F.count("*").cast("long").alias("n_nations"),
                F.min("n_name").alias("first_name"),
            )
        )
        out = out.localCheckpoint(eager=True)
    return out


@register(
    "rdf_import_triples",
    """
    SELECT r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_nation
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region
    """,
)
def rdf_import_triples(spark, sf_dir):
    """n10s RDF import end-to-end (neo4j-plugins.json:48-53): serialize
    the nation/region subgraph as N-Triples (IRI triples for IN_REGION,
    literal triples for names), parse it back with the distributed
    N-Triples reader (sources/rdf.py), rebuild rels + property maps, and
    aggregate — proving the RDF path yields the same graph as parquet."""
    from ..sources.rdf import nodes_from_triples, read_ntriples, rels_from_triples

    t = load_tables(spark, sf_dir)
    nation, region = t["nation"], t["region"]
    rel_lines = nation.select(
        F.concat(
            F.lit("<urn:nation/"), "n_nationkey",
            F.lit("> <urn:rel/IN_REGION> <urn:region/"), "n_regionkey",
            F.lit("> ."),
        ).alias("value")
    )
    # names may contain spaces but no quotes/backslashes in TPC-H; still
    # go through the escaper-for-free concat form used by real exporters
    prop_lines = nation.select(
        F.concat(
            F.lit("<urn:nation/"), "n_nationkey",
            F.lit('> <urn:prop/name> "'), "n_name", F.lit('" .'),
        ).alias("value")
    ).unionByName(
        region.select(
            F.concat(
                F.lit("<urn:region/"), "r_regionkey",
                F.lit('> <urn:prop/name> "'), "r_name", F.lit('" .'),
            ).alias("value")
        )
    )
    with tempfile.TemporaryDirectory() as tmp:
        rel_lines.unionByName(prop_lines).write.mode("overwrite").text(f"{tmp}/g.nt")
        triples = read_ntriples(spark, f"{tmp}/g.nt")
        rels = rels_from_triples(triples)
        nodes = nodes_from_triples(triples)
        named = nodes.select(
            "uri", F.element_at("properties", "name").alias("name")
        )
        out = (
            rels.where(F.col("type") == "IN_REGION")
            .join(named.withColumnRenamed("uri", "src").withColumnRenamed("name", "nation_name"), "src")
            .join(named.withColumnRenamed("uri", "dst").withColumnRenamed("name", "region"), "dst")
            .groupBy("region")
            .agg(
                F.count("*").cast("long").alias("n_nations"),
                F.min("nation_name").alias("first_nation"),
            )
            .orderBy("region")
            .localCheckpoint(eager=True)  # materialize before tmp vanishes
        )
    return out


@register(
    "graphql_mutation_readback",
    """
    SELECT name, seg FROM (VALUES ('alpha', 'MOVED'), ('gamma', 'G'))
      AS t(name, seg) ORDER BY name
    """,
)
def graphql_mutation_readback(spark, sf_dir):
    """r8 GraphQL mutation surface (the graphql plugin's auto-generated
    create<Type>/update<Type>/delete<Type> mutations) over a live store:
    create three, update one, delete one via mutation documents, then
    read back through the QUERY path of the same store-backed engine —
    read-your-writes end-to-end."""
    from ..graphql import GraphQLType, store_engine
    from ..storage.store import GraphStore

    types = {
        "thing": GraphQLType(label="Thing", props={"name": "name", "seg": "seg"})
    }
    eng = store_engine(GraphStore(spark), types)
    for m in (
        'mutation { createThing(name: "alpha", seg: "A") { name } }',
        'mutation { createThing(name: "beta", seg: "B") { name } }',
        'mutation { createThing(name: "gamma", seg: "G") { name } }',
        'mutation { updateThing(name: "alpha", seg: "MOVED") { name seg } }',
        'mutation { deleteThing(name: "beta") }',
    ):
        eng.execute(m).collect()
    return eng.execute("{ thing { name seg } }").orderBy("name")


@register(
    "rdf_export_roundtrip",
    """
    WITH t AS (
      SELECT 'urn:g/rel/IN_REGION' AS predicate,
             'urn:g/node/' || CAST(CAST(1000000000000 + n_regionkey AS BIGINT) AS VARCHAR) AS obj
      FROM nation
      UNION ALL SELECT 'urn:g/prop/name', n_name FROM nation
      UNION ALL SELECT 'urn:g/prop/name', r_name FROM region
    )
    SELECT predicate, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(obj) AS min_obj, MAX(obj) AS max_obj
    FROM t GROUP BY predicate ORDER BY predicate
    """,
)
def rdf_export_roundtrip(spark, sf_dir):
    """r8 n10s export surface (neo4j-plugins.json:48-53): property graph →
    RDF triples (``graph_to_triples``) → N-Triples text
    (``to_ntriples``) → re-import (``read_ntriples``) → aggregate.
    Export∘import must be the identity, so the roundtripped aggregate
    equals the oracle computed straight from the source tables."""
    from ..sources.rdf import graph_to_triples, read_ntriples, to_ntriples

    t = load_tables(spark, sf_dir)
    nodes = (
        t["nation"]
        .select(
            (F.lit(2000000000000) + F.col("n_nationkey")).alias("id"),
            F.col("n_name").alias("name"),
        )
        .unionByName(
            t["region"].select(
                (F.lit(1000000000000) + F.col("r_regionkey")).alias("id"),
                F.col("r_name").alias("name"),
            )
        )
    )
    rels = t["nation"].select(
        (F.lit(2000000000000) + F.col("n_nationkey")).alias("src"),
        (F.lit(1000000000000) + F.col("n_regionkey")).alias("dst"),
        F.lit("IN_REGION").alias("type"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        to_ntriples(graph_to_triples(nodes, rels, base="urn:g/")).write.mode(
            "overwrite"
        ).text(f"{tmp}/g.nt")
        back = read_ntriples(spark, f"{tmp}/g.nt")
        out = (
            back.groupBy("predicate")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.min(F.coalesce("obj_literal", "obj_iri")).alias("min_obj"),
                F.max(F.coalesce("obj_literal", "obj_iri")).alias("max_obj"),
            )
            .orderBy("predicate")
            .localCheckpoint(eager=True)  # materialize before tmp vanishes
        )
    return out


@register(
    "graphql_region_rollup",
    """
    SELECT r_name AS name,
           COALESCE(STRING_AGG(n_name, ',' ORDER BY n_name), '') AS nations_name
    FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY name
    """,
)
def graphql_region_rollup(spark, sf_dir):
    """GraphQL plugin surface (neo4j-plugins.json:28-32): the query
    ``{ region { name nations { name } } }`` through the GraphQL engine
    (graphql.py) — label scan, IN_REGION traversal, to-many selection
    pinned to sorted order and comma-serialized."""
    from ..graphql import tpch_engine
    from ..sources.tpch import build_graph

    eng = tpch_engine(build_graph(spark, sf_dir))
    return eng.execute("{ region { name nations { name } } }").orderBy("name")


@register(
    "graphql_nested_two_levels",
    r"""
    WITH nagg AS (
      SELECT n_regionkey, n_name,
             COALESCE(STRING_AGG(c_name, ',' ORDER BY c_name), '') AS customers_name
      FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_regionkey, n_name
    )
    SELECT r_name AS name,
           COALESCE(STRING_AGG(n_name, ',' ORDER BY n_name), '') AS nations_name,
           COALESCE(STRING_AGG(
             REPLACE(REPLACE(customers_name, '\', '\\'), ',', '\,'),
             ',' ORDER BY n_name), '') AS nations_customers_name
    FROM region LEFT JOIN nagg ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY name
    """,
)
def graphql_nested_two_levels(spark, sf_dir):
    """r8 GraphQL depth extension (neo4j-plugins.json:28-32): a to-many list
    nested under a to-many list — ``{ region { name nations { name
    customers { name } } } }``. Each nesting level is one equi-join plus one
    collect; the inner serialized list's commas are escaped (``\\,``) by the
    level above, so the oracle replicates the escape with REPLACE."""
    from ..graphql import tpch_engine
    from ..sources.tpch import build_graph

    eng = tpch_engine(build_graph(spark, sf_dir))
    return eng.execute(
        "{ region { name nations { name customers { name } } } }"
    ).orderBy("name")


@register(
    "cypher_case_expression",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE c_mktsegment WHEN 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
             AS building
    FROM customer GROUP BY bucket ORDER BY bucket
    """,
)
def cypher_case_expression(spark, sf_dir):
    """Façade CASE expressions — generic form as a grouping key and simple
    form inside an aggregate — compiled from the Cypher string (the
    reference surface is arbitrary Cypher text over Bolt,
    DatabaseIO.java:121-128)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) RETURN "
        "CASE WHEN c.c_acctbal < 0 THEN 'neg' WHEN c.c_acctbal < 5000 THEN 'mid' "
        "ELSE 'high' END AS bucket, count(*) AS n, "
        "sum(CASE c.c_mktsegment WHEN 'BUILDING' THEN 1 ELSE 0 END) AS building "
        "ORDER BY bucket"
    )


@register(
    "cypher_list_comprehension",
    """
    SELECT p_partkey AS pk,
           COALESCE(array_to_string(
               list_transform(list_filter(string_split(p_name, ' '),
                                          w -> length(w) > 4),
                              w -> upper(w)), ' '), '') AS words
    FROM part ORDER BY pk
    """,
)
def cypher_list_comprehension(spark, sf_dir):
    """Façade list comprehension ``[w IN list WHERE pred | expr]`` →
    JVM higher-order functions (filter + transform), no Python UDF.

    The comprehension's array result surfaces as an ``array_join`` string:
    the correctness gate canonicalizes rows via pandas sort/hash, which can't
    order raw list cells (catalog conventions, ``catalog/__init__.py``).
    Every element still flows through the comparison — join is lossless for
    a space-delimited word list."""
    import pyspark.sql.functions as F

    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (p:Part) RETURN p.p_partkey AS pk, "
        "[w IN split(p.p_name, ' ') WHERE size(w) > 4 | toUpper(w)] AS words "
        "ORDER BY pk"
    )
    return out.select("pk", F.array_join("words", " ").alias("words"))


@register(
    "write_merge_unwind_batch",
    """
    SELECT CAST(700 AS BIGINT) AS n_nodes, CAST(244650 AS BIGINT) AS ck_sum
    """,
)
def write_merge_unwind_batch(spark, sf_dir):
    """Batch MERGE through the façade: ``UNWIND $rows AS r MERGE (…)``
    with a 1,500-element parameter compiles to ONE set-based
    ``store.merge_nodes`` (distinct → left-anti → append) — no per-row
    driver round-trip. Two overlapping batches: 1,500 rows / 500 distinct
    keys insert 500; a second 500-row batch re-merging 300 of them plus
    200 new keys inserts exactly 200. Oracle = closed form: 700 nodes,
    Σck = Σ0..699 = 244650."""
    from ..cypher.session import Session
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark))
    rows = [{"ck": i % 500, "name": f"c{i % 500}"} for i in range(1500)]
    s.run("UNWIND $rows AS r MERGE (c:Cust {ck: r.ck, name: r.name})", {"rows": rows})
    rows2 = [{"ck": k, "name": f"c{k}"} for k in range(200, 700)]
    s.run("UNWIND $rows AS r MERGE (c:Cust {ck: r.ck, name: r.name})", {"rows": rows2})
    out = s.run("MATCH (c:Cust) RETURN count(*), sum(c.ck)")
    return out.select(
        F.col("`count(*)`").alias("n_nodes"),
        F.col("`sum(c.ck)`").cast("long").alias("ck_sum"),
    )


@register(
    "cypher_match_merge_rel",
    """
    SELECT CAST(15 AS BIGINT) AS n_routes, CAST(15 AS BIGINT) AS flagged
    """,
)
def cypher_match_merge_rel(spark, sf_dir):
    """``MATCH … MERGE (a)-[:T]->(b)`` write tail (r11 — VERDICT r10 task
    2): get-or-create an edge between two matched anchors, with ON
    CREATE/ON MATCH branches and idempotence on re-run. 3 left × 5 right
    anchors → 15 routes created on the first pass (all take the ON CREATE
    branch, flag 0), zero inserted on the second (all ON MATCH, flag 1 on
    every route — sum 15). Each statement is ONE ``store.merge_rels``
    left-anti batch, never a per-row loop (the reference's graph-building
    pattern, DatabaseIO.java:63)."""
    from ..cypher.session import Session
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark))
    s.run(
        "UNWIND $rows AS r MERGE (c:City {name: r.name, idx: r.idx})",
        {"rows": [{"name": f"city{i}", "idx": i} for i in range(8)]},
    )
    stmt = (
        "MATCH (a:City), (b:City) WHERE a.idx < 3 AND b.idx >= 3 "
        "MERGE (a)-[r:ROUTE]->(b) "
        "ON CREATE SET r.flag = 0 ON MATCH SET r.flag = 1"
    )
    s.run(stmt)
    s.run(stmt)
    out = s.run("MATCH (:City)-[r:ROUTE]->(:City) RETURN count(r), sum(r.flag)")
    return out.select(
        F.col("`count(r)`").cast("long").alias("n_routes"),
        F.col("`sum(r.flag)`").cast("long").alias("flagged"),
    )


@register(
    "cypher_merge_grow_pattern",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rels,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_hubs
    FROM nation
    """,
)
def cypher_merge_grow_pattern(spark, sf_dir):
    """Unbound-endpoint relationship MERGE (r11): ``MATCH (n:Nation)
    MERGE (n)-[:HAS_HUB]->(h:Hub {code: n.n_name})`` — atomic
    whole-pattern get-or-create per anchor row (one distinct-keys
    left-anti + one node append + one rel append per statement);
    re-running creates nothing."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    for _ in range(2):
        s.run("MATCH (n:Nation) MERGE (n)-[:HAS_HUB]->(h:Hub {code: n.n_name})")
    out = s.run(
        "MATCH (n:Nation)-[:HAS_HUB]->(h:Hub) "
        "RETURN count(*), count(DISTINCT h.code)"
    )
    return out.select(
        F.col("`count(*)`").cast("long").alias("n_rels"),
        F.col("`count(DISTINCT h.code)`").cast("long").alias("n_hubs"),
    )


@register(
    "write_merge_rel_batch",
    """
    SELECT CAST(30 AS BIGINT) AS n_routes
    """,
)
def write_merge_rel_batch(spark, sf_dir):
    """Batch relationship MERGE through the façade: UNWIND $rows MATCH
    endpoints by key, MERGE the edge — one ``store.merge_rels`` left-anti
    batch. 100 pairs with duplicates collapse to the 30 distinct routes —
    (i mod 10, i mod 6) has period lcm(10,6)=30 (closed form); re-running
    the same batch inserts nothing."""
    from ..cypher.session import Session
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark))
    s.run(
        "UNWIND $rows AS r MERGE (c:City {name: r.name})",
        {"rows": [{"name": f"city{i}"} for i in range(20)]},
    )
    pairs = [{"f": f"city{i % 10}", "t": f"city{10 + (i % 6)}"} for i in range(100)]
    for _ in range(2):  # idempotence: second pass inserts zero
        s.run(
            "UNWIND $rows AS r MATCH (a:City {name: r.f}), (b:City {name: r.t}) "
            "MERGE (a)-[:ROUTE]->(b)",
            {"rows": pairs},
        )
    out = s.run("MATCH (a:City)-[:ROUTE]->(b:City) RETURN count(*)")
    from pyspark.sql import functions as F

    return out.select(F.col("`count(*)`").alias("n_routes"))


@register(
    "cypher_consecutive_match",
    """
    SELECT n_name AS nation, r_name AS region,
           CAST(s_cnt AS BIGINT) AS suppliers
    FROM nation
    JOIN region ON r_regionkey = n_regionkey
    JOIN (SELECT s_nationkey, count(*) AS s_cnt
          FROM supplier GROUP BY s_nationkey) s ON s.s_nationkey = n_nationkey
    WHERE n_nationkey < 5
    ORDER BY nation
    """,
)
def cypher_consecutive_match(spark, sf_dir):
    """Consecutive plain MATCH clauses with no WITH between (r11): each
    later clause binds through the shared additional-match join — inner
    on shared variables, exactly the multi-MATCH pipeline shape."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) WHERE n.n_nationkey < 5 "
        "MATCH (n)-[:IN_REGION]->(r:Region) "
        "MATCH (sup:Supplier)-[:IN_NATION]->(n) "
        "RETURN n.n_name AS nation, r.r_name AS region, "
        "count(sup) AS suppliers ORDER BY nation"
    )


@register(
    "cypher_unwind_write_tail",
    """
    SELECT t, CAST(v AS BIGINT) AS v FROM (VALUES ('x', 1), ('y', 2)) AS q(t, v)
    ORDER BY t
    """,
)
def cypher_unwind_write_tail(spark, sf_dir):
    """Standalone-UNWIND write tails (r11): ``UNWIND [maps] AS r MERGE …``
    over a literal map list — struct-field access drives the set-based
    merge; idempotent on re-run."""
    from ..cypher.session import Session

    s = Session(spark)
    for _ in range(2):
        s.run("UNWIND [{t: 'x', v: 1}, {t: 'y', v: 2}] AS r MERGE (:UW {t: r.t, v: r.v})")
    return s.run("MATCH (n:UW) RETURN n.t AS t, n.v AS v ORDER BY t")


@register(
    "cypher_expr_call_subquery",
    """
    SELECT n_name AS name, CAST(n_nationkey * 2 AS BIGINT) AS dbl
    FROM nation ORDER BY name
    """,
)
def cypher_expr_call_subquery(spark, sf_dir):
    """Expression-only CALL subqueries (r11): ``CALL { WITH n RETURN
    <exprs> }`` with no inner MATCH is a pure per-row projection over
    the imports."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) CALL { WITH n RETURN n.n_nationkey * 2 AS dbl } "
        "RETURN n.n_name AS name, dbl ORDER BY name"
    )
    return out.select("name", F.col("dbl").cast("long").alias("dbl"))


@register(
    "cypher_foreach_range_readback",
    """
    SELECT CAST(5 AS BIGINT) AS n, CAST(55 AS BIGINT) AS sq_sum
    """,
)
def cypher_foreach_range_readback(spark, sf_dir):
    """FOREACH over an EXPRESSION list (r11 — VERDICT r10 task 8):
    ``FOREACH (i IN range(1, 5) | CREATE …)`` evaluates the list once
    through the unified compiler (driver-side bounded by definition) and
    iterates the write clause; readback aggregates the created nodes."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("FOREACH (i IN range(1, 5) | CREATE (:FSeq {n: i, sq: i * i}))")
    out = s.run("MATCH (x:FSeq) RETURN count(*), sum(x.sq)")
    return out.select(
        F.col("`count(*)`").cast("long").alias("n"),
        F.col("`sum(x.sq)`").cast("long").alias("sq_sum"),
    )


@register(
    "cypher_set_with_continue",
    """
    SELECT n_name AS name, CAST(n_nationkey * 2 AS BIGINT) AS score
    FROM nation WHERE n_nationkey * 2 >= 20 ORDER BY name
    """,
)
def cypher_set_with_continue(spark, sf_dir):
    """Write-then-continue pipeline (r11 — VERDICT r10 task 6): ``MATCH …
    SET … WITH … RETURN`` — the SET's read-your-writes overlay feeds the
    WITH stage (filter on the freshly-written value), one set-based
    property update + shared stage machinery, never a per-row loop."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) SET n.score = n.n_nationkey * 2 "
        "WITH n WHERE n.score >= 20 "
        "RETURN n.n_name AS name, n.score AS score ORDER BY name"
    )
    return out.select("name", F.col("score").cast("long").alias("score"))


@register(
    "cypher_duration_values",
    """
    SELECT CAST(2 AS BIGINT) AS d2_days,
           CAST(1 AS BIGINT) AS dt_days,
           CAST(2 AS BIGINT) AS dt_hours,
           'P1Y2M' AS ym,
           '1995-04-14' AS plus30,
           '1996-05-25' AS mixed_plus,
           CAST(6 AS BIGINT) AS btw_hours
    """,
)
def cypher_duration_values(spark, sf_dir):
    """Durations as first-class CLIENT values (r11 — VERDICT r10 task 5):
    ``RETURN duration({days: 2})`` collects (DayTimeIntervalType →
    timedelta; day-only casts to INTERVAL DAY so date arithmetic stays
    DATE-typed), month-only durations project as ISO-8601 text, mixed
    month+day stays arithmetic-capable, and ``duration.between`` returns
    the same collectable shape. Interval components extracted JVM-side
    for the hash gate."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN duration({days: 2}) AS d2, duration('P1DT2H30M') AS dt, "
        "duration('P1Y2M') AS ym, "
        "toString(date('1995-03-15') + duration('P30D')) AS plus30, "
        "toString(date('1995-03-15') + duration('P1Y2M10D')) AS mixed_plus, "
        "duration.between(datetime('2024-01-01 00:00:00'), "
        "datetime('2024-01-01 06:30:00')) AS btw"
    )
    return out.select(
        F.expr("extract(DAY FROM `d2`)").cast("long").alias("d2_days"),
        F.expr("extract(DAY FROM `dt`)").cast("long").alias("dt_days"),
        F.expr("extract(HOUR FROM `dt`)").cast("long").alias("dt_hours"),
        F.col("ym"),
        F.col("plus30"),
        F.col("mixed_plus"),
        F.expr("extract(HOUR FROM `btw`)").cast("long").alias("btw_hours"),
    )


@register(
    "cypher_temporal",
    """
    SELECT o_orderkey AS ok,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
           strftime(o_orderdate + INTERVAL 14 MONTH, '%Y-%m-%d') AS anniv,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy
    FROM orders ORDER BY ok
    """,
)
def cypher_temporal(spark, sf_dir):
    """Façade temporal surface (SURVEY §2.B.7 temporal row): ``date()``
    construction, ``+ duration('P…')`` arithmetic, and accessor functions
    inside one Cypher string — all compiled to JVM date arithmetic
    (``to_date``/``make_interval``), no Python in the row path."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (o:Order) RETURN o.o_orderkey AS ok, "
        "toString(date(o.o_orderdate) + duration('P30D')) AS due, "
        "toString(date(o.o_orderdate) + duration('P1Y2M')) AS anniv, "
        "year(o.o_orderdate) AS yr, month(o.o_orderdate) AS mo, "
        "day(o.o_orderdate) AS dy ORDER BY ok"
    )


@register(
    "cypher_reduce",
    """
    SELECT p_partkey AS pk,
           CAST(list_sum(list_transform(string_split(p_name, ' '),
                                        w -> length(w))) AS BIGINT) AS chars
    FROM part ORDER BY pk
    """,
)
def cypher_reduce(spark, sf_dir):
    """Façade ``reduce(acc = init, x IN list | expr)`` → ``F.aggregate``
    JVM fold; the merge expression resolves both the accumulator and the
    element through a scoped two-variable resolver."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (p:Part) RETURN p.p_partkey AS pk, "
        "reduce(acc = 0, w IN split(p.p_name, ' ') | acc + size(w)) AS chars "
        "ORDER BY pk"
    )


@register(
    "cypher_index_ddl",
    """
    SELECT * FROM (VALUES
      ('dog_name', 'ONLINE', 'RANGE', 'dog', 'name'),
      ('dog_age_text', 'ONLINE', 'TEXT', 'dog', 'age')
    ) AS t(name, state, type, label, prop) ORDER BY name
    """,
)
def cypher_index_ddl(spark, sf_dir):
    """Index DDL surface: CREATE [TEXT] INDEX … FOR (n:L) ON (n.p), then
    SHOW INDEXES introspection (storage/indexes.py — catalog metadata +
    dump-time row-group clustering as the physical index)."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name: 'Arne', age: 4})")
    s.run("CREATE INDEX dog_name FOR (n:dog) ON (n.name)")
    s.run("CREATE TEXT INDEX dog_age_text IF NOT EXISTS FOR (n:dog) ON (n.age)")
    out = s.run("SHOW INDEXES")
    return out.select(
        "name",
        "state",
        "type",
        F.element_at("labelsOrTypes", 1).alias("label"),
        F.element_at("properties", 1).alias("prop"),
    ).orderBy("name")


@register(
    "cypher_count_subquery",
    """
    SELECT n_name AS name,
           CAST((SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
              + (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
              AS BIGINT) AS members
    FROM nation ORDER BY name
    """,
)
def cypher_count_subquery(spark, sf_dir):
    """Façade ``COUNT { pattern }`` in RETURN position (openCypher 9
    count subquery): per-nation membership counted by a decorrelated
    groupBy + left join, zero for match-less anchors."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, "
        "COUNT { (n)<-[:IN_NATION]-() } AS members ORDER BY name"
    )


@register(
    "cypher_rel_alternation",
    """
    SELECT CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
           AS BIGINT) AS n
    """,
)
def cypher_rel_alternation(spark, sf_dir):
    """Relationship-type alternation ``-[:A|B]->`` through the façade:
    each Customer has one IN_NATION edge plus one PLACED edge per order,
    so the alternation count is |customer| + |orders|. The union routes
    through ``PropertyGraph.rels_by_type`` so each branch stays a pruned
    per-type scan."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run("MATCH (c:Customer)-[:IN_NATION|PLACED]->(x) RETURN count(*) AS n")


@register(
    "cypher_list_quantifiers",
    """
    WITH w AS (SELECT p_partkey AS pk,
                      string_split(p_name, ' ') AS ws
               FROM part)
    SELECT pk,
           CAST(len(list_filter(ws, x -> length(x) > 3)) = len(ws) AS BOOLEAN) AS all_long,
           CAST(len(list_filter(ws, x -> contains(x, 'a'))) > 0 AS BOOLEAN) AS any_a,
           CAST(len(list_filter(ws, x -> length(x) > 8)) = 0 AS BOOLEAN) AS none_huge,
           CAST(len(list_filter(ws, x -> starts_with(x, 's'))) = 1 AS BOOLEAN) AS one_s
    FROM w
    WHERE len(list_filter(ws, x -> contains(x, 'e'))) > 0
    ORDER BY pk
    """,
)
def cypher_list_quantifiers(spark, sf_dir):
    """Façade list quantifiers ``all/any/none/single(x IN list WHERE
    pred)`` in RETURN and WHERE position → JVM higher-order functions
    (forall / exists / ¬exists / filtered size) — no Python UDF, stays
    inside whole-stage codegen (SURVEY §2.B.7 predicate functions)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (p:Part) WHERE any(x IN split(p.p_name, ' ') WHERE x CONTAINS 'e') "
        "RETURN p.p_partkey AS pk, "
        "all(x IN split(p.p_name, ' ') WHERE size(x) > 3) AS all_long, "
        "any(x IN split(p.p_name, ' ') WHERE x CONTAINS 'a') AS any_a, "
        "none(x IN split(p.p_name, ' ') WHERE size(x) > 8) AS none_huge, "
        "single(x IN split(p.p_name, ' ') WHERE x STARTS WITH 's') AS one_s "
        "ORDER BY pk"
    )


@register(
    "cypher_pattern_comprehension",
    """
    SELECT n_name AS nation,
           COALESCE((SELECT string_agg(s_name, ',' ORDER BY s_name)
                     FROM supplier s
                     WHERE s.s_nationkey = n.n_nationkey
                       AND s.s_acctbal > 5000), '') AS rich_suppliers
    FROM nation n ORDER BY nation
    """,
)
def cypher_pattern_comprehension(spark, sf_dir):
    """Pattern comprehensions ``[(s:Supplier)-[:IN_NATION]->(n) WHERE
    pred | expr]`` in RETURN position: decorrelated to ONE pattern-match
    frame aggregated per anchor id (collect_list) and left-joined back —
    the same shape Catalyst rewrites correlated scalar subqueries into,
    never a per-row subquery. The array surfaces sorted (Cypher leaves
    comprehension order unspecified; a distributed engine must pin one)
    and joins to a string for the hash gate."""
    import pyspark.sql.functions as F

    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) RETURN n.n_name AS nation, "
        "[(s:Supplier)-[:IN_NATION]->(n) WHERE s.s_acctbal > 5000 | s.s_name] "
        "AS rich_suppliers ORDER BY nation"
    )
    return out.select(
        "nation", F.array_join("rich_suppliers", ",").alias("rich_suppliers")
    )


@register(
    "cypher_constraint_ddl",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'dog_name_uq', 'ONLINE', 'UNIQUENESS', 'NODE',
       'dog', 'name', CAST(2 AS BIGINT))
    ) AS t(id, name, state, type, entityType, label, prop, n_dogs)
    """,
)
def cypher_constraint_ddl(spark, sf_dir):
    """Constraint DDL surface: CREATE CONSTRAINT … REQUIRE n.p IS
    UNIQUE, SHOW CONSTRAINTS introspection, write-path enforcement
    (storage/constraints.py — distributed dup-count validation; the
    refused duplicate CREATE is part of the checked behavior)."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name: 'Arne'})")
    s.run("CREATE CONSTRAINT dog_name_uq FOR (n:dog) REQUIRE n.name IS UNIQUE")
    s.run("CREATE (b:dog {name: 'Bosse'})")
    try:
        s.run("CREATE (c:dog {name: 'Arne'})")
        raise AssertionError("unique constraint did not fire")
    except ValueError:
        pass
    n_dogs = s.run("MATCH (n:dog) RETURN count(*) AS n").collect()[0]["n"]
    out = s.run("SHOW CONSTRAINTS")
    return out.select(
        "id",
        "name",
        "state",
        "type",
        "entityType",
        F.element_at("labelsOrTypes", 1).alias("label"),
        F.element_at("properties", 1).alias("prop"),
        F.lit(n_dogs).cast("long").alias("n_dogs"),
    )


@register(
    "proc_schema_visualization",
    """
    SELECT * FROM (
      SELECT 'Nation' AS srcLabel, 'IN_REGION' AS relType, 'Region' AS dstLabel,
             CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n
      UNION ALL SELECT 'Customer', 'IN_NATION', 'Nation',
             CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
      UNION ALL SELECT 'Supplier', 'IN_NATION', 'Nation',
             CAST((SELECT COUNT(*) FROM supplier) AS BIGINT)
      UNION ALL SELECT 'Customer', 'PLACED', 'Order',
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
      UNION ALL SELECT 'Order', 'CONTAINS', 'Part',
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
      UNION ALL SELECT 'Part', 'SUPPLIED_BY', 'Supplier',
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    ) ORDER BY srcLabel, relType, dstLabel
    """,
)
def proc_schema_visualization(spark, sf_dir):
    """CALL db.schema.visualization through the façade: the schema graph
    as (srcLabel, relType, dstLabel, count) triples — two label joins +
    one groupBy over the rel frame (procedures/registry.py)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "CALL db.schema.visualization() YIELD srcLabel, relType, dstLabel, n"
    )
    return out.orderBy("srcLabel", "relType", "dstLabel")


@register(
    "proc_gds_graph_catalog",
    """
    SELECT 'memb_cat' AS graphName,
           CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
                AS BIGINT) AS nodeCount,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS relationshipCount,
           CAST(0 AS BIGINT) AS after_drop
    """,
)
def proc_gds_graph_catalog(spark, sf_dir):
    """gds.graph.project / list / drop lifecycle through the façade: a
    named label/type-filtered projection lands in the in-memory catalog
    as CACHED frames (endpoint-filtered rels, left-semi joins), lists
    its counts, and drop unpersists (procedures/registry.py)."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("memb_cat", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "CALL gds.graph.project('memb_cat', ['Customer', 'Nation'], ['IN_NATION']) "
        "YIELD graphName"
    )
    listed = s.run(
        "CALL gds.graph.list() YIELD graphName, nodeCount, relationshipCount"
    ).where(F.col("graphName") == "memb_cat")
    row = listed.collect()[0]
    s.run("CALL gds.graph.drop('memb_cat') YIELD graphName")
    remaining = (
        s.run("CALL gds.graph.list() YIELD graphName")
        .where(F.col("graphName") == "memb_cat")
        .count()
    )
    return local_df(spark, 
        [(row["graphName"], row["nodeCount"], row["relationshipCount"], remaining)],
        "graphName string, nodeCount long, relationshipCount long, after_drop long",
    )


@register(
    "proc_meta_introspection",
    """
    WITH pk AS (SELECT 14 AS n_keys)
    SELECT 'CONTAINS' AS first_type,
           CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
              + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
              + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM orders)
              AS BIGINT) AS node_count,
           CAST(6 AS BIGINT) AS label_count,
           CAST(5 AS BIGINT) AS type_count
    """,
)
def proc_meta_introspection(spark, sf_dir):
    """db.relationshipTypes + apoc.meta.stats through the façade — the
    schema introspection a reference user scripts against."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    first = (
        s.run("CALL db.relationshipTypes() YIELD relationshipType")
        .orderBy("relationshipType")
        .limit(1)
        .collect()[0]["relationshipType"]
    )
    stats = s.run(
        "CALL apoc.meta.stats() YIELD nodeCount, labelCount, relTypeCount"
    ).collect()[0]
    return local_df(spark, 
        [(first, stats["nodeCount"], stats["labelCount"], stats["relTypeCount"])],
        "first_type string, node_count long, label_count long, type_count long",
    )


@register(
    "cypher_exists_where_subquery",
    """
    SELECT n_name AS nation
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9000)
    ORDER BY nation
    """,
)
def cypher_exists_where_subquery(spark, sf_dir):
    """openCypher 9 existential subquery with inner WHERE:
    ``EXISTS { (s:Supplier)-[:IN_NATION]->(n) WHERE s.s_acctbal > 9000 }``
    — the inner predicate filters the pattern-match frame BEFORE the
    distinct semi-join (cypher/session.py:_pattern_filter)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) WHERE EXISTS { (s:Supplier)-[:IN_NATION]->(n) "
        "WHERE s.s_acctbal > 9000 } RETURN n.n_name AS nation ORDER BY nation"
    )
    return out


@register(
    "cypher_map_projection",
    """
    SELECT n_name AS name,
           '{"name":"' || n_name || '","key":' || CAST(n_nationkey AS VARCHAR)
             || '}' AS m
    FROM nation ORDER BY name
    """,
)
def cypher_map_projection(spark, sf_dir):
    """Map projection ``n {.prop, alias: expr}`` → a struct column
    (heterogeneous-safe), serialized to JSON for the hash gate."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, "
        "n {name: n.n_name, key: n.n_nationkey} AS m ORDER BY name"
    )
    return out.select("name", F.to_json("m").alias("m"))


@register(
    "cypher_path_binding",
    """
    WITH RECURSIVE p AS (
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS start_id,
             CAST(2000000000000 + n_nationkey AS BIGINT) AS end_id,
             [CAST(2000000000000 + n_nationkey AS BIGINT)] AS nodes, 0 AS hops
      FROM nation WHERE n_nationkey < 3
      UNION ALL
      SELECT p.start_id, e.dst, list_append(p.nodes, e.dst), p.hops + 1
      FROM p JOIN (
        SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS src,
               CAST(1000000000000 + n_regionkey AS BIGINT) AS dst FROM nation
      ) e ON e.src = p.end_id
      WHERE NOT list_contains(p.nodes, e.dst) AND p.hops < 2)
    SELECT start_id, end_id, CAST(hops AS BIGINT) AS len,
           array_to_string(nodes, '->') AS path_str
    FROM p WHERE hops >= 1
    ORDER BY start_id, end_id
    """,
)
def cypher_path_binding(spark, sf_dir):
    """General path binding ``MATCH p = (n:Nation)-[:IN_REGION*1..2]->(r)
    RETURN length(p), nodes(p)`` — every simple path via
    paths.enumerate_paths, with p/length(p)/nodes(p) accessor wiring."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH p = (n:Nation)-[:IN_REGION*1..2]->(x) "
        "WHERE n.n_nationkey < 3 "
        "RETURN n.id AS start_id, x.id AS end_id, length(p) AS len, nodes(p) AS ns "
        "ORDER BY start_id, end_id"
    )
    return out.select(
        "start_id",
        "end_id",
        "len",
        # nodes(p) yields entity STRUCTS since r11 — render the id chain
        F.concat_ws(
            "->", F.transform("ns", lambda x: x["id"].cast("string"))
        ).alias("path_str"),
    )


@register(
    "proc_dbms_components",
    """
    SELECT 'Neo4j Kernel' AS name, 'community' AS edition
    """,
)
def proc_dbms_components(spark, sf_dir):
    """CALL dbms.components() — the server-identity procedure every
    driver handshake logs (name/versions/edition)."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run("CALL dbms.components() YIELD name, edition")
    return out.select("name", "edition")


@register(
    "proc_export_json_roundtrip",
    """
    SELECT CAST((SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
                AS BIGINT) AS nodes,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS relationships
    """,
)
def proc_export_json_roundtrip(spark, sf_dir):
    """apoc.export.json.all: whole-subgraph JSONL export + re-read — the
    counts survive the round trip (sources/textdata.write_jsonl with
    explicit re-read schema, never inference)."""
    import tempfile

    from ..cypher.session import Session
    from ..graph import PropertyGraph
    from ..sources.textdata import read_jsonl
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    g = build_graph(spark, sf_dir)
    small = PropertyGraph(
        nodes=g.label_frames["Nation"].unionByName(
            g.label_frames["Region"], allowMissingColumns=True
        ),
        rels=g.type_frames["IN_REGION"],
    )
    s = Session(spark, store=GraphStore(spark, small))
    with tempfile.TemporaryDirectory() as tmp:
        s.run(f"CALL apoc.export.json.all('{tmp}/out') YIELD file, nodes, relationships")
        nodes = read_jsonl(spark, f"{tmp}/out/nodes", small.nodes.schema).count()
        rels = read_jsonl(spark, f"{tmp}/out/rels", small.rels.schema).count()
    return local_df(spark, 
        [(nodes, rels)], "nodes long, relationships long"
    )


@register(
    "proc_apoc_cypher_run",
    """
    SELECT n_name AS name, CAST(COUNT(*) AS BIGINT) AS customers
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE c_acctbal > 1000.0
    GROUP BY n_name ORDER BY customers DESC, name LIMIT 5
    """,
)
def proc_apoc_cypher_run(spark, sf_dir):
    """``CALL apoc.cypher.run(...)`` through the façade: the dynamically
    passed statement (with a $minbal parameter rendered by the session's
    Bolt parameter convention) runs against the same graph and returns
    its native columns."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "CALL apoc.cypher.run('MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
        "WHERE c.c_acctbal > $minbal RETURN n.n_name AS name, "
        "count(*) AS customers ORDER BY customers DESC, name LIMIT 5', "
        "{minbal: 1000.0}) YIELD name, customers RETURN name, customers"
    )


@register(
    "proc_export_graphml_lines",
    """
    WITH n AS (SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS id,
                      'Region' AS lab, r_name AS name FROM region
               UNION ALL
               SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
                      'Nation', n_name FROM nation),
    e AS (SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS src,
                 CAST(1000000000000 + n_regionkey AS BIGINT) AS dst FROM nation)
    SELECT line FROM (
      SELECT '<?xml version="1.0" encoding="UTF-8"?>' AS line
      UNION ALL SELECT '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
      UNION ALL SELECT '<key id="labels" for="node" attr.name="labels" attr.type="string"/>'
      UNION ALL SELECT '<key id="label" for="edge" attr.name="label" attr.type="string"/>'
      UNION ALL SELECT '<key id="name" for="node" attr.name="name" attr.type="string"/>'
      UNION ALL SELECT '<graph id="G" edgedefault="directed">'
      UNION ALL
      SELECT '<node id="n' || id || '"><data key="labels">:' || lab
             || '</data><data key="name">' || name || '</data></node>' FROM n
      UNION ALL
      SELECT '<edge source="n' || src || '" target="n' || dst
             || '"><data key="label">IN_REGION</data></edge>' FROM e
      UNION ALL SELECT '</graph>'
      UNION ALL SELECT '</graphml>'
    ) ORDER BY line
    """,
)
def proc_export_graphml_lines(spark, sf_dir):
    """apoc.export.graphml line set for the Nation/Region subgraph — the
    exporter's exact document lines (header keys, APOC :Label convention,
    one self-contained element per line). TPC-H names contain no XML
    specials, so the oracle skips the escape chain the exporter applies;
    the escape path is pytest-covered."""
    from ..sources.graphml import graph_to_graphml
    from ..sources.tpch import build_graph

    g = build_graph(spark, sf_dir)
    lo_r, lo_n = 1_000_000_000_000, 2_000_000_000_000
    nodes = (
        g.nodes.where(
            F.array_contains("labels", "Region") | F.array_contains("labels", "Nation")
        )
        .select(
            "id",
            "labels",
            F.coalesce(F.col("r_name"), F.col("n_name")).alias("name"),
        )
    )
    rels = g.rels.where(F.col("type") == "IN_REGION").select("src", "dst", "type")
    return graph_to_graphml(nodes, rels).select("line").orderBy("line")


# Shared query-vector literal for the vector-index row: exact /16
# binary fractions so the Cypher literal and the SQL literal are the
# same doubles.
_VQ_VALS = [((i * 37) % 19 - 9) / 16.0 for i in range(64)]
_VQ_LIST = "[" + ", ".join(repr(v) for v in _VQ_VALS) + "]"


@register(
    "proc_vector_index_query",
    f"""
    WITH q AS (SELECT {_VQ_LIST}::DOUBLE[] AS qv)
    SELECT c.vec_id AS node,
      list_reduce(list_prepend(0.0,
        list_transform(range(1, 65), i -> qv[i] * c.embedding[i]::DOUBLE)),
        (a, x) -> a + x)
      / greatest(
          sqrt(list_reduce(list_prepend(0.0,
            list_transform(range(1, 65), i -> qv[i] * qv[i])), (a, x) -> a + x))
        * sqrt(list_reduce(list_prepend(0.0,
            list_transform(range(1, 65),
              i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
            (a, x) -> a + x)),
          1e-12) AS score
    FROM embeddings c, q ORDER BY score DESC, node LIMIT 5
    """,
)
def proc_vector_index_query(spark, sf_dir):
    """CREATE VECTOR INDEX → db.index.vector.queryNodes through the
    façade: the DDL trains an IVF coarse quantizer (KMeans codebook +
    inverted file) and the query probes it by INDEX NAME. nprobe = cells
    here, so the probe is provably exact and the brute-force cosine
    oracle applies regardless of how KMeans clusters — the
    approximate-nprobe path is pytest-graded (recall + subset property)."""
    from ..cypher.session import Session
    from ..graph import PropertyGraph
    from ..storage.store import GraphStore

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nodes = emb.select(
        F.col("vec_id").alias("id"), F.array(F.lit("Vec")).alias("labels"), "embedding"
    )
    rels = local_df(spark, [], "id long, src long, dst long, type string")
    s = Session(spark, store=GraphStore(spark, PropertyGraph(nodes=nodes, rels=rels)))
    s.run(
        "CREATE VECTOR INDEX embidx FOR (n:Vec) ON (n.embedding) "
        "OPTIONS {dimensions: 64, similarity: 'cosine', cells: 8, nprobe: 8}"
    )
    return s.run(
        f"CALL db.index.vector.queryNodes('embidx', 5, {_VQ_LIST}) "
        "YIELD node, score RETURN node, score"
    )


@register(
    "proc_apoc_refactor_rename",
    """
    SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS nations
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name ORDER BY region
    """,
)
def proc_apoc_refactor_rename(spark, sf_dir):
    """apoc.refactor.rename.label + rename.type through the façade: the
    Nation/Region subgraph is renamed to Country/LOCATED_IN in place, and
    the readback MATCH uses ONLY the new names — proving the rewrite hit
    every node/relationship (the oracle is the same rollup from the base
    tables, name-agnostic)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    g = build_graph(spark, sf_dir)
    s = Session(spark, store=GraphStore(spark, g))
    n_ren = s.run(
        "CALL apoc.refactor.rename.label('Nation', 'Country') YIELD total RETURN total"
    ).collect()[0].total
    r_ren = s.run(
        "CALL apoc.refactor.rename.type('IN_REGION', 'LOCATED_IN') YIELD total RETURN total"
    ).collect()[0].total
    assert n_ren > 0 and r_ren > 0
    return s.run(
        "MATCH (c:Country)-[:LOCATED_IN]->(r:Region) "
        "RETURN r.r_name AS region, count(*) AS nations ORDER BY region"
    )


@register(
    "proc_apoc_create_merge",
    """
    SELECT 'w1' AS name, CAST(1 AS BIGINT) AS sku, 'gadget' AS kind
    UNION ALL SELECT 'w2', 2, 'widget'
    ORDER BY sku
    """,
)
def proc_apoc_create_merge(spark, sf_dir):
    """apoc.create.node / apoc.merge.node / apoc.create.relationship
    through the façade: dynamic-label creation, a MERGE that must NOT
    duplicate (its onCreateProps are proven unapplied on match), a
    dynamically-typed relationship, then a readback through ordinary
    MATCH. Literal oracle — the row grades the write path's end state."""
    from ..cypher.session import Session

    s = Session(spark)
    a = s.run(
        "CALL apoc.create.node(['Widget', 'Item'], {name: 'w1', sku: 1, kind: 'gadget'}) "
        "YIELD id RETURN id"
    ).collect()[0].id
    s.run(
        "CALL apoc.merge.node(['Widget'], {sku: 2}, {name: 'w2', kind: 'widget'}) "
        "YIELD id RETURN id"
    )
    # second merge on the same key: must match, not create — and must NOT
    # re-apply onCreateProps
    s.run(
        "CALL apoc.merge.node(['Widget'], {sku: 2}, {name: 'CLOBBERED', kind: 'CLOBBERED'}) "
        "YIELD id RETURN id"
    )
    b = s.run("MATCH (w:Widget {sku: 2}) RETURN w.sku AS k").collect()
    assert len(b) == 1
    s.run(
        f"CALL apoc.create.relationship({a}, 'VARIANT_OF', {{since: 2024}}, {a}) "
        "YIELD id RETURN id"
    )
    return s.run(
        "MATCH (w:Widget) RETURN w.name AS name, w.sku AS sku, w.kind AS kind "
        "ORDER BY sku"
    )


@register(
    "cypher_hostile_expression",
    """
    SELECT c_name AS name,
           CAST(list_reduce(list_prepend(0, list_transform(
               list_filter(range(1, len(c_mktsegment) + 1), x -> x % 2 = 0),
               x -> CASE WHEN x > 4 THEN x * 2 ELSE -x END)),
             (acc, s) -> acc + s) AS BIGINT) AS folded,
           (list_transform(string_split(c_name, '#'),
               w -> CASE len(w) WHEN 8 THEN upper(w) ELSE w || '!' END))[1]
             AS first_tok
    FROM customer ORDER BY name
    """,
)
def cypher_hostile_expression(spark, sf_dir):
    """Hostile nesting through the unified expression compiler
    (cypher/exprs.py, the r8-verdict Pratt-parser milestone): a searched
    CASE inside a filtered list comprehension inside a reduce fold, plus
    a simple-form CASE with string concatenation inside a second
    comprehension consumed through postfix subscription — every construct
    in a position the old per-shape ladder could not dispatch. One
    façade statement, compiled to pure built-in higher-order Column
    expressions (no UDFs), replayed exactly in DuckDB lambdas."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) RETURN c.c_name AS name, "
        "reduce(acc = 0, s IN [x IN range(1, size(c.c_mktsegment)) "
        "WHERE x % 2 = 0 | CASE WHEN x > 4 THEN x * 2 ELSE -x END] "
        "| acc + s) AS folded, "
        "[w IN split(c.c_name, '#') | CASE size(w) WHEN 8 THEN toUpper(w) "
        "ELSE w + '!' END][0] AS first_tok "
        "ORDER BY name"
    )


@register(
    "cypher_collect_subquery",
    """
    SELECT n_name AS nation,
           COALESCE(array_to_string(
             list_sort(list(c_name) FILTER (c_acctbal > 9900.0)), ','),
             '') AS rich,
           CAST(COUNT(*) FILTER (c_acctbal > 9900.0) AS BIGINT) AS n_rich
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY nation
    """,
)
def cypher_collect_subquery(spark, sf_dir):
    """Cypher 5 ``COLLECT { MATCH … WHERE … RETURN … }`` subquery in
    RETURN position (r9): decorrelated to one pattern-match frame
    aggregated on the anchor ids (collect_list, sorted) and left-joined
    back — never a per-row subquery. The same COLLECT nested inside
    size() exercises expression-position rewriting."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation) RETURN n.n_name AS nation, "
        "COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
        "WHERE c.c_acctbal > 9900.0 RETURN c.c_name } AS rich, "
        "size(COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
        "WHERE c.c_acctbal > 9900.0 RETURN c.c_name }) AS n_rich "
        "ORDER BY nation"
    )
    # CSV-render the collected array (the driver's hash compare needs
    # scalar cells — the catalog's sorted-CSV convention)
    return out.select(
        "nation", F.concat_ws(",", F.col("rich")).alias("rich"), "n_rich"
    )


@register(
    "source_orc_roundtrip",
    """
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE l_returnflag <> 'N'
    GROUP BY l_returnflag ORDER BY flag
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC sink → source roundtrip (Spark's built-in columnar sibling of
    parquet): lineitem written PARTITIONED BY l_returnflag, read back
    with a partition filter — the filter prunes to the matching
    directories at plan time (partition pruning, not a full scan), and
    the aggregate must match the parquet original. Scale posture: at
    100 TB the pruned read touches only the selected partitions."""
    import tempfile

    li = load_tables(spark, sf_dir)["lineitem"]
    with tempfile.TemporaryDirectory() as tmp:
        li.select("l_returnflag", "l_quantity").write.partitionBy(
            "l_returnflag"
        ).orc(f"{tmp}/li")
        back = spark.read.orc(f"{tmp}/li").where(F.col("l_returnflag") != "N")
        out = (
            back.groupBy(F.col("l_returnflag").alias("flag"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            )
            .orderBy("flag")
            .localCheckpoint(eager=True)  # materialize before tmp vanishes
        )
    return out


@register(
    "graphql_where_filters",
    """
    SELECT n_name AS name,
           COALESCE(STRING_AGG(c_name, ',' ORDER BY c_name)
             FILTER (c_acctbal >= 9000.0 AND c_mktsegment = 'BUILDING'), '')
             AS rich_name
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    WHERE n_name LIKE '%1%' AND n_name >= 'NATION_12'
    GROUP BY n_name ORDER BY name
    """,
)
def graphql_where_filters(spark, sf_dir):
    """neo4j-graphql ``where:`` input objects + field aliases (r9):
    operator-suffixed filter fields at the root (``name_contains``) and
    on a nested to-many selection (``acctbal_gte`` + plain equality),
    with the nested field renamed through a GraphQL alias — every where
    term compiles to one Catalyst filter pushed below the join."""
    from ..graphql import tpch_engine
    from ..sources.tpch import build_graph

    eng = tpch_engine(build_graph(spark, sf_dir))
    return eng.execute(
        '{ nation(where: {name_contains: "1", name_gte: "NATION_12"}) '
        '{ name rich: customers(where: {acctbal_gte: 9000.0, '
        'mktsegment: "BUILDING"}) { name } } }'
    ).orderBy("name")


@register(
    "source_xml_roundtrip",
    """
    SELECT n_name AS name,
           CAST(n_nationkey AS BIGINT) AS key,
           n_name || '&<>"x' AS decorated
    FROM nation ORDER BY key
    """,
)
def source_xml_roundtrip(spark, sf_dir):
    """XML sink → apoc.load.xml source roundtrip (sources/xmldata.py):
    nation rows serialized as one attribute-record element per line —
    including a column holding every XML metacharacter, escaped on write
    and entity-decoded by the JVM xpath engine on read — must come back
    value-identical. Extraction is xpath_string/xpath_boolean columns
    over a distributed text read; no Python XML parsing."""
    import tempfile

    from ..sources.xmldata import load_xml, write_xml_lines

    n = load_tables(spark, sf_dir)["nation"]
    dec = F.concat(F.col("n_name"), F.lit('&<>"x'))
    with tempfile.TemporaryDirectory() as tmp:
        write_xml_lines(
            n.select(
                F.col("n_name"),
                F.col("n_nationkey").cast("string").alias("nk"),
                dec.alias("dec"),
            ),
            f"{tmp}/nx",
            element="nation",
            attrs={"name": "n_name", "key": "nk", "decorated": "dec"},
        )
        back = load_xml(spark, f"{tmp}/nx", "nation", ["name", "key", "decorated"])
        out = (
            back.select(
                F.col("name"),
                F.col("key").cast("long").alias("key"),
                F.col("decorated"),
            )
            .orderBy("key")
            .localCheckpoint(eager=True)  # materialize before tmp vanishes
        )
    return out


@register(
    "cypher_set_expression_readback",
    """
    SELECT CASE WHEN c_acctbal >= 5000.0 THEN 'hi' ELSE 'lo' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents_sum
    FROM customer GROUP BY tier ORDER BY tier
    """,
)
def cypher_set_expression_readback(spark, sf_dir):
    """Expression-valued SET (r9): per-node computed writes — arithmetic
    over the node's own property and a CASE tier — flow through ONE
    joined conditional column update (store.set_props_from_frame), then
    read back through ordinary MATCH aggregation. The oracle recomputes
    both expressions relationally; decimal-exact sum so the hash is
    partition-order independent."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "MATCH (c:Customer) SET c.cents = toInteger(round(c.c_acctbal * 100)), "
        "c.tier = CASE WHEN c.c_acctbal >= 5000.0 THEN 'hi' ELSE 'lo' END"
    )
    return s.run(
        "MATCH (c:Customer) RETURN c.tier AS tier, count(*) AS n, "
        "sum(c.cents) AS cents_sum ORDER BY tier"
    )


@register(
    "proc_show_functions",
    """
    SELECT 'apoc.text.capitalize' AS name, 'apoc' AS category
    UNION ALL SELECT 'apoc.text.charAt', 'apoc'
    UNION ALL SELECT 'apoc.text.clean', 'apoc'
    UNION ALL SELECT 'apoc.text.hammingDistance', 'apoc'
    UNION ALL SELECT 'apoc.text.indexOf', 'apoc'
    UNION ALL SELECT 'apoc.text.join', 'apoc'
    UNION ALL SELECT 'apoc.text.levenshteinDistance', 'apoc'
    UNION ALL SELECT 'apoc.text.levenshteinSimilarity', 'apoc'
    UNION ALL SELECT 'apoc.text.phonetic', 'apoc'
    UNION ALL SELECT 'apoc.text.repeat', 'apoc'
    UNION ALL SELECT 'apoc.text.swapCase', 'apoc'
    UNION ALL SELECT 'apoc.text.format', 'apoc'
    UNION ALL SELECT 'apoc.text.split', 'apoc'
    UNION ALL SELECT 'apoc.text.regexGroups', 'apoc'
    UNION ALL SELECT 'apoc.text.urlencode', 'apoc'
    UNION ALL SELECT 'apoc.text.urldecode', 'apoc'
    UNION ALL SELECT 'apoc.text.base64Encode', 'apoc'
    UNION ALL SELECT 'apoc.text.base64Decode', 'apoc'
    UNION ALL SELECT 'apoc.text.lpad', 'apoc'
    UNION ALL SELECT 'apoc.text.rpad', 'apoc'
    UNION ALL SELECT 'apoc.text.snakeCase', 'apoc'
    UNION ALL SELECT 'apoc.text.camelCase', 'apoc'
    UNION ALL SELECT 'apoc.text.upperCamelCase', 'apoc'
    UNION ALL SELECT 'apoc.text.slug', 'apoc'
    UNION ALL SELECT 'apoc.text.sorensenDiceSimilarity', 'apoc'
    UNION ALL SELECT 'apoc.text.fuzzyMatch', 'apoc'
    UNION ALL SELECT 'apoc.text.distance', 'apoc'
    UNION ALL SELECT 'apoc.text.compareCleaned', 'apoc'
    UNION ALL SELECT 'apoc.text.replace', 'apoc'
    UNION ALL SELECT 'apoc.text.regreplace', 'apoc'
    UNION ALL SELECT 'apoc.text.byteCount', 'apoc'
    UNION ALL SELECT 'gds.similarity.cosine', 'gds'
    UNION ALL SELECT 'gds.similarity.euclidean', 'gds'
    UNION ALL SELECT 'gds.similarity.euclideanDistance', 'gds'
    UNION ALL SELECT 'gds.similarity.jaccard', 'gds'
    UNION ALL SELECT 'gds.similarity.overlap', 'gds'
    UNION ALL SELECT 'gds.similarity.pearson', 'gds'
    ORDER BY name
    """,
)
def proc_show_functions(spark, sf_dir):
    """SHOW FUNCTIONS (r9) through the façade — the registered
    RETURN-position scalar-function surface, pinned here for the
    apoc.text.* and gds.similarity.* namespaces (the full registry also
    carries apoc.coll/map/date/agg/util + genai; the oracle pins the two
    namespaces whose membership the suites grade)."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run("SHOW FUNCTIONS")
    return out.where(
        F.col("name").startswith("apoc.text.")
        | F.col("name").startswith("gds.similarity.")
    ).orderBy("name")


@register(
    "cypher_label_set_readback",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_debtors,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_acctbal < 0.0
    """,
)
def cypher_label_set_readback(spark, sf_dir):
    """``SET n:Label`` (r9) read back through a label scan: the negative-
    balance customers gain :Debtor via ONE conditional labels-array
    update, then MATCH (:Debtor) must see exactly that set. The oracle
    recomputes membership relationally."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("MATCH (c:Customer) WHERE c.c_acctbal < 0.0 SET c:Debtor")
    return s.run(
        "MATCH (d:Debtor) RETURN count(*) AS n_debtors, "
        "sum(d.c_custkey) AS key_sum"
    )


@register(
    "cypher_standalone_with",
    """
    WITH RECURSIVE seq(x) AS (
      SELECT 1 UNION ALL SELECT x + 1 FROM seq WHERE x < 20
    )
    SELECT CAST(SUM(x * x) AS BIGINT) AS sq_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE x % 2 = 0
    """,
)
def cypher_standalone_with(spark, sf_dir):
    """Standalone WITH pipeline (r9): no pattern anchor — a literal list
    through UNWIND, a WHERE-filtered rebinding stage, and a terminal
    aggregate, all through the façade's stage machinery."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "WITH range(1, 20) AS l UNWIND l AS x "
        "WITH x WHERE x % 2 = 0 "
        "RETURN sum(x * x) AS sq_sum, count(*) AS n"
    )


@register(
    "cypher_nested_aggregates",
    """
    SELECT c_mktsegment AS seg,
           CAST(COUNT(*) + 1 AS BIGINT) AS n1,
           CAST(MAX(c_custkey) - MIN(c_custkey) AS BIGINT) AS key_spread,
           MIN(c_name) AS first_name
    FROM customer GROUP BY c_mktsegment ORDER BY seg
    """,
)
def cypher_nested_aggregates(spark, sf_dir):
    """Aggregates nested inside expressions (r9): count(*)+1, a
    difference of two aggregates, and head(collect(sorted)) — each inner
    aggregate lifts to a temp alias, the outer arithmetic compiles in
    one post-aggregation select (no extra shuffle)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) RETURN c.c_mktsegment AS seg, "
        "count(*) + 1 AS n1, max(c.c_custkey) - min(c.c_custkey) AS key_spread, "
        "head(collect(c.c_name)) AS first_name ORDER BY seg"
    )


def _entity_props_csv(col):
    """Entity struct's properties map → deterministic 'k=v;…' CSV, keys
    sorted (the driver's hash gate can't take map cells)."""
    m = col["properties"]
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(m)),
            # properties are VARIANT-typed since r11; cast renders the
            # same text the r10 stringified map produced
            lambda k: F.concat(k, F.lit("="), F.element_at(m, k).cast("string")),
        ),
        ";",
    )


@register(
    "cypher_return_entity",
    """
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS n_id,
           'Nation' AS n_labels,
           'n_name=' || n_name || ';n_nationkey=' || CAST(n_nationkey AS VARCHAR)
             AS n_props,
           CAST(10000000000000 + n_nationkey AS BIGINT) AS r_id,
           'IN_REGION' AS r_type,
           CAST(2000000000000 + n_nationkey AS BIGINT) AS r_start,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS r_end,
           '' AS r_props,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS m_id,
           'Region' AS m_labels,
           'r_name=' || r_name || ';r_regionkey=' || CAST(r_regionkey AS VARCHAR)
             AS m_props
    FROM nation JOIN region ON r_regionkey = n_regionkey
    ORDER BY n_id
    """,
)
def cypher_return_entity(spark, sf_dir):
    """``RETURN n, r, m`` serializes full entities (r10 — SURVEY §1.2:
    NODE = struct(id, labels, properties), RELATIONSHIP adds type/start/
    end; DatabaseIO.java:127-128 materializes records, not bare ids).
    Flattened to scalar columns for the hash gate; ORDER BY n is entity
    id order."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation)-[r:IN_REGION]->(m:Region) RETURN n, r, m ORDER BY n"
    )
    n, r, m = F.col("n"), F.col("r"), F.col("m")
    return out.select(
        n["id"].alias("n_id"),
        F.array_join(n["labels"], ",").alias("n_labels"),
        _entity_props_csv(n).alias("n_props"),
        r["id"].alias("r_id"),
        r["type"].alias("r_type"),
        r["start"].alias("r_start"),
        r["end"].alias("r_end"),
        _entity_props_csv(r).alias("r_props"),
        m["id"].alias("m_id"),
        F.array_join(m["labels"], ",").alias("m_labels"),
        _entity_props_csv(m).alias("m_props"),
    )


@register(
    "cypher_collect_entities",
    """
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS m_id,
           'Region' AS m_labels,
           CAST(COUNT(*) AS BIGINT) AS c,
           string_agg(CAST(2000000000000 + n_nationkey AS VARCHAR) || ':' || n_name,
                      ';' ORDER BY n_nationkey) AS ns
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_regionkey ORDER BY m_id
    """,
)
def cypher_collect_entities(spark, sf_dir):
    """Entity grouping key + entity-aware collect (r10): ``RETURN m,
    collect(n)`` groups by the entity id (any_value-carried dependents,
    never a map-typed groupBy key) and collects id-sorted entity
    structs."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH (n:Nation)-[:IN_REGION]->(m:Region) "
        "RETURN m, collect(n) AS ns, count(*) AS c ORDER BY m"
    )
    m = F.col("m")
    return out.select(
        m["id"].alias("m_id"),
        F.array_join(m["labels"], ",").alias("m_labels"),
        F.col("c"),
        F.array_join(
            F.transform(
                F.col("ns"),
                lambda x: F.concat(
                    x["id"].cast("string"),
                    F.lit(":"),
                    F.element_at(x["properties"], F.lit("n_name")).cast("string"),
                ),
            ),
            ";",
        ).alias("ns"),
    )


@register(
    "cypher_path_entities",
    """
    SELECT n_nationkey AS nk,
           CAST(1 AS BIGINT) AS len,
           CAST(2000000000000 + n_nationkey AS VARCHAR) || ';'
             || CAST(10000000000000 + n_nationkey AS VARCHAR) || ';'
             || CAST(1000000000000 + n_regionkey AS VARCHAR) AS path_ids,
           'Nation;IN_REGION;Region' AS path_kinds,
           n_name AS nation,
           'IN_REGION' AS rel_types
    FROM nation ORDER BY nk
    """,
)
def cypher_path_entities(spark, sf_dir):
    """Entity paths (r11 — VERDICT r10 task 3): ``RETURN p`` yields the
    alternating node/rel entity list (SURVEY §1.2 PATH; Bolt Path
    contract DatabaseIO.java:127-128), ``nodes(p)``/``relationships(p)``
    yield entity structs, and ``[x IN nodes(p) | x.n_name]`` resolves
    through the scoped entity accessor. Flattened to scalar columns for
    the hash gate."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    out = s.run(
        "MATCH p = (n:Nation)-[:IN_REGION*1..1]->(m:Region) "
        "RETURN p, nodes(p) AS ns, relationships(p) AS rs, "
        "[x IN nodes(p) | x.n_name] AS nnames, "
        "length(p) AS len, n.n_nationkey AS nk"
    )
    return out.select(
        F.col("nk"),
        F.col("len").cast("long").alias("len"),
        F.array_join(
            F.transform("p", lambda e: e["id"].cast("string")), ";"
        ).alias("path_ids"),
        F.array_join(
            F.transform(
                "p",
                lambda e: F.coalesce(e["type"], F.array_join(e["labels"], "+")),
            ),
            ";",
        ).alias("path_kinds"),
        F.concat_ws(";", "nnames").alias("nation"),
        F.array_join(F.transform("rs", lambda r: r["type"]), ";").alias(
            "rel_types"
        ),
    ).orderBy("nk")


@register(
    "cypher_stdev_percentile",
    """
    WITH s AS (
      SELECT o_orderstatus AS status,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6))
                      * CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE) AS sx2,
             COUNT(*) AS n,
             list_sort(list(o_totalprice)) AS arr
      FROM orders GROUP BY o_orderstatus)
    SELECT status,
           SQRT(GREATEST((sx2 - sx*sx/n)/(n-1), 0)) AS sd,
           SQRT(GREATEST((sx2 - sx*sx/n)/n, 0)) AS sdp,
           arr[CAST(FLOOR((n-1)*0.5) AS BIGINT)+1]
             + (COALESCE(arr[CAST(FLOOR((n-1)*0.5) AS BIGINT)+2],
                         arr[CAST(FLOOR((n-1)*0.5) AS BIGINT)+1])
                - arr[CAST(FLOOR((n-1)*0.5) AS BIGINT)+1])
               * ((n-1)*0.5 - FLOOR((n-1)*0.5)) AS pc,
           arr[CAST(GREATEST(CEIL(0.5*n), 1) AS BIGINT)] AS pd
    FROM s ORDER BY status
    """,
)
def cypher_stdev_percentile(spark, sf_dir):
    """stDev/stDevP/percentileCont/percentileDisc through Session.run
    (r10 — the façade aggregate compiler, not the DataFrame catalog):
    stDev* via exact DECIMAL sums (partition-order independent), the
    percentiles via in-group sorted arrays with the identical explicit
    interpolation formula on the DuckDB side."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (o:Order) RETURN o.o_orderstatus AS status, "
        "stDev(o.o_totalprice) AS sd, stDevP(o.o_totalprice) AS sdp, "
        "percentileCont(o.o_totalprice, 0.5) AS pc, "
        "percentileDisc(o.o_totalprice, 0.5) AS pd ORDER BY status"
    )


@register(
    "cypher_call_subquery_correlated",
    """
    SELECT n_name AS nation,
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE s.s_nationkey = n.n_nationkey) AS BIGINT) AS n_suppliers
    FROM nation n ORDER BY nation
    """,
)
def cypher_call_subquery_correlated(spark, sf_dir):
    """Correlated CALL { WITH n … } subquery (r10 — openCypher 9
    variable import): per-nation supplier count via an OPTIONAL inner
    match, decorrelated to one pattern bind + equi-join + per-outer-row
    aggregate (session.py:_apply_call_subquery_stage)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) CALL { WITH n OPTIONAL MATCH "
        "(n)<-[:IN_NATION]-(s:Supplier) RETURN count(s) AS n_suppliers } "
        "RETURN n.n_name AS nation, n_suppliers ORDER BY nation"
    )


@register(
    "cypher_expr_props_readback",
    """
    SELECT 'LAUNCH' AS name, '2024-06-01' AS d, CAST(6 AS BIGINT) AS n
    """,
)
def cypher_expr_props_readback(spark, sf_dir):
    """Expression-valued properties in a write pattern (r10): the values
    evaluate once through the unified compiler at write time and read
    back typed."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:Evt {name: toUpper('launch'), d: date('2024-06-01'), n: 2 * 3})")
    return s.run(
        "MATCH (e:Evt) RETURN e.name AS name, toString(e.d) AS d, e.n AS n"
    )


@register(
    "proc_gds_wcc_write_map",
    """
    SELECT n_name AS name,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS cc
    FROM nation ORDER BY name
    """,
)
def proc_gds_wcc_write_map(spark, sf_dir):
    """The canonical GDS config-map call shape (r12 — VERDICT r11 task 1):
    ``CALL gds.wcc.write('g', {writeProperty: 'cc'})`` — the convention
    every public GDS example uses for exactly the plugin namespace the
    reference declares (calver/coredb/neo4j-plugins.json:24-30). The CALL
    dispatcher unpacks a trailing map argument landing in a scalar
    parameter slot into the procedure's named parameters
    (procedures/registry.py:call); unknown keys raise the GDS
    "Unexpected configuration key" shape."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    _graphs_for(spark).pop("wwmg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('wwmg', ['Nation', 'Region'], ['IN_REGION'])")
    s.run("CALL gds.wcc.write('wwmg', {writeProperty: 'cc'})")
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, n.cc AS cc ORDER BY name"
    )


@register(
    "proc_gds_pagerank_stream_map",
    """
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS nodeId
    FROM region r
    ORDER BY (SELECT count(*) FROM nation n
              WHERE n.n_regionkey = r.r_regionkey) DESC, nodeId
    LIMIT 5
    """,
)
def proc_gds_pagerank_stream_map(spark, sf_dir):
    """``CALL gds.pageRank.stream('g', {maxIterations: 5})`` (r12): the
    config-map form drives the algorithm parameters. Scores are rank-
    compared, not value-compared (iterative float sums aren't oracle-
    hashable): in the Nation→Region star graph every region's score is
    monotone in its nation in-degree and strictly above any nation's, so
    the top-5 nodes by score are the regions ordered by in-degree."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    _graphs_for(spark).pop("prmg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('prmg', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.pageRank.stream('prmg', {maxIterations: 5}) "
        "YIELD nodeId, score "
        "RETURN nodeId ORDER BY score DESC, nodeId LIMIT 5"
    )


@register(
    "proc_gds_project_string",
    """
    SELECT 'strg1' AS graphName,
           CAST((SELECT count(*) FROM nation) AS BIGINT) AS nodeCount,
           CAST(0 AS BIGINT) AS relationshipCount
    UNION ALL
    SELECT 'strg2',
           CAST((SELECT count(*) FROM nation) AS BIGINT),
           CAST(0 AS BIGINT)
    ORDER BY graphName
    """,
)
def proc_gds_project_string(spark, sf_dir):
    """String label/type arguments to ``gds.graph.project`` (r12 — VERDICT
    r11 task 2): ``'Nation'`` coerces to ``['Nation']`` (it used to
    iterate PER-CHARACTER into a silent empty projection) and ``'*'`` is
    the no-filter wildcard; the string form projects the identical graph
    as the list form (both rows below agree)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    from ..procedures.registry import _graphs_for

    for g in ("strg1", "strg2"):  # idempotent under re-runs
        _graphs_for(spark).pop(g, None)
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('strg1', 'Nation', '*')")
    s.run("CALL gds.graph.project('strg2', ['Nation'], '*')")
    return s.run(
        "CALL gds.graph.list() YIELD graphName, nodeCount, relationshipCount "
        "WHERE graphName STARTS WITH 'strg' "
        "RETURN graphName, nodeCount, relationshipCount ORDER BY graphName"
    )


@register(
    "cypher_missing_prop_null",
    """
    SELECT CAST((SELECT count(*) FROM nation) AS BIGINT) AS n_all,
           CAST((SELECT count(*) FROM nation WHERE n_nationkey < 5) AS BIGINT)
             AS n_graded
    """,
)
def cypher_missing_prop_null(spark, sf_dir):
    """A property no write has ever introduced is NULL in every position —
    WHERE included (r12 — VERDICT r11 task 3; SURVEY §7.2 "n.missing →
    null, never error"). ``n.bogus IS NULL`` keeps all rows instead of
    raising AnalysisException; ``count(n.grade)`` counts the 5 nodes a
    partial SET actually wrote."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("MATCH (n:Nation) WHERE n.n_nationkey < 5 SET n.grade = 1")
    return s.run(
        "MATCH (n:Nation) WHERE n.bogus IS NULL "
        "RETURN count(*) AS n_all, count(n.grade) AS n_graded"
    )


@register(
    "cypher_postfix_accessors",
    """
    SELECT CAST(3 AS BIGINT) AS h, 1.5e0 AS px, CAST(2024 AS BIGINT) AS y,
           CAST(2 AS BIGINT) AS dow, CAST(7 AS BIGINT) AS ma
    """,
)
def cypher_postfix_accessors(spark, sf_dir):
    """Postfix property access on call expressions (r12 — VERDICT r11
    task 4): ``duration({…}).hours``, ``point({…}).x``,
    ``datetime(…).year``, ``date(…).dayOfWeek`` (ISO, Monday=1) and map-
    literal key access, all without a bound-alias detour (one postfix
    rule in the Pratt parser, cypher/exprs.py:postfix)."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN duration({days: 2, hours: 3}).hours AS h, "
        "point({x: 1.5, y: 2.5}).x AS px, "
        "datetime('2024-03-05T10:20:30').year AS y, "
        "date('2024-03-05').dayOfWeek AS dow, "
        "{a: 7}.a AS ma"
    )
    return out.select(
        F.col("h").cast("long"),
        F.col("px").cast("double"),
        F.col("y").cast("long"),
        F.col("dow").cast("long"),
        F.col("ma").cast("long"),
    )


@register(
    "cypher_merge_chain_pattern",
    """
    SELECT CAST(3 AS BIGINT) AS n_rels, CAST(2 AS BIGINT) AS n_pairs
    """,
)
def cypher_merge_chain_pattern(spark, sf_dir):
    """Multi-relationship MERGE chain (r12 — VERDICT r11 task 6):
    ``MATCH … MERGE (a)-[:ROAD]->(b)-[:ROAD]->(c)`` is whole-pattern
    atomic — with a→b pre-existing but b→c missing, the first MERGE
    creates BOTH a fresh a→b and b→c (3 rels over 2 distinct pairs, the
    openCypher contract); the second MERGE matches the whole chain and
    creates nothing (idempotence)."""
    from ..cypher.session import Session
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark))
    s.run(
        "UNWIND $rows AS r MERGE (c:City {name: r.name, idx: r.idx})",
        {"rows": [{"name": f"city{i}", "idx": i} for i in range(3)]},
    )
    s.run("MATCH (a:City {idx: 0}), (b:City {idx: 1}) CREATE (a)-[:ROAD]->(b)")
    chain = (
        "MATCH (a:City {idx: 0}), (b:City {idx: 1}), (c:City {idx: 2}) "
        "MERGE (a)-[:ROAD]->(b)-[:ROAD]->(c)"
    )
    s.run(chain)
    s.run(chain)
    out = s.run(
        "MATCH (x:City)-[r:ROAD]->(y:City) "
        "RETURN count(r), count(DISTINCT x.idx * 10 + y.idx)"
    )
    return out.select(
        F.col("`count(r)`").cast("long").alias("n_rels"),
        F.col("`count(DISTINCT x.idx * 10 + y.idx)`").cast("long").alias("n_pairs"),
    )


@register(
    "proc_gds_undirected_degree",
    """
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS nodeId,
           CAST(1 AS DOUBLE) AS score
    FROM nation
    UNION ALL
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT),
           CAST((SELECT count(*) FROM nation n
                 WHERE n.n_regionkey = r.r_regionkey) AS DOUBLE)
    FROM region r
    ORDER BY nodeId
    """,
)
def proc_gds_undirected_degree(spark, sf_dir):
    """Relationship-projection map with per-type orientation (r12): the
    canonical ``{IN_REGION: {orientation: 'UNDIRECTED'}}`` form stores
    both directions at projection time (map-only, no shuffle —
    procedures/registry.py:_apply_orientation), so NATURAL degree over
    the undirected projection reads total degree: 1 per nation, the
    nation count per region."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("undg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "CALL gds.graph.project('undg', ['Nation', 'Region'], "
        "{IN_REGION: {orientation: 'UNDIRECTED'}})"
    )
    return s.run(
        "CALL gds.degree.stream('undg') YIELD nodeId, score "
        "RETURN nodeId, score ORDER BY nodeId"
    )


@register(
    "proc_gds_dijkstra_stream",
    """
    SELECT CAST(2000000000000 AS BIGINT) AS sourceNode,
           CAST(2000000000000 AS BIGINT) AS targetNode, 0.0e0 AS totalCost
    UNION ALL
    SELECT CAST(2000000000000 AS BIGINT),
           CAST(1000000000000 + (SELECT n_regionkey FROM nation
                                 WHERE n_nationkey = 0) AS BIGINT), 1.0e0
    UNION ALL
    SELECT CAST(2000000000000 AS BIGINT),
           CAST(2000000000000 + n_nationkey AS BIGINT), 2.0e0
    FROM nation
    WHERE n_regionkey = (SELECT n_regionkey FROM nation WHERE n_nationkey = 0)
      AND n_nationkey <> 0
    ORDER BY totalCost, targetNode
    """,
)
def proc_gds_dijkstra_stream(spark, sf_dir):
    """``CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: …})``
    (r12): config-map source, hop costs (no weight property — GDS's
    defaultValue:1) over an UNDIRECTED projection; from nation 0 the
    reachable set is itself (0), its region (1), and its sibling
    nations (2)."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("djkg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "CALL gds.graph.project('djkg', ['Nation', 'Region'], "
        "{IN_REGION: {orientation: 'UNDIRECTED'}})"
    )
    return s.run(
        "CALL gds.shortestPath.dijkstra.stream('djkg', {sourceNode: 2000000000000}) "
        "YIELD sourceNode, targetNode, totalCost "
        "RETURN sourceNode, targetNode, totalCost ORDER BY totalCost, targetNode"
    )


@register(
    "cypher_foreach_bound_set",
    """
    SELECT n_name AS name, n_nationkey > 12 AS flagged
    FROM nation ORDER BY name
    """,
)
def cypher_foreach_bound_set(spark, sf_dir):
    """FOREACH as a MATCH write tail (r12): the conditional-write idiom
    ``FOREACH (i IN CASE WHEN … THEN [1] ELSE [] END | SET …)`` — the
    list compiles per binding row, one posexplode + one max_by-collapsed
    conditional update (set-based, never a per-row loop)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "MATCH (n:Nation) FOREACH "
        "(i IN CASE WHEN n.n_nationkey > 12 THEN [1] ELSE [] END | SET n.flagged = i)"
    )
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, "
        "n.flagged IS NOT NULL AS flagged ORDER BY name"
    )


@register(
    "cypher_duration_between",
    """
    SELECT CAST(1 AS BIGINT) AS m, CAST(15 AS BIGINT) AS d,
           CAST(2 AS BIGINT) AS y, CAST(330 AS BIGINT) AS mi
    """,
)
def cypher_duration_between(spark, sf_dir):
    """duration.between(a, b) component accessors (r12): months = whole
    calendar months, days = the remainder after those months, minutes =
    total sub-day remainder — compiled from the ORIGINAL endpoints
    (months_between + timestamp_add), since calendar months aren't
    recoverable from a day-time difference."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN duration.between(date('2024-01-15'), date('2024-03-01')).months AS m, "
        "duration.between(date('2024-01-15'), date('2024-03-01')).days AS d, "
        "duration.between(date('2022-01-01'), date('2024-07-01')).years AS y, "
        "duration.between(datetime('2024-01-01T00:00:00'), "
        "datetime('2024-01-01T05:30:00')).minutes AS mi"
    )
    return out.select(
        F.col("m").cast("long"), F.col("d").cast("long"),
        F.col("y").cast("long"), F.col("mi").cast("long"),
    )


@register(
    "cypher_shortest_path_bound",
    """
    SELECT CAST(2 AS BIGINT) AS l, CAST(3 AS BIGINT) AS n
    """,
)
def cypher_shortest_path_bound(spark, sf_dir):
    """shortestPath over endpoints a PREVIOUS MATCH bound (r12):
    ``MATCH (a:…), (b:…) MATCH sp = shortestPath((a)-[*..4]-(b))`` —
    the BSP search runs once over the DISTINCT endpoint sets and joins
    back per binding row. Nations 1 and 2 share region 1 (fixed TPC-H
    nation table), so the undirected hop path is a→region→b: length 2,
    3 nodes."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (a:Nation {n_nationkey: 1}), (b:Nation {n_nationkey: 6}) "
        "MATCH sp = shortestPath((a)-[:IN_REGION*..4]-(b)) "
        "RETURN length(sp) AS l, size(nodes(sp)) AS n"
    )


@register(
    "cypher_exists_return",
    """
    SELECT n_name AS name,
           EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
             AS has_supp
    FROM nation n ORDER BY name
    """,
)
def cypher_exists_return(spark, sf_dir):
    """EXISTS { pattern } as a RETURN item (r12): per-binding boolean via
    the decorrelated pattern aggregate (one groupBy on the anchor ids +
    one left join — the same shape Catalyst rewrites scalar subqueries
    into); the WHERE position always supported it."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) RETURN n.n_name AS name, "
        "EXISTS { (n)<-[:IN_NATION]-(:Supplier) } AS has_supp ORDER BY name"
    )


@register(
    "fn_r12_additions",
    """
    SELECT 'x' AS l, 'y' AS rt, CAST(2 AS BIGINT) AS b, '2024-03-01' AS t,
           '{"k":1}' AS j
    """,
)
def fn_r12_additions(spark, sf_dir):
    """r12 probe-corpus function gaps: case-insensitive lookup
    (ltrim == lTrim), apoc.convert.toJson / fromJsonMap (typed map
    values via VARIANT), date.truncate → DATE."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN ltrim('  x') AS l, rtrim('y  ') AS rt, "
        "toInteger(apoc.convert.fromJsonMap('{\"b\": 2}').b) AS b, "
        "toString(date.truncate('month', date('2024-03-15'))) AS t, "
        "apoc.convert.toJson({k: 1}) AS j"
    )
    return out.select(
        F.col("l"), F.col("rt"), F.col("b").cast("long"), F.col("t"), F.col("j")
    )


@register(
    "cypher_with_star",
    """
    SELECT n_name AS name, CAST(n_nationkey * 2 AS BIGINT) AS dk
    FROM nation WHERE n_nationkey > 20 ORDER BY name
    """,
)
def cypher_with_star(spark, sf_dir):
    """``WITH *`` passthrough (r12): the whole binding carries forward,
    composing with extra computed items and a post-WITH WHERE — no
    projection loss mid-pipeline."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) WITH *, n.n_nationkey * 2 AS dk "
        "WHERE n.n_nationkey > 20 "
        "RETURN n.n_name AS name, dk ORDER BY name"
    )


@register(
    "cypher_label_expressions",
    """
    SELECT CAST((SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
                AS BIGINT) AS c_or,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS c_andnot,
           CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS c_multi
    """,
)
def cypher_label_expressions(spark, sf_dir):
    """Label expressions in WHERE position (r12): ``n:Nation|Region`` /
    ``n:Nation&!Region`` / AND-chain membership — boolean terms over the
    labels array, counted in one scan (no per-label re-scan)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n) RETURN "
        "sum(CASE WHEN n:Nation|Region THEN 1 ELSE 0 END) AS c_or, "
        "sum(CASE WHEN n:Nation&!Region THEN 1 ELSE 0 END) AS c_andnot, "
        "sum(CASE WHEN n:Region:Region THEN 1 ELSE 0 END) AS c_multi"
    )


@register(
    "cypher_operator_semantics",
    """
    SELECT CAST(2 AS BIGINT) AS int_div,
           CAST(-3 AS BIGINT) AS neg_div,
           2.5 AS float_div,
           TRUE AS chained,
           'ab' AS cat,
           CAST(31 AS BIGINT) AS hex,
           TRUE AS tp,
           2.0 AS br,
           CAST(NULL AS BIGINT) AS ni,
           'STRING NOT NULL' AS vt,
           CAST(3 AS BIGINT) AS cl
    """,
)
def cypher_operator_semantics(spark, sf_dir):
    """r12 operator-semantics pack: Cypher integer division (truncating
    toward zero), chained comparisons, `||` concatenation, hex literals,
    `IS ::` type predicates, HALF_EVEN rounding mode, nullIf, valueType,
    char_length."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN 5 / 2 AS int_div, -7 / 2 AS neg_div, 5.0 / 2 AS float_div, "
        "1 < 2 < 3 AS chained, 'a' || 'b' AS cat, 0x1F AS hex, "
        "1 IS :: INTEGER AS tp, round(2.5, 0, 'HALF_EVEN') AS br, "
        "nullIf(1, 1) AS ni, valueType('x') AS vt, char_length('abc') AS cl"
    )
    return out.select(
        F.col("int_div").cast("long"), F.col("neg_div").cast("long"),
        "float_div", "chained", "cat", F.col("hex").cast("long"),
        "tp", "br", F.col("ni").cast("long"), "vt", F.col("cl").cast("long"),
    )


@register(
    "cypher_inline_where_qpp",
    """
    SELECT n.n_name AS name, CAST(COUNT(*) AS BIGINT) AS c
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 5000
    GROUP BY n.n_name ORDER BY name
    """,
)
def cypher_inline_where_qpp(spark, sf_dir):
    """Inline pattern WHERE (Neo4j 5) + the quantified-relationship
    ``->{1,1}`` sugar (r12): the predicate conjains onto the bound frame,
    the quantifier resolves to the fixed single hop."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer WHERE c.c_acctbal > 5000)-[:IN_NATION]->{1,1}(n:Nation) "
        "RETURN n.n_name AS name, count(*) AS c ORDER BY name"
    )


@register(
    "fn_r12b_additions",
    """
    SELECT CAST(60 AS BIGINT) AS dd,
           CAST(6 AS BIGINT) AS dm,
           CAST(3600 AS BIGINT) AS ds,
           CAST(1970 AS BIGINT) AS ey,
           1.5 AS px,
           TRUE AS ie,
           CAST(2 AS BIGINT) AS til,
           '1970-01-01' AS adf,
           CAST(2 AS BIGINT) AS amm
    """,
)
def fn_r12b_additions(spark, sf_dir):
    """r12 function batch two: duration.inDays/inMonths/inSeconds
    component accessors, epoch datetime constructors, WGS-84 point
    accessor mapping, isEmpty over maps, list casts, apoc.date.format,
    apoc.map.merge postfix access."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run(
        "RETURN duration.inDays(date('2024-01-01'), date('2024-03-01')).days AS dd, "
        "duration.inMonths(date('2024-01-01'), date('2024-07-15')).months AS dm, "
        "duration.inSeconds(datetime('2024-01-01T00:00:00'), "
        "datetime('2024-01-01T01:00:00')).seconds AS ds, "
        "datetime({epochMillis: 86400000}).year AS ey, "
        "point({longitude: 1.5, latitude: 2.5}).x AS px, "
        "isEmpty({}) AS ie, "
        "toIntegerList(['1','2'])[1] AS til, "
        "apoc.date.format(0, 'ms', 'yyyy-MM-dd') AS adf, "
        "toInteger(apoc.map.merge({a:1}, {b:2}).b) AS amm"
    )
    return out.select(
        "dd", "dm", "ds", "ey", "px", "ie",
        F.col("til").cast("long"), "adf", F.col("amm").cast("long"),
    )


@register(
    "proc_gds_scc_stream",
    """
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS nodeId,
           CAST(2000000000000 + n_nationkey AS BIGINT) AS componentId
    FROM nation
    UNION ALL
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT),
           CAST(1000000000000 + r_regionkey AS BIGINT)
    FROM region
    ORDER BY nodeId
    """,
)
def proc_gds_scc_stream(spark, sf_dir):
    """``CALL gds.scc.stream`` (r12) over the Nation→Region DAG: a DAG
    has only trivial SCCs, so every node is its own component — exact,
    and a real exercise of the FW-BW-MIN peeling through the CALL
    surface."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("sccg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('sccg', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.scc.stream('sccg') YIELD nodeId, componentId "
        "RETURN nodeId, componentId ORDER BY nodeId"
    )


@register(
    "proc_gds_closeness_stream",
    """
    WITH sizes AS (SELECT n_regionkey, COUNT(*) AS k FROM nation GROUP BY n_regionkey)
    SELECT CAST(2000000000000 + n.n_nationkey AS BIGINT) AS nodeId,
           CAST(s.k AS DOUBLE) / (1 + 2 * (s.k - 1)) AS score
    FROM nation n JOIN sizes s ON n.n_regionkey = s.n_regionkey
    UNION ALL
    SELECT CAST(1000000000000 + r.r_regionkey AS BIGINT), 1.0
    FROM region r
    ORDER BY nodeId
    """,
)
def proc_gds_closeness_stream(spark, sf_dir):
    """``CALL gds.closeness.stream`` (r12) over the Nation–Region stars
    (undirected closeness): a nation reaches its region at 1 and its
    k−1 sibling nations at 2 → (k)/(1+2(k−1)); a region reaches its k
    nations at 1 → 1.0. Closed form on both engines."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("clg", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('clg', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.closeness.stream('clg') YIELD nodeId, score "
        "RETURN nodeId, score ORDER BY nodeId"
    )


@register(
    "cypher_call_in_transactions",
    """
    SELECT CAST(i AS BIGINT) AS i FROM (VALUES (1), (2), (3), (4)) t(i) ORDER BY i
    """,
)
def cypher_call_in_transactions(spark, sf_dir):
    """``CALL { … } IN TRANSACTIONS OF n ROWS`` (r12): the canonical
    batched-write idiom. The engine is set-based, so the batching clause
    is semantics-neutral — the body splices into the UNWIND write tail
    and the readback sees all rows."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run(
        "UNWIND range(1, 4) AS i "
        "CALL { WITH i CREATE (:TxRow {i: i}) } IN TRANSACTIONS OF 2 ROWS"
    )
    return s.run("MATCH (t:TxRow) RETURN t.i AS i ORDER BY i")


@register(
    "proc_gds_asnode",
    """
    SELECT n_name AS name,
           CAST(1000000000000 + n_regionkey AS BIGINT) AS comp
    FROM nation ORDER BY name
    """,
)
def proc_gds_asnode(spark, sf_dir):
    """``gds.util.asNode(nodeId).prop`` (r12) — THE GDS-docs result
    idiom: stream nodeIds, join the property back through one node-id
    equi-join (never a collect)."""
    from ..cypher.session import Session
    from ..procedures.registry import _graphs_for
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    _graphs_for(spark).pop("ang", None)  # idempotent under re-runs
    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run("CALL gds.graph.project('ang', ['Nation', 'Region'], ['IN_REGION'])")
    return s.run(
        "CALL gds.wcc.stream('ang') YIELD nodeId, componentId "
        "WHERE nodeId >= 2000000000000 "
        "RETURN gds.util.asNode(nodeId).n_name AS name, componentId AS comp "
        "ORDER BY name"
    )


@register(
    "cypher_start_end_node",
    """
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS c
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY nation
    """,
)
def cypher_start_end_node(spark, sf_dir):
    """``startNode(r)/endNode(r)`` (r12): endpoint entity lookups over a
    bound relationship variable — property access joins the node frame
    on the rel's endpoint id columns."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (:Customer)-[r:IN_NATION]->(:Nation) "
        "RETURN endNode(r).n_name AS nation, count(*) AS c ORDER BY nation"
    )


@register(
    "proc_periodic_iterate_canonical",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS marked FROM nation
    """,
)
def proc_periodic_iterate_canonical(spark, sf_dir):
    """The canonical APOC ``apoc.periodic.iterate`` dialect (r12): the
    action references the outer entity variable directly
    (``SET n.flag = true``); each batch re-anchors with one id-IN MATCH
    — still one set-based write per batch."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    s.run(
        "CALL apoc.periodic.iterate('MATCH (n:Nation) RETURN n', "
        "'SET n.flagged = true', {batchSize: 10})"
    ).collect()
    return s.run("MATCH (n:Nation {flagged: true}) RETURN count(*) AS marked")


@register(
    "cypher_load_csv_statement",
    """
    SELECT n, CAST(a AS BIGINT) AS a
    FROM (VALUES ('x', 1), ('y', 2), ('z', 3)) t(n, a) ORDER BY n
    """,
)
def cypher_load_csv_statement(spark, sf_dir):
    """The Cypher ``LOAD CSV WITH HEADERS FROM … AS row`` statement
    (r12): the file reads through spark.read.csv (distributed,
    splittable), row binds as a struct, fields are strings cast in the
    projection — THE import idiom, Spark-first (no PERIODIC COMMIT
    needed; one job ingests what Neo4j batches)."""
    import os
    import tempfile

    from ..cypher.session import Session

    d = tempfile.mkdtemp(prefix="graft_loadcsv_")
    path = os.path.join(d, "rows.csv")
    with open(path, "w") as f:
        f.write("name,age\nx,1\ny,2\nz,3\n")
    s = Session(spark)
    return s.run(
        f"LOAD CSV WITH HEADERS FROM 'file://{path}' AS row "
        "RETURN row.name AS n, toInteger(row.age) AS a ORDER BY n"
    )


@register(
    "cypher_null_ordering",
    """
    SELECT x FROM (VALUES (3), (NULL), (1), (2)) t(x)
    ORDER BY x LIMIT 3
    """,
)
def cypher_null_ordering(spark, sf_dir):
    """Cypher null placement (r12): nulls sort LAST ascending (and FIRST
    descending) — the OPPOSITE of Spark's default. LIMIT makes the
    divergence value-visible, so this row would catch a regression."""
    from ..cypher.session import Session

    s = Session(spark)
    out = s.run("UNWIND [3, null, 1, 2] AS x RETURN x ORDER BY x LIMIT 3")
    return out.select(F.col("x").cast("long"))


@register(
    "cypher_size_pattern",
    """
    SELECT n.n_name AS name, CAST(COUNT(c.c_custkey) AS BIGINT) AS deg
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY name
    """,
)
def cypher_size_pattern(spark, sf_dir):
    """Legacy ``size((n)<-[:T]-(:Label))`` pattern-count form (r12):
    rewritten to a COUNT subquery — one decorrelated per-anchor
    aggregate + left join, never a per-row probe."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) "
        "RETURN n.n_name AS name, size((n)<-[:IN_NATION]-(:Customer)) AS deg "
        "ORDER BY name"
    )


@register(
    "cypher_anon_arrows",
    """
    SELECT r_name AS region, CAST(COUNT(*) AS BIGINT) AS in_n,
           CAST(COUNT(*) AS BIGINT) AS undirected_deg
    FROM nation JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY region
    """,
)
def cypher_anon_arrows(spark, sf_dir):
    """Bracketless relationship arrows (r12): ``<--`` binds untyped
    incoming rels, ``--`` undirected — the tutorial shapes
    ``(a)-->(b)`` / ``(a)--(b)`` that previously failed to parse.
    Region nodes only have incoming IN_REGION edges, so both counts
    agree and the oracle is one grouped join."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (r:Region)<--(n) WITH r, count(n) AS in_n "
        "MATCH (r)--(m) "
        "RETURN r.r_name AS region, in_n, count(m) AS undirected_deg "
        "ORDER BY region"
    )


@register(
    "cypher_leading_with",
    """
    SELECT n_name AS name, CAST(4 AS BIGINT) AS cap
    FROM nation WHERE n_nationkey < 4 ORDER BY name
    """,
)
def cypher_leading_with(spark, sf_dir):
    """A statement OPENING with WITH and continuing into MATCH (r12) —
    the parameter-binding idiom ``WITH 4 AS cap MATCH … WHERE … < cap``;
    runs as a unit-row pipeline through the shared stage machinery."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "WITH 4 AS cap MATCH (n:Nation) WHERE n.n_nationkey < cap "
        "RETURN n.n_name AS name, cap ORDER BY name"
    )


@register(
    "cypher_unwind_match_pipeline",
    """
    SELECT r_name AS name FROM region WHERE r_regionkey IN (0, 2)
    ORDER BY name
    """,
)
def cypher_unwind_match_pipeline(spark, sf_dir):
    """``UNWIND … AS x MATCH (n {key: x})`` (r12): the UNWIND stage takes
    a MATCH tail, and the inline property map referencing the unwound
    variable hoists into the post-join WHERE (equivalent under the inner
    join; the scan keeps literal filters only)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "UNWIND [0, 2] AS rk MATCH (r:Region {r_regionkey: rk}) "
        "RETURN r.r_name AS name ORDER BY name"
    )


@register(
    "cypher_merge_on_set_map",
    """
    SELECT CAST(1 AS BIGINT) AS k, TRUE AS made, CAST(10 AS BIGINT) AS n,
           TRUE AS seen
    """,
)
def cypher_merge_on_set_map(spark, sf_dir):
    """``ON CREATE SET c += {map}`` / ``ON MATCH SET c += {map}`` (r12):
    the map form merges each key (previously a parse crash). Run twice:
    first run takes the CREATE branch, second the MATCH branch."""
    from ..cypher.session import Session

    s = Session(spark)
    for _ in range(2):
        s.run(
            "MERGE (c:Cfg {k: 1}) "
            "ON CREATE SET c += {made: true, n: 10} "
            "ON MATCH SET c += {seen: true}"
        )
    return s.run(
        "MATCH (c:Cfg) RETURN c.k AS k, c.made AS made, c.n AS n, "
        "c.seen AS seen"
    )


@register(
    "cypher_trim_slice_suite",
    """
    SELECT 'a' AS bt, 'a' AS lt, 'a' AS rt, 'a' AS tb,
           CAST(3 AS BIGINT) AS t2a, CAST(4 AS BIGINT) AS t2b,
           CAST(3 AS BIGINT) AS bl_n, CAST(3 AS BIGINT) AS bl_last,
           'llo' AS sub
    """,
)
def cypher_trim_slice_suite(spark, sf_dir):
    """Two-argument trims + the ANSI ``trim(BOTH … FROM …)`` specifier
    (Neo4j 5.20) and NEGATIVE list-slice bounds (``xs[-2..]`` — from the
    end, r12), plus one-argument from-index substring. List results
    surface as subscripted scalars (the hash gate's convention for
    array-valued outputs)."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN btrim('xxaxx','x') AS bt, ltrim('xxa','x') AS lt, "
        "rtrim('axx','x') AS rt, trim(BOTH 'y' FROM 'yyayy') AS tb, "
        "[1,2,3,4][-2..][0] AS t2a, [1,2,3,4][-2..][1] AS t2b, "
        "size([1,2,3,4][..-1]) AS bl_n, [1,2,3,4][..-1][2] AS bl_last, "
        "substring('hello', 2) AS sub"
    )


@register(
    "fn_apoc_r12c_suite",
    """
    SELECT '005' AS lp, '500' AS rp, 'hello-world-x' AS sc,
           'YWI=' AS b64, 'ab' AS b64d,
           '0cc175b9c0f1b6a831c399e269772661' AS h5,
           '86f7e437faa5a7fce15d1ddcb9eaeaea377667b8' AS h1,
           'b' AS sp, CAST(2 AS BIGINT) AS occ, CAST(3 AS BIGINT) AS rev,
           'a+b' AS ue, 'a b' AS ud
    """,
)
def fn_apoc_r12c_suite(spark, sf_dir):
    """The r12 probe-found APOC registrations: pads, snakeCase, base64,
    md5/sha1 (list-of-parts contract), regex split, occurrences,
    reverse, urlencode/urldecode — all builtin Column expressions."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN apoc.text.lpad('5',3,'0') AS lp, "
        "apoc.text.rpad('5',3,'0') AS rp, "
        "apoc.text.snakeCase('helloWorldX') AS sc, "
        "apoc.text.base64Encode('ab') AS b64, "
        "apoc.text.base64Decode('YWI=') AS b64d, "
        "apoc.util.md5(['a']) AS h5, apoc.util.sha1(['a']) AS h1, "
        "apoc.text.split('a;b;c',';')[1] AS sp, "
        "apoc.coll.occurrences([1,1,2],1) AS occ, "
        "apoc.coll.reverse([1,2,3])[0] AS rev, "
        "apoc.text.urlencode('a b') AS ue, apoc.text.urldecode('a%20b') AS ud"
    )


@register(
    "proc_gds_dijkstra_weighted",
    """
    SELECT * FROM (VALUES ('A', 0.0), ('B', 50.0), ('C', 50.0), ('D', 90.0))
    AS t(name, totalCost) ORDER BY name
    """,
)
def proc_gds_dijkstra_weighted(spark, sf_dir):
    """THE canonical GDS invocation from public docs (r12):
    ``MATCH (source:…) CALL gds.shortestPath.dijkstra.stream('g',
    {sourceNode: source, relationshipWeightProperty: 'cost'}) YIELD …`` —
    node-valued sourceNode resolves to its id, the weight property rides
    the projection, and the CALL runs as a bounded per-binding stage."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:RoadNode {name:'A'}), (:RoadNode {name:'B'}), "
          "(:RoadNode {name:'C'}), (:RoadNode {name:'D'})")
    for a, b, c in (("A", "B", 50), ("A", "C", 50), ("B", "D", 40), ("C", "D", 80)):
        s.run(
            f"MATCH (x:RoadNode {{name:'{a}'}}), (y:RoadNode {{name:'{b}'}}) "
            f"CREATE (x)-[:ROAD {{cost: {c}}}]->(y)"
        )
    s.run("CALL gds.graph.project('wroad12', 'RoadNode', {ROAD: {properties: 'cost'}})")
    out = s.run(
        "MATCH (source:RoadNode {name:'A'}) "
        "CALL gds.shortestPath.dijkstra.stream('wroad12', "
        "{sourceNode: source, relationshipWeightProperty: 'cost'}) "
        "YIELD targetNode, totalCost "
        "RETURN gds.util.asNode(targetNode).name AS name, totalCost "
        "ORDER BY name"
    )
    return out


@register(
    "cypher_count_expr_group",
    """
    SELECT CAST(COUNT(*) + c_nationkey AS BIGINT) AS v
    FROM customer GROUP BY c_nationkey ORDER BY v
    """,
)
def cypher_count_expr_group(spark, sf_dir):
    """``RETURN count(*) + n.key`` (r12): bound names in the
    non-aggregate part of a mixed item are implicit grouping keys
    (Cypher's rule) — lifted to hidden keys, never an unresolved-column
    error."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
        "RETURN count(*) + n.n_nationkey AS v ORDER BY v"
    )


@register(
    "cypher_rel_ddl",
    """
    SELECT 'rc_cat' AS name, 'RELATIONSHIP_UNIQUENESS' AS type,
           'RELATIONSHIP' AS entityType
    """,
)
def cypher_rel_ddl(spark, sf_dir):
    """Relationship constraint DDL ``FOR ()-[r:T]-()`` (r12) — catalog
    registration readback through SHOW CONSTRAINTS with a YIELD-less
    WHERE (also r12)."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE CONSTRAINT rc_cat FOR ()-[r:RC]-() REQUIRE r.rid IS UNIQUE")
    return s.run(
        "SHOW CONSTRAINTS YIELD name, type, entityType WHERE name = 'rc_cat' "
        "RETURN name, type, entityType"
    )


@register(
    "cypher_counter_set",
    """
    SELECT CAST(3 AS BIGINT) AS n
    """,
)
def cypher_counter_set(spark, sf_dir):
    """The read-modify-write counter idiom (r12):
    ``SET c.count = coalesce(c.count, 0) + 1`` three times — each SET
    reads the CURRENT value through the conditional-update path."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("MERGE (c:Ctr {ck: 'hits'}) ON CREATE SET c.count = 0")
    for _ in range(3):
        s.run("MATCH (c:Ctr {ck: 'hits'}) SET c.count = coalesce(c.count, 0) + 1")
    return s.run("MATCH (c:Ctr {ck: 'hits'}) RETURN c.count AS n")


@register(
    "fn_duration_arith",
    """
    SELECT 'P1DT12H' AS added, CAST(1 AS BIGINT) AS hrs, TRUE AS cmp
    """,
)
def fn_duration_arith(spark, sf_dir):
    """Duration value arithmetic (r12): duration + duration renders
    ISO-8601, map-constructed durations carry component accessors, and
    datetime + duration compares as an instant."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN toString(duration('P1D') + duration('PT12H')) AS added, "
        "duration({minutes: 90}).hours AS hrs, "
        "datetime('2024-01-01T00:00:00Z') + duration('PT1H') > "
        "datetime('2024-01-01T00:00:00Z') AS cmp"
    )


@register(
    "cypher_entity_subscript",
    """
    SELECT n_name AS name FROM nation WHERE n_nationkey = 7
    """,
)
def cypher_entity_subscript(spark, sf_dir):
    """``n['prop']`` dynamic property access on a bound entity (r12) —
    routes through the property resolver, missing keys → null."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation {n_nationkey: 7}) RETURN n['n_name'] AS name"
    )


@register(
    "proc_gds_knn_stream",
    """
    SELECT * FROM (VALUES ('a', 'b'), ('b', 'a'), ('c', 'b'))
    AS t(n1, n2) ORDER BY n1
    """,
)
def proc_gds_knn_stream(spark, sf_dir):
    """``CALL gds.knn.stream('g', {nodeProperties: ['e'], topK: 1})``
    (r12) — cosine KNN over ARRAY-valued projected node properties.
    Vectors chosen so top-1 neighbours are unambiguous: a=(1,0),
    b=(0.9,0.1), c=(0,1) → cos(a,b)=.994, cos(a,c)=0, cos(b,c)=.110,
    so a→b, b→a, c→b."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:KnnN {nm:'a', e: [1.0, 0.0]}), "
          "(:KnnN {nm:'b', e: [0.9, 0.1]}), (:KnnN {nm:'c', e: [0.0, 1.0]})")
    s.run("CALL gds.graph.project('knn12', {KnnN: {properties: 'e'}}, '*')")
    out = s.run(
        "CALL gds.knn.stream('knn12', {nodeProperties: ['e'], topK: 1}) "
        "YIELD node1, node2 "
        "RETURN gds.util.asNode(node1).nm AS n1, gds.util.asNode(node2).nm AS n2 "
        "ORDER BY n1"
    )
    return out


@register(
    "cypher_union_orderby",
    """
    SELECT name FROM (
      SELECT n_name AS name FROM nation WHERE n_nationkey < 3
      UNION SELECT r_name AS name FROM region
    ) ORDER BY name DESC LIMIT 4
    """,
)
def cypher_union_orderby(spark, sf_dir):
    """A trailing ORDER BY / LIMIT after the last UNION branch orders the
    WHOLE union (r12 — was silently sorting one branch; Cypher branches
    cannot be ordered individually)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) WHERE n.n_nationkey < 3 RETURN n.n_name AS name "
        "UNION MATCH (r:Region) RETURN r.r_name AS name "
        "ORDER BY name DESC LIMIT 4"
    )


@register(
    "proc_gds_yens_stream",
    """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 2.0, 'A'), (CAST(1 AS BIGINT), 4.0, 'A'))
    AS t(idx, totalCost, src) ORDER BY idx
    """,
)
def proc_gds_yens_stream(spark, sf_dir):
    """``gds.shortestPath.yens.stream`` (r12): K-shortest loopless paths
    through the canonical MATCH…CALL config-map shape. Diamond graph:
    A→B→C (1+1) and A→D→C (3+1) → costs 2.0 then 4.0."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:Yn {name:'A'}), (:Yn {name:'B'}), (:Yn {name:'C'}), "
          "(:Yn {name:'D'})")
    for a, b, c in (("A", "B", 1), ("B", "C", 1), ("A", "D", 3), ("D", "C", 1)):
        s.run(
            f"MATCH (x:Yn {{name:'{a}'}}), (y:Yn {{name:'{b}'}}) "
            f"CREATE (x)-[:YR {{w: {c}}}]->(y)"
        )
    s.run("CALL gds.graph.project('yen12', 'Yn', {YR: {properties: 'w'}})")
    return s.run(
        "MATCH (a:Yn {name:'A'}), (c:Yn {name:'C'}) "
        "CALL gds.shortestPath.yens.stream('yen12', {sourceNode: a, "
        "targetNode: c, k: 3, relationshipWeightProperty: 'w'}) "
        "YIELD index, totalCost "
        "RETURN index AS idx, totalCost, a.name AS src "
        "ORDER BY idx"
    )


@register(
    "cypher_correlated_unwind",
    """
    SELECT CAST(c_custkey % 5 + 1 AS BIGINT) AS nk,
           CAST(SUM(i) AS BIGINT) AS isum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer, LATERAL (
      SELECT UNNEST(range(1, CAST(c_custkey % 5 + 1 AS BIGINT) + 1)) AS i
    )
    WHERE c_custkey <= 40
    GROUP BY nk ORDER BY nk
    """,
)
def cypher_correlated_unwind(spark, sf_dir):
    """Correlated UNWIND over a COMPUTED range expression (r13 — VERDICT
    r12 wrong #1): ``MATCH (c) UNWIND range(1, c.prop) AS i`` fans each
    node out into prop rows; the else-branch now compiles the expression
    (cypher/session.py) instead of resolving its text as a column name.
    DuckDB's range(a, b) is end-exclusive, hence the +1 on the oracle."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (c:Customer) WHERE c.c_custkey <= 40 "
        "UNWIND range(1, c.c_custkey % 5 + 1) AS i "
        "RETURN c.c_custkey % 5 + 1 AS nk, sum(i) AS isum, count(*) AS n "
        "ORDER BY nk"
    )


@register(
    "cypher_divzero_semantics",
    """
    SELECT 'Infinity' AS pos, '-Infinity' AS neg, 'NaN' AS nan,
           CAST(2 AS BIGINT) AS intdiv, CAST(-1 AS BIGINT) AS negmod,
           'NaN' AS fmod0, CAST(NULL AS DOUBLE) AS nulldiv
    """,
)
def cypher_divzero_semantics(spark, sf_dir):
    """Cypher division semantics (r13 — VERDICT r12 wrong #2): float
    division never errors (1.0/0 → Infinity, -1.0/0 → -Infinity,
    0.0/0 → NaN; float % 0 → NaN), integer division truncates toward
    zero, % keeps the dividend's sign. The special float values
    serialize as strings so the DuckDB hash can pin them exactly."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN toString(1.0/0) AS pos, toString(-1.0/0) AS neg, "
        "toString(0.0/0) AS nan, 5/2 AS intdiv, -7 % 3 AS negmod, "
        "toString(5.0 % 0) AS fmod0, null / 2.0 AS nulldiv"
    )


@register(
    "cypher_with_distinct_standalone",
    """
    SELECT CAST(x AS BIGINT) AS y FROM (
      SELECT DISTINCT UNNEST([1, 1, 2, 3, 3]) AS x
    ) ORDER BY y
    """,
)
def cypher_with_distinct_standalone(spark, sf_dir):
    """Statement-opening ``WITH DISTINCT`` (r13 — VERDICT r12 wrong #3):
    the standalone-WITH pipeline strips/applies the DISTINCT prefix
    exactly like the clause-anchored path."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "UNWIND [1, 1, 2, 3, 3] AS x WITH DISTINCT x AS y "
        "RETURN y ORDER BY y"
    )


@register(
    "fn_apoc_r13_suite",
    """
    SELECT CAST(3 AS BIGINT) AS dist, TRUE AS cmp, 'x-y' AS rep,
           CAST(6 AS BIGINT) AS bc, CAST(6 AS BIGINT) AS slong,
           '2,3,2' AS rall, TRUE AS callv, FALSE AS diff,
           '1,2,1' AS ddn, CAST(2 AS BIGINT) AS fill_n,
           'a' AS mclean
    """,
)
def fn_apoc_r13_suite(spark, sf_dir):
    """The r13 doc-name alias sweep (VERDICT r12 missing #2):
    apoc.text.distance (levenshtein alias), compareCleaned, replace,
    byteCount, coll.sumLongs/removeAll/containsAll/fill/different/
    dropDuplicateNeighbors, map.clean — all builtin Column expressions,
    zero UDFs."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN apoc.text.distance('kitten', 'sitting') AS dist, "
        "apoc.text.compareCleaned('Hello, World!', 'hello world') AS cmp, "
        "apoc.text.replace('x.y', '\\\\.', '-') AS rep, "
        "apoc.text.byteCount('héllo') AS bc, "
        "apoc.coll.sumLongs([1, 2, 3.5]) AS slong, "
        "apoc.text.join([x IN apoc.coll.removeAll([1, 2, 3, 2], [1]) "
        "| toString(x)], ',') AS rall, "
        "apoc.coll.containsAll([1, 2, 3], [1, 3]) AS callv, "
        "apoc.coll.different([1, 2, 1]) AS diff, "
        "apoc.text.join([x IN apoc.coll.dropDuplicateNeighbors([1, 1, 2, 2, 1]) "
        "| toString(x)], ',') AS ddn, "
        "size(apoc.coll.fill('x', 2)) AS fill_n, "
        "apoc.text.join(keys(apoc.map.clean({a: 1, b: 2, c: 3}, ['b'], ['3'])), "
        "',') AS mclean"
    )


@register(
    "cypher_merge_counter",
    """
    SELECT CAST(3 AS BIGINT) AS n
    """,
)
def cypher_merge_counter(spark, sf_dir):
    """The MERGE counter idiom (r13 novel-probe find): ``ON MATCH SET
    x.n = x.n + 1`` — a self-referencing assignment compiled against the
    matched node's stored columns through the set-based conditional
    update (was: ExprText reached py4j raw)."""
    from ..cypher.session import Session

    s = Session(spark)
    q = ("MERGE (x:Ctr13 {k: 1}) ON CREATE SET x.n = 1 "
         "ON MATCH SET x.n = x.n + 1 RETURN x.n AS n")
    s.run(q)
    s.run(q)
    return s.run(q)


@register(
    "fn_to_integer_forms",
    """
    SELECT CAST(3 AS BIGINT) AS a, CAST(-2 AS BIGINT) AS b,
           CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS d,
           CAST(3 AS BIGINT) AS e, 2.5 AS f
    """,
)
def fn_to_integer_forms(spark, sf_dir):
    """Cypher toInteger/toFloat coercion forms (r13): float STRINGS parse
    then truncate toward zero; unparseable strings are null, never
    Spark's ANSI CAST_INVALID_INPUT."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN toInteger('3.7') AS a, toInteger('-2.9') AS b, "
        "toInteger('abc') AS c, toFloat('zz') AS d, "
        "toInteger(3.7) AS e, toFloat('2.5') AS f"
    )


@register(
    "cypher_count_where_subquery",
    """
    SELECT n_name AS name, CAST(cnt AS BIGINT) AS big
    FROM nation JOIN (
      SELECT c_nationkey, COUNT(*) AS cnt FROM customer
      WHERE c_acctbal > 9000.0 GROUP BY c_nationkey
    ) ON c_nationkey = n_nationkey
    ORDER BY name
    """,
)
def cypher_count_where_subquery(spark, sf_dir):
    """``COUNT { MATCH … WHERE pred }`` in WITH-item position (r13): the
    predicate filters the decorrelated subquery matches before the
    per-anchor count — one grouped count + one equi-join back, never
    per-row; the WITH stage rewrites the subquery exactly like RETURN
    position does."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (n:Nation) "
        "WITH n, COUNT { MATCH (c:Customer)-[:IN_NATION]->(n) "
        "WHERE c.c_acctbal > 9000.0 } AS big "
        "WHERE big > 0 RETURN n.n_name AS name, big ORDER BY name"
    )


@register(
    "cypher_unwind_call_subquery",
    """
    SELECT CAST(x AS BIGINT) AS x, CAST(x * 10 AS BIGINT) AS y
    FROM (SELECT UNNEST([1, 2, 3]) AS x) ORDER BY x
    """,
)
def cypher_unwind_call_subquery(spark, sf_dir):
    """``UNWIND … CALL { WITH x … RETURN … } RETURN …`` (r13): the
    exploded frame flows through the shared correlated-subquery stage
    (per-row projection, no per-row execution)."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "UNWIND [1, 2, 3] AS x CALL { WITH x RETURN x * 10 AS y } "
        "RETURN x, y ORDER BY x"
    )


@register(
    "cypher_stored_temporal_accessor",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY y ORDER BY y
    """,
)
def cypher_stored_temporal_accessor(spark, sf_dir):
    """Temporal component accessors on a STORED property column (r13
    novel-probe find): ``o.o_orderdate.year`` — the accessor chain
    resolves against the typed store column (was: missing-property
    null)."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (o:Order) RETURN o.o_orderdate.year AS y, count(*) AS n "
        "ORDER BY y"
    )


@register(
    "cypher_varlen_rel_predicate",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum
    FROM (
      SELECT l_quantity,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey, l_partkey
               ORDER BY l_linenumber, l_suppkey, l_quantity, l_extendedprice
             ) AS rn
      FROM lineitem
    ) WHERE rn = 1 AND l_quantity >= 45
    """,
)
def cypher_varlen_rel_predicate(spark, sf_dir):
    """Named var-length rel variable used as a LIST (r13 novel-probe
    find): ``-[rs:CONTAINS*1..1]->`` with ``all(r IN rs WHERE …)``
    rewrites onto the path-enumeration kernel, which carries per-path
    relationship structs; string-carried numerics recover through the
    try_cast ordering compare. The kernel enumerates DISTINCT endpoint
    pairs and collapses parallel rels to the min-id one (documented
    _materialize_path_entities contract) — the oracle replays that
    collapse with the rel-id ROW_NUMBER."""
    from ..cypher.session import Session
    from ..sources.tpch import build_graph
    from ..storage.store import GraphStore

    s = Session(spark, store=GraphStore(spark, build_graph(spark, sf_dir)))
    return s.run(
        "MATCH (o:Order)-[rs:CONTAINS*1..1]->(p:Part) "
        "WHERE all(r IN rs WHERE r.l_quantity >= 45) "
        "RETURN count(*) AS n, "
        "sum(reduce(acc = 0, r IN rs | acc + toInteger(r.l_quantity))) AS qsum"
    )


@register(
    "fn_null_propagation",
    """
    SELECT CAST(NULL AS BIGINT) AS s, CAST(NULL AS BIGINT) AS h,
           CAST(NULL AS VARCHAR) AS u, CAST(2147483648 AS BIGINT) AS a
    """,
)
def fn_null_propagation(spark, sf_dir):
    """Function null-propagation + 64-bit literal folds (r13):
    size(null)/head(null)/toUpper(null) → null (was a raw
    DATATYPE_MISMATCH analysis error); abs(-2147483648) folds in 64-bit
    (was an int32 overflow)."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN size(null) AS s, head(null) AS h, toUpper(null) AS u, "
        "abs(-2147483648) AS a"
    )


@register(
    "cypher_bulk_import_id_prop",
    """
    SELECT CAST(1 AS BIGINT) AS id, 'A' AS v
    UNION ALL SELECT CAST(2 AS BIGINT), 'b'
    UNION ALL SELECT CAST(3 AS BIGINT), CAST(NULL AS VARCHAR)
    ORDER BY id
    """,
)
def cypher_bulk_import_id_prop(spark, sf_dir):
    """THE docs bulk-import idiom (r13): ``UNWIND $batch AS row CREATE
    (:N {id: row.id, …})`` then MERGE-by-id upserts — a user property
    named ``id`` stores under an escaped column; pattern filters,
    property reads, keys() and SET all map back while ``id(n)`` keeps
    the internal entity id."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run(
        "UNWIND $batch AS row CREATE (:Blk13 {id: row.id, v: row.v})",
        {"batch": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]},
    )
    s.run(
        "UNWIND $batch AS row MERGE (x:Blk13 {id: row.id}) "
        "ON MATCH SET x.v = row.v",
        {"batch": [{"id": 1, "v": "A"}, {"id": 3, "v": "c"}]},
    )
    return s.run(
        "MATCH (b:Blk13) RETURN b.id AS id, b.v AS v ORDER BY id"
    )


@register(
    "cypher_create_set_tail",
    """
    SELECT CAST(2 AS BIGINT) AS b, CAST(30 AS BIGINT) AS s
    """,
)
def cypher_create_set_tail(spark, sf_dir):
    """``CREATE (n:L {a: 1}) SET n.b = n.a + 1 RETURN …`` (r13): the SET
    tail applies to the just-created ids through the shared single-id
    setter, self-referencing RHS included; multi-variable SET items
    compose."""
    from ..cypher.session import Session

    s = Session(spark)
    r1 = s.run("CREATE (n:Cst13 {a: 1}) SET n.b = n.a + 1 RETURN n.b AS b")
    s.run("CREATE (p:Cst13b {x: 1}), (q:Cst13b {x: 2}) "
          "SET p.y = 10, q.y = 20")
    return s.run(
        "MATCH (n:Cst13) MATCH (m:Cst13b) "
        "RETURN n.b AS b, sum(m.y) AS s"
    )


@register(
    "cypher_foreach_collected_set",
    """
    SELECT CAST(3 AS BIGINT) AS n
    """,
)
def cypher_foreach_collected_set(spark, sf_dir):
    """``WITH collect(f) AS fs FOREACH (n IN fs | SET …)`` (r13): the
    loop element is an entity struct — its id field keys one set-based
    conditional update (no per-element loop); the token-aware FOREACH
    substitution keeps same-named map keys/properties intact."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("FOREACH (x IN [1, 2, 3] | CREATE (:Fcs13 {x: x}))")
    s.run(
        "MATCH (f:Fcs13) WITH collect(f) AS fs "
        "FOREACH (n IN fs | SET n.seen = true)"
    )
    return s.run("MATCH (f:Fcs13 {seen: true}) RETURN count(*) AS n")


@register(
    "cypher_typed_rel_list_props",
    """
    SELECT CAST(1.5 AS DOUBLE) AS w1, CAST(2.5 AS DOUBLE) AS w2,
           CAST(3 AS BIGINT) AS x3, CAST(6 AS BIGINT) AS xsum
    """,
)
def cypher_typed_rel_list_props(spark, sf_dir):
    """Typed property reads out of path entity lists (r14 — VERDICT r13
    wrong #1): ``[r IN relationships(p) | r.w]`` keeps the stored DOUBLE
    type (the string-cast carried-struct contract returned '1.5'), and
    ``[x IN nodes(p) | x.x]`` keeps BIGINT — the ``__p_<prop>`` typed
    carrier fields resolve these; schema_match pins the types."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run(
        "CREATE (:Tcr14 {x: 1})-[:TW {w: 1.5}]->"
        "(:Tcr14 {x: 2})-[:TW {w: 2.5}]->(:Tcr14 {x: 3})"
    )
    return s.run(
        "MATCH p=(a:Tcr14 {x:1})-[:TW*2]->(c) "
        "RETURN [r IN relationships(p) | r.w][0] AS w1, "
        "[r IN relationships(p) | r.w][1] AS w2, "
        "[x IN nodes(p) | x.x][2] AS x3, "
        "reduce(acc = 0, v IN [x IN nodes(p) | x.x] | acc + v) AS xsum"
    )


@register(
    "cypher_typed_collect_props",
    """
    SELECT CAST(1 AS BIGINT) AS nx, CAST(10 AS BIGINT) AS c1,
           CAST(60 AS BIGINT) AS csum, CAST(0.5 AS DOUBLE) AS f1
    """,
)
def cypher_typed_collect_props(spark, sf_dir):
    """Typed property reads out of ``collect(n)`` element structs (r14 —
    VERDICT r13 wrong #1, second carrier): ``[x IN ns | x.y]`` over a
    collected entity list keeps BIGINT/DOUBLE property types instead of
    stringifying through the properties map."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run(
        "CREATE (:Tcc14 {x: 1, y: 10, f: 0.5}), (:Tcc14 {x: 2, y: 20, f: 1.5}), "
        "(:Tcc14 {x: 3, y: 30, f: 2.5})"
    )
    return s.run(
        "MATCH (n:Tcc14 {x: 1}) MATCH (m:Tcc14) "
        "WITH n, collect(m) AS ns "
        "RETURN n.x AS nx, [x IN ns | x.y][0] AS c1, "
        "reduce(acc = 0, v IN [x IN ns | x.y] | acc + v) AS csum, "
        "[x IN ns | x.f][0] AS f1"
    )


@register(
    "cypher_reduce_hof_types",
    """
    SELECT 'abc' AS j, CAST(6 AS BIGINT) AS t, CAST(3.0 AS DOUBLE) AS d,
           CAST(2 AS BIGINT) AS ln, 'b!' AS ex
    """,
)
def cypher_reduce_hof_types(spark, sf_dir):
    """Type-correct ``+`` inside HOF lambdas (r14 — VERDICT r13 wrong #2):
    a string accumulator concatenates (was a raw BINARY_OP_WRONG_TYPE),
    numeric accumulators stay numeric, an empty-list accumulator retypes
    to the source element type and appends, and comprehension bodies
    concat string elements."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "RETURN reduce(acc = '', w IN ['a','b','c'] | acc + w) AS j, "
        "reduce(acc = 0, x IN [1,2,3] | acc + x) AS t, "
        "reduce(acc = 0.0, x IN [1,2] | acc + x) AS d, "
        "size(reduce(acc = [], x IN [1,2] | acc + x)) AS ln, "
        "[w IN ['a','b'] | w + '!'][1] AS ex"
    )


@register(
    "cypher_sum_empty",
    """
    SELECT CAST(0 AS BIGINT) AS zsum, CAST(0 AS BIGINT) AS c
    """,
)
def cypher_sum_empty(spark, sf_dir):
    """``sum()`` over zero matched rows returns 0, not null (r14 —
    VERDICT r13 wrong #5; count was already 0). The coalesce applies at
    the aggregate dispatch, typed to the summed column."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:Sme14 {x: 1})")
    return s.run(
        "MATCH (z:Sme14) WHERE z.x > 99 "
        "RETURN sum(z.x) AS zsum, count(z.x) AS c"
    )


@register(
    "fn_null_edge_suite",
    """
    SELECT CAST(NULL AS BOOLEAN) AS in_null, CAST(0 AS BIGINT) AS empty_len,
           TRUE AS nan_yes, FALSE AS nan_no,
           CAST(-9223372036854775808 AS BIGINT) AS imin,
           CAST(6 AS BIGINT) AS topk_sum
    """,
)
def fn_null_edge_suite(spark, sf_dir):
    """Null/empty edge semantics (r14 — VERDICT r13 wrong #3/#4, missing
    #1-#3): ``1 IN null`` → null, ``range(1, 0)`` → the empty list,
    ``isNaN()`` registered (0.0/0.0 → NaN → true), the int64 min literal
    parses, and LIMIT accepts statically-evaluable function expressions
    (``LIMIT toInteger(ceil(2.2))`` keeps 3 rows)."""
    from ..cypher.session import Session

    s = Session(spark)
    return s.run(
        "UNWIND range(1, 10) AS x WITH x ORDER BY x "
        "LIMIT toInteger(ceil(2.2)) "
        "RETURN 1 IN null AS in_null, size(range(1, 0)) AS empty_len, "
        "isNaN(0.0/0.0) AS nan_yes, isNaN(2.5) AS nan_no, "
        "-9223372036854775808 AS imin, sum(x) AS topk_sum"
    )


@register(
    "cypher_create_set_forms",
    """
    SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, 'Csf14:Extra14' AS ls
    """,
)
def cypher_create_set_forms(spark, sf_dir):
    """``CREATE … SET`` map-merge and label forms (r14 — ADVICE r13):
    ``SET n += {map}`` merges each key onto the just-created node (the
    r13 tail split on '=' and silently created a property named 'a +');
    ``SET n:Label`` adds the label through the set-based labels update."""
    from ..cypher.session import Session

    s = Session(spark)
    s.run("CREATE (n:Csf14 {a: 0}) SET n += {a: 1, b: 'x'}, n:Extra14")
    return s.run(
        "MATCH (n:Csf14) "
        "RETURN n.a AS a, n.b AS b, "
        "reduce(acc = '', l IN labels(n) | "
        "CASE WHEN acc = '' THEN l ELSE acc + ':' + l END) AS ls"
    )
