"""GDS algorithm queries (SURVEY.md §2.B.10), oracle-checked where exact.

The TPC-H graph's node ids are arithmetic (LABEL_BASE + key), so the DuckDB
oracle reconstructs the edge list straight from the relational tables and
grades BFS/SSSP/WCC with recursive CTEs. The float-iterative algorithms
(PageRank, LPA) are rows-only here and property-tested in pytest on known
graphs.

The projected graph is a DAG (Customer→{Order,Nation}, Order→Part,
Part→Supplier, Supplier→Nation, Nation→Region), so recursive CTEs with a
hop cap terminate and min-dist == BFS depth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import gds
from ..sources.tpch import build_graph, load_tables
from . import register

# DuckDB edge-list twin of sources/tpch.build_graph (unit weights for FK
# edges, l_quantity for lineitem-derived edges).
_EDGES = """
  SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS src,
         CAST(1000000000000 + n_regionkey AS BIGINT) AS dst, CAST(1 AS BIGINT) AS w FROM nation
  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT),
         CAST(2000000000000 + c_nationkey AS BIGINT), 1 FROM customer
  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
         CAST(2000000000000 + s_nationkey AS BIGINT), 1 FROM supplier
  UNION ALL SELECT CAST(3000000000000 + o_custkey AS BIGINT),
         CAST(6000000000000 + o_orderkey AS BIGINT), 1 FROM orders
  UNION ALL SELECT CAST(6000000000000 + l_orderkey AS BIGINT),
         CAST(5000000000000 + l_partkey AS BIGINT), CAST(l_quantity AS BIGINT) FROM lineitem
  UNION ALL SELECT CAST(5000000000000 + l_partkey AS BIGINT),
         CAST(4000000000000 + l_suppkey AS BIGINT), CAST(l_quantity AS BIGINT) FROM lineitem
"""


def _seed(g):
    """Lowest-id Customer node as a 1-row DataFrame (no driver collect)."""
    return g.label_frames["Customer"].orderBy("id").limit(1).select("id")


@register(
    "gds_degree",
    f"""
    WITH e AS ({_EDGES})
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY src
    """,
)
def gds_degree(spark, sf_dir):
    """gds.degree — per-node out-degree (one groupBy shuffle)."""
    return build_graph(spark, sf_dir).degrees("out")


@register(
    "gds_bfs_from_customer",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist FROM seed
      UNION
      SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id WHERE walk.dist < 10
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
)
def gds_bfs_from_customer(spark, sf_dir):
    """BFS distances from the lowest-keyed customer (frontier BSP)."""
    g = build_graph(spark, sf_dir)
    return gds.bfs(g.rels, _seed(g), max_depth=10)


@register(
    "gds_sssp_weighted",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM seed
      UNION
      SELECT e.dst, walk.dist + e.w, walk.hops + 1
      FROM walk JOIN e ON e.src = walk.id WHERE walk.hops < 6
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
)
def gds_sssp_weighted(spark, sf_dir):
    """Weighted SSSP (Bellman-Ford BSP), integer weights — exact."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(
            F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity").cast("long")
        )
        .otherwise(F.lit(1))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return gds.sssp(edges, _seed(g), max_iter=10)


@register(
    "gds_shortest_path_to_regions",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist FROM seed
      UNION
      SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id WHERE walk.dist < 10
    )
    SELECT id, MIN(dist) AS dist FROM walk
    WHERE id BETWEEN 1000000000000 AND 1999999999999 GROUP BY id
    """,
)
def gds_shortest_path_to_regions(spark, sf_dir):
    """shortestPath (unweighted): hop distance to every reachable Region."""
    g = build_graph(spark, sf_dir)
    lo, hi = 1_000_000_000_000, 1_999_999_999_999
    return gds.bfs(g.rels, _seed(g), max_depth=10).where(F.col("id").between(lo, hi))


@register(
    "gds_wcc_supply_zones",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS src,
             CAST(2000000000000 + s_nationkey AS BIGINT) AS dst FROM supplier
      UNION ALL
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    n AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS id FROM supplier
      UNION SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation
      UNION SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region
    ),
    r AS (
      SELECT id, id AS comp FROM n
      UNION
      SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.id
    )
    SELECT id, MIN(comp) AS comp FROM r GROUP BY id
    """,
)
def gds_wcc_supply_zones(spark, sf_dir):
    """WCC over the Supplier–Nation–Region subgraph: one component per
    region, canonically labeled by the (minimum) region node id."""
    g = build_graph(spark, sf_dir)
    sup_lo = 4_000_000_000_000
    edges = g.type_frames["IN_NATION"].where(F.col("src") >= sup_lo).unionByName(
        g.type_frames["IN_REGION"]
    ).select("src", "dst")
    nodes = (
        g.label_frames["Supplier"]
        .select("id")
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.wcc(edges, nodes)


@register(
    "gds_wcc_star_supply_zones",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS src,
             CAST(2000000000000 + s_nationkey AS BIGINT) AS dst FROM supplier
      UNION ALL
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    n AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS id FROM supplier
      UNION SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation
      UNION SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region
    ),
    r AS (
      SELECT id, id AS comp FROM n
      UNION
      SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.id
    )
    SELECT id, MIN(comp) AS comp FROM r GROUP BY id
    """,
)
def gds_wcc_star_supply_zones(spark, sf_dir):
    """Same components as gds_wcc_supply_zones through the O(log n)
    large-star/small-star contraction kernel instead of O(diameter)
    min-label BSP — the high-diameter scale path."""
    g = build_graph(spark, sf_dir)
    sup_lo = 4_000_000_000_000
    edges = g.type_frames["IN_NATION"].where(F.col("src") >= sup_lo).unionByName(
        g.type_frames["IN_REGION"]
    ).select("src", "dst")
    nodes = (
        g.label_frames["Supplier"]
        .select("id")
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.wcc_star(edges, nodes)


@register(
    "gds_triangle_count_copart",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM e e1 JOIN e e2 ON e2.p1 = e1.p2 JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    """,
)
def gds_triangle_count_copart(spark, sf_dir):
    """Triangle count on the part co-occurrence graph (parts sharing an
    order) — wedge closure via two equi-joins, never all-pairs."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.triangle_count(co)


@register(
    "gds_node_similarity_suppliers",
    """
    WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    sz AS (SELECT s, COUNT(*) AS n FROM sp GROUP BY s),
    i AS (
      SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS DOUBLE) AS i
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s GROUP BY a.s, b.s)
    SELECT CAST(4000000000000 + sa AS BIGINT) AS node_a,
           CAST(4000000000000 + sb AS BIGINT) AS node_b,
           i / (za.n + zb.n - i) AS jaccard
    FROM i JOIN sz za ON za.s = sa JOIN sz zb ON zb.s = sb
    WHERE i / (za.n + zb.n - i) >= 0.15
    """,
)
def gds_node_similarity_suppliers(spark, sf_dir):
    """gds.nodeSimilarity: suppliers by Jaccard of supplied-part sets
    (candidates co-grouped on shared parts — bucket join)."""
    g = build_graph(spark, sf_dir)
    sup_edges = g.type_frames["SUPPLIED_BY"].select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return gds.node_similarity(sup_edges, min_jaccard=0.15)


@register(
    "gds_knn_embeddings",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, len(q.embedding) + 1),
                 i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
               (acc, x) -> acc + x)
             / greatest(
                 sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(q.embedding) + 1),
                     i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x))
               * sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(c.embedding) + 1),
                     i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x)),
               1e-12) AS sim
      FROM q JOIN embeddings c ON q.vec_id != c.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def gds_knn_embeddings(spark, sf_dir):
    """gds.knn over the embeddings property (exact cosine top-3)."""
    from ..operators import similarity as sim

    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.brute_force_topk(e, e.where(F.col("vec_id") < 100), k=3)


@register(
    "gds_all_shortest_paths_to_regions",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id AS start_id, id AS end_id, [id] AS path, CAST(0 AS BIGINT) AS hops
      FROM seed
      UNION ALL
      SELECT walk.start_id, e.dst, list_append(walk.path, e.dst), walk.hops + 1
      FROM walk JOIN e ON e.src = walk.end_id
      WHERE walk.hops < 5 AND NOT list_contains(walk.path, e.dst)
    ),
    to_regions AS (
      SELECT DISTINCT start_id, end_id, hops, array_to_string(path, '->') AS path_str
      FROM walk
      WHERE end_id BETWEEN 1000000000000 AND 1999999999999
    ),
    mins AS (SELECT start_id, end_id, MIN(hops) AS hops FROM to_regions GROUP BY 1, 2)
    SELECT t.start_id, t.end_id, t.hops, t.path_str
    FROM to_regions t JOIN mins USING (start_id, end_id, hops)
    """,
)
def gds_all_shortest_paths_to_regions(spark, sf_dir):
    """allShortestPaths: every minimum-length simple path from the lowest
    customer to each reachable Region, as node-id arrays."""
    from ..operators import paths as P

    g = build_graph(spark, sf_dir)
    lo, hi = 1_000_000_000_000, 1_999_999_999_999
    regions = g.label_frames["Region"].select("id")
    out = P.all_shortest_paths(g.rels, _seed(g), max_hops=5, targets=regions)
    return out.select(
        "start_id",
        "end_id",
        "hops",
        F.concat_ws("->", F.transform("path", lambda x: x.cast("string"))).alias("path_str"),
    ).distinct()


@register("gds_pagerank")  # rows-only: float power iteration
def gds_pagerank(spark, sf_dir):
    """gds.pageRank (15 iterations, damping 0.85, dangling-mass aware)."""
    g = build_graph(spark, sf_dir)
    return gds.pagerank(g.rels, g.nodes, iterations=15)


@register("gds_label_propagation")  # rows-only: tie-break-sensitive iteration
def gds_label_propagation(spark, sf_dir):
    """gds.labelPropagation (synchronous, deterministic tie-break)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.label_propagation(edges, nodes, max_iter=6)


@register(
    "gds_local_clustering",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT id, COUNT(*) AS d FROM (
        SELECT p1 AS id FROM e UNION ALL SELECT p2 FROM e) GROUP BY id),
    tri AS (
      SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z
      FROM e e1 JOIN e e2 ON e2.p1 = e1.p2 JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
    pn AS (
      SELECT id, COUNT(*) AS t FROM (
        SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      GROUP BY id)
    SELECT deg.id, CAST(COALESCE(pn.t, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * COALESCE(pn.t, 0) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS coeff
    FROM deg LEFT JOIN pn ON pn.id = deg.id
    """,
)
def gds_local_clustering(spark, sf_dir):
    """Per-node triangle count + local clustering coefficient on the part
    co-occurrence graph (wedge closure, never all-pairs)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.local_clustering(co)


@register("gds_pagerank_weighted")  # rows-only: float power iteration
def gds_pagerank_weighted(spark, sf_dir):
    """gds.pageRank with relationshipWeightProperty: lineitem-derived
    edges weighted by l_quantity, FK edges weight 1."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity"))
        .otherwise(F.lit(1.0))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return gds.pagerank(edges, g.nodes, iterations=10, weight_col="weight")


@register("gds_personalized_pagerank")  # rows-only: float power iteration
def gds_personalized_pagerank(spark, sf_dir):
    """gds.pageRank with sourceNodes: rank personalized on the lowest
    customer; mass stays in its reachable neighborhood."""
    g = build_graph(spark, sf_dir)
    return gds.personalized_pagerank(g.rels, _seed(g), g.nodes, iterations=10)


@register("gds_louvain")  # rows-only: modularity-gain iteration (float, tie-break-sensitive)
def gds_louvain(spark, sf_dir):
    """gds.louvain (synchronous local-moving, deterministic tie-break)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.louvain(edges, nodes, max_iter=5)


@register(
    "gds_graph_project",
    """
    SELECT 'Customer' AS kind, CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n
    UNION ALL SELECT 'Order', CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL SELECT 'PLACED', CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    """,
)
def gds_graph_project(spark, sf_dir):
    """gds.graph.project: label/type-filtered subgraph + size summary."""
    g = build_graph(spark, sf_dir)
    c = g.label_frames["Customer"].select(F.lit("Customer").alias("kind"))
    o = g.label_frames["Order"].select(F.lit("Order").alias("kind"))
    p = g.type_frames["PLACED"].select(F.lit("PLACED").alias("kind"))
    return (
        c.unionByName(o).unionByName(p)
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n"))
    )
