"""Relational core of the Cypher surface (SURVEY.md §2.B.1-2.B.6).

Each query exercises one operator row through the engine's graph API
(PropertyGraph / match_chain — never raw spark.sql) and carries a DuckDB
oracle. Reference anchor: the query shapes the reference's own test suite
runs over Bolt (/root/reference/src/test/java/com/neo4j/docker/utils/
DatabaseIO.java:42-92) — label scans, property lookups, expands, projections
— generalized to the TPC-H-ish graph projection (FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.patterns import (
    NodeSpec,
    RelSpec,
    match_chain,
    optional_expand,
    pattern_predicate,
    var_length_expand,
)
from ..sources.tpch import build_graph, load_tables
from . import register


def money_sum(col, precision: int = 28, scale: int = 2) -> F.Column:
    """Exact decimal sum surfaced as double (see catalog/__init__ docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


# ---------------------------------------------------------------- 2.B.1 scans


@register(
    "scan_label_customer",
    "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer",
)
def scan_label_customer(spark, sf_dir):
    """MATCH (c:Customer) RETURN c.* — label scan via per-label catalog."""
    g = build_graph(spark, sf_dir)
    return g.nodes_by_label("Customer").select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@register(
    "scan_all_nodes_by_label",
    """
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT 'Region' AS label FROM region
      UNION ALL SELECT 'Nation' FROM nation
      UNION ALL SELECT 'Customer' FROM customer
      UNION ALL SELECT 'Supplier' FROM supplier
      UNION ALL SELECT 'Part' FROM part
      UNION ALL SELECT 'Order' FROM orders
    ) t GROUP BY label
    """,
)
def scan_all_nodes_by_label(spark, sf_dir):
    """MATCH (n) RETURN labels(n), count(*) — all-nodes scan + explode."""
    g = build_graph(spark, sf_dir)
    return (
        g.nodes.select(F.explode("labels").alias("label"))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@register(
    "scan_rel_type",
    "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag",
)
def scan_rel_type(spark, sf_dir):
    """MATCH ()-[r:CONTAINS]->() — rel-type scan via per-type catalog."""
    g = build_graph(spark, sf_dir)
    return g.rels_by_type("CONTAINS").groupBy("l_returnflag").agg(F.count("*").alias("n"))


@register(
    "property_lookup",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def property_lookup(spark, sf_dir):
    """MATCH (c:Customer {c_mktsegment:'BUILDING'}) — property-map lookup."""
    g = build_graph(spark, sf_dir)
    df = match_chain(g, [NodeSpec("c", "Customer", props={"c_mktsegment": "BUILDING"})])
    return df.select(F.col("c_c_custkey").alias("c_custkey"), F.col("c_c_name").alias("c_name"))


# ------------------------------------------------- 2.B.2 projection / filter


@register(
    "predicate_boolean_mix",
    """
    SELECT p_partkey, p_name, p_type, p_retailprice FROM part
    WHERE (p_type IN ('SMALL','PROMO') AND p_name LIKE 'red%')
       OR (p_name LIKE '%bolt' AND p_retailprice BETWEEN 500 AND 1500)
    """,
)
def predicate_boolean_mix(spark, sf_dir):
    """WHERE with AND/OR, IN, STARTS WITH, ENDS WITH, BETWEEN."""
    g = build_graph(spark, sf_dir)
    p = g.nodes_by_label("Part")
    cond = (F.col("p_type").isin("SMALL", "PROMO") & F.col("p_name").startswith("red")) | (
        F.col("p_name").endswith("bolt") & F.col("p_retailprice").between(500, 1500)
    )
    return p.where(cond).select("p_partkey", "p_name", "p_type", "p_retailprice")


@register(
    "predicate_regex",
    """
    SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n FROM part
    WHERE regexp_matches(p_name, '^(red|blue) [a-z]+$') GROUP BY p_type
    """,
)
def predicate_regex(spark, sf_dir):
    """WHERE p.name =~ '...' — regex predicate (Cypher =~ → rlike)."""
    g = build_graph(spark, sf_dir)
    return (
        g.nodes_by_label("Part")
        .where(F.col("p_name").rlike("^(red|blue) [a-z]+$"))
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "projection_expressions",
    """
    SELECT o_orderkey, o_orderstatus || '-' || o_orderpriority AS status_tag,
           o_totalprice * 1.1 AS gross
    FROM orders
    """,
)
def projection_expressions(spark, sf_dir):
    """RETURN with arithmetic + string-concat expression projection."""
    g = build_graph(spark, sf_dir)
    return g.nodes_by_label("Order").select(
        "o_orderkey",
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias("status_tag"),
        (F.col("o_totalprice") * 1.1).alias("gross"),
    )


@register("return_distinct", "SELECT DISTINCT c_mktsegment FROM customer")
def return_distinct(spark, sf_dir):
    """RETURN DISTINCT."""
    g = build_graph(spark, sf_dir)
    return g.nodes_by_label("Customer").select("c_mktsegment").distinct()


# ------------------------------------------------------------- 2.B.3 joins


@register(
    "expand_one_hop",
    """
    SELECT c_name, o_orderkey, o_totalprice
    FROM customer JOIN orders ON o_custkey = c_custkey
    """,
)
def expand_one_hop(spark, sf_dir):
    """MATCH (c:Customer)-[:PLACED]->(o:Order) — 1-hop expand."""
    g = build_graph(spark, sf_dir)
    df = g.expand("Customer", "PLACED", "Order", "c", "r", "o")
    return df.select(
        F.col("c_c_name").alias("c_name"),
        F.col("o_o_orderkey").alias("o_orderkey"),
        F.col("o_o_totalprice").alias("o_totalprice"),
    )


@register(
    "expand_two_hop",
    """
    SELECT c_name, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_name
    """,
)
def expand_two_hop(spark, sf_dir):
    """MATCH (c)-[:PLACED]->(o)-[:CONTAINS]->(p) — 2-hop chain."""
    g = build_graph(spark, sf_dir)
    df = match_chain(
        g,
        [
            NodeSpec("c", "Customer"),
            RelSpec("r1", "PLACED"),
            NodeSpec("o", "Order"),
            RelSpec("r2", "CONTAINS"),
            NodeSpec("p", "Part"),
        ],
    )
    return df.groupBy(F.col("c_c_name").alias("c_name")).agg(F.count("*").alias("n_lines"))


@register(
    "expand_three_hop",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem l1 ON l1.l_orderkey = o_orderkey
                  JOIN lineitem l2 ON l2.l_partkey = l1.l_partkey
                  JOIN supplier ON s_suppkey = l2.l_suppkey
    GROUP BY c_mktsegment
    """,
)
def expand_three_hop(spark, sf_dir):
    """MATCH (c)-[:PLACED]->(o)-[:CONTAINS]->(p)-[:SUPPLIED_BY]->(s) — 3 hops."""
    g = build_graph(spark, sf_dir)
    df = match_chain(
        g,
        [
            NodeSpec("c", "Customer"),
            RelSpec("r1", "PLACED"),
            NodeSpec("o", "Order"),
            RelSpec("r2", "CONTAINS"),
            NodeSpec("p", "Part"),
            RelSpec("r3", "SUPPLIED_BY"),
            NodeSpec("s", "Supplier"),
        ],
    )
    return df.groupBy(F.col("c_c_mktsegment").alias("c_mktsegment")).agg(
        F.count("*").alias("n_paths")
    )


@register(
    "expand_undirected",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_neighbors
    FROM (SELECT c_nationkey AS k FROM customer
          UNION ALL SELECT s_nationkey FROM supplier) t
    JOIN nation ON n_nationkey = t.k GROUP BY n_name
    """,
)
def expand_undirected(spark, sf_dir):
    """MATCH (n:Nation)-[:IN_NATION]-(x) — undirected expand."""
    g = build_graph(spark, sf_dir)
    df = g.expand("Nation", "IN_NATION", None, "n", "r", "x", direction="both")
    return df.groupBy(F.col("n_n_name").alias("n_name")).agg(F.count("*").alias("n_neighbors"))


@register(
    "optional_match_count",
    """
    SELECT c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_big_orders
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 30000) o
      ON o.o_custkey = c_custkey
    GROUP BY c_name
    """,
)
def optional_match_count(spark, sf_dir):
    """OPTIONAL MATCH (c)-[:PLACED]->(o) WHERE o.total>30000 — left outer."""
    g = build_graph(spark, sf_dir)
    from ..graph import prefix_columns

    left = prefix_columns(g.nodes_by_label("Customer"), "c")
    df = optional_expand(
        g,
        left,
        "c_id",
        RelSpec("r", "PLACED"),
        NodeSpec("o", "Order"),
        node_filter=F.col("o_totalprice") > 30000,
    )
    return df.groupBy(F.col("c_c_name").alias("c_name")).agg(
        F.count("o_o_orderkey").alias("n_big_orders")
    )


@register(
    "pattern_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 60000)
    """,
)
def pattern_semi_join(spark, sf_dir):
    """MATCH (c) WHERE (c)-[:PLACED]->(o WHERE o.total>60000) — semi join."""
    g = build_graph(spark, sf_dir)
    df = pattern_predicate(
        g,
        g.nodes_by_label("Customer"),
        "id",
        RelSpec("r", "PLACED"),
        NodeSpec("o", "Order"),
        node_filter=F.col("o_totalprice") > 60000,
    )
    return df.select("c_custkey", "c_name")


@register(
    "pattern_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 60000)
    """,
)
def pattern_anti_join(spark, sf_dir):
    """MATCH (c) WHERE NOT (c)-[:PLACED]->(o WHERE ...) — anti join."""
    g = build_graph(spark, sf_dir)
    df = pattern_predicate(
        g,
        g.nodes_by_label("Customer"),
        "id",
        RelSpec("r", "PLACED"),
        NodeSpec("o", "Order"),
        anti=True,
        node_filter=F.col("o_totalprice") > 60000,
    )
    return df.select("c_custkey", "c_name")


@register(
    "theta_join_inequality",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN supplier ON s_nationkey = n_nationkey
    WHERE s_acctbal > c_acctbal
    GROUP BY n_name
    """,
)
def theta_join_inequality(spark, sf_dir):
    """(c)-[:IN_NATION]->(n)<-[:IN_NATION]-(s) WHERE s.bal > c.bal — theta."""
    g = build_graph(spark, sf_dir)
    df = match_chain(
        g,
        [
            NodeSpec("c", "Customer"),
            RelSpec("r1", "IN_NATION"),
            NodeSpec("n", "Nation"),
            RelSpec("r2", "IN_NATION", direction="in"),
            NodeSpec("s", "Supplier"),
        ],
    )
    return (
        df.where(F.col("s_s_acctbal") > F.col("c_c_acctbal"))
        .groupBy(F.col("n_n_name").alias("n_name"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "rel_uniqueness_pairs",
    """
    SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS n_pairs
    FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey) t
    """,
)
def rel_uniqueness_pairs(spark, sf_dir):
    """(p1)<-[r1:CONTAINS]-(o)-[r2:CONTAINS]->(p2) — r1 != r2 injected.

    Cypher uniqueness: same MATCH never binds one relationship twice, so the
    result is ordered pairs of *distinct* lineitems per order (n²-n), not n².
    """
    g = build_graph(spark, sf_dir)
    df = match_chain(
        g,
        [
            NodeSpec("p1", "Part"),
            RelSpec("r1", "CONTAINS", direction="in"),
            NodeSpec("o", "Order"),
            RelSpec("r2", "CONTAINS"),
            NodeSpec("p2", "Part"),
        ],
    )
    return df.agg(F.count("*").alias("n_pairs"))


@register(
    "cartesian_product",
    """
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def cartesian_product(spark, sf_dir):
    """Disconnected patterns MATCH (r:Region), (s) — crossJoin."""
    g = build_graph(spark, sf_dir)
    r = g.nodes_by_label("Region").select("r_name")
    s = g.nodes_by_label("Order").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "var_length_reach",
    """
    SELECT 1 AS hops, CAST(COUNT(*) AS BIGINT) AS n FROM customer
    UNION ALL
    SELECT 2 AS hops, CAST(COUNT(*) AS BIGINT) AS n FROM customer
    """,
)
def var_length_reach(spark, sf_dir):
    """MATCH (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x) — var-length.

    Every customer reaches exactly its nation at 1 hop and its region at 2,
    so the per-hops distinct-pair counts both equal |Customer|.
    """
    g = build_graph(spark, sf_dir)
    vl = var_length_expand(
        g, g.nodes_by_label("Customer"), "id", ["IN_NATION", "IN_REGION"], 1, 2
    )
    return vl.groupBy("hops").agg(F.count("*").alias("n"))


# ----------------------------------------------------- 2.B.4 aggregations


@register(
    "agg_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape over CONTAINS properties — implicit grouping, sum/avg.

    Cypher has no GROUP BY: RETURN r.flag, r.status, sum(...) groups by the
    non-aggregated expressions; the engine infers the keys the same way.
    """
    g = build_graph(spark, sf_dir)
    li = g.rels_by_type("CONTAINS")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        money_sum(disc_price, 24, 6).alias("sum_disc_price"),
        money_sum(charge, 24, 6).alias("sum_charge"),
        (money_sum("l_quantity") / F.count("*")).alias("avg_qty"),
        (money_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
        (money_sum("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark, sf_dir):
    """count(DISTINCT x) alongside count(*) under implicit grouping."""
    g = build_graph(spark, sf_dir)
    df = g.expand("Customer", "PLACED", "Order", "c", "r", "o")
    return df.groupBy(F.col("c_c_mktsegment").alias("c_mktsegment")).agg(
        F.countDistinct("c_c_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_collect_sorted",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect(x) — surfaced as sorted CSV so the hash is order-stable."""
    g = build_graph(spark, sf_dir)
    df = g.expand("Nation", "IN_REGION", "Region", "n", "r", "g")
    return df.groupBy(F.col("g_r_name").alias("r_name")).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_n_name"))).alias("nations")
    )


@register(
    "agg_percentile_disc",
    """
    SELECT o_orderstatus, o_totalprice AS median_price FROM (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
      FROM orders) t
    WHERE rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
    """,
)
def agg_percentile_disc(spark, sf_dir):
    """percentileDisc(x, 0.5) — exact discrete median per group.

    Computed with the same rank-selection on both sides (not engine-native
    quantile functions, whose interpolation conventions differ).
    """
    g = build_graph(spark, sf_dir)
    o = g.nodes_by_label("Order")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    return (
        o.select(
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("cnt"),
        )
        .where(F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("long"))
        .select("o_orderstatus", F.col("o_totalprice").alias("median_price"))
    )


@register(
    "agg_stddev",
    """
    SELECT o_orderstatus,
           SQRT((sx2 - sx * sx / n) / (n - 1)) AS sd_price,
           CAST(n AS BIGINT) AS n
    FROM (
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx2,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus) t
    """,
)
def agg_stddev(spark, sf_dir):
    """stDev(x) — via exact decimal sums so both engines agree bit-for-bit."""
    g = build_graph(spark, sf_dir)
    o = g.nodes_by_label("Order")
    # square AFTER the decimal cast: decimal*decimal is exact on both
    # engines, while casting the double product x*x to decimal hits
    # shortest-repr-vs-binary rounding divergence (found by check_oracle).
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    agg = o.groupBy("o_orderstatus").agg(
        money_sum("o_totalprice").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sx2"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "o_orderstatus",
        F.sqrt((F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias(
            "sd_price"
        ),
        F.col("n"),
    )


# ---------------------------------------------- 2.B.5 ordering / limit / topk


@register(
    "order_by_limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def order_by_limit(spark, sf_dir):
    """ORDER BY ... DESC LIMIT n — TakeOrderedAndProject, no full sort."""
    g = build_graph(spark, sf_dir)
    return (
        g.nodes_by_label("Order")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "skip_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10
    """,
)
def skip_offset(spark, sf_dir):
    """SKIP 10 LIMIT 10 — pagination (DataFrame.offset, Spark 3.4+)."""
    g = build_graph(spark, sf_dir)
    return (
        g.nodes_by_label("Order")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(10)
    )


@register(
    "topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rk AS INT) AS rk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer) t
    WHERE rk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """top-k per group — window row_number + filter (SURVEY §2.B.5)."""
    g = build_graph(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        g.nodes_by_label("Customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


# --------------------------------------------------- 2.B.6 set ops / compose


@register(
    "union_distinct",
    "SELECT n_name AS name FROM nation UNION SELECT r_name FROM region",
)
def union_distinct(spark, sf_dir):
    """UNION (distinct) of two projections."""
    g = build_graph(spark, sf_dir)
    a = g.nodes_by_label("Nation").select(F.col("n_name").alias("name"))
    b = g.nodes_by_label("Region").select(F.col("r_name").alias("name"))
    return a.union(b).distinct()


@register(
    "union_all_counts",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
      (SELECT n_name AS name FROM nation UNION ALL SELECT r_name FROM region) t
    """,
)
def union_all_counts(spark, sf_dir):
    """UNION ALL keeps duplicates."""
    g = build_graph(spark, sf_dir)
    a = g.nodes_by_label("Nation").select(F.col("n_name").alias("name"))
    b = g.nodes_by_label("Region").select(F.col("r_name").alias("name"))
    return a.union(b).agg(F.count("*").alias("n"))


@register(
    "unwind_words_topk",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def unwind_words_topk(spark, sf_dir):
    """UNWIND split(text) AS word — explode + implicit-group count + top-k."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


@register(
    "with_pipeline_having",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING COUNT(*) > 60
    """,
)
def with_pipeline_having(spark, sf_dir):
    """MATCH ... WITH n, count(c) AS cnt WHERE cnt > 60 RETURN — pipeline."""
    g = build_graph(spark, sf_dir)
    df = g.expand("Customer", "IN_NATION", "Nation", "c", "r", "n")
    counted = df.groupBy(F.col("n_n_name").alias("n_name")).agg(
        F.count("*").alias("n_customers")
    )
    return counted.where(F.col("n_customers") > 60)


@register(
    "call_subquery_top_nation_per_region",
    """
    SELECT r_name, n_name, CAST(n_customers AS BIGINT) AS n_customers FROM (
      SELECT r_name, n_name, n_customers,
             ROW_NUMBER() OVER (PARTITION BY r_name
                                ORDER BY n_customers DESC, n_name) AS rk
      FROM (SELECT r_name, n_name, COUNT(*) AS n_customers
            FROM region JOIN nation ON n_regionkey = r_regionkey
                        JOIN customer ON c_nationkey = n_nationkey
            GROUP BY r_name, n_name) a) b
    WHERE rk = 1
    """,
)
def call_subquery_top_nation_per_region(spark, sf_dir):
    """CALL { MATCH ... RETURN top nation } per region — correlated subquery
    decorrelated to window-over-aggregate."""
    g = build_graph(spark, sf_dir)
    df = match_chain(
        g,
        [
            NodeSpec("c", "Customer"),
            RelSpec("r1", "IN_NATION"),
            NodeSpec("n", "Nation"),
            RelSpec("r2", "IN_REGION"),
            NodeSpec("g", "Region"),
        ],
    )
    counted = df.groupBy(
        F.col("g_r_name").alias("r_name"), F.col("n_n_name").alias("n_name")
    ).agg(F.count("*").alias("n_customers"))
    w = Window.partitionBy("r_name").orderBy(F.col("n_customers").desc(), F.col("n_name"))
    return (
        counted.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .select("r_name", "n_name", "n_customers")
    )


@register(
    "intersect_names",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier
    """,
)
def intersect_names(spark, sf_dir):
    """intersect — nations having both customers and suppliers."""
    g = build_graph(spark, sf_dir)
    a = g.rels_by_type("IN_NATION").where(F.col("src") >= 3_000_000_000_000).where(
        F.col("src") < 4_000_000_000_000
    )
    # customers' nations ∩ suppliers' nations, mapped back to business keys
    c = a.select((F.col("dst") - 2_000_000_000_000).cast("int").alias("nationkey"))
    b = g.rels_by_type("IN_NATION").where(F.col("src") >= 4_000_000_000_000)
    s = b.select((F.col("dst") - 2_000_000_000_000).cast("int").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
    EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 9900
    """,
)
def except_nations(spark, sf_dir):
    """except (set difference) — nations with positive-balance customers
    but none above the 9900 cutoff."""
    c = load_tables(spark, sf_dir)["customer"]
    a = c.where(F.col("c_acctbal") > 0).select(F.col("c_nationkey").alias("nationkey"))
    b = c.where(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("nationkey"))
    return a.distinct().exceptAll(b.distinct())


@register(
    "agg_percentile_cont",
    """
    WITH s AS (
      SELECT o_orderstatus, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders)
    SELECT o_orderstatus,
           CAST(SUM(CASE
             WHEN rk = CAST(floor(1 + (n - 1) * 0.5) AS BIGINT)
               THEN o_totalprice * (1 - ((n - 1) * 0.5 - floor((n - 1) * 0.5)))
             WHEN rk = CAST(floor(1 + (n - 1) * 0.5) AS BIGINT) + 1
               THEN o_totalprice * ((n - 1) * 0.5 - floor((n - 1) * 0.5))
             ELSE 0 END) AS DOUBLE) AS p50
    FROM s GROUP BY o_orderstatus
    """,
)
def agg_percentile_cont(spark, sf_dir):
    """percentileCont(x, 0.5) — linear-interpolated median per group,
    computed with the same explicit rank/interpolation formula on both
    sides (engine-native quantile functions differ in convention)."""
    g = build_graph(spark, sf_dir)
    o = g.nodes_by_label("Order")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    pos = (F.col("n") - 1) * 0.5
    lo = F.floor(pos) + 1
    frac = pos - F.floor(pos)
    contrib = (
        F.when(F.col("rk") == lo.cast("long"), F.col("o_totalprice") * (1 - frac))
        .when(F.col("rk") == lo.cast("long") + 1, F.col("o_totalprice") * frac)
        .otherwise(F.lit(0.0))
    )
    return (
        o.select("o_orderstatus", "o_totalprice", "o_orderkey")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .groupBy("o_orderstatus")
        .agg(F.sum(contrib).cast("double").alias("p50"))
    )


@register(
    "agg_rollup_volumes",
    """
    SELECT COALESCE(c_mktsegment, '<all>') AS segment,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
    """,
)
def agg_rollup_volumes(spark, sf_dir):
    """ROLLUP hierarchy totals (segment → priority → grand total) in ONE
    aggregation pass — Spark's ``rollup()`` computes all grouping sets
    with map-side partial aggregation, no per-level re-scan. Exact
    decimal sums; NULL grouping keys surface as '<all>' on both sides."""
    t = load_tables(spark, sf_dir)
    j = t["orders"].join(
        t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
    )
    return (
        j.rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "volume",
        )
    )


@register(
    "events_moving_average",
    """
    WITH v AS (
      SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,2)) AS val
      FROM events),
    w AS (
      SELECT event_type, ts, event_id,
             SUM(val) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS k
      FROM v)
    SELECT event_id, event_type,
           CAST(ROUND(CAST(s AS DOUBLE) / k * 1000) AS BIGINT) AS ma_milli
    FROM w
    """,
)
def events_moving_average(spark, sf_dir):
    """5-row trailing moving average per event type — the time-series
    smoothing window, partitioned by type (never a global sort) with a
    (ts, event_id) total order and exact DECIMAL running sums; the
    average surfaces milli-rounded from the same exact fraction on both
    engines."""
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"]
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    val = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "event_type",
        F.round(
            F.sum(val).over(w).cast("double") / F.count("*").over(w) * 1000
        )
        .cast("long")
        .alias("ma_milli"),
    )


@register(
    "events_lag_lead_delta",
    """
    WITH v AS (SELECT user_id, ts, event_id,
                      CAST(value AS DECIMAL(18,2)) AS val FROM events)
    SELECT event_id,
           CAST(ROUND(CAST(val - COALESCE(LAG(val) OVER w, val) AS DOUBLE) * 1000)
                AS BIGINT) AS delta_milli,
           CAST(LEAD(event_id) OVER w AS BIGINT) AS next_event
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_lag_lead_delta(spark, sf_dir):
    """LAG/LEAD per user stream: value delta against the previous event
    and the next event id — the change-detection window shape,
    partitioned by user (never a global sort), exact DECIMAL deltas
    milli-scaled."""
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    val = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        F.round(
            (val - F.coalesce(F.lag(val).over(w), val)).cast("double") * 1000
        )
        .cast("long")
        .alias("delta_milli"),
        F.lead("event_id").over(w).cast("long").alias("next_event"),
    )


@register(
    "agg_cube_volumes",
    """
    SELECT COALESCE(c_mktsegment, '<all>') AS segment,
           COALESCE(o_orderstatus, '<all>') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
)
def agg_cube_volumes(spark, sf_dir):
    """CUBE grouping sets — all four (segment, status) marginals in one
    aggregation pass (Spark expands the grouping sets map-side, no
    re-scan per set)."""
    t = load_tables(spark, sf_dir)
    j = t["orders"].join(
        t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
    )
    return (
        j.cube("c_mktsegment", "o_orderstatus")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .select(
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "n_orders",
        )
    )


@register(
    "rank_percentile_suppliers",
    """
    WITH s AS (SELECT s_suppkey, s_nationkey,
                      CAST(s_acctbal AS DECIMAL(18,2)) AS bal FROM supplier)
    SELECT s_suppkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(ROUND(PERCENT_RANK() OVER w * 1e6) AS BIGINT) AS pct_micro,
           CAST(ROUND(CUME_DIST() OVER w * 1e6) AS BIGINT) AS cume_micro
    FROM s WINDOW w AS (PARTITION BY s_nationkey ORDER BY bal DESC, s_suppkey)
    """,
)
def rank_percentile_suppliers(spark, sf_dir):
    """RANK / PERCENT_RANK / CUME_DIST per nation over supplier balances
    — the ranked-percentile window family with a unique tiebreak;
    rational ranks micro-scaled (exact int/int division on both
    engines)."""
    from pyspark.sql import Window as W

    s = load_tables(spark, sf_dir)["supplier"]
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").cast("decimal(18,2)").desc(), "s_suppkey"
    )
    return s.select(
        "s_suppkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.round(F.percent_rank().over(w) * 1e6).cast("long").alias("pct_micro"),
        F.round(F.cume_dist().over(w) * 1e6).cast("long").alias("cume_micro"),
    )


@register(
    "agg_above_customer_avg",
    """
    WITH ca AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM orders o JOIN ca ON ca.ck = o.o_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * ca.n > 1.5 * ca.s
    """,
)
def agg_above_customer_avg(spark, sf_dir):
    """Correlated-scalar-subquery shape (TPC-H Q17 family): orders above
    1.5× their own customer's average, DECORRELATED to one groupBy +
    one equi-join — the rewrite Catalyst applies to correlated
    subqueries, written declaratively. The comparison cross-multiplies
    (price·n > 1.5·sum) so no division touches the predicate; sums are
    exact DECIMAL."""
    t = load_tables(spark, sf_dir)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    ca = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(dec).cast("double").alias("s"),
            F.count("*").cast("long").alias("n"),
        )
    )
    o = t["orders"]
    j = o.join(ca, o["o_custkey"] == ca["ck"]).where(
        dec * F.col("n") > F.lit(1.5) * F.col("s")
    )
    return j.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(dec).cast("double").alias("volume"),
    )


@register(
    "agg_pivot_status_by_segment",
    """
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_orders
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def agg_pivot_status_by_segment(spark, sf_dir):
    """PIVOT (orderstatus columns per segment) — Spark's
    ``groupBy().pivot(values)`` with EXPLICIT pivot values, which skips
    the extra distinct-scan pass and compiles to the same conditional
    aggregation the SQL FILTER form expresses."""
    t = load_tables(spark, sf_dir)
    j = t["orders"].join(
        t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"]
    )
    out = (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "segment",
        F.coalesce("F", F.lit(0)).cast("long").alias("f_orders"),
        F.coalesce("O", F.lit(0)).cast("long").alias("o_orders"),
        F.coalesce("P", F.lit(0)).cast("long").alias("p_orders"),
    ).orderBy("segment")


@register(
    "events_value_histogram",
    """
    WITH b AS (SELECT CAST(FLOOR(CAST(value AS DECIMAL(18,2)) / 10) AS BIGINT)
                 AS bucket FROM events)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def events_value_histogram(spark, sf_dir):
    """Fixed-width value histogram (width 10): map-side integer binning
    via exact DECIMAL floor-division + one groupBy over the tiny bucket
    domain."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(
            F.floor(F.col("value").cast("decimal(18,2)") / 10)
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket")
    )
