"""Loaders for the driver-provided TPC-H-ish parquet tables and their
projection onto the engine's property-graph model.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. The graph projection follows FIXTURES.md §5:
one node label per entity table, one relationship type per foreign key.

Scale notes: each table is a plain parquet read — filters/projections push
down. Node ids are derived arithmetically from the table primary keys with a
per-label offset (no shuffle, no monotonically_increasing_id nondeterminism),
so id allocation is deterministic and partition-local at any scale.
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


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    # events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    # read nanos as long and truncate to micros (same truncation DuckDB
    # applies when it loads ns into its us-precision TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
    ev = out["events"]
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    out["events"] = ev
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
    """
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
    node_frames = []
    all_props: list[str] = []
    for label, (_, _, props) in prop_cols.items():
        for p in props:
            if p not in all_props:
                all_props.append(p)
    for label, (table, key, props) in prop_cols.items():
        df = nodes_of(t[table], label, key, props)
        # schema-union: per-label property sets evolve independently
        # (SURVEY.md §1.2 "schema-on-write per label")
        missing = [p for p in all_props if p not in props]
        for m in missing:
            df = df.withColumn(m, F.lit(None))
        node_frames.append(df.select("id", "labels", *all_props))
    nodes = node_frames[0]
    for df in node_frames[1:]:
        nodes = nodes.unionByName(df)

    def rel(df: DataFrame, rtype: str, src_col: F.Column, dst_col: F.Column, props: list[str]) -> DataFrame:
        return df.select(
            F.monotonically_increasing_id().alias("_row"),
            src_col.alias("src"),
            dst_col.alias("dst"),
            F.lit(rtype).alias("type"),
            *[F.col(p) for p in props],
        ).drop("_row")

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
    rel_frames = [
        rel(t["nation"], "IN_REGION", node_id("Nation", "n_nationkey"), node_id("Region", "n_regionkey"), []),
        rel(t["customer"], "IN_NATION", node_id("Customer", "c_custkey"), node_id("Nation", "c_nationkey"), []),
        rel(t["supplier"], "IN_NATION", node_id("Supplier", "s_suppkey"), node_id("Nation", "s_nationkey"), []),
        rel(t["orders"], "PLACED", node_id("Customer", "o_custkey"), node_id("Order", "o_orderkey"), []),
        rel(
            t["lineitem"],
            "CONTAINS",
            node_id("Order", "l_orderkey"),
            node_id("Part", "l_partkey"),
            lineitem_props,
        ),
        rel(
            t["lineitem"],
            "SUPPLIED_BY",
            node_id("Part", "l_partkey"),
            node_id("Supplier", "l_suppkey"),
            lineitem_props,
        ),
    ]
    all_rel_props: list[str] = lineitem_props
    unioned = []
    for df in rel_frames:
        for m in [p for p in all_rel_props if p not in df.columns]:
            df = df.withColumn(m, F.lit(None))
        unioned.append(df.select("src", "dst", "type", *all_rel_props))
    rels = unioned[0]
    for df in unioned[1:]:
        rels = rels.unionByName(df)
    # deterministic rel id: hash of (src, dst, type, linenumber) — collision-safe
    # enough for analytics; real writes allocate from the store (storage layer).
    rels = rels.withColumn(
        "id", F.xxhash64(F.col("src"), F.col("dst"), F.col("type"), F.col("l_linenumber"))
    ).select("id", "src", "dst", "type", *all_rel_props)
    return PropertyGraph(nodes=nodes, rels=rels)
