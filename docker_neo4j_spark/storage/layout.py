"""Physical storage layouts for cluster scale: bucketing + partitioning.

At 100 TB the dominant cost of pattern matching is the shuffle that
co-locates nodes with their relationships. Two standard Spark layouts
remove it:

- **Bucketed tables** (``bucketBy`` on the join key, ``saveAsTable``):
  a bucketed-bucketed equi-join on the bucket key runs with NO exchange
  on either side — each task joins bucket i against bucket i. That is
  the persistent analog of the reference engine's adjacency locality:
  rels bucketed by ``src`` join nodes bucketed by ``id`` shuffle-free.
- **Partitioned directories** (``partitionBy`` on a low-cardinality
  column): a filter on the partition column prunes whole directories at
  planning time (``PartitionFilters`` in the scan) — the engine's
  label/type pruning made durable on disk.

Both are plan-audited in tests/test_plan_audit.py — the claim "no
exchange / pruned partitions" is asserted against the physical plan, not
just documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..graph import PropertyGraph


def save_bucketed_graph(
    graph: PropertyGraph, name: str, buckets: int = 64
) -> None:
    """Persist the graph as bucketed tables ``<name>_nodes`` (bucketed by
    ``id``) and ``<name>_rels`` (bucketed by ``src``), both sorted within
    buckets. ``buckets`` should be sized so one bucket of the largest
    table fits an executor's memory at target scale (e.g. 100 TB / 64k
    buckets ≈ 1.6 GB)."""
    spark = graph.nodes.sparkSession
    for suffix in ("nodes", "rels"):
        # a fresh session's in-memory catalog doesn't know about a previous
        # run's table, but saveAsTable still refuses while the warehouse
        # dir exists — drop the registration AND the orphaned location
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        loc = spark._jvm.org.apache.hadoop.fs.Path(
            f"{spark.conf.get('spark.sql.warehouse.dir')}/{name}_{suffix}"
        )
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    (
        graph.nodes.write.mode("overwrite")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .format("parquet")
        .saveAsTable(f"{name}_nodes")
    )
    (
        graph.rels.write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .format("parquet")
        .saveAsTable(f"{name}_rels")
    )


def load_bucketed_graph(spark: SparkSession, name: str) -> PropertyGraph:
    """Reload a bucketed graph; joins on the bucket keys are exchange-free."""
    return PropertyGraph(
        nodes=spark.table(f"{name}_nodes"), rels=spark.table(f"{name}_rels")
    )


def bucketed_expand(spark: SparkSession, name: str) -> DataFrame:
    """1-hop expand over the bucketed layout: nodes⋈rels on the bucket key.

    With both sides bucketed to the same count, the physical plan contains
    no Exchange for this join — the property the layout exists to buy.
    """
    nodes = spark.table(f"{name}_nodes")
    rels = spark.table(f"{name}_rels")
    return nodes.join(rels, nodes["id"] == rels["src"])


def save_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Write a directory-partitioned dataset (one dir per value of
    ``partition_col``); equality filters on it prune at planning time."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)
