"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``docker_neo4j_spark/catalog/`` — one registered
query (+ oracle where SQL-expressible) per implemented operator from
SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    2-hop pattern (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part)
    with implicit-grouping aggregation — the reference's own smoke shape
    (MATCH (a:dog)-[:SNIFFS]->(b:dog), DatabaseIO.java:51) scaled onto the
    TPC-H-ish graph.
    """
    from docker_neo4j_spark.catalog import QUERIES, load_all

    load_all()
    return QUERIES["expand_two_hop"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from docker_neo4j_spark.catalog import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    from docker_neo4j_spark.catalog import ORACLES, load_all

    load_all()
    return dict(ORACLES)
