"""Path enumeration: shortestPath / allShortestPaths (SURVEY.md §2.B.3).

``var_length_expand`` (patterns.py) answers *reachability* — min hops per
(start, end). This module materializes the *paths themselves* as node-id
arrays, which is what Cypher's ``shortestPath((a)-[*..k]->(b))`` /
``allShortestPaths`` bind.

BSP shape: the frontier carries the path array; each superstep joins the
frontier against the edge set and appends the next node. Simple-path
semantics (no repeated node within one path — Cypher's rule) via an
``array_contains`` guard, which also makes the loop terminate on cyclic
graphs. Paths explode combinatorially by nature — the operator is meant
for bounded ``max_hops`` and/or a filtered start set, exactly like the
reference engine's planner assumes.
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enumerate_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    targets: DataFrame | None = None,
    min_hops: int = 1,
) -> DataFrame:
    """All simple paths of length min_hops..max_hops from ``sources``
    (id col); ``min_hops=0`` adds the trivial start=end path (the QPP
    ``*``/``{0,n}`` quantifier — r12).

    Returns (start_id, end_id, hops, path) with ``path`` the full node-id
    array. ``targets`` (id col) filters end nodes if given.
    """
    e = edges.select("src", "dst").distinct().repartition("src").cache()
    frontier = sources.select(
        F.col("id").alias("start_id"),
        F.col("id").alias("end_id"),
        F.array(F.col("id")).alias("path"),
    )
    out = (
        frontier.withColumn("hops", F.lit(0).cast("long"))
        if min_hops == 0
        else None
    )
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier["end_id"] == e["src"])
            .where(~F.array_contains(F.col("path"), F.col("dst")))  # simple paths
            .select(
                "start_id",
                F.col("dst").alias("end_id"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
        )
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        step = frontier.withColumn("hops", F.lit(hop).cast("long"))
        out = step if out is None else out.unionByName(step)
    if out is None:
        return local_df(sources.sparkSession, 
            [], "start_id long, end_id long, hops long, path array<bigint>"
        )
    if targets is not None:
        out = out.join(
            targets.select(F.col("id").alias("end_id")).distinct(), "end_id", "left_semi"
        )
    return out.select("start_id", "end_id", "hops", "path")


def all_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    targets: DataFrame | None = None,
) -> DataFrame:
    """``allShortestPaths``: every minimum-length path per (start, end).

    Enumerate up to ``max_hops`` then keep paths whose length equals the
    per-pair minimum (one extra groupBy-min + semi-join — no second
    traversal).
    """
    paths = enumerate_paths(edges, sources, max_hops, targets)
    mins = paths.groupBy("start_id", "end_id").agg(F.min("hops").alias("hops"))
    return paths.join(mins, ["start_id", "end_id", "hops"])


def shortest_path(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    targets: DataFrame | None = None,
) -> DataFrame:
    """``shortestPath``: ONE deterministic minimum-length path per pair —
    the lexicographically smallest node-id sequence among the shortest
    (the reference picks an arbitrary one; we pick a stable one so results
    are reproducible and oracle-comparable)."""
    best = all_shortest_paths(edges, sources, max_hops, targets)
    return (
        best.groupBy("start_id", "end_id", "hops")
        .agg(F.min("path").alias("path"))
    )


def k_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    max_hops: int,
    weight_col: str | None = None,
    targets: DataFrame | None = None,
) -> DataFrame:
    """K-shortest loopless paths per (start, end) pair — the result set
    of Yen's algorithm (reference surface: gds.shortestPath.yens),
    computed SET-WISE: bounded simple-path enumeration with an
    accumulated cost, then a per-pair top-k window ordered by
    (cost, path-string). Yen's sequential deviation loop is inherently
    serial per pair; under a bounded ``max_hops`` — the same bound the
    reference planner assumes for path enumeration — the whole K-set
    falls out of one traversal shared across EVERY pair at once, which
    is the shape a 1000-executor cluster wants (one BSP frontier, one
    window), not |pairs|·K sequential Dijkstra re-runs.

    Parallel edges collapse to the minimum weight first (the cheaper
    edge dominates any path using the dearer twin). Unweighted
    (``weight_col=None``): cost = hops. Returns (start_id, end_id,
    rank, cost, path_str).
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = (
        edges.select("src", "dst", w.alias("_w"))
        .groupBy("src", "dst")
        .agg(F.min("_w").alias("_w"))
        .repartition("src")
        .cache()
    )
    frontier = sources.select(
        F.col("id").alias("start_id"),
        F.col("id").alias("end_id"),
        F.array(F.col("id")).alias("path"),
        F.lit(0).cast("long").alias("cost"),
    )
    out = None
    for _hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier["end_id"] == e["src"])
            .where(~F.array_contains(F.col("path"), F.col("dst")))
            .select(
                "start_id",
                F.col("dst").alias("end_id"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                (F.col("cost") + F.col("_w")).alias("cost"),
            )
        )
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        out = frontier if out is None else out.unionByName(frontier)
    if out is None:
        return local_df(sources.sparkSession, 
            [], "start_id long, end_id long, rank long, cost long, path_str string"
        )
    if targets is not None:
        out = out.join(
            targets.select(F.col("id").alias("end_id")).distinct(),
            "end_id",
            "left_semi",
        )
    from pyspark.sql import Window

    ranked = out.select(
        "start_id",
        "end_id",
        "cost",
        F.concat_ws("->", F.transform("path", lambda x: x.cast("string"))).alias(
            "path_str"
        ),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("start_id", "end_id").orderBy("cost", "path_str")
        ).cast("long"),
    )
    e.unpersist()
    return ranked.where(F.col("rank") <= k).select(
        "start_id", "end_id", "rank", "cost", "path_str"
    )
