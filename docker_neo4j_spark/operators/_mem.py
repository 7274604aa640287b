"""Release helper for checkpointed frames (r14).

``DataFrame.unpersist()`` only removes catalog-cached queries; the blocks
behind ``localCheckpoint`` (eager or lazy) register as *persistent RDDs*
(exactly the class of blocks ``bench.py`` has to clear with
``getPersistentRDDs()`` between queries, because ``clearCache()`` misses
them). Every "superseded BSP state frame" release in the iterative
kernels therefore silently no-opped until r14: pinned frames accumulated
O(rounds) deep until the session (or the bench harness) swept them.

``release`` frees a checkpointed frame's blocks through the underlying
``LogicalRDD``; on a plain derived frame it falls back to the ordinary
(catalog) unpersist, so call sites can treat it as "free this frame"
regardless of how the frame was produced.

CAUTION: a locally-checkpointed RDD's lineage is truncated — its blocks
cannot be recomputed after release. Only release a frame once every
frame derived from it has materialized (the kernels' "one round behind"
discipline).
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def _loop_width(spark: SparkSession, sized_by: DataFrame | None) -> int:
    """Static shuffle width for a BSP loop body, derived from input size.

    With AQE off inside ``static_loop_plan`` there is no partition
    coalescing, so a loop would otherwise run every per-round shuffle at
    the session's full ``spark.sql.shuffle.partitions`` — a constant tuned
    for the whole cluster, paying ~width empty tasks per round on small
    graphs. Re-derive the width the way AQE's coalescing would: enough
    partitions to keep each at the advisory size, floored at the ceiling
    of ``defaultParallelism`` (the loop's join compute runs over the
    co-partitioned edge cache, so width is also its parallelism), capped
    at the session setting so a cluster-tuned config is never exceeded.
    ``sized_by`` is the kernel's edge frame — the one large input every
    per-round join streams through. Sizing uses Catalyst's estimate for
    that frame (same signal AQE plans from); unknown/huge estimates hit
    the cap, so at the 100 TB target this is a no-op.
    """
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    forced = os.environ.get("SPARK_GRAFT_LOOP_PARTS", "")
    if forced:
        return max(1, int(forced))
    if sized_by is None:
        return cap
    try:
        raw = (
            sized_by._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # py4j converts scala.math.BigInt to int when it fits; be defensive.
        size = raw if isinstance(raw, int) else int(str(raw))
        # Deliberately smaller than AQE's 64 MB advisory: AQE coalescing
        # only resizes a post-shuffle reduce side, while this width also
        # carries the whole superstep's join compute over the
        # co-partitioned edge cache (measured sf0.1: pagerank needs ≥4
        # even though its edge cache is ~53 MiB; 64 MB would pick 1 and
        # run 2× slower).
        target = int(
            spark.conf.get(
                "spark.graft.loop.targetPartitionBytes", str(8 << 20)
            )
        )
        width = max(min(math.ceil(size / target), cap), 1)
        if os.environ.get("SPARK_GRAFT_LOOP_DEBUG"):
            print(f"[loop_width] size={size} width={width} cap={cap}")
        return width
    except Exception:  # noqa: BLE001 - sizing is best-effort
        return cap


@contextmanager
def static_loop_plan(spark: SparkSession, sized_by: DataFrame | None = None):
    """Plan a BSP kernel body with the static planner (AQE off, restored).

    The iterative kernels engineer their per-round physical shape by hand:
    the edge frame is ``repartition(key).cache()``-ed once, and each round's
    state checkpoint comes out of a ``groupBy(key)`` whose hash partitioning
    ``localCheckpoint`` preserves — so the round's state⋈edges join needs no
    exchange on either side. AQE silently defeats both halves (measured r14,
    gds_pagerank at sf0.1):

    - a join against a checkpointed state sees ``LogicalRDD``'s unknown
      (huge) size stats, so Catalyst broadcasts the OTHER side — rebuilding
      a fresh BroadcastExchange of the whole cached EDGE frame every round
      (52.7 MiB × 15 rounds on the headline row; at the 100 TB target that
      side does not fit in driver memory at all), and
    - AQE's partition coalescing rewrites the state aggregate's output
      partitioning, so the next round's join re-exchanges BOTH sides.

    With the static planner the checkpoint's hash partitioning survives and
    a ``shuffle_hash`` hint on the (small) state side plans the round as a
    zero-exchange ShuffledHashJoin: edges never move, only the ≤|N|-row
    aggregate output shuffles — the textbook Pregel cost model. Measured
    (interleaved A/B, sf0.1 pagerank): 82 → 25 jobs, every paired run
    faster, bit-identical output. Skew note: per-round aggregates group by
    node id over the co-partitioned layout the kernel chose; AQE's
    skew-join splitting only rewrites sort-merge joins, which these loops
    deliberately do not contain, so nothing is lost at cluster scale.

    ``sized_by`` (r14, guide §2.2 "derive partitioning from input size"):
    with AQE off there is no partition coalescing, so the loop body also
    runs under a ``spark.sql.shuffle.partitions`` re-derived from the
    kernel's edge-frame size (see ``_loop_width``) instead of the session
    constant — every ``repartition(key)``/``groupBy`` inside the body
    resolves its width from it at plan time, so the state↔edge
    co-partitioning (and the zero-exchange rounds) hold at ANY width.
    Kernels with multiplicative per-round state (betweenness, closeness,
    CELF) pass no ``sized_by`` and keep the session width."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_loop_width(spark, sized_by))
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def release(df: DataFrame | None) -> None:
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return
    except Exception:  # noqa: BLE001 - releasing is best-effort
        pass
    try:
        df.unpersist()
    except Exception:  # noqa: BLE001
        pass


def release_deep(df: DataFrame | None) -> None:
    """Free EVERY checkpointed (``LogicalRDD``) leaf under ``df``'s plan.

    For a frame that is a pure derivation over checkpoints — e.g. the
    projection a kernel returns over its final BSP state, abandoned by the
    caller after use — ``release`` no-ops (the root is a ``Project``, not
    the ``LogicalRDD``). This walks the analyzed plan's leaves instead.

    CAUTION: stronger contract than ``release`` — the caller asserts that
    NOTHING else references any checkpoint under this plan. Only use on
    frames whose whole derivation chain is private and fully consumed."""
    if df is None:
        return
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - releasing is best-effort
        pass
