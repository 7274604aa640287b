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

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def static_loop_plan(spark: SparkSession):
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
    deliberately do not contain, so nothing is lost at cluster scale."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


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
