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

from pyspark.sql import DataFrame


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
