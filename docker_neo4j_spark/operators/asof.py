"""As-of (most-recent-match) join — the temporal enrichment primitive.

Not a reference operator (the packaged engine has no as-of join); included
under the training-data/event-analytics mandate: joining each event to the
latest state row at-or-before its timestamp is how feature snapshots,
price marks, and session context get attached at scale.

Spark realization: the UNION + window trick, not a range join —
tag both inputs, union them, and take ``last(value, ignorenulls=True)``
over a window partitioned by the equi-key and ordered by (time, side).
One shuffle on the equi-key, no per-row range probe, no cross product:
the shape a range join would optimize into on a sorted engine, expressed
directly. Scales as a single hash-partitioned sort — the skew caveat is
the equi-key's cardinality, same as any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """For every ``left`` row, attach the ``value_cols`` of the latest
    ``right`` row with the same ``by`` key and ``right.on <= left.on``
    (backward as-of, inclusive — DuckDB/pandas ``merge_asof`` default).

    Returns all ``left`` columns plus ``<col><suffix>`` for each value
    column (null when no prior right row exists). Ties at equal ``on``:
    the right row is visible to the left row (right sorts first).

    All value columns travel in ONE struct tagged per right row, and the
    window takes ``last(struct, ignorenulls=True)`` — so (a) a matched
    right row whose value is legitimately NULL surfaces as NULL instead
    of being skipped for an older non-null value, and (b) multi-column
    results are row-atomic (never a mix of two right rows), matching
    DuckDB ASOF JOIN / pandas ``merge_asof`` semantics.
    """
    lcols = left.columns
    rv = "_rv_struct"
    struct_t = F.struct(*[F.col(c).alias(c) for c in value_cols])
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(right.select(struct_t.alias(rv)).schema[rv].dataType)
        .alias(rv),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, by) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        struct_t.alias(rv),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged_l.unionByName(tagged_r).select(
        *lcols,
        F.col("_side"),
        F.last(rv, ignorenulls=True).over(w).alias(rv),
    )
    return enriched.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"{rv}.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
