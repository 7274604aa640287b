"""Frequency sketches over DataFrames — the approximate-counting side of
the analytics surface (SURVEY §2.B.7 lists approx_count_distinct; a
count-min sketch is the same engineering trade for per-key frequencies,
and the streaming trending/top-k path's scale hedge when the key space
stops fitting an exact groupBy).

Count-min (Cormode & Muthukrishnan 2005): depth×width counters; every key
increments one counter per row (bucket = md5-derived hash), a point query
reads the MIN across rows — an overestimate with error ≤ εN at
probability 1−δ for width = e/ε, depth = ln(1/δ).

The hash is md5-derived (same ``conv(substr(md5…)))`` convention as
MinHash/SimHash here), so the whole sketch is DETERMINISTIC and replays
exactly in SQL — build and query are oracle-checkable, unlike RNG-seeded
sketch libraries.

Scale shape: build is one map + one groupBy over (row, bucket) — the
sketch itself is depth×width rows (KBs), broadcastable to any query side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key, d: int, width: int, salt: str):
    """Row-d bucket for a key: first 8 md5 hex chars → long, mod width.
    Positive (≤ 2³²−1), so `%` agrees across engines."""
    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.lit(str(d)), key.cast("string"))
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch: (row, bucket, count) with depth×width ≥ rows.
    One union of depth map passes + one groupBy — no per-key state."""
    parts = [
        df.select(
            F.lit(d).alias("row"), _bucket(F.col(key_col), d, width, salt)
        )
        for d in range(depth)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("row", "bucket").agg(F.count("*").cast("long").alias("count"))


def countmin_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every key in ``keys``: (key, est) with
    est = min over rows of the key's counter (0 when a counter row is
    absent — an untouched bucket). The sketch side is depth×width rows —
    broadcast it."""
    probes = None
    for d in range(depth):
        p = keys.select(
            F.col(key_col).alias("key"),
            F.lit(d).alias("row"),
            _bucket(F.col(key_col), d, width, salt),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("est"))
    )


def countmin_build_windowed(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 day",
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Per-event-time-window sketches: (win_start, row, bucket, count) —
    the streaming shape: state per window is depth×width counters no
    matter how many distinct keys the window saw, and closed windows'
    sketches are immutable (watermark-evictable under a streaming
    aggregation)."""
    w = F.window(F.col(ts_col), window).start.alias("win_start")
    parts = [
        df.select(
            w, F.lit(d).alias("row"), _bucket(F.col(key_col), d, width, salt)
        )
        for d in range(depth)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("win_start", "row", "bucket").agg(
        F.count("*").cast("long").alias("count")
    )


def countmin_query_windowed(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query every key against every window present in the sketch:
    (win_start, key, est). The probe set is |windows|×|keys|×depth rows —
    both sides small; the sketch broadcasts."""
    wins = sketch.select("win_start").distinct()
    probes = None
    for d in range(depth):
        p = wins.crossJoin(
            keys.select(F.col(key_col).alias("key"))
        ).select(
            "win_start",
            "key",
            F.lit(d).alias("row"),
            _bucket(F.col("key"), d, width, salt),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), ["win_start", "row", "bucket"], "left")
        .groupBy("win_start", "key")
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("est"))
    )
