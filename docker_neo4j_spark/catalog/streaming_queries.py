"""Streaming-surface queries (SURVEY.md §2.B.8).

The windowed aggregate is graded through its *batch twin*: the same
``windowed_counts`` transformation runs on the static events table and is
hash-matched against DuckDB's tumbling-window SQL. Structured Streaming
guarantees the streaming execution of the identical plan produces the
same rows (verified end-to-end in tests/test_streaming.py with a real
micro-batch run); money-style sums go through exact DECIMAL to dodge
double-summation order nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tpch import load_tables
from ..streaming.events import dedup_within_watermark, session_counts, windowed_counts
from . import register


def _fmt_ts(col: str):
    """Catalog convention (catalog/__init__.py): timestamps surface as
    formatted strings — a raw timestamp column would hit the driver
    canonicalizer's engine-specific datetime dtype handling."""
    return F.date_format(F.col(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")


@register(
    "stream_session_windows_batch",
    """
    WITH t AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM t)
    SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_windows_batch(spark, sf_dir):
    """Gap-based session windows — batch twin of the streaming
    session_window aggregate, graded against gaps-and-islands SQL."""
    ev = load_tables(spark, sf_dir)["events"]
    out = session_counts(ev, gap="5 minutes")
    return out.withColumn("session_start", _fmt_ts("session_start"))


@register(
    "stream_sessionize_batch",
    """
    WITH t AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM t)
    SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_sessionize_batch(spark, sf_dir):
    """Batch twin of the event-time-timeout sessionizer (the
    applyInPandasWithState operator whose streaming close-on-timeout path
    is pytest-graded); (user, start, end, n) per gap session."""
    from ..streaming.events import stateful_sessionize

    ev = load_tables(spark, sf_dir)["events"]
    out = stateful_sessionize(ev, gap="10 minutes")
    return out.withColumn("session_start", _fmt_ts("session_start")).withColumn(
        "session_end", _fmt_ts("session_end")
    )


@register(
    "stream_windowed_counts_batch",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_counts_batch(spark, sf_dir):
    """Tumbling 1-hour window per event type — batch twin of the
    streaming aggregate (same code path, exact decimal sums)."""
    ev = load_tables(spark, sf_dir)["events"]
    out = windowed_counts(ev, window="1 hour", exact_sums=True)
    return out.withColumn("window_start", _fmt_ts("window_start"))


@register(
    "stream_static_enrich_batch",
    """
    SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events LEFT JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2 ORDER BY segment, event_type
    """,
)
def stream_static_enrich_batch(spark, sf_dir):
    """r8: stream-static enrichment join (the canonical micro-batch
    pattern: broadcast the dimension snapshot into each batch) — events
    enriched with the customer segment, then per-(segment, type) exact
    sums. Batch twin of the same code path; stream==batch parity is
    pytest-pinned (test_streaming)."""
    from ..streaming.events import enrich_with_dimension

    t = load_tables(spark, sf_dir)
    enriched = enrich_with_dimension(
        t["events"], t["customer"], "user_id", "c_custkey", ["c_mktsegment"]
    )
    return (
        enriched.groupBy(
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("segment", "event_type")
    )


@register(
    "stream_dedup_batch",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_after_dedup
    FROM (SELECT DISTINCT ON (event_id) * FROM
            (SELECT * FROM events UNION ALL SELECT * FROM events))
    """,
)
def stream_dedup_batch(spark, sf_dir):
    """Dedup-on-key batch twin: doubled input collapses to distinct ids."""
    ev = load_tables(spark, sf_dir)["events"]
    doubled = ev.unionByName(ev)
    return dedup_within_watermark(doubled).agg(
        F.count("*").cast("long").alias("n_after_dedup")
    )


@register(
    "stream_attribution_join_batch",
    """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           p.value AS amount
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_attribution_join_batch(spark, sf_dir):
    """Stream-stream interval join graded through its batch twin
    (``streaming/events.attribution_join``): purchases attributed to the
    same user's clicks within the preceding hour; integer-microsecond
    gaps keep the row hash-exact. The streaming execution of the
    identical plan (watermarked both sides, availableNow micro-batches)
    is verified in tests/test_streaming.py."""
    from ..streaming.events import attribution_join

    ev = load_tables(spark, sf_dir)["events"]
    return attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
    )


@register(
    "stream_attribution_left_batch",
    """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           p.value AS amount
    FROM events c
    LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    """,
)
def stream_attribution_left_batch(spark, sf_dir):
    """LEFT OUTER stream-stream interval join (attribution with
    unattributed clicks surfaced as NULL purchases) — on streams the
    outer rows emit when the watermark proves no match can arrive; the
    batch twin is a plain left join with the same bounds."""
    from ..streaming.events import attribution_join

    ev = load_tables(spark, sf_dir)["events"]
    return attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
        how="left_outer",
    )


@register(
    "events_funnel_counts",
    """
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s0 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id)
    SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step,
           CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS users
    UNION ALL SELECT 1, 'click', (SELECT COUNT(*) FROM s1)
    UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM s2)
    """,
)
def events_funnel_counts(spark, sf_dir):
    """First-touch ordered funnel view→click→purchase
    (``streaming/events.funnel_counts``): stage k binds the earliest
    event strictly after stage k−1's binding; per-stage distinct-user
    counts, exact integers."""
    from ..streaming.events import funnel_counts

    ev = load_tables(spark, sf_dir)["events"]
    return funnel_counts(ev, ["view", "click", "purchase"])


@register(
    "events_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    j AS (
      SELECT f.cohort, date_diff('day', f.cohort, a.day) AS off
      FROM a JOIN f USING (user_id))
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
           CAST(off AS BIGINT) AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM j WHERE off <= 7 GROUP BY cohort, off
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle (streaming/events.retention_cohorts):
    first-activity-day cohorts × day offsets ≤ 7, distinct-user counts —
    exact integer analytics over the events table."""
    from ..streaming.events import retention_cohorts

    ev = load_tables(spark, sf_dir)["events"]
    return retention_cohorts(ev, horizon_days=7)


@register(
    "stream_trending_topk_batch",
    """
    WITH c AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2)
    SELECT window_start, event_type, n_events, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type) AS rn
      FROM c) WHERE rn <= 3
    """,
)
def stream_trending_topk_batch(spark, sf_dir):
    """Per-window top-3 trending event types — batch twin of the
    streaming windowed-count + per-finalized-window rank pipeline
    (events.trending_topk). The rank window is partitioned by the hour
    bucket — no SinglePartition sort anywhere."""
    from ..streaming.events import trending_topk

    ev = load_tables(spark, sf_dir)["events"]
    out = trending_topk(ev, window="1 hour", k=3)
    return out.withColumn("window_start", _fmt_ts("window_start"))


@register(
    "events_ohlc_rollup",
    """
    WITH w AS (SELECT date_trunc('hour', ts) AS ws, event_type, ts, event_id, value
               FROM events),
    r AS (SELECT *,
            ROW_NUMBER() OVER (PARTITION BY ws, event_type
                               ORDER BY ts, event_id) AS rn_a,
            ROW_NUMBER() OVER (PARTITION BY ws, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM w)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S.%f') AS window_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           MIN(value) AS low_v, MAX(value) AS high_v,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY ws, event_type
    """,
)
def events_ohlc_rollup(spark, sf_dir):
    """Hypertable-style OHLC downsample: per tumbling hour per event
    type, open/close (first/last by (ts, event_id) — the unique
    tiebreak keeps the pick engine-exact) and low/high/count. One
    windowed groupBy with min_by/max_by struct ordering — no sort, no
    shuffle beyond the rollup keys; every output is a picked or compared
    double, never a float sum."""
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", F.struct("ts", "event_id")).alias("open_v"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close_v"),
            F.min("value").alias("low_v"),
            F.max("value").alias("high_v"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open_v",
            "close_v",
            "low_v",
            "high_v",
            "n_events",
        )
    )
    return out.withColumn("window_start", _fmt_ts("window_start"))


@register(
    "events_anomaly_3sigma",
    """
    WITH st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CAST(ROUND((e.value - s1 / n) * (e.value - s1 / n) * 1e6) AS BIGINT)
             AS sqdev_micro
    FROM events e JOIN st ON st.event_type = e.event_type
    WHERE (e.value - s1 / n) * (e.value - s1 / n) * n * n
          > 9e0 * (n * s2 - s1 * s1)
    """,
)
def events_anomaly_3sigma(spark, sf_dir):
    """3σ anomaly flagging per event type: population mean/variance from
    EXACT decimal Σx / Σx² (order-independent), then a broadcast join of
    the 1-row-per-type stats frame back onto the stream — the classic
    two-pass outlier detector with no float accumulation anywhere. The
    comparison cross-multiplies to avoid division ((x−μ)²·n² > 9·(nΣx²−(Σx)²)),
    so both engines evaluate the identical double expression."""
    ev = load_tables(spark, sf_dir)["events"]
    v = F.col("value").cast("decimal(28,6)")
    st = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    j = ev.join(F.broadcast(st), "event_type")
    dev = F.col("value") - F.col("s1") / F.col("n")
    return (
        j.where(dev * dev * F.col("n") * F.col("n") > F.lit(9.0) * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")))
        .select(
            "event_id",
            "event_type",
            F.round(dev * dev * F.lit(1e6)).cast("long").alias("sqdev_micro"),
        )
    )


@register(
    "stream_sliding_windows_batch",
    """
    WITH ev AS (SELECT ts, event_type, value FROM events),
    halfhours AS (
      SELECT date_trunc('hour', ts) + CASE WHEN EXTRACT(minute FROM ts) >= 30
             THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS slot,
             event_type, value FROM ev),
    expanded AS (
      SELECT slot AS wstart, event_type, value FROM halfhours
      UNION ALL
      SELECT slot - INTERVAL 30 MINUTE, event_type, value FROM halfhours)
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S.%f') AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY wstart, event_type
    """,
)
def stream_sliding_windows_batch(spark, sf_dir):
    """Hopping (sliding) windows — 1-hour window every 30 minutes, so
    each event lands in exactly two windows: ``F.window(ts, '1 hour',
    '30 minutes')``, identical on batch and stream (the state doubles
    versus tumbling, the watermark contract is unchanged). Exact decimal
    sums for the hash gate."""
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return out.withColumn("window_start", _fmt_ts("window_start"))


@register(
    "stream_windowed_distinct_users_batch",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def stream_windowed_distinct_users_batch(spark, sf_dir):
    """Distinct users per tumbling hour — the state-heavy windowed
    COUNT(DISTINCT): Spark expands it to a two-level aggregate (partial
    distinct per partition, then merge), so the shuffle carries
    (window, user) pairs once, not raw events; the streaming twin is the
    same plan under a watermark (or approx_count_distinct when the exact
    set would exceed state budgets — that variant is the rows-only
    fn_approx_count_distinct)."""
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
    )
    return out.withColumn("window_start", _fmt_ts("window_start"))


@register(
    "events_countmin_frequencies",
    """
    WITH ds AS (SELECT UNNEST(range(4)) AS d),
    b AS (
      SELECT d, CAST(('0x' || substr(md5('cms|' || CAST(d AS VARCHAR) || '|'
               || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
      FROM events, ds),
    cnt AS (SELECT d, bucket, COUNT(*) AS c FROM b GROUP BY d, bucket),
    keys AS (SELECT DISTINCT user_id FROM events),
    kb AS (
      SELECT user_id, d,
             CAST(('0x' || substr(md5('cms|' || CAST(d AS VARCHAR) || '|'
               || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
      FROM keys, ds),
    est AS (SELECT user_id, MIN(COALESCE(c, 0)) AS est
            FROM kb LEFT JOIN cnt USING (d, bucket) GROUP BY user_id),
    ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact
           FROM events GROUP BY user_id)
    SELECT est.user_id, est.est, ex.exact, est.est - ex.exact AS overcount
    FROM est JOIN ex USING (user_id)
    ORDER BY ex.exact DESC, est.user_id LIMIT 20
    """,
)
def events_countmin_frequencies(spark, sf_dir):
    """Count-min sketch per-user event frequencies (depth 4 × width 64 —
    deliberately narrower than the 150-user key space so hash collisions
    produce REAL overcounts) next to the exact counts: est ≥ exact always,
    overcount = the sketch's collision error. The md5-derived buckets make
    the whole sketch deterministic, so the oracle replays build AND query
    exactly — `operators/sketch.py`."""
    from ..operators import sketch

    ev = load_tables(spark, sf_dir)["events"]
    sk = sketch.countmin_build(ev, "user_id", depth=4, width=64)
    keys = ev.select("user_id").distinct()
    est = sketch.countmin_query(sk, keys, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("exact"))
    return (
        est.withColumnRenamed("key", "user_id")
        .join(exact, "user_id")
        .select(
            "user_id", "est", "exact", (F.col("est") - F.col("exact")).alias("overcount")
        )
        .orderBy(F.desc("exact"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "stream_attribution_full_batch",
    """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           COALESCE(c.user_id, p.user_id) AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           p.value AS amount
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_attribution_full_batch(spark, sf_dir):
    """FULL OUTER stream-stream interval join — unattributed clicks AND
    click-less purchases both survive with NULL far-side columns (on
    streams each side emits once its watermark proves no match can
    arrive; Spark supports full-outer stream-stream exactly because the
    interval bound makes both state stores evictable). The side filters
    live in subqueries, not WHERE — a WHERE would silently delete the
    right-only rows."""
    from ..streaming.events import attribution_join

    ev = load_tables(spark, sf_dir)["events"]
    return attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
        how="full_outer",
    )


@register(
    "events_countmin_windowed",
    """
    WITH ds AS (SELECT UNNEST(range(2)) AS d),
    b AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, d,
             CAST(('0x' || substr(md5('cms|' || CAST(d AS VARCHAR) || '|'
               || event_type), 1, 8)) AS BIGINT) % 8 AS bucket
      FROM events, ds),
    cnt AS (SELECT day, d, bucket, COUNT(*) AS c FROM b GROUP BY day, d, bucket),
    keys AS (SELECT DISTINCT event_type FROM events),
    days AS (SELECT DISTINCT day FROM cnt),
    kb AS (
      SELECT days.day, keys.event_type, ds.d,
             CAST(('0x' || substr(md5('cms|' || CAST(ds.d AS VARCHAR) || '|'
               || keys.event_type), 1, 8)) AS BIGINT) % 8 AS bucket
      FROM days, keys, ds),
    est AS (SELECT day, event_type, MIN(COALESCE(c, 0)) AS est
            FROM kb LEFT JOIN cnt USING (day, d, bucket)
            GROUP BY day, event_type),
    ex AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                  CAST(COUNT(*) AS BIGINT) AS exact
           FROM events GROUP BY 1, 2)
    SELECT est.day, est.event_type, est.est,
           COALESCE(ex.exact, 0) AS exact,
           est.est - COALESCE(ex.exact, 0) AS overcount
    FROM est LEFT JOIN ex USING (day, event_type)
    ORDER BY day, event_type
    """,
)
def events_countmin_windowed(spark, sf_dir):
    """Per-day count-min sketches over the event stream (depth 2 × width
    8 vs 5 event types — narrow enough that collisions really happen):
    per window the sketch is 16 counters regardless of key cardinality,
    the property that makes sketches the watermark-evictable state for
    streaming heavy-hitters. Every (day, type) estimate sits beside its
    exact count; est ≥ exact always."""
    from ..operators import sketch

    ev = load_tables(spark, sf_dir)["events"]
    sk = sketch.countmin_build_windowed(
        ev, "event_type", ts_col="ts", window="1 day", depth=2, width=8
    )
    keys = ev.select("event_type").distinct()
    est = sketch.countmin_query_windowed(sk, keys, "event_type", depth=2, width=8)
    exact = (
        ev.select(
            F.window(F.col("ts"), "1 day").start.alias("win_start"), "event_type"
        )
        .groupBy("win_start", "event_type")
        .agg(F.count("*").cast("long").alias("exact"))
    )
    return (
        est.withColumnRenamed("key", "event_type")
        .join(exact, ["win_start", "event_type"], "left")
        .select(
            F.date_format("win_start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "est",
            F.coalesce("exact", F.lit(0)).alias("exact"),
            (F.col("est") - F.coalesce("exact", F.lit(0))).alias("overcount"),
        )
        .orderBy("day", "event_type")
    )
