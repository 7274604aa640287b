"""Real micro-batch runs of the streaming surface: the stream must produce
exactly what the batch twin produces (Structured Streaming's equivalence
contract), dedup must be stateful-exact, CDC upsert idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.sources.tpch import load_tables
from docker_neo4j_spark.streaming.events import (
    cdc_upsert_sink,
    dedup_within_watermark,
    read_event_stream,
    run_stream_to_memory,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """First 2 days of events, written as 4 files → 4 micro-batches."""
    tmp = tmp_path_factory.mktemp("events_stream")
    ev = load_tables(spark, sf_dir)["events"].where(F.col("ts") < "2024-01-03")
    ev.repartition(4).write.mode("overwrite").parquet(str(tmp / "in"))
    return str(tmp / "in")


def _canon(df):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in df.collect()
    )


def test_stream_matches_batch_windowed_agg(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="1 hour", watermark="1 hour")
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = spark.table("win_counts")

    batch = windowed_counts(spark.read.parquet(event_dir), window="1 hour")
    assert _canon(got) == _canon(batch)


def test_stream_dedup_within_watermark(spark, event_dir, tmp_path):
    # plant duplicates: write the same events twice into the stream dir
    dup_dir = str(tmp_path / "dup")
    ev = spark.read.parquet(event_dir)
    ev.unionByName(ev).repartition(3).write.mode("overwrite").parquet(dup_dir)

    deduped = dedup_within_watermark(read_event_stream(spark, dup_dir), watermark="10 days")
    run_stream_to_memory(deduped, "dedup_out", output_mode="append")
    got = spark.table("dedup_out")
    n_distinct = ev.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_cdc_upsert_idempotent(spark, event_dir, tmp_path):
    target = str(tmp_path / "cdc_target")
    sink = cdc_upsert_sink(target)
    src = spark.read.parquet(event_dir)

    # two deliveries of the same batch (at-least-once input)
    sink(src, 0)
    sink(src, 1)
    merged = spark.read.parquet(target)
    assert merged.count() == src.count()
    assert merged.select("event_id").distinct().count() == src.count()

    # a later batch with one new + one replayed event upserts exactly one
    new = spark.createDataFrame(
        [(10_000_000, None, 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    replay = src.limit(1)
    sink(new.unionByName(replay), 2)
    assert spark.read.parquet(target).count() == src.count() + 1


def test_stateful_running_totals(spark, event_dir):
    from docker_neo4j_spark.streaming.events import stateful_running_totals

    stream = read_event_stream(spark, event_dir)
    out = stateful_running_totals(stream)
    run_stream_to_memory(out, "running_totals", output_mode="update")
    got = spark.table("running_totals")

    # counts only grow: the max row per user is the final state, and it
    # must equal the batch groupBy over the full input
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value")
    )
    batch = (
        spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"), F.sum("value").alias("sum_value"))
    )
    f = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in final.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in batch.collect()}
    assert f == b
    # state persisted across micro-batches: some user must appear in
    # multiple batches with growing counts (4 input files -> 4 batches)
    multi = got.groupBy("user_id").agg(F.count("*").alias("k")).where(F.col("k") > 1).count()
    assert multi > 0


def test_stateful_sessionize_timeout_close(spark, tmp_path):
    """Event-time-timeout state close: sessions finalize either when a
    later-than-gap event arrives (in-band split) or when the watermark
    passes last_event+gap (hasTimedOut path); both must match the batch
    session_window twin."""
    import os
    import time as _time

    from docker_neo4j_spark.streaming.events import stateful_sessionize

    d = tmp_path / "sess_in"
    d.mkdir()
    base = "2024-01-01T{}:00"

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            [(i, ts, u, "click", 1.0, "{}") for i, (ts, u) in enumerate(rows)],
            "event_id long, ts_s string, user_id long, event_type string, value double, props string",
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        sub = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        target = d / name
        os.rename(sub / part, target)
        os.utime(target, (mtime, mtime))

    t0 = _time.time() - 1000
    # batch 1: user1 session (10:00, 10:02), user2 session (10:01)
    write_file("f1.parquet", [(base.format("10"), 1), ("2024-01-01T10:02:00", 1), ("2024-01-01T10:01:00", 2)], t0)
    # batch 2: user2 at 13:00 — > gap after 10:01, closes user2's first session in-band
    write_file("f2.parquet", [("2024-01-01T13:00:00", 2)], t0 + 10)
    # batch 3: user3 at 16:00 — advances the watermark past user1's timeout
    write_file("f3.parquet", [("2024-01-01T16:00:00", 3)], t0 + 20)

    stream = read_event_stream(spark, str(d))
    out = stateful_sessionize(stream, gap="10 minutes", watermark="1 hour")
    run_stream_to_memory(out, "sessions_closed", output_mode="append")
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.table("sessions_closed").collect()
    }
    # user1 closes by timeout (watermark passes 10:12); user2's first
    # session closes in-band when 13:00 arrives; user2's second closes by
    # timeout in the final batch (watermark 15:00 > 13:10). user3 (16:00,
    # timeout 16:10) is still open when the stream drains — never emitted.
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:02:00", 2),
        (2, "2024-01-01 10:01:00", "2024-01-01 10:01:00", 1),
        (2, "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1),
    }

    # every closed session must also be a row of the batch twin
    twin = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in stateful_sessionize(
            spark.read.parquet(str(d)), gap="10 minutes"
        ).collect()
    }
    assert got <= twin


def test_quality_filter_stream_equals_batch(spark, tmp_path):
    """The quality-threshold corpus filter runs unchanged over readStream:
    availableNow drain equals the batch result (stream/batch parity for
    the curation path)."""
    from docker_neo4j_spark.operators.text import quality_score
    from docker_neo4j_spark.streaming.events import run_stream_to_memory

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and it is happy with that for now", "en"),
            (2, "x!!", "en"),
            (3, "the data is in the lake and the pipeline moves it to the warehouse for training", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs"))

    def keep(df):
        # single-lineage form (no self-join) — required for the stream path
        return quality_score(df).where(F.col("quality") >= 0.5).select("doc_id")

    batch_ids = {r["doc_id"] for r in keep(spark.read.parquet(str(tmp_path / "docs"))).collect()}
    stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(
        str(tmp_path / "docs")
    )
    run_stream_to_memory(keep(stream), "q_filter")
    stream_ids = {r["doc_id"] for r in spark.table("q_filter").collect()}
    assert stream_ids == batch_ids  # exact stream/batch parity
    assert 2 not in batch_ids and 3 in batch_ids  # junk dropped, prose kept


def test_session_run_parameters(spark):
    from docker_neo4j_spark.cypher.session import Session

    s = Session(spark)
    s.run("CREATE (a:dog {name:'Arne', age: 7})")
    s.run("CREATE (b:dog {name:'Bosse', age: 3})")
    r = s.run(
        "MATCH (d:dog) WHERE d.name = $name AND d.age > $min RETURN d.name AS n",
        parameters={"name": "Arne", "min": 5},
    ).collect()
    assert [row["n"] for row in r] == ["Arne"]
    r = s.run(
        "MATCH (d:dog) WHERE d.name IN $names RETURN count(*) AS c",
        parameters={"names": ["Arne", "Bosse", "Cleo"]},
    ).collect()
    assert r[0]["c"] == 2


def test_kafka_roundtrip_real(spark, tmp_path):
    """Kafka produce→consume roundtrip over the full option surface.

    Uses the REAL connector when the spark-sql-kafka jar is on the
    classpath and $SPARK_KAFKA_BOOTSTRAP names a broker; otherwise runs
    the IDENTICAL statements against the vendored file-backed contract
    source (``kafka_file.py`` — same options, same output schema), so the
    produce/consume pipeline code executes either way instead of
    skipping. Which path ran is visible in the format name below."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from docker_neo4j_spark.streaming.kafka import kafka_available

    bootstrap = os.environ.get("SPARK_KAFKA_BOOTSTRAP")
    if kafka_available(spark) and bootstrap:
        fmt = "kafka"
    else:
        from docker_neo4j_spark.streaming import kafka_file

        kafka_file.register(spark)
        fmt, bootstrap = "file_kafka", str(tmp_path / "broker")

    topic = f"spark_graft_test_{uuid.uuid4().hex[:8]}"
    src = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct(F.col("id"), (F.col("id") * 2).alias("v"))).alias("value"),
    )
    (
        src.write.mode("append").format(fmt)
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    back = (
        spark.read.format(fmt)
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.get_json_object(F.col("value").cast("string"), "$.v").cast("long").alias("v"),
        )
    )
    rows = {int(r["key"]): r["v"] for r in back.collect()}
    assert len(rows) == 100 and all(rows[k] == 2 * k for k in rows)


def test_kafka_streaming_ingest_and_cdc_contract(spark, tmp_path):
    """The module's own builders (read_kafka_events / write_kafka_cdc) run
    end-to-end through Structured Streaming micro-batches against the
    file-backed contract source: JSON values parse to EVENTS_SCHEMA on
    ingest, and the CDC writer publishes (key, JSON value) records."""
    import json

    from pyspark.sql import functions as F

    from docker_neo4j_spark.streaming import kafka_file
    from docker_neo4j_spark.streaming.kafka import read_kafka_events, write_kafka_cdc

    kafka_file.register(spark)
    broker = str(tmp_path / "broker")

    # produce typed events as JSON — what a real producer would publish
    events = [
        {
            "event_id": i,
            "ts": "2024-01-01 00:00:00",
            "user_id": i % 3,
            "event_type": "click",
            "value": float(i),
            "props": "{}",
        }
        for i in range(20)
    ]
    spark.createDataFrame(
        [(str(e["event_id"]), json.dumps(e)) for e in events], "key string, value string"
    ).write.mode("append").format("file_kafka").option("kafka.bootstrap.servers", broker).option(
        "topic", "events_in"
    ).save()

    # ingest: the real builder, only the format name swapped
    stream = read_kafka_events(
        spark, broker, "events_in", starting_offsets="earliest", format="file_kafka"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt_in")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 20
    assert {r["user_id"] for r in got.select("user_id").distinct().collect()} == {0, 1, 2}

    # CDC publish back out through the builder's writer (expects a
    # streaming frame, so re-read the parquet sink as a stream)
    restream = (
        spark.readStream.schema(got.schema).parquet(out_dir).where(F.col("event_id") < 5)
    )
    w = write_kafka_cdc(
        restream.select("event_id", "user_id", "event_type"),
        broker,
        "events_cdc",
        str(tmp_path / "ckpt_out"),
        format="file_kafka",
    )
    qw = w.trigger(availableNow=True).start()
    qw.awaitTermination(120)
    cdc = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "events_cdc")
        .load()
    )
    recs = {
        int(r["key"].decode()): json.loads(r["value"].decode())
        for r in cdc.collect()
    }
    assert set(recs) == {0, 1, 2, 3, 4}
    assert all(recs[k]["event_type"] == "click" for k in recs)


def test_stream_stream_attribution_join_matches_batch(spark, event_dir):
    """Two watermarked streams interval-joined (attribution_join): the
    availableNow drain must equal the batch twin row-for-row — the
    stream-stream join surface of §2.B.8."""
    from docker_neo4j_spark.streaming.events import attribution_join

    batch = spark.read.parquet(event_dir)
    b = attribution_join(
        batch.where(F.col("event_type") == "click"),
        batch.where(F.col("event_type") == "purchase"),
        horizon="24 hours",
    )
    expect = sorted(
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_us"]) for r in b.collect()
    )

    stream = read_event_stream(spark, event_dir)
    # the fixture's 4 files are HASH-partitioned, not time-ordered, so a
    # micro-batch can carry rows older than the watermark advanced by an
    # earlier batch; a watermark wider than the fixture's 2-day span keeps
    # the parity deterministic (drop behavior is covered by the dedup test)
    s = attribution_join(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        horizon="24 hours",
        watermark="10 days",
    )
    run_stream_to_memory(s, "attrib_join", output_mode="append")
    got = sorted(
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_us"])
        for r in spark.table("attrib_join").collect()
    )
    assert got == expect and len(got) > 0


def test_funnel_counts_order_sensitivity(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 completes in order; user 2 purchases BEFORE clicking
        (1, "view", base),
        (1, "click", base + dt.timedelta(minutes=1)),
        (1, "purchase", base + dt.timedelta(minutes=2)),
        (2, "view", base),
        (2, "purchase", base + dt.timedelta(minutes=1)),
        (2, "click", base + dt.timedelta(minutes=2)),
        (3, "view", base),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    from docker_neo4j_spark.streaming.events import funnel_counts

    out = {r["step"]: r["users"] for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_attribution_left_outer_emits_unmatched_clicks(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    clicks = spark.createDataFrame(
        [(1, base, 10, "click", 0.0), (2, base + dt.timedelta(hours=3), 10, "click", 0.0)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    purchases = spark.createDataFrame(
        [(9, base + dt.timedelta(minutes=30), 10, "purchase", 5.0)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    from docker_neo4j_spark.streaming.events import attribution_join

    out = {r["click_id"]: r for r in attribution_join(clicks, purchases, how="left_outer").collect()}
    assert out[1]["purchase_id"] == 9 and out[1]["gap_us"] == 30 * 60 * 1_000_000
    assert out[2]["purchase_id"] is None and out[2]["amount"] is None


def test_retention_cohorts_triangle(spark):
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        # user 1: active day 0 and day 2; user 2: day 0 only (same cohort)
        (1, "view", d0),
        (1, "view", d0 + dt.timedelta(days=2, hours=3)),
        (2, "view", d0 + dt.timedelta(hours=5)),
        # user 3 joins a day later, returns day 1
        (3, "view", d0 + dt.timedelta(days=1)),
        (3, "view", d0 + dt.timedelta(days=2)),
        # beyond-horizon activity is excluded
        (2, "view", d0 + dt.timedelta(days=30)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    from docker_neo4j_spark.streaming.events import retention_cohorts

    out = {
        (r["cohort"], r["offset_days"]): r["users"]
        for r in retention_cohorts(ev, horizon_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }


def test_stream_trending_topk_matches_batch(spark, event_dir):
    """Streaming windowed counts (complete mode) + per-window rank ==
    the one-shot batch trending_topk ranking."""
    from pyspark.sql import Window as W

    from docker_neo4j_spark.streaming.events import trending_topk

    stream = read_event_stream(spark, event_dir)
    counts = trending_topk(stream, window="1 hour", k=3)
    assert "rank" not in counts.columns  # streaming side defers ranking
    run_stream_to_memory(counts, "trend_counts", output_mode="complete")
    rk = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    got = (
        spark.table("trend_counts")
        .withColumn("rank", F.row_number().over(rk).cast("long"))
        .where(F.col("rank") <= 3)
    )
    batch = trending_topk(spark.read.parquet(event_dir), window="1 hour", k=3)
    canon = lambda df: sorted(  # noqa: E731
        (str(r["window_start"]), r["event_type"], r["n_events"], r["rank"])
        for r in df.collect()
    )
    assert canon(got) == canon(batch)


def test_stream_static_enrich_matches_batch(spark, event_dir, sf_dir):
    """Stream-static broadcast enrichment: the same join over readStream
    (availableNow drain) equals the batch result, and out-of-dimension
    keys survive the LEFT join with a null segment."""
    from docker_neo4j_spark.streaming.events import (
        enrich_with_dimension,
        run_stream_to_memory,
    )

    dim = load_tables(spark, sf_dir)["customer"]

    def shape(df):
        return (
            enrich_with_dimension(df, dim, "user_id", "c_custkey", ["c_mktsegment"])
            .groupBy(
                F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
                "event_type",
            )
            .agg(F.count("*").cast("long").alias("n"))
        )

    batch = {
        (r["segment"], r["event_type"]): r["n"]
        for r in shape(spark.read.parquet(event_dir)).collect()
    }
    run_stream_to_memory(
        shape(read_event_stream(spark, event_dir)),
        "enriched_counts",
        output_mode="complete",
    )
    got = {
        (r["segment"], r["event_type"]): r["n"]
        for r in spark.table("enriched_counts").collect()
    }
    assert got == batch and batch


def test_attribution_full_outer_emits_both_unmatched_sides(spark):
    """FULL OUTER: unattributed clicks keep NULL purchase columns AND
    click-less purchases keep NULL click columns with their own
    user_id."""
    import datetime as _dt

    from docker_neo4j_spark.streaming.events import attribution_join

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 100, "click", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    purchases = spark.createDataFrame(
        [
            (2, t0 + _dt.timedelta(minutes=30), 100, "purchase", 9.0, ""),
            (3, t0 + _dt.timedelta(minutes=10), 200, "purchase", 5.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = {
        (r.click_id, r.purchase_id): r
        for r in attribution_join(clicks, purchases, how="full_outer").collect()
    }
    assert set(rows) == {(1, 2), (None, 3)}
    assert rows[(1, 2)].user_id == 100 and rows[(1, 2)].gap_us == 30 * 60 * 1_000_000
    lone = rows[(None, 3)]
    assert lone.user_id == 200 and lone.gap_us is None and lone.amount == 5.0
