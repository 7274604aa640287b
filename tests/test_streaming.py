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
