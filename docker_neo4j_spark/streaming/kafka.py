"""Kafka source/sink wiring (SURVEY.md §2.B.1/§2.B.8 — the `streams`
plugin surface: "consume records → ingest" and "CDC → topics").

The builders return unstarted readers/writers so the wiring is testable
without a broker; starting them requires the spark-sql-kafka connector
jar on the classpath (not bundled in this container — callers get the
standard Spark DATA_SOURCE_NOT_FOUND error at start time, and
``kafka_available()`` lets code probe first). Everything downstream of
the source (windowed aggs, dedup, foreachBatch upsert) is shared with
the file-backed stream in events.py — swapping the format is the entire
migration, which is the point of the Structured Streaming design.

Enabling the real connector (any Spark 4.x deployment):

    spark-submit --packages \\
        org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>
    # or spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:…
    # (pulls kafka-clients + commons-pool2 transitively)

``tests/test_streaming.py::test_kafka_roundtrip_real`` runs a real
produce→consume roundtrip when BOTH are present — the connector jar on
the classpath and a broker address in ``$SPARK_KAFKA_BOOTSTRAP`` — and
pytest-skips (never fakes) otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_SCHEMA


def kafka_available(spark: SparkSession) -> bool:
    """True iff the Kafka connector class is loadable in this session."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    format: str = "kafka",
) -> DataFrame:
    """Kafka ingest → typed event stream: JSON values parsed to the same
    schema the file source produces, so every downstream transformation
    is source-agnostic. ``format`` swaps the connector for the vendored
    file-backed contract fake (``kafka_file.py``, format ``file_kafka``)
    with identical options and output schema — nothing else changes."""
    raw = (
        spark.readStream.format(format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e")
    ).select("e.*")


def write_kafka_cdc(
    changes: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "event_id",
    format: str = "kafka",
):
    """CDC publish: a change-feed DataFrame → Kafka topic (key = entity id,
    value = JSON change record). Returns the unstarted writer."""
    payload = changes.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*changes.columns)).alias("value"),
    )
    return (
        payload.writeStream.format(format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
