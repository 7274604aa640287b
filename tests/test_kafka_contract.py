"""Broker-protocol conformance for the file-backed Kafka contract source.

The container has no spark-sql-kafka jar and no network to fetch one, so
the real produce→consume roundtrip cannot run here; these tests instead
pin ``streaming/kafka_file.py`` to the guarantees the REAL connector
documents, so code written against the twin transfers to a real broker
unchanged: exact output schema, dense monotonic per-partition offsets
stable across re-reads, append-only log semantics, earliest/latest
semantics, exactly-once micro-batch delivery through a checkpoint, topic
isolation, binary key/value round-trip, and option validation.
Reference surface: the ``streams`` plugin,
/root/reference/docker-image-src/3.5/coredb/neo4j-plugins.json:24-27.
"""

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.streaming import kafka_file


@pytest.fixture()
def broker(spark, tmp_path):
    kafka_file.register(spark)
    return str(tmp_path / "broker")


def _produce(spark, broker, topic, pairs):
    spark.createDataFrame(pairs, "key string, value string").coalesce(1).write.mode(
        "append"
    ).format("file_kafka").option("kafka.bootstrap.servers", broker).option(
        "topic", topic
    ).save()


def _consume(spark, broker, topic):
    return (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", topic)
        .load()
    )


def test_output_schema_matches_real_connector(spark, broker):
    """The real connector's documented scan schema, field for field —
    (key binary, value binary, topic string, partition int, offset
    bigint, timestamp timestamp, timestampType int) in that order."""
    _produce(spark, broker, "t", [("k", "v")])
    df = _consume(spark, broker, "t")
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]


def test_offsets_dense_monotonic_and_stable(spark, broker):
    """Offsets within a partition are 0..n-1 in log order and identical
    across re-reads (a consumer may seek by offset and must find the
    same record)."""
    _produce(spark, broker, "t", [(str(i), f"v{i}") for i in range(5)])
    first = [
        (r["offset"], bytes(r["value"]).decode())
        for r in _consume(spark, broker, "t").orderBy("offset").collect()
    ]
    assert [o for o, _ in first] == list(range(5))
    again = [
        (r["offset"], bytes(r["value"]).decode())
        for r in _consume(spark, broker, "t").orderBy("offset").collect()
    ]
    assert first == again


def test_append_only_log_preserves_existing_offsets(spark, broker):
    """Producing more records never renumbers what is already in the
    log — the broker's append-only partition contract."""
    _produce(spark, broker, "t", [("a", "v0"), ("b", "v1")])
    before = {
        r["offset"]: bytes(r["value"]).decode()
        for r in _consume(spark, broker, "t").collect()
    }
    _produce(spark, broker, "t", [("c", "v2")])
    after = {
        r["offset"]: bytes(r["value"]).decode()
        for r in _consume(spark, broker, "t").collect()
    }
    assert {k: after[k] for k in before} == before
    assert after[max(after)] == "v2"


def test_topic_isolation(spark, broker):
    _produce(spark, broker, "alpha", [("k", "va")])
    _produce(spark, broker, "beta", [("k", "vb")])
    a = _consume(spark, broker, "alpha").collect()
    assert len(a) == 1 and bytes(a[0]["value"]).decode() == "va"
    assert a[0]["topic"] == "alpha"
    assert _consume(spark, broker, "beta").count() == 1


def test_binary_key_value_roundtrip(spark, broker):
    """Keys and values travel as bytes; a null key is legal (real
    producers send keyless records for round-robin partitioning)."""
    _produce(spark, broker, "t", [(None, "unkeyed"), ("k1", "keyed")])
    rows = {
        (bytes(r["key"]).decode() if r["key"] is not None else None): bytes(
            r["value"]
        ).decode()
        for r in _consume(spark, broker, "t").collect()
    }
    assert rows == {None: "unkeyed", "k1": "keyed"}


def test_starting_offsets_latest_vs_earliest_streaming(spark, broker, tmp_path):
    """startingOffsets=latest ignores the backlog, earliest replays it —
    the consumer-group seek semantics the real source implements."""
    _produce(spark, broker, "t", [("old", "backlog")])

    def drain(starting, out_name):
        out, ckpt = str(tmp_path / out_name), str(tmp_path / f"{out_name}_ckpt")
        q = (
            spark.readStream.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t")
            .option("startingOffsets", starting)
            .load()
            .select(F.col("value").cast("string"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["value"] for r in spark.read.parquet(out).collect()}

    assert drain("earliest", "e") == {"backlog"}
    assert drain("latest", "l") == set()


def test_exactly_once_across_micro_batches(spark, broker, tmp_path):
    """Records produced between availableNow drains arrive exactly once
    when the checkpoint is reused — the offset-tracking contract."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t")
            .option("startingOffsets", "earliest")
            .load()
            .select(F.col("value").cast("string"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _produce(spark, broker, "t", [("a", "v0")])
    drain()
    _produce(spark, broker, "t", [("b", "v1"), ("c", "v2")])
    drain()
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["v0", "v1", "v2"]  # no loss, no duplicates


def test_option_validation_mirrors_connector(spark, broker):
    """Missing bootstrap/topic options fail loudly with the real option
    names in the message (misconfiguration must not read empty data)."""
    with pytest.raises(Exception, match="kafka.bootstrap.servers"):
        spark.read.format("file_kafka").option("subscribe", "t").load().collect()
    with pytest.raises(Exception, match="subscribe"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).load().collect()


def test_multi_topic_subscribe(spark, broker):
    """subscribe accepts a comma-separated topic list; each record keeps
    its own topic and per-topic dense offsets (the real connector's
    multi-topic consumer contract)."""
    _produce(spark, broker, "alpha", [("a", "va0"), ("a", "va1")])
    _produce(spark, broker, "beta", [("b", "vb0")])
    rows = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "alpha, beta")
        .load()
        .collect()
    )
    got = sorted((r["topic"], r["offset"], bytes(r["value"]).decode()) for r in rows)
    assert got == [("alpha", 0, "va0"), ("alpha", 1, "va1"), ("beta", 0, "vb0")]


def test_multi_topic_streaming_exactly_once(spark, broker, tmp_path):
    """A streaming consumer over two topics tracks offsets per topic
    through the checkpoint — records in either topic between drains
    arrive exactly once."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t1,t2")
            .option("startingOffsets", "earliest")
            .load()
            .select("topic", F.col("value").cast("string"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _produce(spark, broker, "t1", [("k", "v1")])
    drain()
    _produce(spark, broker, "t2", [("k", "v2")])
    _produce(spark, broker, "t1", [("k", "v3")])
    drain()
    got = sorted(
        (r["topic"], r["value"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [("t1", "v1"), ("t1", "v3"), ("t2", "v2")]


def test_writer_topic_column_routing(spark, broker):
    """Without a 'topic' option, each row's topic column names its
    destination — the real producer contract; with neither, the write
    fails loudly."""
    spark.createDataFrame(
        [("k1", "va", "alpha"), ("k2", "vb", "beta")],
        "key string, value string, topic string",
    ).coalesce(1).write.mode("append").format("file_kafka").option(
        "kafka.bootstrap.servers", broker
    ).save()
    a = _consume(spark, broker, "alpha").collect()
    b = _consume(spark, broker, "beta").collect()
    assert [bytes(r["value"]).decode() for r in a] == ["va"]
    assert [bytes(r["value"]).decode() for r in b] == ["vb"]
    with pytest.raises(Exception, match="topic"):
        spark.createDataFrame([("k", "v")], "key string, value string").write.mode(
            "append"
        ).format("file_kafka").option("kafka.bootstrap.servers", broker).save()


def test_part_sequence_survives_clock_stepback(spark, broker, monkeypatch):
    """Part names derive from the directory's max sequence, not the wall
    clock — a clock step-back (NTP) between produces must not reorder the
    log or renumber existing offsets (ADVICE r7)."""
    from docker_neo4j_spark.streaming import kafka_file as kf

    _produce(spark, broker, "clk", [("a", "v0")])
    # simulate: whatever the wall clock does now, sequencing is dir-derived
    _produce(spark, broker, "clk", [("b", "v1")])
    _produce(spark, broker, "clk", [("c", "v2")])
    rows = _consume(spark, broker, "clk").orderBy("offset").collect()
    assert [bytes(r["value"]).decode() for r in rows] == ["v0", "v1", "v2"]
    import os

    d = os.path.join(broker, "clk")
    seqs = sorted(
        int(m.group(1))
        for m in (kf._PART_SEQ_RE.match(f) for f in os.listdir(d))
        if m
    )
    assert seqs == [0, 1, 2]  # dense, dir-derived, clock-independent


def test_subscription_mode_mutual_exclusion(spark, broker):
    """Exactly one of assign/subscribe/subscribePattern — zero or two is
    the real connector's IllegalArgumentException."""
    _produce(spark, broker, "t", [("a", "v")])
    with pytest.raises(Exception, match="exactly one of"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).load().collect()
    with pytest.raises(Exception, match="exactly one of"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).option("subscribe", "t").option("assign", '{"t": [0]}').load().collect()


def test_assign_mode(spark, broker):
    """assign takes the real connector's JSON form; a partition other
    than 0 fails loudly (the twin is single-partition per topic)."""
    _produce(spark, broker, "ta", [("a", "v0")])
    _produce(spark, broker, "tb", [("b", "v1")])
    rows = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("assign", '{"ta": [0], "tb": [0]}')
        .load()
        .collect()
    )
    assert {r["topic"] for r in rows} == {"ta", "tb"}
    with pytest.raises(Exception, match="single partition 0"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).option("assign", '{"ta": [0, 1]}').load().collect()
    with pytest.raises(Exception, match="assign must be JSON"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).option("assign", "ta").load().collect()


def test_subscribe_pattern_mode(spark, broker):
    _produce(spark, broker, "events_a", [("a", "v0")])
    _produce(spark, broker, "events_b", [("b", "v1")])
    _produce(spark, broker, "other", [("c", "v2")])
    rows = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribePattern", "events_.*")
        .load()
        .collect()
    )
    assert {r["topic"] for r in rows} == {"events_a", "events_b"}
    # zero matches is an empty result, not an error (real connector)
    empty = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribePattern", "nomatch_.*")
        .load()
        .collect()
    )
    assert empty == []


def test_starting_offsets_json_batch(spark, broker):
    """Per-partition JSON startingOffsets: a concrete offset seeks, -2 is
    earliest, -1 is latest; a topic missing from the JSON starts
    earliest."""
    _produce(spark, broker, "j1", [(str(i), f"v{i}") for i in range(5)])
    _produce(spark, broker, "j2", [(str(i), f"w{i}") for i in range(3)])
    rows = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "j1,j2")
        .option("startingOffsets", '{"j1": {"0": 3}, "j2": {"0": -2}}')
        .load()
        .collect()
    )
    got = sorted((r["topic"], r["offset"]) for r in rows)
    assert got == [("j1", 3), ("j1", 4), ("j2", 0), ("j2", 1), ("j2", 2)]
    # -1 (latest) yields nothing in batch for that topic
    rows2 = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "j1,j2")
        .option("startingOffsets", '{"j1": {"0": -1}}')
        .load()
        .collect()
    )
    got2 = sorted((r["topic"], r["offset"]) for r in rows2)
    assert got2 == [("j2", 0), ("j2", 1), ("j2", 2)]


def test_batch_read_refuses_latest(spark, broker):
    _produce(spark, broker, "t", [("a", "v")])
    with pytest.raises(Exception, match="not allowed for"):
        spark.read.format("file_kafka").option(
            "kafka.bootstrap.servers", broker
        ).option("subscribe", "t").option(
            "startingOffsets", "latest"
        ).load().collect()


def test_starting_offsets_json_streaming(spark, broker, tmp_path):
    """The JSON form also seeds a NEW streaming checkpoint's initial
    offset (existing checkpoints keep their own positions)."""
    _produce(spark, broker, "js", [(str(i), f"v{i}") for i in range(4)])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        spark.readStream.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "js")
        .option("startingOffsets", '{"js": {"0": 2}}')
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["v2", "v3"]


def test_seek_by_timestamp_batch(spark, broker):
    """startingOffsetsByTimestamp: start at the FIRST offset whose record
    timestamp >= the sought epoch-millis (the broker's offsetsForTimes
    contract); partitions absent from the JSON start earliest; no match +
    strategy=error raises, strategy=latest yields the empty tail — all
    real-connector rules (r9 conformance dimension)."""
    import json as _json
    import time

    _produce(spark, broker, "t", [("k0", "v0")])
    time.sleep(0.05)
    cut_ms = int(time.time() * 1000)
    time.sleep(0.05)
    _produce(spark, broker, "t", [("k1", "v1"), ("k2", "v2")])

    def read_from(ts_ms, strategy=None):
        r = (
            spark.read.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t")
            .option(
                "startingOffsetsByTimestamp", _json.dumps({"t": {"0": ts_ms}})
            )
        )
        if strategy:
            r = r.option("startingOffsetsByTimestampStrategy", strategy)
        return {row["value"].decode() for row in r.load().collect()}

    assert read_from(0) == {"v0", "v1", "v2"}
    assert read_from(cut_ms) == {"v1", "v2"}
    far_future = cut_ms + 10**10
    with pytest.raises(Exception, match="no offset"):
        read_from(far_future)
    assert read_from(far_future, strategy="latest") == set()
    # mutual exclusion with startingOffsets — the real connector's rule
    with pytest.raises(Exception, match="only one"):
        (
            spark.read.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t")
            .option("startingOffsets", "earliest")
            .option(
                "startingOffsetsByTimestamp", _json.dumps({"t": {"0": 0}})
            )
            .load()
            .collect()
        )


def test_consumer_group_rebalance_handoff(spark, broker, tmp_path):
    """kafka.group.id: a consumer joining the group AFTER a member's
    progress was committed (fresh checkpoint — the rebalance/died-member
    case) resumes from the group's COMMITTED offset, not from
    startingOffsets=earliest; a different group — and a group-less
    consumer — still replay everything. Group commits are LAZY (they
    fire when the next batch starts, exactly the real consumer's async
    offset-commit timing), so member 1 runs two availableNow drains: the
    second's restart commits the first's offsets (r9 conformance
    dimension)."""
    _produce(spark, broker, "t", [("a", "v1"), ("b", "v2")])

    def drain(name, group=None, starting="earliest"):
        out, ckpt = str(tmp_path / name), str(tmp_path / f"{name}_ckpt")
        r = (
            spark.readStream.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "t")
            .option("startingOffsets", starting)
        )
        if group:
            r = r.option("kafka.group.id", group)
        q = (
            r.load()
            .select(F.col("value").cast("string"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {row["value"] for row in spark.read.parquet(out).collect()}

    # member 1 consumes the backlog; its progress commits on the restart
    assert drain("m1", group="g1") == {"v1", "v2"}
    _produce(spark, broker, "t", [("c", "v3")])
    assert drain("m1", group="g1") == {"v1", "v2", "v3"}
    # the restart committed offset 2 (v1+v2) — v3's batch is uncommitted
    import json as _json

    committed = _json.load(open(tmp_path / "broker" / "_groups" / "g1.json"))
    assert committed == {"t": 2}
    # member 2: NEW checkpoint, same group → resumes at the committed
    # offset (the uncommitted tail replays — at-least-once, the real
    # group-handoff contract), though startingOffsets says earliest
    assert drain("m2", group="g1") == {"v3"}
    # a different group sees the whole log again
    assert drain("other", group="g2") == {"v1", "v2", "v3"}
    # group-less consumer: checkpoint-only tracking, full replay
    assert drain("nogroup") == {"v1", "v2", "v3"}


def test_max_offsets_per_trigger_bounds_each_batch(spark, broker, tmp_path):
    """maxOffsetsPerTrigger caps each micro-batch, allocated proportional
    to per-topic lag (the real connector's rate limit), and every record
    still arrives across successive batches — nothing skipped, nothing
    duplicated."""
    _produce(spark, broker, "ma", [(str(i), f"a{i}") for i in range(5)])
    _produce(spark, broker, "mb", [(str(i), f"b{i}") for i in range(10)])
    # unit-level allocation: budget 6 over lags (5, 10) → (2, 4)
    opts = kafka_file._Opts(
        {
            "kafka.bootstrap.servers": broker,
            "subscribe": "ma,mb",
            "maxOffsetsPerTrigger": "6",
        }
    )
    reader = kafka_file.FileKafkaStreamReader(opts)
    rows, end = reader.read(reader.initialOffset())
    got = list(rows)
    assert len(got) == 6
    assert end["n"] == {"ma": 2, "mb": 4}
    rows2, end2 = reader.read(end)
    assert len(list(rows2)) == 6 and end2["n"] == {"ma": 4, "mb": 8}
    # unit-level drain: successive capped batches deliver everything
    # exactly once
    seen, cur, reader2 = [], None, kafka_file.FileKafkaStreamReader(opts)
    cur = reader2.initialOffset()
    for _ in range(10):
        rows_i, nxt = reader2.read(cur)
        batch = list(rows_i)
        assert len(batch) <= 6
        if not batch:
            break
        seen += [bytes(r[1]).decode() for r in batch]
        cur = nxt
    assert sorted(seen) == sorted(
        [f"a{i}" for i in range(5)] + [f"b{i}" for i in range(10)]
    )
    # end-to-end: capped micro-batches through a checkpointed stream;
    # repeated availableNow runs drain the log, each batch ≤ the cap
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    want = sorted([f"a{i}" for i in range(5)] + [f"b{i}" for i in range(10)])
    for _ in range(6):
        (
            spark.readStream.format("file_kafka")
            .option("kafka.bootstrap.servers", broker)
            .option("subscribe", "ma,mb")
            .option("maxOffsetsPerTrigger", "6")
            .load()
            .selectExpr("CAST(value AS STRING) AS value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
        if vals == want:
            break
    assert vals == want
    with pytest.raises(Exception, match="positive"):
        kafka_file._Opts(
            {
                "kafka.bootstrap.servers": broker,
                "subscribe": "ma",
                "maxOffsetsPerTrigger": "0",
            }
        )


def test_transactional_producer_visibility(spark, broker):
    """kafka.transactional.id: spooled rows are INVISIBLE to a consumer
    until the transaction commits, appear atomically at commit, and an
    aborted transaction's rows are never visible (read_committed — the
    real connector consumer's default isolation). Documented deviation:
    the twin assigns offsets at commit time; the broker reserves them at
    produce time and skips aborted ranges via markers."""
    opts = kafka_file._Opts(
        {
            "kafka.bootstrap.servers": broker,
            "topic": "tx",
            "kafka.transactional.id": "producer-1",
        },
        for_write=True,
    )
    w = kafka_file.FileKafkaBatchWriter(opts)
    msg = w.write(iter([{"key": "k1", "value": "committed"}]))
    assert _consume(spark, broker, "tx").count() == 0  # in-flight: invisible
    w.commit([msg])
    vals = [
        bytes(r["value"]).decode()
        for r in _consume(spark, broker, "tx").collect()
    ]
    assert vals == ["committed"]
    aborted = w.write(iter([{"key": "k2", "value": "aborted"}]))
    w.abort([aborted])
    vals = [
        bytes(r["value"]).decode()
        for r in _consume(spark, broker, "tx").collect()
    ]
    assert vals == ["committed"]  # aborted rows never surface
    # non-transactional writes keep the immediate-append default
    _produce(spark, broker, "tx", [("k3", "plain")])
    assert _consume(spark, broker, "tx").count() == 2


def test_ending_offsets_batch_bounds(spark, broker):
    """r11: endingOffsets bounds batch reads — JSON per-partition upper
    bound (exclusive), -1 = latest; 'earliest'/-2 refused; setting it on
    a STREAMING query throws — all real-connector rules."""
    _produce(spark, broker, "eo", [(f"k{i}", f"v{i}") for i in range(6)])
    base = (
        spark.read.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "eo")
    )
    got = base.option("endingOffsets", '{"eo": {"0": 4}}').load().collect()
    assert sorted(r.offset for r in got) == [0, 1, 2, 3]
    got = base.option("endingOffsets", '{"eo": {"0": -1}}').load().collect()
    assert len(got) == 6
    # window: startingOffsets JSON + endingOffsets JSON
    got = (
        base.option("startingOffsets", '{"eo": {"0": 2}}')
        .option("endingOffsets", '{"eo": {"0": 5}}')
        .load()
        .collect()
    )
    assert sorted(r.offset for r in got) == [2, 3, 4]
    with pytest.raises(Exception, match="earliest"):
        base.option("endingOffsets", "earliest").load().collect()
    with pytest.raises(Exception, match="not allowed in endingOffsets"):
        base.option("endingOffsets", '{"eo": {"0": -2}}').load().collect()
    # a STREAMING query with endingOffsets throws at stream start (the
    # reader factory is lazy — load() only builds the plan)
    sdf = (
        spark.readStream.format("file_kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "eo")
        .option("endingOffsets", "latest")
        .load()
    )
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", broker + "_eo_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="streaming"):
        q.awaitTermination()
