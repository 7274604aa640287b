"""File-backed Kafka-contract data source (PySpark Python Data Source API).

The container ships no spark-sql-kafka connector jar and no network to
fetch one, so the real produce→consume path can't execute here. Rather
than leave the Kafka wiring forever skip-gated, this module vendors a
**drop-in contract fake**: a registered Spark data source
(``file_kafka``) that honors the exact option surface of the real
connector —

- ``kafka.bootstrap.servers`` → the spool root (a directory path plays
  the broker address),
- exactly ONE of ``assign`` (JSON ``{"topic": [0]}``), ``subscribe``
  (comma-separated topic list), or ``subscribePattern`` (regex) for
  reads — the real connector's subscription rule; producers take an
  optional ``topic`` or route per-row via a ``topic`` column (the real
  producer contract),
- ``startingOffsets`` → ``earliest``/``latest``/per-partition JSON
  (``{"topic": {"0": off}}``, -2 = earliest, -1 = latest; ``latest``
  refused for batch reads, as the real connector refuses it),

and yields the real connector's exact output schema
``key binary, value binary, topic string, partition int, offset bigint,
timestamp timestamp, timestampType int``, so
``read_kafka_events``/``write_kafka_cdc`` run UNMODIFIED against it
(swap the format name, nothing else — the module's design promise).

The log is a directory of immutable JSONL part files per topic; the
record order is the sorted-filename concatenation, offsets are positions
in that order. Appends create new part files (no in-place mutation), so
concurrent producers never corrupt the log — the same append-only
contract a real broker partition gives. One partition per topic: this is
a CONTRACT fake for correctness tests, not a throughput tool; at scale
the real connector talks to a real cluster.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _topic_dir(root: str, topic: str) -> str:
    return os.path.join(root, topic)


def _log_records(root: str, topic: str) -> list[dict]:
    """The topic log: records across sorted immutable part files."""
    d = _topic_dir(root, topic)
    if not os.path.isdir(d):
        return []
    records: list[dict] = []
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(d, fname)) as f:
            for line in f:
                if line.strip():
                    records.append(json.loads(line))
    return records


_PART_SEQ_RE = re.compile(r"^part-z(\d{20})-")


def _next_seq(d: str) -> int:
    """Successor of the largest sequence already in the topic dir. Deriving
    the next part name from the directory (not the wall clock) keeps
    sorted-filename order == append order even across clock step-backs
    (NTP): a new part always sorts after every existing part."""
    best = -1
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return 0
    for fname in names:
        m = _PART_SEQ_RE.match(fname)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def _append_part(root: str, topic: str, rows: list[dict]) -> None:
    if not rows:
        return
    d = _topic_dir(root, topic)
    os.makedirs(d, exist_ok=True)
    # monotonic part names: sorted-filename order == append order, so a
    # later produce can never renumber existing offsets (the broker's
    # append-only contract; random names broke it — offsets must be
    # stable for consumers seeking by offset). The sequence is max+1 over
    # the dir's existing part names, so it is monotonic regardless of the
    # wall clock. The 'z' prefix sorts AFTER any legacy part-<uuid4hex>
    # file (hex < 'z'), so appending to a pre-upgrade spool extends it
    # instead of renumbering it; the uuid suffix keeps two producers that
    # raced to the same sequence collision-free (both sort after all
    # earlier parts, so existing offsets are still never renumbered).
    part = os.path.join(
        d, f"part-z{_next_seq(d):020d}-{uuid.uuid4().hex}.jsonl"
    )
    tmp = part + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, part)  # atomic publish: readers never see partial files


def _to_output_row(rec: dict, topic: str, offset: int):
    key = rec.get("key")
    return (
        key.encode() if isinstance(key, str) else key,
        (rec.get("value") or "").encode(),
        topic,
        0,
        offset,
        datetime.datetime.fromtimestamp(rec.get("ts", 0.0)),
        0,  # TimestampType.CREATE_TIME
    )


class _Opts:
    """Option surface of the real connector, validated the way it
    validates: reads take EXACTLY ONE of ``assign`` (JSON topic →
    partition list), ``subscribe`` (comma-separated list), or
    ``subscribePattern`` (regex); writes take an optional ``topic``
    (else per-row routing). ``startingOffsets`` accepts
    ``earliest``/``latest`` or the per-partition JSON form
    (``{"topic": {"0": off}}``, with -2 = earliest and -1 = latest;
    partitions missing from the JSON start earliest); ``latest`` is
    refused for batch reads — all real-connector rules."""

    def __init__(self, options, for_write: bool = False, for_batch: bool = False):
        self.root = options.get("kafka.bootstrap.servers")
        if not self.root:
            raise ValueError(
                "file_kafka requires kafka.bootstrap.servers (spool dir) — "
                "the real connector's option name"
            )
        self.topic = (options.get("topic") or "").strip() or None
        if for_write:
            self.topics: list[str] = [self.topic] if self.topic else []
            self.starting = "earliest"
            self.starting_json = None
            # transactional producer (kafka.transactional.id): rows spool
            # outside the log until the epoch's commit, vanish on abort —
            # a read_committed consumer never sees in-flight data (r10).
            # Deviation, documented: offsets are assigned at commit time
            # (the twin keeps the log strictly append-only) where the real
            # broker reserves them at produce time and skips via markers.
            self.txn_id = (
                options.get("kafka.transactional.id") or ""
            ).strip() or None
            return
        modes = [
            k for k in ("assign", "subscribe", "subscribePattern") if options.get(k)
        ]
        if len(modes) != 1:
            raise ValueError(
                "file_kafka reads require exactly one of assign / subscribe / "
                "subscribePattern — the real connector's subscription rule"
            )
        mode = modes[0]
        if mode == "subscribe":
            self.topics = [
                t.strip() for t in options.get("subscribe").split(",") if t.strip()
            ]
            if not self.topics:
                raise ValueError("file_kafka: empty subscribe topic list")
        elif mode == "assign":
            try:
                spec = json.loads(options.get("assign"))
                assert isinstance(spec, dict) and spec
            except (ValueError, AssertionError):
                raise ValueError(
                    'file_kafka: assign must be JSON like {"topic": [0]} — '
                    "the real connector's assign form"
                ) from None
            for topic, parts in spec.items():
                if parts not in ([0], []):
                    raise ValueError(
                        f"file_kafka: topic {topic!r} has a single partition 0 "
                        f"(assign requested {parts!r})"
                    )
            self.topics = sorted(spec)
        else:  # subscribePattern — resolved against the spool at plan time
            pat = re.compile(options.get("subscribePattern"))
            existing = (
                sorted(os.listdir(self.root)) if os.path.isdir(self.root) else []
            )
            self.topics = [
                t
                for t in existing
                if pat.fullmatch(t) and os.path.isdir(os.path.join(self.root, t))
            ]
        # consumer-group id (the real connector's kafka.group.id option):
        # committed group offsets take precedence over startingOffsets on
        # (re)start — the consumer-group handoff a rebalance relies on
        self.group_id = (options.get("kafka.group.id") or "").strip() or None
        # seek-by-timestamp (startingOffsetsByTimestamp, ms per partition)
        # — mutually exclusive with startingOffsets, the real connector's
        # rule; the no-match behavior follows
        # startingOffsetsByTimestampStrategy (error | latest, default error)
        raw_ts = options.get("startingOffsetsByTimestamp")
        self.starting_ts = None
        self.ts_strategy = (
            options.get("startingOffsetsByTimestampStrategy") or "error"
        ).strip().lower()
        if self.ts_strategy not in ("error", "latest"):
            raise ValueError(
                f"file_kafka: bad startingOffsetsByTimestampStrategy "
                f"{self.ts_strategy!r} (error | latest)"
            )
        if raw_ts:
            if options.get("startingOffsets"):
                raise ValueError(
                    "file_kafka: set only one of startingOffsets and "
                    "startingOffsetsByTimestamp — the real connector's rule"
                )
            try:
                self.starting_ts = {
                    t: {int(p): int(ms) for p, ms in parts.items()}
                    for t, parts in json.loads(raw_ts).items()
                }
            except (ValueError, AttributeError):
                raise ValueError(
                    "file_kafka: startingOffsetsByTimestamp JSON must be "
                    '{"topic": {"partition": epoch_millis}}'
                ) from None
        raw_start = options.get("startingOffsets") or "earliest"
        self.starting_json = None
        if raw_start.strip().startswith("{"):
            try:
                self.starting_json = {
                    t: {int(p): int(o) for p, o in parts.items()}
                    for t, parts in json.loads(raw_start).items()
                }
            except (ValueError, AttributeError):
                raise ValueError(
                    "file_kafka: startingOffsets JSON must be "
                    '{"topic": {"partition": offset}}'
                ) from None
            self.starting = "json"
        else:
            self.starting = raw_start.strip().lower()
            if self.starting not in ("earliest", "latest"):
                raise ValueError(
                    f"file_kafka: bad startingOffsets {raw_start!r}"
                )
        if for_batch and self.starting == "latest":
            raise ValueError(
                "file_kafka: startingOffsets 'latest' is not allowed for "
                "batch queries — the real connector's rule"
            )
        # endingOffsets (r11): batch-query upper bound — 'latest'
        # (default) or per-partition JSON with -1 = latest; 'earliest'
        # and -2 refused, and a STREAMING query with endingOffsets set
        # throws — all real-connector rules
        raw_end = options.get("endingOffsets")
        self.ending = "latest"
        self.ending_json = None
        if raw_end is not None and not for_write:
            if not for_batch:
                raise ValueError(
                    "file_kafka: endingOffsets is not allowed in streaming "
                    "queries — the real connector's rule"
                )
            r = raw_end.strip()
            if r.startswith("{"):
                try:
                    self.ending_json = {
                        t: {int(p): int(o) for p, o in parts.items()}
                        for t, parts in json.loads(r).items()
                    }
                except (ValueError, AttributeError):
                    raise ValueError(
                        "file_kafka: endingOffsets JSON must be "
                        '{"topic": {"partition": offset}}'
                    ) from None
                if any(
                    o == -2
                    for parts in self.ending_json.values()
                    for o in parts.values()
                ):
                    raise ValueError(
                        "file_kafka: earliest (-2) is not allowed in "
                        "endingOffsets — the real connector's rule"
                    )
                self.ending = "json"
            elif r.lower() == "latest":
                pass
            elif r.lower() == "earliest":
                raise ValueError(
                    "file_kafka: endingOffsets 'earliest' is not allowed — "
                    "the real connector's rule"
                )
            else:
                raise ValueError(f"file_kafka: bad endingOffsets {raw_end!r}")
        # maxOffsetsPerTrigger: per-micro-batch record cap, allocated
        # proportionally to per-topic lag (streaming only — the real
        # connector ignores it for batch queries)
        raw_max = options.get("maxOffsetsPerTrigger")
        self.max_offsets = None
        if raw_max is not None:
            try:
                self.max_offsets = int(raw_max)
                assert self.max_offsets > 0
            except (ValueError, AssertionError):
                raise ValueError(
                    "file_kafka: maxOffsetsPerTrigger must be a positive "
                    "integer"
                ) from None

    def end_index(self, topic: str, log_len: int) -> int:
        """Resolved batch-read end position (exclusive) for partition 0:
        'latest' = log length; JSON offsets clamp to it, -1 = latest.
        Partitions missing from the JSON end latest (connector rule)."""
        if self.ending == "json":
            o = (self.ending_json or {}).get(topic, {}).get(0, -1)
            return log_len if o == -1 else max(0, min(int(o), log_len))
        return log_len

    def start_index(self, topic: str, log_len: int, records: list | None = None) -> int:
        """Resolved start position for a topic's single partition 0."""
        if self.starting_ts is not None:
            ts_ms = self.starting_ts.get(topic, {}).get(0)
            if ts_ms is None:
                return 0  # partitions missing from the JSON start earliest
            if records is None:
                records = _log_records(self.root, topic)
            # first offset whose record timestamp >= the sought millis —
            # the broker's offsetsForTimes contract (ts is CreateTime)
            for i, rec in enumerate(records):
                if rec.get("ts", 0.0) * 1000.0 >= ts_ms:
                    return i
            if self.ts_strategy == "latest":
                return log_len
            raise ValueError(
                f"file_kafka: no offset in {topic!r} with timestamp >= "
                f"{ts_ms} and startingOffsetsByTimestampStrategy=error — "
                f"the real connector's no-match rule"
            )
        if self.starting_json is not None:
            off = self.starting_json.get(topic, {}).get(0, -2)
            if off == -2:
                return 0
            if off == -1:
                return log_len
            return min(max(off, 0), log_len)
        return log_len if self.starting == "latest" else 0

    # -- consumer-group committed offsets (kafka.group.id) ---------------

    def _group_file(self) -> str:
        return os.path.join(self.root, "_groups", f"{self.group_id}.json")

    def committed_offsets(self) -> dict | None:
        """The group's committed {topic: offset} map, if any."""
        if not self.group_id:
            return None
        try:
            with open(self._group_file()) as f:
                return {t: int(o) for t, o in json.load(f).items()}
        except (OSError, ValueError):
            return None

    def commit_group_offsets(self, offsets: dict) -> None:
        """Persist the group's progress (atomic rename — a dying consumer
        never leaves a torn commit for the next group member)."""
        if not self.group_id:
            return
        path = self._group_file()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(offsets, f)
        os.replace(tmp, path)


class FileKafkaBatchReader(DataSourceReader):
    def __init__(self, opts: _Opts):
        self.opts = opts

    def read(self, partition) -> Iterator[tuple]:
        for topic in self.opts.topics:
            records = _log_records(self.opts.root, topic)
            start = self.opts.start_index(topic, len(records), records)
            end = self.opts.end_index(topic, len(records))
            for i, rec in enumerate(records[start:end], start=start):
                yield _to_output_row(rec, topic, i)


def _norm_offset(off: dict, topics: list[str]) -> dict:
    """Offset dict → {topic: consumed-count}. Accepts the legacy single-
    topic int form so existing checkpoints keep resuming; a legacy int
    under a MULTI-topic subscription is ambiguous (which topic was it?)
    and silently zeroing would re-deliver consumed records, so refuse."""
    n = off.get("n", 0)
    if isinstance(n, dict):
        return {t: int(n.get(t, 0)) for t in topics}
    if len(topics) == 1:
        return {topics[0]: int(n)}
    raise ValueError(
        "file_kafka checkpoint holds a single-topic offset but the "
        "subscription now names multiple topics — start a fresh "
        "checkpoint for the widened subscription"
    )


class FileKafkaStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, opts: _Opts):
        self.opts = opts

    def initialOffset(self) -> dict:
        # consumer-group semantics: the group's committed offsets win over
        # startingOffsets (the rebalance handoff — a member joining after
        # another died resumes where the group left off, never from the
        # auto-reset position)
        committed = self.opts.committed_offsets()
        out = {}
        for t in self.opts.topics:
            if committed is not None and t in committed:
                out[t] = committed[t]
            else:
                records = _log_records(self.opts.root, t)
                out[t] = self.opts.start_index(t, len(records), records)
        return {"n": out}

    def read(self, start: dict):
        lo = _norm_offset(start, self.opts.topics)
        logs, avail = {}, {}
        for topic in self.opts.topics:
            logs[topic] = _log_records(self.opts.root, topic)
            avail[topic] = max(len(logs[topic]) - lo[topic], 0)
        take = dict(avail)
        cap, total = self.opts.max_offsets, sum(avail.values())
        if cap is not None and total > cap:
            # maxOffsetsPerTrigger: proportional-to-lag allocation (the
            # real connector's rate limit); integer floors can underfill,
            # so hand the remainder out in topic order — the batch always
            # uses its full budget and never exceeds it
            take = {t: (cap * a) // total for t, a in avail.items()}
            rem = cap - sum(take.values())
            for t in sorted(avail):
                if rem <= 0:
                    break
                extra = min(rem, avail[t] - take[t])
                take[t] += extra
                rem -= extra
        rows, end = [], {}
        for topic in self.opts.topics:
            hi = lo[topic] + take[topic]
            rows += [
                _to_output_row(rec, topic, i)
                for i, rec in enumerate(logs[topic][lo[topic]:hi], start=lo[topic])
            ]
            end[topic] = hi
        return iter(rows), {"n": end}

    def commit(self, end: dict) -> None:
        """Micro-batch completion: commit the group's progress (no-op
        without kafka.group.id — checkpoint-only tracking, the real
        connector's default)."""
        self.opts.commit_group_offsets(_norm_offset(end, self.opts.topics))

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = _norm_offset(start, self.opts.topics)
        hi = _norm_offset(end, self.opts.topics)
        for topic in self.opts.topics:
            records = _log_records(self.opts.root, topic)
            for i, rec in enumerate(
                records[lo[topic]:hi[topic]], start=lo[topic]
            ):
                yield _to_output_row(rec, topic, i)


class _Commit(WriterCommitMessage):
    def __init__(self, spool: list | None = None):
        self.spool = spool or []


def _spool_records(opts: _Opts, grouped: dict[str, list[dict]]) -> "_Commit":
    """Transactional produce: park each topic's records in the txn spool
    (outside the log — invisible to every reader) and hand the paths to
    the driver through the commit message."""
    spool_dir = os.path.join(opts.root, "_txn", opts.txn_id)
    os.makedirs(spool_dir, exist_ok=True)
    paths = []
    for topic, recs in grouped.items():
        p = os.path.join(spool_dir, f"{uuid.uuid4().hex}.json")
        with open(p, "w") as f:
            json.dump({"topic": topic, "records": recs}, f)
        paths.append(p)
    return _Commit(spool=paths)


def _commit_spooled(opts: _Opts, messages) -> None:
    """Driver-side transaction commit: spooled records enter the log
    atomically (one immutable part per topic append); only now does a
    consumer see them — the read_committed visibility contract."""
    for msg in messages or ():
        for p in getattr(msg, "spool", ()) or ():
            try:
                with open(p) as f:
                    blob = json.load(f)
            except OSError:
                continue
            _append_part(opts.root, blob["topic"], blob["records"])
            os.remove(p)


def _abort_spooled(opts: _Opts, messages) -> None:
    """Driver-side abort: the spool is dropped — aborted transactional
    records are never visible to any consumer."""
    for msg in messages or ():
        for p in getattr(msg, "spool", ()) or ():
            try:
                os.remove(p)
            except OSError:
                pass


def _rows_to_records(iterator, default_topic: str | None) -> dict[str, list[dict]]:
    """Producer routing, the real connector's rule: the ``topic`` option
    wins; without it each row's ``topic`` column decides; neither is an
    error. Returns records grouped per destination topic."""
    import time

    out: dict[str, list[dict]] = {}
    now = time.time()
    for row in iterator:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        topic = default_topic or d.get("topic")
        if not topic:
            raise ValueError(
                "file_kafka write: no 'topic' option and no topic column "
                "on the row — the real connector's producer contract"
            )
        key = d.get("key")
        value = d.get("value")
        out.setdefault(topic, []).append(
            {
                "key": key.decode() if isinstance(key, (bytes, bytearray)) else key,
                "value": value.decode()
                if isinstance(value, (bytes, bytearray))
                else value,
                "ts": now,
            }
        )
    return out


class FileKafkaBatchWriter(DataSourceWriter):
    """Producer contract: rows with (key?, value[, topic]) columns append
    to the topic log; each task publishes one immutable part file per
    destination topic."""

    def __init__(self, opts: _Opts):
        self.opts = opts

    def write(self, iterator) -> _Commit:
        grouped = _rows_to_records(iterator, self.opts.topic)
        if self.opts.txn_id:
            return _spool_records(self.opts, grouped)
        for topic, recs in grouped.items():
            _append_part(self.opts.root, topic, recs)
        return _Commit()

    def commit(self, messages):
        _commit_spooled(self.opts, messages)

    def abort(self, messages):
        _abort_spooled(self.opts, messages)


class FileKafkaStreamWriter(DataSourceStreamWriter):
    def __init__(self, opts: _Opts):
        self.opts = opts

    def write(self, iterator) -> _Commit:
        grouped = _rows_to_records(iterator, self.opts.topic)
        if self.opts.txn_id:
            return _spool_records(self.opts, grouped)
        for topic, recs in grouped.items():
            _append_part(self.opts.root, topic, recs)
        return _Commit()

    def commit(self, messages, batchId):
        _commit_spooled(self.opts, messages)

    def abort(self, messages, batchId):
        _abort_spooled(self.opts, messages)


class FileKafkaDataSource(DataSource):
    """``spark.dataSource.register(FileKafkaDataSource)`` then use format
    ``file_kafka`` anywhere the real connector's ``kafka`` would go."""

    @classmethod
    def name(cls) -> str:
        return "file_kafka"

    def schema(self):
        return KAFKA_SCHEMA

    def reader(self, schema) -> FileKafkaBatchReader:
        return FileKafkaBatchReader(_Opts(self.options, for_batch=True))

    def simpleStreamReader(self, schema) -> FileKafkaStreamReader:
        return FileKafkaStreamReader(_Opts(self.options))

    def writer(self, schema, overwrite) -> FileKafkaBatchWriter:
        return FileKafkaBatchWriter(_Opts(self.options, for_write=True))

    def streamWriter(self, schema, overwrite) -> FileKafkaStreamWriter:
        return FileKafkaStreamWriter(_Opts(self.options, for_write=True))


def register(spark) -> None:
    """Idempotent registration of the contract fake."""
    spark.dataSource.register(FileKafkaDataSource)
