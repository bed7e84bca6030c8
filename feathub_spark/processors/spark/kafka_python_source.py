"""``kafka_py``: a PySpark Python Data Source for Kafka, used as the
planner's fallback when the ``spark-sql-kafka-0-10`` JVM connector jar is
not on the classpath.

The reference reads Kafka through engine-native connectors (reference
feature_tables/sources/kafka_source.py:25-100 maps to Flink's Kafka
connector); the Spark-first equivalent is ``spark.read.format("kafka")``,
and that remains the preferred path — this module only takes over when the
jar is absent (probed once per JVM via ``Class.forName``).  It implements
Spark 4's public Python Data Source API (pyspark.sql.datasource) on top of
the pure-Python wire client in feathub_spark/common/kafkawire.py:

- batch read: one InputPartition per Kafka topic-partition (sliced further
  when ``minPartitions`` asks for more parallelism), each task fetching its
  own offset range over its own broker connection — the same distribution
  the JVM connector uses, so a 1000-partition topic fans out to 1000 tasks;
- streaming read: a DataSourceStreamReader whose offsets are per-partition
  dicts checkpointed by Spark — resume/exactly-once bookkeeping comes from
  Structured Streaming itself, ``maxOffsetsPerTrigger`` bounds each batch;
- batch/stream write: Produce v3 with Kafka's own murmur2 default
  partitioner for keyed rows, acks=-1, at-least-once (same contract as the
  JVM sink).

Option names and the output schema (key/value binary, topic, partition,
offset, timestamp, timestampType) mirror the JVM connector exactly, so the
planner code in source_sink_utils.py / stream_builder.py only ever swaps
the format string.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from feathub_spark.common.kafkawire import (
    EARLIEST_TIMESTAMP,
    LATEST_TIMESTAMP,
    KafkaWireClient,
    iter_records,
)

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

_CREATE_TIME = 0  # timestampType: our batches are always CreateTime


def jvm_kafka_connector_available(spark) -> bool:
    """True when the spark-sql-kafka provider class is loadable.  Probed
    via Class.forName (the provider registers through Java ServiceLoader,
    so class presence == format availability); cached per SparkContext.

    A session facade that cannot be probed (no sparkContext/_jvm — the
    recording fakes in tests) reports True: on a REAL session the probe
    itself never throws, so failure-to-probe means "not a real JVM", and
    the JVM format name is the stable default for plan-assembly mocks."""
    try:
        sc = spark.sparkContext
        cached = getattr(sc, "_feathub_kafka_jvm_available", None)
        if cached is not None:
            return cached
        jvm = spark._jvm
    except Exception:
        return True
    try:
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        available = True
    except Exception:
        available = False
    try:
        sc._feathub_kafka_jvm_available = available
    except Exception:
        pass
    return available


def ensure_kafka_py_registered(spark) -> str:
    """Register the Python data source once per session; returns the
    format name to use with spark.read/readStream/write."""
    if not getattr(spark, "_feathub_kafka_py_registered", False):
        spark.dataSource.register(KafkaPyDataSource)
        spark._feathub_kafka_py_registered = True
    return "kafka_py"


def kafka_format_for(spark) -> str:
    """The format string the planner should use for this session."""
    if jvm_kafka_connector_available(spark):
        return "kafka"
    return ensure_kafka_py_registered(spark)


# ---------------------------------------------------------------------------
# Option parsing shared by batch and streaming readers.
# ---------------------------------------------------------------------------

def _opt(options, name: str, default: Optional[str] = None) -> Optional[str]:
    # DataSource options arrive case-insensitively lowered by Spark, but
    # look both ways so direct construction in tests also works.
    return options.get(name.lower(), options.get(name, default))


def _reject_unsupported_security(options) -> None:
    """kafka_py speaks PLAINTEXT only.  A source configured for SASL/SSL
    must fail HERE with the real cause, not degrade to a plaintext TCP
    attempt whose eventual connection error never names security as the
    reason (and silently skipping auth against a secured broker would be
    worse).  The JVM connector supports these options — point there."""
    proto = _opt(options, "kafka.security.protocol")
    offending = [
        k
        for k in options
        if k.lower().startswith(("kafka.sasl.", "kafka.ssl."))
    ]
    if proto and proto.strip().upper() != "PLAINTEXT":
        offending.insert(0, f"kafka.security.protocol={proto}")
    if offending:
        raise ValueError(
            "kafka_py (the pure-Python fallback) supports PLAINTEXT only; "
            f"unsupported security options: {sorted(set(offending))}. "
            "Install the spark-sql-kafka-0-10 connector jar to use "
            "SASL/SSL-secured brokers."
        )


def _topics_of(options) -> List[str]:
    sub = _opt(options, "subscribe")
    if not sub:
        raise ValueError("kafka_py requires the 'subscribe' option")
    return [t.strip() for t in sub.split(",") if t.strip()]


def _starting_timestamps(options) -> Optional[int]:
    ts = _opt(options, "startingTimestamp")
    return int(ts) if ts is not None else None


def _offsets_spec(raw: Optional[str], default: int) -> Tuple[int, Optional[dict]]:
    """Parse earliest/latest/JSON offset options into
    (sentinel_timestamp, explicit_map)."""
    if raw is None:
        return default, None
    low = raw.strip().lower()
    if low == "earliest":
        return EARLIEST_TIMESTAMP, None
    if low == "latest":
        return LATEST_TIMESTAMP, None
    return 0, json.loads(raw)  # {"topic": {"0": 23}}; -2/-1 per JVM spec


def _resolve_offsets(
    client: KafkaWireClient,
    topics: Dict[str, List[int]],
    raw: Optional[str],
    default: int,
    starting_ts: Optional[int] = None,
) -> Dict[Tuple[str, int], int]:
    """Resolve an offsets option to concrete per-partition offsets."""
    if starting_ts is not None:
        got = client.list_offsets(
            {(t, p): starting_ts for t, ps in topics.items() for p in ps}
        )
        # -1 = no record at/after ts: start at log end, like the JVM reader
        latest = client.list_offsets(
            {k: LATEST_TIMESTAMP for k, v in got.items() if v < 0}
        )
        return {k: (v if v >= 0 else latest[k]) for k, v in got.items()}
    sentinel, explicit = _offsets_spec(raw, default)
    if explicit is None:
        return client.list_offsets(
            {(t, p): sentinel for t, ps in topics.items() for p in ps}
        )
    out: Dict[Tuple[str, int], int] = {}
    need_sentinel: Dict[Tuple[str, int], int] = {}
    for t, ps in topics.items():
        per = {int(k): int(v) for k, v in explicit.get(t, {}).items()}
        for p in ps:
            v = per.get(p, default)
            if v in (EARLIEST_TIMESTAMP, LATEST_TIMESTAMP):
                need_sentinel[(t, p)] = v
            else:
                out[(t, p)] = v
    if need_sentinel:
        out.update(client.list_offsets(need_sentinel))
    return out


def _fetch_range(
    bootstrap: str,
    topic: str,
    partition: int,
    start: int,
    end: int,
    verify_crc: bool = True,
) -> Iterator[tuple]:
    """Yield connector-schema tuples for [start, end) — the per-task loop.
    Fetch positions inside a batch return the whole containing batch, so
    records below `start` are skipped client-side (normal Kafka consumer
    behavior).  Uses the inlined-varint iter_records fast path; position
    advances by batch offset SPANS (progress), not last-yielded+1, so a
    compacted batch whose tail records are gone cannot stall the loop."""
    if start >= end:
        return
    from_ts = datetime.fromtimestamp
    utc = timezone.utc
    with KafkaWireClient.from_bootstrap(bootstrap) as client:
        pos = start
        while pos < end:
            hwm, record_set = client.fetch(topic, partition, pos)
            progress = [pos]
            got_any = False
            for offset, ts_ms, key, value in iter_records(
                record_set, verify_crc=verify_crc, progress=progress
            ):
                got_any = True
                if offset < pos or offset >= end:
                    continue
                yield (
                    key,
                    value,
                    topic,
                    partition,
                    offset,
                    from_ts(ts_ms / 1000.0, utc),
                    _CREATE_TIME,
                )
            if progress[0] <= pos and not got_any:
                if hwm <= pos:
                    return  # log end reached (end bounded by a stale hwm)
                raise RuntimeError(
                    f"kafka_py: no complete batch at {topic}[{partition}]"
                    f"@{pos} (hwm {hwm}) — offsets missing from the log "
                    "(retention/compaction data loss?)"
                )
            pos = max(pos, progress[0])


class KafkaRangePartition(InputPartition):
    def __init__(
        self, bootstrap: str, topic: str, partition: int, start: int, end: int
    ) -> None:
        self.bootstrap = bootstrap
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


# ---------------------------------------------------------------------------
# Batch reader.
# ---------------------------------------------------------------------------

def _verify_crc_opt(options) -> bool:
    # mirrors the consumer's check.crcs: on by default, explicit opt-out
    return str(_opt(options, "verifyCrc", "true")).lower() != "false"


class KafkaPyBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._options = options
        _reject_unsupported_security(options)
        self._bootstrap = _opt(options, "kafka.bootstrap.servers")
        self._verify_crc = _verify_crc_opt(options)
        if not self._bootstrap:
            raise ValueError("kafka_py requires 'kafka.bootstrap.servers'")

    def partitions(self) -> Sequence[InputPartition]:
        topics = _topics_of(self._options)
        with KafkaWireClient.from_bootstrap(self._bootstrap) as client:
            topo = client.metadata(topics)
            starts = _resolve_offsets(
                client,
                topo,
                _opt(self._options, "startingOffsets"),
                EARLIEST_TIMESTAMP,
                _starting_timestamps(self._options),
            )
            ends = _resolve_offsets(
                client,
                topo,
                _opt(self._options, "endingOffsets"),
                LATEST_TIMESTAMP,
            )
        parts: List[KafkaRangePartition] = []
        for (t, p), start in sorted(starts.items()):
            end = ends[(t, p)]
            parts.append(KafkaRangePartition(self._bootstrap, t, p, start, end))
        min_parts = _opt(self._options, "minPartitions")
        if min_parts:
            parts = _slice_partitions(parts, int(min_parts))
        return parts

    def read(self, partition: KafkaRangePartition) -> Iterator[tuple]:
        return _fetch_range(
            partition.bootstrap,
            partition.topic,
            partition.partition,
            partition.start,
            partition.end,
            verify_crc=self._verify_crc,
        )


def _slice_partitions(
    parts: List[KafkaRangePartition], min_partitions: int
) -> List[KafkaRangePartition]:
    """Split offset ranges so len(result) >= min_partitions (when there are
    enough records), proportionally to range size — mirrors the JVM
    connector's minPartitions contract for oversized topic-partitions."""
    total = sum(max(0, p.end - p.start) for p in parts)
    if total == 0 or len(parts) >= min_partitions:
        return parts
    out: List[KafkaRangePartition] = []
    for p in parts:
        size = max(0, p.end - p.start)
        n = max(1, round(min_partitions * size / total)) if size else 1
        step = max(1, -(-size // n)) if size else 1
        pos = p.start
        while True:
            nxt = min(p.end, pos + step)
            out.append(
                KafkaRangePartition(p.bootstrap, p.topic, p.partition, pos, nxt)
            )
            pos = nxt
            if pos >= p.end:
                break
    return out


# ---------------------------------------------------------------------------
# Streaming reader.  Offsets are {"topic-partition": nextOffset} dicts —
# Spark checkpoints them; initialOffset honors startingOffsets /
# startingTimestamp on the FIRST start only (after that the checkpoint
# wins), exactly like the JVM source.
# ---------------------------------------------------------------------------

def _tp_key(topic: str, partition: int) -> str:
    return f"{topic} {partition}"


def _tp_unkey(key: str) -> Tuple[str, int]:
    t, _, p = key.rpartition(" ")
    return t, int(p)


class KafkaPyStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self._options = options
        _reject_unsupported_security(options)
        self._bootstrap = _opt(options, "kafka.bootstrap.servers")
        if not self._bootstrap:
            raise ValueError("kafka_py requires 'kafka.bootstrap.servers'")
        mot = _opt(options, "maxOffsetsPerTrigger")
        self._max_per_trigger = int(mot) if mot else None
        self._verify_crc = _verify_crc_opt(options)
        self._client: Optional[KafkaWireClient] = None
        # last batch-end this reader planned; the admission-control anchor
        # for maxOffsetsPerTrigger (see latestOffset)
        self._pos: Optional[dict] = None

    def _conn(self) -> KafkaWireClient:
        if self._client is None:
            self._client = KafkaWireClient.from_bootstrap(self._bootstrap)
        return self._client

    def _with_conn(self, fn):
        """Run fn(client), reconnecting ONCE on a dead socket — the driver
        connection outlives micro-batch gaps and broker restarts, and a
        long-lived query must not die on the first stale-socket error."""
        try:
            return fn(self._conn())
        except (ConnectionError, OSError):
            self.stop()
            return fn(self._conn())

    def initialOffset(self) -> dict:
        topics = _topics_of(self._options)

        def resolve(client):
            topo = client.metadata(topics)
            return _resolve_offsets(
                client,
                topo,
                _opt(self._options, "startingOffsets"),
                EARLIEST_TIMESTAMP,
                _starting_timestamps(self._options),
            )

        starts = self._with_conn(resolve)
        out = {_tp_key(t, p): off for (t, p), off in starts.items()}
        if self._pos is None:
            # anchor only if latestOffset hasn't already run: Spark calls
            # latestOffset() BEFORE initialOffset() when planning the first
            # batch, and rewinding the anchor here would let the next
            # latestOffset() return an end BEHIND the first batch's end
            # (backward offsets in the checkpoint -> duplicate reads)
            self._pos = dict(out)
        return out

    def latestOffset(self) -> dict:
        """The end offset of the NEXT micro-batch.  maxOffsetsPerTrigger is
        applied HERE — Spark checkpoints whatever this returns as the batch
        end, so capping anywhere later (e.g. partitions()) would silently
        drop the records between the cap and the true log end.  The cap is
        distributed across partitions proportionally to their backlog,
        anchored at the last planned end (self._pos).

        The FIRST latestOffset() of a run has no anchor — Spark calls it
        before initialOffset() on a fresh start and never tells the reader
        the restored offset on a checkpoint restart — so it returns the
        true log end: one uncapped first batch, capped thereafter (the
        anchor self-heals through partitions()).  Anchoring that first call
        at startingOffsets instead would be WRONG on restart: the capped
        end could land behind the checkpointed position, Spark would
        checkpoint offsets moving backward, and the overlap would replay as
        duplicates.  The JVM connector receives the start offset through
        SupportsAdmissionControl.latestOffset(start, limit) — an API the
        Python data source does not expose — which is why it can cap the
        first batch and this reader cannot."""
        topics = _topics_of(self._options)

        def resolve(client):
            topo = client.metadata(topics)
            return client.list_offsets(
                {(t, p): LATEST_TIMESTAMP for t, ps in topo.items() for p in ps}
            )

        latest = self._with_conn(resolve)
        end = {_tp_key(t, p): off for (t, p), off in latest.items()}
        if self._max_per_trigger is not None and self._pos is not None:
            backlog = {
                k: max(0, e - self._pos.get(k, e)) for k, e in end.items()
            }
            total = sum(backlog.values())
            if total > self._max_per_trigger:
                scale = self._max_per_trigger / total
                capped = {}
                for k, e in end.items():
                    s = self._pos.get(k, e)
                    take = int(backlog[k] * scale)
                    capped[k] = min(e, s + take)
                # rounding may strand a fully-starved batch; guarantee
                # progress by granting one record to the largest backlog
                if all(capped[k] <= self._pos.get(k, capped[k]) for k in capped):
                    k_max = max(backlog, key=backlog.get)
                    capped[k_max] = min(
                        end[k_max], self._pos.get(k_max, 0) + 1
                    )
                end = capped
        self._pos = dict(end)
        return end

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # authoritative re-anchor: on restart Spark replans the last batch
        # straight from the checkpoint without calling initialOffset()
        self._pos = dict(end)
        # a partition created AFTER the query started appears in `end`
        # with no `start` entry; the JVM source reads it from EARLIEST.
        # Defaulting to 0 instead would hit OFFSET_OUT_OF_RANGE on any
        # broker whose retention already aged out the low offsets.
        new_keys = [k for k in end if k not in start]
        new_starts: Dict[str, int] = {}
        if new_keys:
            new_starts = {
                _tp_key(t, p): off
                for (t, p), off in self._with_conn(
                    lambda client: client.list_offsets(
                        {_tp_unkey(k): EARLIEST_TIMESTAMP for k in new_keys}
                    )
                ).items()
            }
        parts: List[KafkaRangePartition] = []
        for key, e in sorted(end.items()):
            t, p = _tp_unkey(key)
            s = start.get(key, new_starts.get(key, 0))
            parts.append(KafkaRangePartition(self._bootstrap, t, p, s, e))
        min_parts = _opt(self._options, "minPartitions")
        if min_parts:
            # same contract as the batch reader (and the JVM source, which
            # honors minPartitions per micro-batch): slice oversized offset
            # ranges so a 2-partition topic still fans out across the
            # cluster when one trigger carries a large backlog
            parts = _slice_partitions(parts, int(min_parts))
        return parts

    def read(self, partition: KafkaRangePartition) -> Iterator[tuple]:
        return _fetch_range(
            partition.bootstrap,
            partition.topic,
            partition.partition,
            partition.start,
            partition.end,
            verify_crc=self._verify_crc,
        )

    def commit(self, end: dict) -> None:
        pass  # positions live in the Spark checkpoint, not the broker

    def stop(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None


# ---------------------------------------------------------------------------
# Writers.  Input schema mirrors the JVM sink contract: a required binary
# `value`, optional binary `key`, optional string `topic` (else the `topic`
# option), optional int `partition`.  murmur2 keyed partitioning matches
# Kafka's DefaultPartitioner so a keyed stream lands on the same partitions
# a Java producer would pick.
# ---------------------------------------------------------------------------

def murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (seed 0x9747b28c), as used by the default
    partitioner.  Public algorithm; verified against the values the Kafka
    client test-suite publishes (see tests/test_kafkawire.py)."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rem = length - i
    if rem == 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[i] & 0xFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def _to_bytes(v) -> Optional[bytes]:
    if v is None or isinstance(v, bytes):
        return v
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("utf-8")
    raise TypeError(f"kafka_py writer: cannot serialize {type(v).__name__}")


class KafkaCommitMessage(WriterCommitMessage):
    def __init__(self, records: int) -> None:
        self.records = records


class _KafkaWriteCore:
    """Shared by the batch and streaming writers (one instance per task)."""

    def __init__(self, options, schema) -> None:
        _reject_unsupported_security(options)
        self._bootstrap = _opt(options, "kafka.bootstrap.servers")
        if not self._bootstrap:
            raise ValueError("kafka_py requires 'kafka.bootstrap.servers'")
        self._topic = _opt(options, "topic")
        names = [f.name for f in schema.fields]
        for required in ("value",):
            if required not in names:
                raise ValueError(
                    f"kafka_py writer needs a '{required}' column; got {names}"
                )
        if self._topic is None and "topic" not in names:
            raise ValueError(
                "kafka_py writer needs a 'topic' option or column"
            )
        self._batch_size = int(_opt(options, "batchSize", "500"))

    def write_rows(self, iterator) -> KafkaCommitMessage:
        import time

        from pyspark import TaskContext

        ctx = TaskContext.get()
        rr_start = ctx.partitionId() if ctx is not None else 0
        client = KafkaWireClient.from_bootstrap(self._bootstrap)
        npart_cache: Dict[str, int] = {}
        pending: Dict[Tuple[str, int], list] = {}
        total = 0
        try:
            for i, row in enumerate(iterator):
                d = row.asDict() if hasattr(row, "asDict") else row
                topic = d.get("topic") or self._topic
                key = _to_bytes(d.get("key"))
                value = _to_bytes(d.get("value"))
                nparts = npart_cache.get(topic)
                if nparts is None:
                    nparts = len(client.metadata([topic])[topic])
                    npart_cache[topic] = nparts
                part = d.get("partition")
                if part is None:
                    if key is not None:
                        part = (murmur2(key) & 0x7FFFFFFF) % nparts
                    else:
                        part = (rr_start + i) % nparts
                ts = d.get("timestamp")
                if ts is None:
                    ts_ms = int(time.time() * 1000)
                elif isinstance(ts, datetime):
                    # naive datetimes here are OS-LOCAL wall times, not
                    # session-tz ones: the data-source write worker
                    # converts TimestampType via astimezone().replace(
                    # tzinfo=None) (pyspark.sql.conversion
                    # ArrowTableToRowsConversion), so .timestamp() — which
                    # interprets naive values in the OS zone — exactly
                    # round-trips the epoch regardless of
                    # spark.sql.session.timeZone.  TimestampNTZ wall times
                    # carry no zone at all and are likewise taken as
                    # OS-local.  tz-aware values are exact by definition.
                    ts_ms = int(ts.timestamp() * 1000)
                else:
                    ts_ms = int(ts)
                buf = pending.setdefault((topic, int(part)), [])
                buf.append((key, value, ts_ms))
                total += 1
                if len(buf) >= self._batch_size:
                    client.produce(topic, int(part), buf)
                    buf.clear()
            for (topic, part), buf in pending.items():
                if buf:
                    client.produce(topic, part, buf)
        finally:
            client.close()
        return KafkaCommitMessage(total)


class KafkaPyBatchWriter(DataSourceWriter):
    def __init__(self, options, schema) -> None:
        self._core = _KafkaWriteCore(options, schema)

    def write(self, iterator) -> KafkaCommitMessage:
        return self._core.write_rows(iterator)

    def commit(self, messages) -> None:
        pass  # records were acked in write(); at-least-once like JVM sink

    def abort(self, messages) -> None:
        pass  # no transactional producer: partial writes may remain


class KafkaPyStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema) -> None:
        self._core = _KafkaWriteCore(options, schema)

    def write(self, iterator) -> KafkaCommitMessage:
        return self._core.write_rows(iterator)

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass


class KafkaPyDataSource(DataSource):
    """format('kafka_py') — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kafka_py"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def reader(self, schema) -> KafkaPyBatchReader:
        return KafkaPyBatchReader(self.options)

    def streamReader(self, schema) -> KafkaPyStreamReader:
        return KafkaPyStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> KafkaPyBatchWriter:
        if overwrite:
            raise ValueError("kafka_py cannot overwrite a topic")
        return KafkaPyBatchWriter(self.options, schema)

    def streamWriter(self, schema, overwrite: bool) -> KafkaPyStreamWriter:
        return KafkaPyStreamWriter(self.options, schema)
