"""LIVE Kafka connector tests against an in-process wire-protocol broker.

The sandbox has no dockerd, no Kafka broker, no Python Kafka client, and
the pyspark wheel does not ship the ``spark-sql-kafka-0-10`` jar — so the
JVM connector path can never execute here.  This suite is the Kafka
analogue of test_jdbc_derby_live.py / test_redis_live.py: the PRODUCTION
planner paths (``get_source_dataframe`` with a KafkaSource,
``insert_into_sink`` with a KafkaSink, the streaming builder's Kafka
branches) run UNMODIFIED and land on the engine's ``kafka_py`` Python Data
Source fallback, which speaks the PUBLIC Kafka protocol
(kafka.apache.org/protocol: Metadata/ListOffsets/Fetch/Produce, message
format v2 with CRC32C) over real TCP sockets to tools/minikafka.py.

Reference counterpart: the testcontainer suites at
/root/reference/python/feathub/processors/flink/table_builder/tests/
test_kafka_source_sink.py.
"""

from __future__ import annotations

import json
import time
import uuid
from datetime import datetime, timezone

import pytest

from feathub_spark.common import types as t
from feathub_spark.common.kafkawire import (
    EARLIEST_TIMESTAMP,
    LATEST_TIMESTAMP,
    KafkaWireClient,
    decode_record_batches,
)
from feathub_spark.table.schema import Schema

SCHEMA = Schema(["k", "v", "ts"], [t.String, t.Int64, t.Int64])


@pytest.fixture(scope="module")
def broker():
    from tools.minikafka import MiniKafkaBroker

    with MiniKafkaBroker(num_partitions=3) as b:
        yield b


@pytest.fixture(scope="module")
def wire(broker):
    client = KafkaWireClient.from_bootstrap(broker.bootstrap)
    yield client
    client.close()


def _topic() -> str:
    return f"t_{uuid.uuid4().hex[:10]}"


def _source(broker, topic, **kw):
    from feathub_spark.feature_tables.sources.connector_sources import (
        KafkaSource,
    )

    kw.setdefault("startup_mode", "earliest-offset")
    kw.setdefault("is_bounded", True)
    return KafkaSource(
        name=f"src_{topic}",
        bootstrap_server=broker.bootstrap,
        topic=topic,
        schema=SCHEMA,
        keys=["k"],
        timestamp_field="ts",
        timestamp_format="epoch",
        **kw,
    )


def _produce_json(wire, topic, partition, rows, base_ts=1_700_000_000_000):
    wire.produce(
        topic,
        partition,
        [
            (
                r["k"].encode(),
                json.dumps(r).encode(),
                base_ts + i * 1000,
            )
            for i, r in enumerate(rows)
        ],
    )


# --------------------------- batch source ----------------------------------

def test_bounded_source_reads_all_partitions(spark, broker, wire):
    """Production KafkaSource -> kafka_py fallback: every partition's JSON
    records parse against the declared schema, with event time derived."""
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
    )

    topic = _topic()
    _produce_json(wire, topic, 0, [{"k": "a", "v": 1, "ts": 100}])
    _produce_json(wire, topic, 1, [{"k": "b", "v": 2, "ts": 200}])
    _produce_json(wire, topic, 2, [{"k": "c", "v": 3, "ts": 300}])
    df = get_source_dataframe(spark, _source(broker, topic))
    rows = {(r["k"], r["v"], r["ts"]) for r in df.collect()}
    assert rows == {("a", 1, 100), ("b", 2, 200), ("c", 3, 300)}
    from feathub_spark.processors.spark.constants import EVENT_TIME_COL

    assert EVENT_TIME_COL in df.columns


def test_bounded_source_parallelism_matches_topic_partitions(
    spark, broker, wire
):
    """One Spark input partition per Kafka partition — the same fan-out the
    JVM connector produces, so a 1000-partition topic gets 1000 tasks."""
    from feathub_spark.processors.spark.kafka_python_source import (
        ensure_kafka_py_registered,
    )

    topic = _topic()
    for p in range(3):
        _produce_json(wire, topic, p, [{"k": f"k{p}", "v": p, "ts": p}])
    ensure_kafka_py_registered(spark)
    raw = (
        spark.read.format("kafka_py")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("subscribe", topic)
        .load()
    )
    parts = raw.rdd.getNumPartitions()
    assert parts == 3
    assert raw.count() == 3


def test_min_partitions_slices_offset_ranges(spark, broker, wire):
    from feathub_spark.processors.spark.kafka_python_source import (
        ensure_kafka_py_registered,
    )

    topic = _topic()
    _produce_json(
        wire, topic, 0, [{"k": f"k{i}", "v": i, "ts": i} for i in range(20)]
    )
    ensure_kafka_py_registered(spark)
    raw = (
        spark.read.format("kafka_py")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("subscribe", topic)
        .option("minPartitions", "4")
        .load()
    )
    # 20 records in ONE topic-partition split across >= 4 Spark tasks,
    # every record still read exactly once
    assert raw.rdd.getNumPartitions() >= 4
    got = sorted(r["offset"] for r in raw.collect())
    assert got == list(range(20))


def test_startup_mode_timestamp(spark, broker, wire):
    """startup_mode='timestamp' -> startingTimestamp: only records at or
    after the datetime are read (ListOffsets timestamp lookup)."""
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
    )

    topic = _topic()
    base = 1_700_000_000_000
    _produce_json(
        wire,
        topic,
        0,
        [{"k": f"k{i}", "v": i, "ts": i} for i in range(6)],
        base_ts=base,
    )
    src = _source(
        broker,
        topic,
        startup_mode="timestamp",
        startup_datetime=datetime.fromtimestamp(
            (base + 3000) / 1000.0, timezone.utc
        ),
    )
    df = get_source_dataframe(spark, src)
    assert sorted(r["v"] for r in df.collect()) == [3, 4, 5]


def test_startup_timestamp_past_log_end_reads_nothing(spark, broker, wire):
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
    )

    topic = _topic()
    _produce_json(wire, topic, 0, [{"k": "a", "v": 1, "ts": 1}])
    src = _source(
        broker,
        topic,
        startup_mode="timestamp",
        startup_datetime=datetime.now(timezone.utc),
    )
    assert get_source_dataframe(spark, src).count() == 0


def test_csv_value_format(spark, broker, wire):
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
    )

    topic = _topic()
    wire.produce(topic, 0, [(b"a", b"a,10,100", 1000), (b"b", b"b,20,200", 2000)])
    src = _source(broker, topic, value_format="csv")
    rows = {(r["k"], r["v"], r["ts"]) for r in get_source_dataframe(spark, src).collect()}
    assert rows == {("a", 10, 100), ("b", 20, 200)}


# --------------------------- batch sink ------------------------------------

def test_sink_writes_keyed_json(spark, broker, wire):
    """Production KafkaSink path: key = JSON of key columns, value = JSON of
    the full row, readable back through the wire client."""
    from feathub_spark.feature_tables.sinks.connector_sinks import KafkaSink
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    topic = _topic()
    df = spark.createDataFrame(
        [("a", 1, 100), ("b", 2, 200)], "k string, v long, ts long"
    )
    sink = KafkaSink(bootstrap_server=broker.bootstrap, topic=topic)
    insert_into_sink(df, sink, _source(broker, "unused"))
    got = {}
    for p in range(3):
        _, record_set = wire.fetch(topic, p, 0)
        for _, _, records in decode_record_batches(record_set):
            for rec in records:
                got[json.loads(rec.key)["k"]] = json.loads(rec.value)
    assert got == {
        "a": {"k": "a", "v": 1, "ts": 100},
        "b": {"k": "b", "v": 2, "ts": 200},
    }


def test_sink_roundtrip_through_source(spark, broker, wire):
    """write with the production sink, read with the production source."""
    from feathub_spark.feature_tables.sinks.connector_sinks import KafkaSink
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
        insert_into_sink,
    )

    topic = _topic()
    df = spark.createDataFrame(
        [(f"k{i}", i, i * 10) for i in range(50)], "k string, v long, ts long"
    )
    insert_into_sink(
        df, KafkaSink(bootstrap_server=broker.bootstrap, topic=topic), None
    )
    back = get_source_dataframe(spark, _source(broker, topic))
    rows = {(r["k"], r["v"], r["ts"]) for r in back.collect()}
    assert rows == {(f"k{i}", i, i * 10) for i in range(50)}


def test_keyed_write_uses_murmur2_partitioner(spark, broker, wire):
    """Keyed rows land on murmur2(key) % num_partitions — byte-compatible
    with a Java producer's DefaultPartitioner, so a mixed Java/Python
    deployment keeps per-key ordering."""
    from feathub_spark.processors.spark.kafka_python_source import (
        ensure_kafka_py_registered,
        murmur2,
    )

    topic = _topic()
    ensure_kafka_py_registered(spark)
    keys = [f"key{i}" for i in range(12)]
    out = spark.createDataFrame(
        [(k.encode(), f"v-{k}".encode()) for k in keys],
        "key binary, value binary",
    )
    (
        out.write.format("kafka_py")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("topic", topic)
        .mode("append")
        .save()
    )
    for p in range(3):
        _, record_set = wire.fetch(topic, p, 0)
        for _, _, records in decode_record_batches(record_set):
            for rec in records:
                expected = (murmur2(rec.key) & 0x7FFFFFFF) % 3
                assert expected == p, (rec.key, p)


# --------------------------- streaming -------------------------------------

def test_streaming_source_checkpointed_offsets(client, broker, wire, tmp_path):
    """Production streaming path: KafkaSource (unbounded) through the
    stream builder; records produced mid-flight arrive in later
    micro-batches; offsets come from the Spark checkpoint."""
    topic = _topic()
    _produce_json(wire, topic, 0, [{"k": "a", "v": 1, "ts": 100}])
    src = _source(broker, topic, is_bounded=False)
    df = client.processor.get_stream_dataframe(src)
    seen = []

    def collect_batch(batch_df, batch_id):
        seen.extend(
            (r["k"], r["v"], r["ts"]) for r in batch_df.collect()
        )

    q = (
        df.writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert set(seen) == {("a", 1, 100)}
        _produce_json(wire, topic, 1, [{"k": "b", "v": 2, "ts": 200}])
        _produce_json(wire, topic, 2, [{"k": "c", "v": 3, "ts": 300}])
        q.processAllAvailable()
        assert set(seen) == {("a", 1, 100), ("b", 2, 200), ("c", 3, 300)}
    finally:
        q.stop()


def test_streaming_sink_kafka(client, spark, broker, wire, tmp_path):
    """Production streaming Kafka sink (write_stream's kafka branch) on the
    kafka_py stream writer: a file stream lands in the topic as JSON."""
    import os

    from feathub_spark.feature_tables.sinks.connector_sinks import KafkaSink
    from feathub_spark.feature_tables.sources.file_system_source import (
        FileSystemSource,
    )
    from feathub_spark.streaming.stream_builder import write_stream

    topic = _topic()
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    (in_dir / "a.csv").write_text("k,v,ts\na,1,100\nb,2,200\n")
    src = FileSystemSource(
        name="fs_stream_kafka",
        path=str(in_dir),
        data_format="csv",
        schema=SCHEMA,
        keys=["k"],
        timestamp_field="ts",
        timestamp_format="epoch",
    )
    from feathub_spark.processors.spark.constants import EVENT_TIME_COL

    df = client.processor.get_stream_dataframe(src).drop(EVENT_TIME_COL)
    q = write_stream(
        df,
        KafkaSink(bootstrap_server=broker.bootstrap, topic=topic),
        src,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {}
    for p in range(3):
        _, record_set = wire.fetch(topic, p, 0)
        for _, _, records in decode_record_batches(record_set):
            for rec in records:
                payload = json.loads(rec.value)
                got[payload["k"]] = (payload["v"], payload["ts"])
    assert got == {"a": (1, 100), "b": (2, 200)}


def test_streaming_max_offsets_per_trigger(spark, broker, wire, tmp_path):
    """maxOffsetsPerTrigger bounds every batch after the first: the Python
    data source API never hands the reader its start offset before the
    first latestOffset() call (no SupportsAdmissionControl equivalent), so
    the first batch is uncapped by design — records produced after the
    query starts are what the cap governs."""
    from feathub_spark.processors.spark.kafka_python_source import (
        ensure_kafka_py_registered,
    )

    topic = _topic()
    wire.metadata([topic])  # auto-create empty
    ensure_kafka_py_registered(spark)
    batches = []

    def collect_batch(batch_df, batch_id):
        n = batch_df.count()
        if n:
            batches.append(n)

    q = (
        spark.readStream.format("kafka_py")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "4")
        .load()
        .writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # anchor at the (empty) log end
        _produce_json(
            wire, topic, 0,
            [{"k": f"k{i}", "v": i, "ts": i} for i in range(10)],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(batches) == 10
    assert max(batches) <= 4
    assert len(batches) >= 3


# --------------------------- wire-level fidelity ---------------------------

def test_list_offsets_sentinels(broker, wire):
    topic = _topic()
    wire.produce(topic, 0, [(b"a", b"1", 1000), (b"b", b"2", 2000)])
    offs = wire.list_offsets(
        {(topic, 0): EARLIEST_TIMESTAMP, (topic, 1): LATEST_TIMESTAMP}
    )
    assert offs == {(topic, 0): 0, (topic, 1): 0}
    assert wire.list_offsets({(topic, 0): LATEST_TIMESTAMP})[(topic, 0)] == 2


def test_fetch_mid_batch_returns_containing_batch(broker, wire):
    """Fetching an offset inside a batch returns the whole batch — the
    reader must skip below-start records client-side (consumer contract)."""
    topic = _topic()
    wire.produce(topic, 0, [(b"a", b"1", 1), (b"b", b"2", 2), (b"c", b"3", 3)])
    _, record_set = wire.fetch(topic, 0, 2)
    records = [r for _, _, rs in decode_record_batches(record_set) for r in rs]
    assert [r.offset for r in records] == [0, 1, 2]


def test_stream_partitions_new_partition_starts_at_earliest():
    """A topic-partition that appears in `end` with no `start` entry (a
    partition added after the query started) must begin at the broker's
    EARLIEST offset, like the JVM source — not at literal 0, which hits
    OFFSET_OUT_OF_RANGE once retention ages out the low offsets."""
    from feathub_spark.processors.spark.kafka_python_source import (
        KafkaPyStreamReader,
    )

    reader = KafkaPyStreamReader(
        {"kafka.bootstrap.servers": "stub:0", "subscribe": "t"}
    )

    class _StubClient:
        def list_offsets(self, requests):
            assert set(requests.values()) == {EARLIEST_TIMESTAMP}
            return {k: 5 for k in requests}  # retention-aged log start

        def close(self):
            pass

    reader._client = _StubClient()
    parts = reader.partitions({"t 0": 3}, {"t 0": 9, "t 1": 8})
    got = {(p.topic, p.partition): (p.start, p.end) for p in parts}
    assert got == {("t", 0): (3, 9), ("t", 1): (5, 8)}


def test_unsupported_security_options_raise_with_jar_guidance():
    """kafka_py is PLAINTEXT-only: a source/sink configured for SASL/SSL
    must raise AT CONSTRUCTION naming the unsupported options and the JVM
    connector escape hatch — not degrade to a plaintext TCP attempt whose
    connection error never mentions security (reader, stream reader, and
    writer alike).  PLAINTEXT itself stays accepted."""
    import pytest

    from feathub_spark.processors.spark.kafka_python_source import (
        KafkaPyBatchReader,
        KafkaPyStreamReader,
        _KafkaWriteCore,
    )

    class _Field:
        def __init__(self, name):
            self.name = name

    class _Schema:
        fields = [_Field("value")]

    base = {"kafka.bootstrap.servers": "stub:0", "subscribe": "t"}
    for bad in (
        {"kafka.security.protocol": "SASL_SSL"},
        {"kafka.sasl.jaas.config": "org.example required;"},
        {"kafka.ssl.truststore.location": "/tmp/ts.jks"},
    ):
        opts = {**base, **{k.lower(): v for k, v in bad.items()}}
        for ctor in (
            lambda o: KafkaPyBatchReader(o),
            lambda o: KafkaPyStreamReader(o),
            lambda o: _KafkaWriteCore({**o, "topic": "t"}, _Schema()),
        ):
            with pytest.raises(ValueError, match="PLAINTEXT only.*jar"):
                ctor(opts)

    # explicit PLAINTEXT is not an error
    KafkaPyBatchReader(
        {**base, "kafka.security.protocol": "PLAINTEXT"}
    )


def test_stream_partitions_honor_min_partitions():
    """minPartitions slices streaming micro-batch offset ranges too (JVM
    source parity): one 100-record backlog on a single topic-partition
    fans out across the cluster instead of one task."""
    from feathub_spark.processors.spark.kafka_python_source import (
        KafkaPyStreamReader,
    )

    reader = KafkaPyStreamReader(
        {
            "kafka.bootstrap.servers": "stub:0",
            "subscribe": "t",
            "minpartitions": "4",
        }
    )
    parts = reader.partitions({"t 0": 0}, {"t 0": 100})
    assert len(parts) >= 4
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 100
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_produce_corrupt_batch_rejected(broker):
    from feathub_spark.common.kafkawire import (
        KafkaWireError,
        Writer,
        encode_record_batch,
    )

    topic = _topic()
    batch = bytearray(encode_record_batch([(b"a", b"1", 1)]))
    batch[-1] ^= 0xFF  # flip a payload bit; CRC now wrong
    client = KafkaWireClient.from_bootstrap(broker.bootstrap)
    try:
        w = Writer()
        w.string(None).int16(-1).int32(1000)
        w.int32(1).string(topic).int32(1)
        w.int32(0).bytes_(bytes(batch))
        from feathub_spark.common.kafkawire import API_PRODUCE

        r = client._request(API_PRODUCE, 3, w.getvalue())
        r.int32()  # responses array len (1)
        r.string()  # topic
        r.int32()  # partitions len (1)
        r.int32()  # partition
        assert r.int16() == 2  # CORRUPT_MESSAGE
    finally:
        client.close()


def test_binary_safe_payloads(spark, broker, wire):
    """Values containing NULs, CRLFs, and high bytes survive the trip."""
    from feathub_spark.processors.spark.kafka_python_source import (
        ensure_kafka_py_registered,
    )

    topic = _topic()
    nasty = bytes(range(256)) * 3
    wire.produce(topic, 0, [(b"\x00\r\n", nasty, 1234)])
    ensure_kafka_py_registered(spark)
    raw = (
        spark.read.format("kafka_py")
        .option("kafka.bootstrap.servers", broker.bootstrap)
        .option("subscribe", topic)
        .load()
    )
    from pyspark.sql import functions as F

    [row] = raw.select("key", "value", F.unix_millis("timestamp").alias("ms")).collect()
    assert bytes(row["key"]) == b"\x00\r\n"
    assert bytes(row["value"]) == nasty
    assert row["ms"] == 1234
