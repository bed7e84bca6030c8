"""Mock-level connector coverage: no Kafka/JDBC/Hive/Redis services exist in
the sandbox, but the exact reader/writer formats and options the planner
assembles ARE testable — this is what catches typo-level breakage in the
connector glue (reference option mapping: kafka_utils.py:49).

Sources are driven through ``get_source_dataframe`` with a recording
SparkSession facade; sinks through ``insert_into_sink`` with
DataFrame.write monkeypatched to a recording writer.
"""

import json
from datetime import datetime

import pytest

from feathub_spark import Int64, Schema, String
from feathub_spark.common.exceptions import PlanError
from feathub_spark.feature_tables.sources.connector_sources import (
    HiveSource,
    JdbcSource,
    KafkaSource,
    MySQLSource,
    RedisSource,
)
from feathub_spark.feature_tables.sinks.connector_sinks import (
    HiveSink,
    JdbcSink,
    KafkaSink,
    MySQLSink,
    RedisSink,
)
from feathub_spark.processors.spark.source_sink_utils import (
    get_source_dataframe,
    insert_into_sink,
)

SCHEMA = Schema.new_builder().column("a", Int64).column("t", Int64).build()


class RecordingReader:
    def __init__(self, result_df, log):
        self._df = result_df
        self._log = log
        self.fmt = None
        self.opts = {}
        self.schema_ = None

    def format(self, f):
        self.fmt = f
        return self

    def schema(self, s):
        self.schema_ = s
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self, path=None):
        self._log.append(
            {"format": self.fmt, "options": dict(self.opts), "path": path}
        )
        return self._df


class RecordingSession:
    """Quacks like SparkSession for the reader-assembly code path."""

    def __init__(self, result_df, log):
        self._df = result_df
        self._log = log

    @property
    def read(self):
        return RecordingReader(self._df, self._log)

    def table(self, name):
        self._log.append({"table": name})
        return self._df


class RecordingWriter:
    def __init__(self, df, log):
        self._df = df
        self._log = log
        self.conf = {"options": {}}

    def format(self, f):
        self.conf["format"] = f
        return self

    def option(self, k, v):
        self.conf["options"][k] = v
        return self

    def mode(self, m):
        self.conf["mode"] = m
        return self

    def save(self, path=None):
        self.conf["path"] = path
        self.conf["columns"] = list(self._df.columns)
        self._log.append(self.conf)

    def saveAsTable(self, name):
        self.conf["table"] = name
        self.conf["columns"] = list(self._df.columns)
        self._log.append(self.conf)


@pytest.fixture()
def recorded_write(monkeypatch):
    from pyspark.sql import DataFrame

    targets = [DataFrame]
    try:  # pyspark 4: the concrete class overrides the base property
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

        targets.append(ClassicDataFrame)
    except ImportError:
        pass
    log = []
    for t in targets:
        monkeypatch.setattr(
            t, "write", property(lambda self: RecordingWriter(self, log))
        )
    return log


# --------------------------- sources ---------------------------------------

def test_kafka_source_bounded_reader_options(spark):
    raw = spark.createDataFrame(
        [(bytearray(json.dumps({"a": 1, "t": 5}).encode()),)], "value binary"
    )
    log = []
    src = KafkaSource(
        name="k1", bootstrap_server="broker:9092", topic="events",
        schema=SCHEMA, startup_mode="earliest-offset", is_bounded=True,
    )
    df = get_source_dataframe(RecordingSession(raw, log), src)
    assert log == [{
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "broker:9092",
            "subscribe": "events",
            "startingOffsets": "earliest",
            "endingOffsets": "latest",
        },
        "path": None,
    }]
    # the JSON value payload is parsed against the declared schema
    assert df.columns == ["a", "t"]
    assert df.collect()[0].a == 1


def test_kafka_startup_mode_mapping():
    import pytest

    from feathub_spark.common.exceptions import FeathubError, PlanError

    base = dict(
        name="k", bootstrap_server="b:9092", topic="tp", schema=SCHEMA
    )
    # group-offsets (the reference default): a streaming query's
    # checkpoint IS the committed position, so earliest is the faithful
    # first-start mapping — but a BATCH read has no checkpoint, and
    # mapping to earliest silently re-read the whole topic per run
    assert KafkaSource(**base).starting_offset_options(streaming=True) == {
        "startingOffsets": "earliest"
    }
    with pytest.raises(PlanError):
        KafkaSource(**base).starting_offset_options()
    assert KafkaSource(
        **base, startup_mode="latest-offset"
    ).starting_offset_options() == {"startingOffsets": "latest"}
    # timestamp mode must use startingTimestamp (per-partition offsets
    # JSON would read the millis as an OFFSET and fail/seek past the log)
    assert KafkaSource(
        **base, startup_mode="timestamp",
        startup_datetime=datetime.fromtimestamp(1700000000),
    ).starting_offset_options() == {"startingTimestamp": "1700000000000"}
    # invalid modes and timestamp-without-datetime fail at CONSTRUCTION
    # (reference kafka_source.py:129 parity), not as a silent earliest
    with pytest.raises(FeathubError):
        KafkaSource(**base, startup_mode="lastest-offset")
    with pytest.raises(FeathubError):
        KafkaSource(**base, startup_mode="timestamp")


def test_kafka_unbounded_batch_read_rejected(spark):
    src = KafkaSource(
        name="k2", bootstrap_server="b:9092", topic="tp", schema=SCHEMA
    )
    with pytest.raises(PlanError, match="unbounded"):
        get_source_dataframe(RecordingSession(None, []), src)


def test_jdbc_source_reader_options(spark):
    """Spark requires partitionColumn/lowerBound/upperBound/numPartitions
    as a foursome — the reader probes MIN/MAX with a 1-row subquery and
    passes real bounds (or falls back to a single-connection read when
    the table is empty)."""
    bounds = spark.createDataFrame([(3, 99)], "lo long, hi long")
    log = []
    src = JdbcSource(
        name="j1", url="jdbc:postgresql://h:5432/db", table="tbl",
        driver="org.postgresql.Driver", username="u", password="pw",
        partition_column="a", num_partitions=16,
    )
    get_source_dataframe(RecordingSession(bounds, log), src)
    # three loads: schema resolution (case-insensitive partitionColumn
    # fold, a metadata-only WHERE 1=0 query on a real JDBC source),
    # MIN/MAX bounds probe, then the partitioned read
    assert len(log) == 3
    schema_probe, probe, main = log
    assert schema_probe["options"]["dbtable"] == "tbl"
    assert "partitionColumn" not in schema_probe["options"]
    assert probe["options"]["dbtable"] == (
        '(SELECT MIN("a") AS lo, MAX("a") AS hi FROM tbl) feathub_bounds'
    )
    assert main == {
        "format": "jdbc",
        "options": {
            "url": "jdbc:postgresql://h:5432/db",
            "dbtable": "tbl",
            "driver": "org.postgresql.Driver",
            "user": "u",
            "password": "pw",
            "partitionColumn": "a",
            "lowerBound": "3",
            "upperBound": "99",
            "numPartitions": "16",
        },
        "path": None,
    }

    # empty table: no bounds -> single-connection read, no partition opts
    empty = spark.createDataFrame([], "lo long, hi long")
    log2 = []
    get_source_dataframe(RecordingSession(empty, log2), src)
    assert "partitionColumn" not in log2[-1]["options"]


def test_mysql_source_builds_jdbc_url(spark):
    empty = spark.createDataFrame([], "a long")
    log = []
    src = MySQLSource(
        name="m1", database="feat", table="tbl", host="db.internal", port=3307,
        username="u", password="p",
    )
    get_source_dataframe(RecordingSession(empty, log), src)
    opts = log[0]["options"]
    assert log[0]["format"] == "jdbc"
    assert opts["url"] == "jdbc:mysql://db.internal:3307/feat"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    assert opts["dbtable"] == "tbl"


def test_hive_source_reads_table(spark):
    empty = spark.createDataFrame([], "a long")
    log = []
    src = HiveSource(name="h1", database="db", table="tbl")
    get_source_dataframe(RecordingSession(empty, log), src)
    assert log == [{"table": "db.tbl"}]


def test_redis_source_batch_scan_import_gated():
    """Batch RedisSource reads run a client-side SCAN snapshot
    (load_redis_snapshot, live-tested in test_redis_live.py); without the
    redis package the gate raises instead of silently returning empty."""
    src = RedisSource(
        name="r1", schema=SCHEMA, keys=["a"], host="localhost"
    )
    try:  # the live-test shim may be importable in this run (addPyFile
        import redis  # noqa: F401  # puts it on the driver sys.path too)

        pytest.skip("redis module importable; gate covered in test_redis_live")
    except ImportError:
        pass
    with pytest.raises(PlanError, match="redis"):
        get_source_dataframe(RecordingSession(None, []), src)


# --------------------------- sinks -----------------------------------------

def test_kafka_sink_writer_options_and_key_value(spark, recorded_write):
    from feathub_spark.processors.spark.kafka_python_source import (
        kafka_format_for,
    )

    df = spark.createDataFrame([(1, 5)], "a long, t long")
    sink = KafkaSink(bootstrap_server="broker:9092", topic="out")
    desc = KafkaSource(
        name="d", bootstrap_server="x", topic="x", schema=SCHEMA,
        keys=["a"], is_bounded=True,
    )
    insert_into_sink(df, sink, desc)
    # "kafka" with the JVM connector jar, "kafka_py" (the pure-Python
    # fallback) without it — the option/column assembly is identical
    assert recorded_write == [{
        "format": kafka_format_for(spark),
        "options": {
            "kafka.bootstrap.servers": "broker:9092",
            "topic": "out",
        },
        "mode": "append",
        "path": None,
        "columns": ["key", "value"],
    }]


def test_jdbc_sink_writer_options(spark, recorded_write):
    df = spark.createDataFrame([(1, 5)], "a long, t long")
    sink = JdbcSink(
        url="jdbc:postgresql://h/db", table="out_tbl",
        driver="org.postgresql.Driver", username="u", password="p",
    )
    insert_into_sink(df, sink, None)
    assert recorded_write == [{
        "format": "jdbc",
        "options": {
            "url": "jdbc:postgresql://h/db",
            "dbtable": "out_tbl",
            "driver": "org.postgresql.Driver",
            "user": "u",
            "password": "p",
        },
        "mode": "append",
        "path": None,
        "columns": ["a", "t"],
    }]


def test_mysql_sink_is_jdbc_append(spark, recorded_write):
    df = spark.createDataFrame([(1,)], "a long")
    sink = MySQLSink(database="feat", table="t2", host="h", username="u", password="p")
    insert_into_sink(df, sink, None)
    assert recorded_write[0]["format"] == "jdbc"
    assert recorded_write[0]["options"]["url"] == "jdbc:mysql://h:3306/feat"
    assert recorded_write[0]["mode"] == "append"


def test_hive_sink_save_as_table(spark, recorded_write):
    df = spark.createDataFrame([(1,)], "a long")
    sink = HiveSink(database="db", table="out")
    insert_into_sink(df, sink, None)
    assert recorded_write == [{
        "options": {},
        "mode": "append",
        "table": "db.out",
        "columns": ["a"],
    }]


def test_redis_sink_requires_client(spark):
    """The redis package is absent in the sandbox: the sink must fail with a
    clear PlanError at plan time, not an executor-side ImportError."""
    df = spark.createDataFrame([(1,)], "a long")
    sink = RedisSink(host="localhost")
    desc = KafkaSource(
        name="d2", bootstrap_server="x", topic="x", schema=SCHEMA,
        keys=["a"], is_bounded=True,
    )
    try:
        import redis  # noqa: F401

        pytest.skip("redis installed; executor path not unit-testable here")
    except ImportError:
        pass
    with pytest.raises(PlanError, match="redis"):
        insert_into_sink(df, sink, desc)


def test_prometheus_partition_push_records_gauges():
    """_push_prometheus_partition (the foreachPartition body) builds one
    registry — last row wins per metric — and pushes it as the job's
    SINGLE metric group (the sink repartitions to 1 first, so reruns can
    never leave stale per-partition groups on the gateway); verified
    against a recording pushgateway fake, no driver collect anywhere."""
    from pyspark.sql import Row

    from feathub_spark.processors.spark.source_sink_utils import (
        _push_prometheus_partition,
    )

    pushes = []

    class FakeGauge:
        def __init__(self, name, doc, registry=None):
            self.value = None
            registry.gauges[name] = self

        def set(self, v):
            self.value = v

    class FakeRegistry:
        def __init__(self):
            self.gauges = {}

    class Prom:
        CollectorRegistry = FakeRegistry
        Gauge = FakeGauge

        @staticmethod
        def push_to_gateway(url, job, registry):
            pushes.append(
                (url, job, {k: g.value for k, g in registry.gauges.items()})
            )

    rows = [Row(metric_a=1.5, name="x"), Row(metric_a=2.5, name="y")]
    _push_prometheus_partition(rows, "http://gw:9091", "jobx", prom_mod=Prom)
    assert pushes == [("http://gw:9091", "jobx", {"metric_a": 2.5})]

    pushes.clear()
    _push_prometheus_partition([], "http://gw:9091", "jobx", prom_mod=Prom)
    assert pushes == []  # empty partition: no push at all
