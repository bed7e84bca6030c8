"""Service-gated connector integration tests.

The sandbox has no Kafka/Redis/JDBC services, so the connector rows in
SURVEY.md stop at descriptor/options/codec unit tests (recording fakes in
test_connector_options.py).  These modules make the execution paths
runnable the moment an environment provides services — mirroring the
reference's testcontainer suites
(/root/reference/python/feathub/feature_tables/tests/test_redis_source_sink.py:1,
/root/reference/python/feathub/processors/flink/table_builder/tests/
test_kafka_source_sink.py:1) without the docker dependency: each test
skips cleanly unless its env var is set.

Gates:
  KAFKA_BOOTSTRAP=host:9092   Kafka sink->bounded-source round trip.
                              Needs the spark-sql-kafka package on the
                              session classpath (SPARK_KAFKA_PACKAGE to
                              override the default coordinates).
  REDIS_HOST=host[:port]      RedisSink foreachPartition write, read back
                              through RedisOnlineStore (same key scheme +
                              field codec as the unit fakes).
  JDBC_URL=jdbc:...           JdbcSink append then JdbcSource scan
                              (JDBC_TABLE/JDBC_DRIVER/JDBC_USER/
                              JDBC_PASSWORD optional).
  PROMETHEUS_GATEWAY=host:9091  PrometheusSink single-group push.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

from feathub_spark.common import types as t
from feathub_spark.table.schema import Schema

pytestmark = pytest.mark.filterwarnings("ignore::ResourceWarning")

_SCHEMA = Schema(["k", "v", "ts"], [t.Int64, t.Float64, t.Int64])


def _service(var: str) -> str:
    val = os.environ.get(var)
    if not val:
        pytest.skip(f"{var} not set; connector integration test skipped")
    return val


def _rows(spark):
    return spark.createDataFrame(
        [(1, 1.5, 100), (2, 2.5, 200), (1, 3.5, 300)],
        "k long, v double, ts long",
    )


def test_kafka_sink_source_round_trip():
    bootstrap = _service("KAFKA_BOOTSTRAP")
    pkg = os.environ.get(
        "SPARK_KAFKA_PACKAGE",
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("feathub_kafka_it")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from feathub_spark.feature_tables.sinks.connector_sinks import KafkaSink
    from feathub_spark.feature_tables.sources.connector_sources import (
        KafkaSource,
    )
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
        insert_into_sink,
    )

    topic = f"feathub_it_{uuid.uuid4().hex[:8]}"
    desc = KafkaSource(
        name="kafka_it",
        bootstrap_server=bootstrap,
        topic=topic,
        schema=_SCHEMA,
        keys=["k"],
        timestamp_field="ts",
        timestamp_format="epoch_millis",
        startup_mode="earliest-offset",
        is_bounded=True,
    )
    insert_into_sink(
        _rows(spark),
        KafkaSink(bootstrap_server=bootstrap, topic=topic),
        desc,
    )
    time.sleep(1)  # broker commit visibility
    got = get_source_dataframe(spark, desc)
    rows = {(r["k"], r["v"], r["ts"]) for r in got.collect()}
    assert rows == {(1, 1.5, 100), (2, 2.5, 200), (1, 3.5, 300)}


def test_redis_sink_round_trip(spark):
    hostport = _service("REDIS_HOST")
    pytest.importorskip("redis")
    host, _, port = hostport.partition(":")
    port = int(port or 6379)

    from feathub_spark.feature_tables.sinks.connector_sinks import RedisSink
    from feathub_spark.feature_tables.sources.connector_sources import (
        KafkaSource,
    )
    from feathub_spark.online_stores.redis_client import RedisOnlineStore
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    namespace = f"it_{uuid.uuid4().hex[:8]}"
    # any keyed descriptor works; keys=["k"] drives the key scheme
    desc = KafkaSource(
        name="redis_it_desc",
        bootstrap_server="unused",
        topic="unused",
        schema=_SCHEMA,
        keys=["k"],
        is_bounded=True,
    )
    sink = RedisSink(host=host, port=port, namespace=namespace)
    insert_into_sink(_rows(spark), sink, desc)

    store = RedisOnlineStore(host=host, port=port, namespace=namespace)
    import pandas as pd

    got = store.get(pd.DataFrame({"k": [1, 2]}), key_fields=["k"])
    by_key = {int(r["k"]): r for _, r in got.iterrows()}
    # last write per key wins within the partition order; both rows for
    # k=1 carry the same key so the hash holds one of them — assert the
    # codec round-trips values exactly for the unambiguous key
    assert by_key[2]["v"] == 2.5 and int(by_key[2]["ts"]) == 200
    assert by_key[1]["v"] in (1.5, 3.5)


def test_jdbc_sink_source_round_trip(spark):
    url = _service("JDBC_URL")
    table = os.environ.get("JDBC_TABLE", f"feathub_it_{uuid.uuid4().hex[:8]}")

    from feathub_spark.feature_tables.sinks.connector_sinks import JdbcSink
    from feathub_spark.feature_tables.sources.connector_sources import (
        JdbcSource,
    )
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
        insert_into_sink,
    )

    kw = dict(
        driver=os.environ.get("JDBC_DRIVER"),
        username=os.environ.get("JDBC_USER"),
        password=os.environ.get("JDBC_PASSWORD"),
    )
    insert_into_sink(_rows(spark), JdbcSink(url=url, table=table, **kw), None)
    src = JdbcSource(
        name="jdbc_it",
        url=url,
        table=table,
        schema=_SCHEMA,
        keys=["k"],
        partition_column="k",
        num_partitions=2,
        **kw,
    )
    got = get_source_dataframe(spark, src)
    rows = {(r["k"], r["v"], r["ts"]) for r in got.collect()}
    assert rows == {(1, 1.5, 100), (2, 2.5, 200), (1, 3.5, 300)}


def test_prometheus_sink_push(spark):
    gateway = _service("PROMETHEUS_GATEWAY")
    pytest.importorskip("prometheus_client")

    from feathub_spark.feature_tables.sinks.connector_sinks import (
        PrometheusSink,
    )
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    job = f"feathub_it_{uuid.uuid4().hex[:8]}"
    insert_into_sink(
        _rows(spark).selectExpr("v AS metric_v"),
        PrometheusSink(host_url=gateway, job_name=job),
        None,
    )
    # verify the job's single metric group landed
    import urllib.request

    body = urllib.request.urlopen(f"http://{gateway}/metrics").read().decode()
    assert job in body and "metric_v" in body
