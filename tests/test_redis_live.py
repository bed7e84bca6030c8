"""LIVE Redis integration tests — the no-docker closure for the Redis
connector family, same pattern as the embedded-Derby JDBC tests
(test_jdbc_derby_live.py): an in-process RESP2 server (tools/miniredis.py)
listens on a real TCP socket, and a redis-py-API-compatible wire client
(tests/_shims/redis.py) is injected as ``redis`` driver-side (monkeypatch)
and shipped to Spark executors (addPyFile), so the PRODUCTION code paths
run unmodified:

- RedisSink's foreachPartition executor write (source_sink_utils._write_redis)
  with its MULTI/EXEC pipeline, key scheme, and JSON hash codec
- RedisSource's batch SCAN snapshot (load_redis_snapshot) through the planner
- RedisOnlineStore put/get round trips (online_stores/redis_client.py)

What this does NOT prove: compatibility quirks of a specific real Redis
build (both endpoints implement the public RESP2 spec).  Reference
parity target: feature_tables/tests/test_redis_source_sink.py (the
reference's 1,418-LoC live Redis suite, which needs testcontainers).
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import sys

import pandas as pd
import pytest

from feathub_spark.common import types as t
from feathub_spark.feature_tables.sinks.connector_sinks import RedisSink
from feathub_spark.feature_tables.sources.connector_sources import RedisSource
from feathub_spark.processors.spark.source_sink_utils import (
    get_source_dataframe,
    insert_into_sink,
)
from feathub_spark.table.schema import Schema

_SHIM_PATH = os.path.join(os.path.dirname(__file__), "_shims", "redis.py")


@pytest.fixture(scope="module")
def miniredis():
    from tools.miniredis import MiniRedisServer

    srv = MiniRedisServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def redis_shim(monkeypatch):
    spec = importlib.util.spec_from_file_location("redis", _SHIM_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setitem(sys.modules, "redis", mod)
    yield mod


SCHEMA = (
    Schema.new_builder()
    .column("user", t.Int64)
    .column("name", t.String)
    .column("score", t.Float64)
    .column("tags", t.VectorType(t.String))
    .column("attrs", t.MapType(t.String, t.Int64))
    .column("ts", t.Timestamp)
    .build()
)


def _rows():
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    return [
        (1, "alice", 0.5, ["a", "b"], {"k": 1}, base),
        (2, "bob\r\nwith crlf", -1.25, [], {}, base.replace(microsecond=123456)),
        (3, None, None, None, None, base),
        # duplicate key: the LAST write wins per hash upsert
        (1, "alice-v2", 9.0, ["c"], {"k": 2}, base),
    ]


def test_sink_executor_write_then_store_get(spark, miniredis, redis_shim):
    """RedisSink writes through foreachPartition on REAL executor workers
    (the shim ships via addPyFile), RedisOnlineStore reads the hashes back
    over its own connection: types round-trip, last write wins per key."""
    spark.sparkContext.addPyFile(_SHIM_PATH)
    # coalesce(1) serializes the two writes for key 1 into one partition,
    # making last-write-wins deterministic for the assertion
    df = spark.createDataFrame(_rows(), SCHEMA.to_spark_struct()).coalesce(1)
    desc = RedisSource(
        name="snk", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port, namespace="it1",
    )
    sink = RedisSink(host=miniredis.host, port=miniredis.port, namespace="it1")
    insert_into_sink(df, sink, desc)

    from feathub_spark.online_stores.redis_client import RedisOnlineStore

    store = RedisOnlineStore(
        host=miniredis.host, port=miniredis.port, namespace="it1"
    )
    out = store.get(pd.DataFrame({"user": [1, 2, 3]}), ["user"])
    got = {r["user"]: r for r in out.to_dict("records")}
    assert got[1]["name"] == "alice-v2" and got[1]["score"] == 9.0
    assert got[1]["tags"] == ["c"] and got[1]["attrs"] == {"k": 2}
    assert got[2]["name"] == "bob\r\nwith crlf"  # binary-safe bulk strings
    assert got[2]["score"] == -1.25
    assert got[3]["name"] is None and got[3]["attrs"] is None
    # ints stayed ints through the JSON codec (not stringified)
    assert isinstance(got[1]["attrs"]["k"], int)


def test_source_snapshot_through_planner(spark, miniredis, redis_shim):
    """get_source_dataframe on a RedisSource SCANs the namespace and
    rebuilds the declared schema, timestamps included."""
    spark.sparkContext.addPyFile(_SHIM_PATH)
    df = spark.createDataFrame(_rows(), SCHEMA.to_spark_struct()).coalesce(1)
    src = RedisSource(
        name="r_snap", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port, namespace="it2",
    )
    insert_into_sink(
        df,
        RedisSink(host=miniredis.host, port=miniredis.port, namespace="it2"),
        src,
    )
    back = get_source_dataframe(spark, src)
    assert back.schema == SCHEMA.to_spark_struct()
    recs = {r["user"]: r.asDict() for r in back.collect()}
    assert set(recs) == {1, 2, 3}
    assert recs[1]["name"] == "alice-v2"
    assert recs[2]["ts"] == datetime.datetime(2024, 3, 1, 12, 0, 0, 123456)
    assert recs[2]["tags"] == []
    assert recs[3]["score"] is None


def test_key_expr_scheme_shared_by_sink_and_reader(spark, miniredis, redis_shim):
    """A custom key_expr template must produce the same keys on the sink
    and the reader, or every lookup silently misses."""
    spark.sparkContext.addPyFile(_SHIM_PATH)
    expr = "__NAMESPACE__#__KEYS__"
    df = spark.createDataFrame(_rows()[:2], SCHEMA.to_spark_struct())
    desc = RedisSource(
        name="r_expr", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port,
        namespace="it3", key_expr=expr,
    )
    insert_into_sink(
        df,
        RedisSink(
            host=miniredis.host, port=miniredis.port,
            namespace="it3", key_expr=expr,
        ),
        desc,
    )
    client = redis_shim.Redis(host=miniredis.host, port=miniredis.port)
    assert sorted(client.keys("it3#*")) == [b"it3#1", b"it3#2"]

    from feathub_spark.online_stores.redis_client import RedisOnlineStore

    store = RedisOnlineStore(
        host=miniredis.host, port=miniredis.port,
        namespace="it3", key_expr=expr,
    )
    out = store.get(pd.DataFrame({"user": [2]}), ["user"])
    assert out.loc[0, "name"] == "bob\r\nwith crlf"
    # snapshot read honors the same template
    snap = get_source_dataframe(spark, desc)
    assert snap.count() == 2


def test_db_isolation_and_empty_namespace(spark, miniredis, redis_shim):
    """SELECT routes writes to a per-db keyspace; an empty namespace
    yields an empty DataFrame with the full declared schema."""
    from feathub_spark.online_stores.redis_client import RedisOnlineStore

    store1 = RedisOnlineStore(
        host=miniredis.host, port=miniredis.port, db_num=1, namespace="iso"
    )
    store1.put(
        pd.DataFrame({"user": [7], "name": ["x"]}), ["user"]
    )
    store0 = RedisOnlineStore(
        host=miniredis.host, port=miniredis.port, db_num=0, namespace="iso"
    )
    got0 = store0.get(pd.DataFrame({"user": [7]}), ["user"])
    assert "name" not in got0.columns  # db 0 never saw the hash
    got1 = store1.get(pd.DataFrame({"user": [7]}), ["user"])
    assert got1.loc[0, "name"] == "x"

    empty_src = RedisSource(
        name="r_empty", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port, namespace="nothing_here",
    )
    edf = get_source_dataframe(spark, empty_src)
    assert edf.count() == 0
    assert edf.schema == SCHEMA.to_spark_struct()


def test_lookup_join_against_live_redis(spark, miniredis, redis_shim):
    """Processing-time lookup join with a RedisSource right side: the
    RedisLookup adapter snapshots the namespace and lookup_join broadcasts
    it against the fact side (reference join_utils.py:185-222 semantics)."""
    spark.sparkContext.addPyFile(_SHIM_PATH)
    from feathub_spark.processors.spark.lookup_join import RedisLookup, lookup_join

    dim = RedisSource(
        name="r_dim", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port, namespace="it_lkp",
    )
    df = spark.createDataFrame(_rows(), SCHEMA.to_spark_struct()).coalesce(1)
    insert_into_sink(
        df,
        RedisSink(host=miniredis.host, port=miniredis.port, namespace="it_lkp"),
        dim,
    )
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (99, 0.0)], "user long, amount double"
    )
    out = lookup_join(facts, RedisLookup(dim), ["user"])
    got = {r["user"]: r.asDict() for r in out.collect()}
    assert got[1]["name"] == "alice-v2" and got[1]["amount"] == 10.0
    assert got[2]["score"] == -1.25
    assert got[99]["name"] is None  # LEFT join: unmatched fact row survives


def test_streaming_enrich_sees_live_store_updates(
    spark, miniredis, redis_shim, tmp_path
):
    """foreachBatch enrichment takes its snapshot PER MICRO-BATCH, so a
    Redis update between batches is visible to the next batch — the
    processing-time semantics the reference's lookup join defines
    (join_utils.py:185-222)."""
    import os

    from feathub_spark.online_stores.redis_client import RedisOnlineStore
    from feathub_spark.processors.spark.lookup_join import (
        RedisLookup,
        streaming_lookup_enrich,
    )

    spark.sparkContext.addPyFile(_SHIM_PATH)
    dim = RedisSource(
        name="r_stream_dim", schema=SCHEMA, keys=["user"],
        host=miniredis.host, port=miniredis.port, namespace="it_str",
    )
    store = RedisOnlineStore(
        host=miniredis.host, port=miniredis.port, namespace="it_str"
    )
    store.put(pd.DataFrame({"user": [1], "name": ["v1"]}), ["user"])

    d = os.path.join(str(tmp_path), "in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("user,amount\n1,10\n")
    stream = (
        spark.readStream.format("csv")
        .schema("user long, amount double")
        .option("header", "true")
        .load(d)
    )
    collected = []

    def sink_fn(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = streaming_lookup_enrich(stream, RedisLookup(dim), ["user"], sink_fn)
    q.processAllAvailable()
    # mutate the store BETWEEN micro-batches, then feed a second file
    store.put(pd.DataFrame({"user": [1], "name": ["v2"]}), ["user"])
    with open(os.path.join(d, "b.csv"), "w") as f:
        f.write("user,amount\n1,20\n")
    q.processAllAvailable()
    q.stop()

    by_amount = {r["amount"]: r["name"] for r in collected}
    assert by_amount == {10.0: "v1", 20.0: "v2"}


def test_wire_protocol_edges(miniredis, redis_shim):
    """Protocol-level checks straight through the shim client: MULTI/EXEC
    pipelines, 1 MiB bulk strings, WRONGTYPE errors, SCAN MATCH."""
    r = redis_shim.Redis(host=miniredis.host, port=miniredis.port, db=3)
    assert r.ping()
    big = "x" * (1 << 20) + "\r\n$5\r\n"  # payload that would desync a naive parser
    assert r.set("big", big)
    assert r.get("big").decode() == big

    pipe = r.pipeline()
    pipe.hset("h:1", mapping={"a": "1"})
    pipe.hset("h:2", mapping={"b": "2"})
    assert pipe.execute() == [1, 1]
    assert r.hgetall("h:1") == {b"a": b"1"}

    with pytest.raises(redis_shim.ResponseError, match="WRONGTYPE"):
        r.hgetall("big")
    assert sorted(r.scan_iter(match="h:*")) == [b"h:1", b"h:2"]
    assert r.delete("h:1", "h:2", "big") == 3
