"""SQL-backed registry and online store (reference MySQL registry /
mysql_client parity): the DBAPI layer runs identically over sqlite3, so
these tests execute the exact production code paths minus the MySQL
driver."""

import sqlite3

import pandas as pd
import pytest

from feathub_spark import (
    DerivedFeatureView,
    Feature,
    FileSystemSource,
    Int64,
    Schema,
    String,
)
from feathub_spark.online_stores.sql_online_store import SqlOnlineStore
from feathub_spark.registries.sql_registry import SqlRegistry


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "reg.db")
    conns = []

    def factory():
        # one shared connection per factory (sqlite3 cross-connection
        # visibility needs commits, which the code under test performs)
        if not conns:
            conns.append(sqlite3.connect(path))
        return conns[0]

    yield factory
    for c in conns:
        c.close()


def _source(tmp_path, name="z_src"):
    p = tmp_path / f"{name}.csv"
    p.write_text("k,v,t\na,1,5\n")
    schema = (
        Schema.new_builder()
        .column("k", String).column("v", Int64).column("t", Int64).build()
    )
    return FileSystemSource(
        name=name, path=str(p), data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="epoch",
    )


def test_sql_registry_round_trip(tmp_path, db):
    reg = SqlRegistry(db)
    src = _source(tmp_path)
    # view name sorts BEFORE its dependency → exercises fixpoint resolution
    view = DerivedFeatureView(
        name="a_view", source="z_src",
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    reg.build_features([src, view])

    # a brand-new registry over the same database must restore and resolve
    reg2 = SqlRegistry(db)
    restored = reg2.get_features("a_view")
    assert restored.is_resolved()
    assert [f.name for f in restored.features] == ["v2"]
    assert reg2.get_features("z_src").name == "z_src"

    reg2.delete_features("a_view")
    reg3 = SqlRegistry(db)
    with pytest.raises(Exception, match="a_view"):
        reg3.get_features("a_view")


def test_sql_registry_overwrites_on_rebuild(tmp_path, db):
    reg = SqlRegistry(db)
    src = _source(tmp_path)
    reg.build_features([src])
    v1 = DerivedFeatureView(
        name="a_view", source="z_src",
        features=[Feature("v2", transform="v * 2")], keep_source_fields=True,
    )
    reg.build_features([v1])
    v2 = DerivedFeatureView(
        name="a_view", source="z_src",
        features=[Feature("v3", transform="v * 3")], keep_source_fields=True,
    )
    reg.build_features([v2])
    reg2 = SqlRegistry(db)
    assert [f.name for f in reg2.get_features("a_view").features] == ["v3"]


def test_sql_online_store_put_get(db):
    store = SqlOnlineStore(db)
    store.put(
        "features",
        pd.DataFrame({"k": ["a", "b"], "f1": [1, 2], "f2": [10, 20], "ts": [100, 100]}),
        key_fields=["k"],
        timestamp_field="ts",
    )
    # older row must NOT displace; newer must
    store.put(
        "features",
        pd.DataFrame({"k": ["a", "b"], "f1": [99, 3], "f2": [99, 30], "ts": [50, 200]}),
    )
    out = store.get("features", pd.DataFrame({"k": ["a", "b", "missing"]}))
    by_k = {r["k"]: r for _, r in out.iterrows()}
    assert by_k["a"]["f1"] == 1 and by_k["b"]["f1"] == 3
    assert "f1" not in by_k["missing"] or pd.isna(by_k["missing"]["f1"])

    proj = store.get(
        "features", pd.DataFrame({"k": ["a"]}), feature_names=["f2"]
    )
    assert proj.iloc[0]["f2"] == 10
    assert "f1" not in proj.columns


def test_sql_online_store_survives_reconnect(db, tmp_path):
    store = SqlOnlineStore(db)
    store.put(
        "t2", pd.DataFrame({"k": ["x"], "f": [7], "ts": [1]}),
        key_fields=["k"], timestamp_field="ts",
    )
    store2 = SqlOnlineStore(db)
    out = store2.get("t2", pd.DataFrame({"k": ["x"]}))
    assert out.iloc[0]["f"] == 7


def test_redis_key_scheme_and_codec():
    from feathub_spark.online_stores.redis_client import (
        build_redis_key,
        decode_field,
        encode_field,
    )

    assert build_redis_key("ns", ["u1", 5]) == "ns:u1:5"
    assert (
        build_redis_key(
            "ns", ["u1"], key_expr="__NAMESPACE__/__KEYS__/__FEATURE_NAME__",
            feature_name="f",
        )
        == "ns/u1/f"
    )
    for v in [1, 1.5, "s", {"m": 2}, [1, 2], None]:
        assert decode_field(encode_field(v)) == v
    assert decode_field(b'"bytes-ok"') == "bytes-ok"


def test_redis_online_store_requires_client():
    try:
        import redis  # noqa: F401

        pytest.skip("redis installed")
    except ImportError:
        pass
    from feathub_spark.online_stores.redis_client import RedisOnlineStore

    with pytest.raises(ImportError, match="redis"):
        RedisOnlineStore(host="localhost")


def test_mysql_variants_require_driver():
    try:
        import mysql.connector  # noqa: F401

        pytest.skip("mysql-connector installed")
    except ImportError:
        pass
    from feathub_spark.online_stores.sql_online_store import MySQLOnlineStore
    from feathub_spark.registries.sql_registry import MySQLRegistry

    with pytest.raises(Exception, match="mysql-connector"):
        MySQLRegistry(host="h", database="d", username="u", password="p")
    with pytest.raises(ImportError, match="mysql-connector"):
        MySQLOnlineStore(host="h", database="d", username="u", password="p")
