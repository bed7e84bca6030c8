"""LIVE JDBC connector tests against embedded Apache Derby.

Unlike the env-gated suites in test_connector_integration.py, these run
unconditionally: Derby ships inside pyspark's own jars directory, so a
real database is always reachable through the exact production code paths
— ``spark.read.format("jdbc")`` (single and partitioned scans, including
the min/max bounds probe subquery), the append writer, and the full
staged-upsert path (parallel staging write -> driver-side JVM
DriverManager merge -> staging drop).  This is the closest the sandbox
gets to the reference's testcontainer JDBC suites
(/root/reference/python/feathub/processors/flink/table_builder/tests/
test_mysql_source_sink.py) with no external service.
"""

from __future__ import annotations

import uuid

import pytest

from feathub_spark.common import types as t
from feathub_spark.table.schema import Schema

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_SCHEMA = Schema(["k", "v", "ts"], [t.Int64, t.Float64, t.Int64])


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "featdb"
    return f"jdbc:derby:{db};create=true"


def _rows(spark):
    return spark.createDataFrame(
        [(1, 1.5, 100), (2, 2.5, 200), (3, 3.5, 300)],
        "k long, v double, ts long",
    )


def _read_table(spark, url, table, **src_kw):
    from feathub_spark.feature_tables.sources.connector_sources import (
        JdbcSource,
    )
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
    )

    src = JdbcSource(
        name="derby_live",
        url=url,
        table=table,
        schema=_SCHEMA,
        keys=["k"],
        driver=DERBY_DRIVER,
        **src_kw,
    )
    return get_source_dataframe(spark, src)


def test_append_and_read_back(spark, derby_url):
    from feathub_spark.feature_tables.sinks.connector_sinks import JdbcSink
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    table = f"t_{uuid.uuid4().hex[:8]}"
    insert_into_sink(
        _rows(spark),
        JdbcSink(url=derby_url, table=table, driver=DERBY_DRIVER),
        None,
    )
    got = {(r["k"], r["v"], r["ts"]) for r in _read_table(
        spark, derby_url, table).collect()}
    assert got == {(1, 1.5, 100), (2, 2.5, 200), (3, 3.5, 300)}


def test_partitioned_scan_with_bounds_probe(spark, derby_url):
    """partition_column drives the 1-row MIN/MAX bounds subquery and a
    genuine multi-partition JDBC scan."""
    from feathub_spark.feature_tables.sinks.connector_sinks import JdbcSink
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    table = f"t_{uuid.uuid4().hex[:8]}"
    wide = spark.range(1, 101).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) / 2 AS v", "id * 10 AS ts"
    )
    insert_into_sink(
        wide, JdbcSink(url=derby_url, table=table, driver=DERBY_DRIVER), None
    )
    df = _read_table(
        spark, derby_url, table, partition_column="k", num_partitions=4
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.agg({"v": "sum"}).first()[0] == pytest.approx(sum(
        i / 2 for i in range(1, 101)))


def test_partitioned_scan_empty_table_falls_back(spark, derby_url):
    """NULL bounds (empty table) must fall back to the single-connection
    read, not crash on a NULL lowerBound."""
    from feathub_spark.feature_tables.sinks.connector_sinks import JdbcSink
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )

    table = f"t_{uuid.uuid4().hex[:8]}"
    empty = spark.createDataFrame([], "k long, v double, ts long")
    # append of an empty frame still creates the table
    insert_into_sink(
        empty, JdbcSink(url=derby_url, table=table, driver=DERBY_DRIVER), None
    )
    df = _read_table(
        spark, derby_url, table, partition_column="k", num_partitions=4
    )
    assert df.count() == 0


def test_upsert_merge_end_to_end(spark, derby_url):
    """The full staged-upsert path live: initial load, then an upsert
    batch that updates one key, inserts a new one, and carries two
    versions of a third (dedupe keeps the latest by ts)."""
    from feathub_spark.feature_tables.sinks.connector_sinks import JdbcSink
    from feathub_spark.processors.spark.source_sink_utils import (
        insert_into_sink,
    )
    from feathub_spark.table.table_descriptor import TableDescriptor

    table = f"t_{uuid.uuid4().hex[:8]}"
    sink = JdbcSink(
        url=derby_url, table=table, driver=DERBY_DRIVER, upsert_keys=["k"]
    )

    class Desc:
        timestamp_field = "ts"

    insert_into_sink(
        _rows(spark),
        JdbcSink(url=derby_url, table=table, driver=DERBY_DRIVER),
        None,
    )
    batch = spark.createDataFrame(
        [(2, 20.0, 900), (4, 4.5, 400), (1, 7.0, 150), (1, 9.0, 160)],
        "k long, v double, ts long",
    )
    insert_into_sink(batch, sink, Desc())

    got = {(r["k"], r["v"], r["ts"]) for r in _read_table(
        spark, derby_url, table).collect()}
    assert got == {
        (1, 9.0, 160),   # updated; ts=160 beat ts=150 in the batch
        (2, 20.0, 900),  # updated
        (3, 3.5, 300),   # untouched
        (4, 4.5, 400),   # inserted
    }

    # staging residue: no *_feathub_stage_* table may survive the merge
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url, "", "")
    try:
        rs = conn.getMetaData().getTables(None, None, "%", None)
        names = []
        while rs.next():
            names.append(rs.getString("TABLE_NAME"))
        assert not [n for n in names if "FEATHUB_STAGE" in n.upper()]
    finally:
        conn.close()


def test_upsert_sql_derby_form():
    from feathub_spark.processors.spark.source_sink_utils import upsert_sql

    stmt = upsert_sql(
        "jdbc:derby:/tmp/db", "tgt", "stg", ["k", "v", "ts"], ["k"]
    )
    assert stmt == (
        'MERGE INTO tgt t USING stg s ON t."k" = s."k" '
        'WHEN MATCHED THEN UPDATE SET "v" = s."v", "ts" = s."ts" '
        'WHEN NOT MATCHED THEN INSERT ("k", "v", "ts") '
        'VALUES (s."k", s."v", s."ts")'
    )


def test_upsert_sql_keys_only_derby():
    """All columns are keys: no UPDATE clause (nothing to set), insert
    only — Derby rejects an empty SET list."""
    from feathub_spark.processors.spark.source_sink_utils import upsert_sql

    stmt = upsert_sql("jdbc:derby:mem:x", "tgt", "stg", ["k"], ["k"])
    assert "WHEN MATCHED" not in stmt
    assert 'WHEN NOT MATCHED THEN INSERT ("k") VALUES (s."k")' in stmt
