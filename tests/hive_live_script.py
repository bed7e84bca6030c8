"""Subprocess body for the live Hive integration test (test_hive_live.py).

Runs in its OWN JVM because Spark fixes spark.sql.catalogImplementation at
first-session creation per process — the shared pytest session is built
without Hive support.  Uses the Hive jars the pyspark wheel ships with an
embedded Derby metastore under a temp dir (the same no-docker closure as
tests/test_jdbc_derby_live.py), then drives the PRODUCTION planner
functions: insert_into_sink on a HiveSink (append saveAsTable, twice) and
get_source_dataframe on a HiveSource (event-time derivation included).
Prints machine-checkable markers the pytest wrapper asserts on.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    work = tempfile.mkdtemp(prefix="feathub_hive_it_")
    spark = (
        SparkSession.builder.appName("hive_live_it")
        .master("local[2]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", os.path.join(work, "warehouse"))
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={os.path.join(work, 'metastore_db')};create=true",
        )
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    from feathub_spark.common import types as t
    from feathub_spark.feature_tables.sinks.connector_sinks import HiveSink
    from feathub_spark.feature_tables.sources.connector_sources import HiveSource
    from feathub_spark.processors.spark.constants import EVENT_TIME_COL
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
        insert_into_sink,
    )
    from feathub_spark.table.schema import Schema

    schema = (
        Schema.new_builder()
        .column("user", t.Int64)
        .column("amount", t.Float64)
        .column("ts", t.Int64)
        .build()
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS feathub_it")

    df = spark.createDataFrame(
        [(1, 10.0, 1700000000), (2, 20.5, 1700000060)],
        schema.to_spark_struct(),
    )
    sink = HiveSink(database="feathub_it", table="orders_it")
    desc = HiveSource(
        name="h_src", database="feathub_it", table="orders_it",
        schema=schema, keys=["user"], timestamp_field="ts",
        timestamp_format="epoch",
    )
    insert_into_sink(df, sink, desc)
    # second write must APPEND (the metastore table already exists)
    insert_into_sink(
        spark.createDataFrame([(3, 30.0, 1700000120)], schema.to_spark_struct()),
        sink,
        desc,
    )

    back = get_source_dataframe(spark, desc)
    rows = {r["user"]: r for r in back.collect()}
    assert len(rows) == 3, rows
    assert rows[2]["amount"] == 20.5
    # epoch timestamp_field derived the hidden event-time attribute
    assert EVENT_TIME_COL in back.columns
    assert str(rows[3][EVENT_TIME_COL]) == "2023-11-14 22:15:20"

    # metastore is the real arbiter: a fresh catalog lookup sees the table
    assert spark.catalog.tableExists("feathub_it.orders_it")
    cnt = spark.sql("SELECT count(*) AS c FROM feathub_it.orders_it").first()["c"]
    assert cnt == 3

    # keep_timestamp_field=False drops ts before the write
    sink2 = HiveSink(
        database="feathub_it", table="orders_nots", keep_timestamp_field=False
    )
    from feathub_spark.table.table import Table

    Table(df, desc, processor=None).execute_insert(sink2)
    cols = spark.table("feathub_it.orders_nots").columns
    assert "ts" not in cols and "user" in cols, cols

    print("HIVE_LIVE_OK rows=3")
    spark.stop()


if __name__ == "__main__":
    main()
