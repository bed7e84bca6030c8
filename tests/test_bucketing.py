"""Bucketed FileSystemSink: the catalog-recorded hash layout must let
keyed aggregations and windows skip their shuffle (no Exchange on the
bucket columns)."""

import os

from pyspark.sql import functions as F

from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
from feathub_spark.processors.spark.source_sink_utils import insert_into_sink


def test_bucketed_write_skips_downstream_exchange(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 64).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * 3 % 997).cast("double").alias("value"),
    )
    path = os.path.join(str(tmp_path), "bkt_events")
    sink = FileSystemSink(
        path,
        "parquet",
        bucket_by=["user_id"],
        n_buckets=8,
        sort_by=["event_id"],
        table_name="bkt_events_t",
    )
    insert_into_sink(df, sink)
    try:
        back = spark.table("bkt_events_t")
        agg = back.groupBy("user_id").agg(F.sum("value").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 64

        # window partitioned on the bucket key: also shuffle-free
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("event_id")
        win = back.withColumn("rn", F.row_number().over(w))
        wplan = win._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in wplan, wplan
        assert win.count() == 10_000

        # unbucketed write of the same data does shuffle (sanity contrast)
        plain_path = os.path.join(str(tmp_path), "plain_events")
        df.write.format("parquet").mode("overwrite").save(plain_path)
        plain = spark.read.parquet(plain_path)
        pplan = (
            plain.groupBy("user_id")
            .agg(F.sum("value").alias("s"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in pplan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_events_t")


def test_bucket_by_validation(tmp_path):
    import pytest

    from feathub_spark.common.exceptions import FeathubError

    with pytest.raises(FeathubError):
        FileSystemSink(str(tmp_path), "parquet", bucket_by=["k"], n_buckets=0,
                       table_name="x")
    with pytest.raises(FeathubError):
        FileSystemSink(str(tmp_path), "parquet", bucket_by=["k"], n_buckets=4)
    with pytest.raises(FeathubError):
        FileSystemSink(str(tmp_path), "parquet", sort_by=["k"])
