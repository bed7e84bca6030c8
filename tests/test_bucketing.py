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


def test_bucketed_minhash_index_join_reads_without_index_shuffle(spark, tmp_path):
    """The minhash_index docstring's claim, substantiated: writing the
    index bucketed by (band, bucket) lets the per-ingest candidate join
    read the historical corpus with NO index-side exchange — only the
    (small) new shard shuffles to the bucket layout."""
    from feathub_spark.datapipe.dedup import match_minhash_index, minhash_index

    docs = spark.createDataFrame(
        [(i, f"historical document {i} with a shared common body of words "
             f"and a tail {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "historical document 3 with a shared common body of words "
               "and a tail 3")],
        "doc_id long, text string",
    )
    kw = dict(num_hashes=64, bands=16, shingle_k=2, seed=42)
    idx = minhash_index(docs, "text", "doc_id", **kw)
    # The no-index-shuffle claim is about the LARGE-shard regime where the
    # candidate join is a sort-merge join; with broadcast enabled a tiny
    # shard broadcasts and neither side shuffles (also fine, also
    # index-shuffle-free).  Force SMJ to exercise the claimed plan shape.
    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        spark.sql("DROP TABLE IF EXISTS mh_idx_bkt")
        warehouse_leftover = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            "mh_idx_bkt",
        )
        if os.path.isdir(warehouse_leftover):
            import shutil

            shutil.rmtree(warehouse_leftover)
        idx.write.bucketBy(8, "band", "bucket").sortBy("band", "bucket").mode(
            "overwrite"
        ).saveAsTable("mh_idx_bkt")
        bucketed = spark.table("mh_idx_bkt")
        out = match_minhash_index(new, bucketed, "text", "doc_id",
                                  threshold=0.9, **kw)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan

        # contrast: the same index as plain parquet shuffles MORE (the
        # index side needs its own exchange before the candidate join)
        plain_path = str(tmp_path / "mh_idx_plain")
        idx.write.parquet(plain_path)
        plain_out = match_minhash_index(
            new, spark.read.parquet(plain_path), "text", "doc_id",
            threshold=0.9, **kw
        )
        plain_plan = plain_out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") < plain_plan.count("Exchange"), (
            plan.count("Exchange"), plain_plan.count("Exchange")
        )
        # and the bucketed read returns the same (correct) matches
        rows = {(r["new_id"], r["match_id"], r["jaccard"]) for r in out.collect()}
        assert rows == {(100, 3, 1.0)}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS mh_idx_bkt")
