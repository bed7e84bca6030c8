"""Processing-time lookup joins (reference join_utils.py:185-222,
``FOR SYSTEM_TIME AS OF proctime`` against a KV store).

Spark has no streaming lookup-join primitive, so the engine provides the two
idiomatic realizations:

- **batch**: LEFT broadcast-join against a snapshot DataFrame of the KV
  store taken at plan time (the snapshot is small by definition — it is a
  per-key latest-row table);
- **streaming**: foreachBatch enrichment — every micro-batch is joined
  against the CURRENT store contents, giving true processing-time semantics
  (each batch sees the store as of its own execution).

``MemoryLookup`` adapts the in-process MemoryOnlineStore; a Redis adapter
plugs in the same interface (import-gated, per-partition pipelined mget).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


class MemoryLookup:
    """Snapshot provider over MemoryOnlineStore."""

    def __init__(self, table_name: str, feature_names: Optional[Sequence[str]] = None):
        self.table_name = table_name
        self.feature_names = list(feature_names) if feature_names else None

    def snapshot(self, spark: SparkSession) -> DataFrame:
        from feathub_spark.online_stores.memory_online_store import MemoryOnlineStore

        store = MemoryOnlineStore.get_instance()
        pdf = store._tables[self.table_name]
        if self.feature_names:
            keys = store._keys[self.table_name]
            pdf = pdf[keys + [c for c in self.feature_names if c not in keys]]
        if len(pdf) == 0:
            # schema inference fails on a 0-row object-dtype frame; an
            # empty store must still produce the documented left-join
            # NULL-enrichment, so synthesize an all-NULL-string schema
            # from the column names (values would be NULL either way)
            from pyspark.sql.types import StringType, StructField, StructType

            return spark.createDataFrame(
                [], StructType([StructField(c, StringType()) for c in pdf.columns])
            )
        return spark.createDataFrame(pdf)


def lookup_join(
    left: DataFrame,
    lookup,
    keys: Sequence[str],
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Batch processing-time lookup join: LEFT join against a broadcast
    snapshot of the KV table (the snapshot is tiny relative to the fact
    side, so the fact side is never shuffled)."""
    spark = spark or left.sparkSession
    snap = lookup.snapshot(spark) if hasattr(lookup, "snapshot") else lookup
    return left.join(F.broadcast(snap), on=list(keys), how="left")


def streaming_lookup_enrich(
    stream_df: DataFrame,
    lookup,
    keys: Sequence[str],
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    query_name: Optional[str] = None,
):
    """Streaming lookup join via foreachBatch: each micro-batch is joined
    against the store contents AT BATCH TIME (processing-time semantics),
    then handed to ``sink_fn(batch_df, batch_id)``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        enriched = lookup_join(batch_df, lookup, keys, batch_df.sparkSession)
        sink_fn(enriched, batch_id)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
