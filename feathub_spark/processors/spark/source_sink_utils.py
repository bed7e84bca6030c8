"""Source loading and sink writing for the Spark planner.

Batch reads use ``spark.read`` with declared schemas so Catalyst can push
filters/column pruning into the scan; the event-time metadata column is
derived per the descriptor's timestamp_field/format
(reference spark/dataframe_builder/source_sink_utils.py:52-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from feathub_spark.common.exceptions import PlanError
from feathub_spark.common.time_utils import event_time_sql
from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
from feathub_spark.feature_tables.sinks.misc_sinks import (
    BlackHoleSink,
    MemoryStoreSink,
    PrintSink,
)
from feathub_spark.feature_tables.sources.file_system_source import FileSystemSource
from feathub_spark.processors.spark.constants import EVENT_TIME_COL
from feathub_spark.table.table_descriptor import TableDescriptor


def append_event_time(df: DataFrame, descriptor: TableDescriptor) -> DataFrame:
    if descriptor.timestamp_field is None:
        return df
    from feathub_spark.common.time_utils import NATIVE
    from pyspark.sql import types as T

    field = descriptor.timestamp_field
    if descriptor.timestamp_format == NATIVE and isinstance(
        df.schema[field].dataType, T.LongType
    ):
        # Parquet TIMESTAMP(NANOS) read as bigint via nanosAsLong.
        return df.withColumn(
            EVENT_TIME_COL, F.expr(f"timestamp_micros(`{field}` div 1000)")
        )
    return df.withColumn(
        EVENT_TIME_COL,
        F.expr(event_time_sql(field, descriptor.timestamp_format)),
    )


def get_source_dataframe(spark: SparkSession, source: TableDescriptor) -> DataFrame:
    if isinstance(source, FileSystemSource):
        reader = spark.read.format(source.data_format)
        if source.schema is not None and getattr(source, "schema_declared", True):
            reader = reader.schema(source.schema.to_spark_struct())
        for k, v in source.data_format_props.items():
            reader = reader.option(k, v)
        if source.data_format == "csv":
            reader = reader.option("header", source.data_format_props.get("header", "true"))
        df = reader.load(source.path)
        return append_event_time(df, source)
    from feathub_spark.feature_tables.sources.datagen_source import DataGenSource

    if isinstance(source, DataGenSource):
        return append_event_time(source.to_dataframe(spark), source)
    raise PlanError(f"Unsupported source type {type(source).__name__}.")


def insert_into_sink(df: DataFrame, sink) -> None:
    if isinstance(sink, FileSystemSink):
        df.write.format(sink.data_format).mode("overwrite").save(sink.path)
    elif isinstance(sink, PrintSink):
        df.show(sink.num_rows, truncate=False)
    elif isinstance(sink, BlackHoleSink):
        df.write.format("noop").mode("overwrite").save()
    elif isinstance(sink, MemoryStoreSink):
        from feathub_spark.online_stores.memory_online_store import MemoryOnlineStore

        MemoryOnlineStore.get_instance().put(sink.table_name, df)
    else:
        raise PlanError(f"Unsupported sink type {type(sink).__name__}.")
