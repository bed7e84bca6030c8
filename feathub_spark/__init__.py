"""feathub_spark: a PySpark-native feature-engineering engine with the query
and data-processing capabilities of a stream-batch unified feature store.

Public API surface mirrors the reference SDK shape (Schema, sources/sinks,
feature views, transforms, client) while compiling everything to Spark
DataFrame plans optimized by Catalyst.
"""

from feathub_spark.common import types
from feathub_spark.common.types import (
    Bool,
    Bytes,
    Float32,
    Float64,
    Int32,
    Int64,
    MapType,
    String,
    Timestamp,
    Unknown,
    VectorType,
)
from feathub_spark.table.schema import Schema
from feathub_spark.table.table import Table
from feathub_spark.table.table_descriptor import TableDescriptor
from feathub_spark.feature_views.feature import Feature
from feathub_spark.feature_views.derived_feature_view import DerivedFeatureView
from feathub_spark.feature_views.sliding_feature_view import SlidingFeatureView
from feathub_spark.feature_views.sql_feature_view import SqlFeatureView
from feathub_spark.feature_views.transforms import (
    AggFunc,
    ExpressionTransform,
    JoinTransform,
    OverWindowTransform,
    PythonUdfTransform,
    SlidingWindowTransform,
)
from feathub_spark.feature_views.on_demand_feature_view import OnDemandFeatureView
from feathub_spark.feature_tables.sources.file_system_source import FileSystemSource
from feathub_spark.feature_tables.sources.datagen_source import (
    DataGenSource,
    RandomField,
    SequenceField,
)
from feathub_spark.feature_tables.sources.connector_sources import (
    HiveSource,
    JdbcSource,
    KafkaSource,
    MemoryStoreSource,
    MySQLSource,
    RedisSource,
)
from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
from feathub_spark.feature_tables.sinks.misc_sinks import (
    BlackHoleSink,
    MemoryStoreSink,
    PrintSink,
)
from feathub_spark.feature_tables.sinks.connector_sinks import (
    HiveSink,
    JdbcSink,
    KafkaSink,
    MySQLSink,
    PrometheusSink,
    RedisSink,
)
from feathub_spark.online_stores.memory_online_store import MemoryOnlineStore
from feathub_spark.online_stores.sql_online_store import (
    MySQLOnlineStore,
    SqlOnlineStore,
)
from feathub_spark.feature_service.local_feature_service import LocalFeatureService
from feathub_spark.registries.registry import FileRegistry, LocalRegistry
from feathub_spark.registries.sql_registry import MySQLRegistry, SqlRegistry
from feathub_spark.processors.spark.spark_processor import (
    FeathubClient,
    SparkProcessor,
    default_spark_session,
)

__version__ = "0.1.0"

__all__ = [
    "types",
    "Bool", "Bytes", "Float32", "Float64", "Int32", "Int64",
    "MapType", "String", "Timestamp", "Unknown", "VectorType",
    "Schema", "Table", "TableDescriptor", "Feature",
    "DerivedFeatureView", "SlidingFeatureView", "SqlFeatureView",
    "AggFunc", "ExpressionTransform", "JoinTransform", "OverWindowTransform",
    "PythonUdfTransform", "SlidingWindowTransform",
    "FileSystemSource", "FileSystemSink", "BlackHoleSink", "MemoryStoreSink",
    "PrintSink", "LocalRegistry", "FeathubClient", "SparkProcessor",
    "default_spark_session",
    "OnDemandFeatureView", "DataGenSource", "RandomField", "SequenceField",
    "HiveSource", "JdbcSource", "KafkaSource", "MemoryStoreSource",
    "MySQLSource", "RedisSource",
    "HiveSink", "JdbcSink", "KafkaSink", "MySQLSink", "PrometheusSink",
    "RedisSink", "MemoryOnlineStore", "LocalFeatureService",
    "FileRegistry", "SqlRegistry", "MySQLRegistry",
    "SqlOnlineStore", "MySQLOnlineStore",
]
