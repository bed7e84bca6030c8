"""Connector sinks beyond the filesystem.

- KafkaSink (reference feature_tables/sinks/kafka_sink.py:20): rows
  serialized to JSON value (+ JSON key from the table keys) and produced via
  Spark's kafka writer.
- JdbcSink / MySQLSink (mysql_sink.py:20): JDBC append; ``upsert_keys``
  selects foreachBatch-based MERGE semantics where the backend supports it.
- HiveSink (hive_sink.py:23): saveAsTable insert.
- RedisSink (redis_sink.py:25): per-key upsert via foreachPartition with the
  (optional) redis client; maps become hashes.
- PrometheusSink (prometheus_sink.py:21): pushgateway POST per batch,
  gated behind an import-try.
"""

from __future__ import annotations

from typing import Optional, Sequence

from feathub_spark.feature_tables.feature_table import Sink


class KafkaSink(Sink):
    def __init__(
        self,
        bootstrap_server: str,
        topic: str,
        key_format: str = "json",
        value_format: str = "json",
        keep_timestamp_field: bool = True,
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.bootstrap_server = bootstrap_server
        self.topic = topic
        self.key_format = key_format
        self.value_format = value_format


class JdbcSink(Sink):
    def __init__(
        self,
        url: str,
        table: str,
        driver: Optional[str] = None,
        username: Optional[str] = None,
        password: Optional[str] = None,
        upsert_keys: Optional[Sequence[str]] = None,
        keep_timestamp_field: bool = True,
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.url = url
        self.table = table
        self.driver = driver
        self.username = username
        self.password = password
        self.upsert_keys = list(upsert_keys) if upsert_keys else None


class MySQLSink(JdbcSink):
    def __init__(
        self,
        database: str,
        table: str,
        host: str,
        port: int = 3306,
        username: Optional[str] = None,
        password: Optional[str] = None,
        upsert_keys: Optional[Sequence[str]] = None,
        keep_timestamp_field: bool = True,
    ) -> None:
        super().__init__(
            url=f"jdbc:mysql://{host}:{port}/{database}",
            table=table,
            driver="com.mysql.cj.jdbc.Driver",
            username=username,
            password=password,
            upsert_keys=upsert_keys,
            keep_timestamp_field=keep_timestamp_field,
        )


class HiveSink(Sink):
    def __init__(
        self, database: str, table: str, keep_timestamp_field: bool = True
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.database = database
        self.table = table


class RedisSink(Sink):
    def __init__(
        self,
        host: str,
        port: int = 6379,
        mode: str = "standalone",
        db_num: int = 0,
        namespace: str = "default",
        key_expr: Optional[str] = None,
        keep_timestamp_field: bool = True,
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.host = host
        self.port = port
        self.mode = mode
        self.db_num = db_num
        self.namespace = namespace
        self.key_expr = key_expr


class PrometheusSink(Sink):
    def __init__(
        self, host_url: str, job_name: str = "feathub", delete_on_shutdown: bool = True
    ) -> None:
        super().__init__(keep_timestamp_field=True)
        self.host_url = host_url
        self.job_name = job_name
        self.delete_on_shutdown = delete_on_shutdown
