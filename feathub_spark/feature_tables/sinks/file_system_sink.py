"""FileSystemSink (reference feature_tables/sinks/file_system_sink.py:20)."""

from __future__ import annotations

from feathub_spark.feature_tables.feature_table import Sink


class FileSystemSink(Sink):
    def __init__(
        self,
        path: str,
        data_format: str,
        keep_timestamp_field: bool = True,
        data_format_props=None,
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.path = path
        self.data_format = data_format
        self.data_format_props = dict(data_format_props or {})
