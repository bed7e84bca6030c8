"""FileSystemSink (reference feature_tables/sinks/file_system_sink.py:20).

Beyond the reference: optional hash bucketing (``bucket_by``/``n_buckets``/
``sort_by``) registers the output as an external bucketed table, so
downstream joins, aggregations and windows keyed on the bucket columns read
a pre-partitioned layout and skip their shuffle — the standard way to make
a repeatedly-joined 100 TB feature table shuffle-free.  Optional directory
partitioning (``partition_by``, e.g. a date column) writes
``path/col=value/`` subdirectories so downstream range/equality filters on
the partition columns prune whole directories at the scan (the standard
layout for time-partitioned 100 TB tables); composes with bucketing."""

from __future__ import annotations

from typing import Optional, Sequence

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.feature_tables.feature_table import Sink


class FileSystemSink(Sink):
    def __init__(
        self,
        path: str,
        data_format: str,
        keep_timestamp_field: bool = True,
        data_format_props=None,
        bucket_by: Optional[Sequence[str]] = None,
        n_buckets: int = 0,
        sort_by: Optional[Sequence[str]] = None,
        table_name: Optional[str] = None,
        partition_by: Optional[Sequence[str]] = None,
    ) -> None:
        super().__init__(keep_timestamp_field)
        self.path = path
        self.data_format = data_format
        self.data_format_props = dict(data_format_props or {})
        self.bucket_by = list(bucket_by) if bucket_by else None
        self.n_buckets = n_buckets
        self.sort_by = list(sort_by) if sort_by else None
        self.table_name = table_name
        self.partition_by = list(partition_by) if partition_by else None
        if self.partition_by and self.bucket_by:
            overlap = set(self.partition_by) & set(self.bucket_by)
            if overlap:
                raise FeathubError(
                    f"partition_by and bucket_by overlap on {sorted(overlap)}; "
                    "a column can define the directory layout or the hash "
                    "layout, not both."
                )
        if self.bucket_by:
            if n_buckets <= 0:
                raise FeathubError("bucket_by requires n_buckets > 0.")
            if not table_name:
                raise FeathubError(
                    "bucket_by requires table_name (bucketed layouts are "
                    "recorded in the session catalog)."
                )
        elif sort_by:
            raise FeathubError("sort_by requires bucket_by.")
