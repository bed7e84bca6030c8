"""FileSystemSource: scan csv/json/parquet files
(reference feature_tables/sources/file_system_source.py:22-72).

``max_out_of_orderness`` carries the watermark bound used by streaming reads:
watermark = event_time - (max_out_of_orderness + 1ms), matching
source_sink_utils_common.py:95-103.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Dict, Optional, Sequence

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.table.schema import Schema
from feathub_spark.feature_tables.feature_table import FeatureTable

_SUPPORTED_FORMATS = {"csv", "json", "parquet"}


class FileSystemSource(FeatureTable):
    def __init__(
        self,
        name: str,
        path: str,
        data_format: str,
        schema: Optional[Schema] = None,
        keys: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
        timestamp_format: str = "epoch",
        max_out_of_orderness: timedelta = timedelta(0),
        data_format_props: Optional[Dict[str, str]] = None,
    ) -> None:
        if data_format not in _SUPPORTED_FORMATS:
            raise FeathubError(
                f"Unsupported data_format {data_format!r}; "
                f"expected one of {sorted(_SUPPORTED_FORMATS)}."
            )
        if data_format != "parquet" and schema is None:
            raise FeathubError(f"{data_format} sources require an explicit schema.")
        super().__init__(
            name,
            system_name="filesystem",
            schema=schema,
            keys=keys,
            timestamp_field=timestamp_field,
            timestamp_format=timestamp_format,
        )
        self.path = path
        self.data_format = data_format
        self.max_out_of_orderness = max_out_of_orderness
        self.data_format_props = dict(data_format_props or {})
