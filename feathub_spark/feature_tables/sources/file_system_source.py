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

_SUPPORTED_FORMATS = {"csv", "json", "parquet", "protobuf"}


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
        # protobuf (reference format_config.py:23) is handled by the
        # pure-Python wire codec (common/protowire.py) over length-delimited
        # message files; the schema is the descriptor, with field numbers
        # from data_format_props["protobuf.field_numbers"] (default 1..N).
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
        # Parquet schemas may be inferred from the footer for resolution, but
        # the physical read must then let Spark derive its own types (e.g.
        # timestamp vs timestamp_ntz physical encodings).
        self.schema_declared = schema is not None

    def get_output_schema(self) -> Schema:
        if self.schema is None and self.data_format == "parquet":
            self.schema = _infer_parquet_schema(
                self.path, self.data_format_props.get("pathGlobFilter")
            )
        return super().get_output_schema()


def _infer_parquet_schema(path: str, glob_filter: str = None) -> Schema:
    """Read the parquet footer (pyarrow, no Spark needed) so descriptor
    resolution can derive feature dtypes before a session exists.  Honors
    Spark's pathGlobFilter option when the path is a directory of mixed
    files."""
    import glob as globmod
    import os

    import pyarrow.dataset as ds

    from feathub_spark.common import types as t

    target = path
    if glob_filter and os.path.isdir(path):
        matches = sorted(globmod.glob(os.path.join(path, glob_filter)))
        if matches:
            target = matches
    arrow_schema = ds.dataset(target, format="parquet").schema
    names, dtypes = [], []
    for field in arrow_schema:
        names.append(field.name)
        dtypes.append(_arrow_to_dtype(field.type))
    return Schema(names, dtypes)


def _arrow_to_dtype(at):
    import pyarrow as pa

    from feathub_spark.common import types as t

    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return t.Bytes
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return t.String
    if pa.types.is_boolean(at):
        return t.Bool
    if pa.types.is_int8(at) or pa.types.is_int16(at) or pa.types.is_int32(at):
        return t.Int32
    if pa.types.is_int64(at) or pa.types.is_uint32(at) or pa.types.is_uint64(at):
        return t.Int64
    if pa.types.is_float32(at):
        return t.Float32
    if pa.types.is_float64(at):
        return t.Float64
    if pa.types.is_timestamp(at):
        # TIMESTAMP(NANOS) is unreadable by Spark natively; the session sets
        # nanosAsLong, so declare bigint (append_event_time converts).
        return t.Int64 if at.unit == "ns" else t.Timestamp
    if pa.types.is_date(at):
        return t.Timestamp
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return t.VectorType(_arrow_to_dtype(at.value_type))
    if pa.types.is_map(at):
        return t.MapType(_arrow_to_dtype(at.key_type), _arrow_to_dtype(at.item_type))
    return t.Unknown
