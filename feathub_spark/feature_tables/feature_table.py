"""FeatureTable: a TableDescriptor backed by a physical system
(reference feature_tables/feature_table.py:25,118)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.table.schema import Schema
from feathub_spark.table.table_descriptor import TableDescriptor


class FeatureTable(TableDescriptor):
    def __init__(
        self,
        name: str,
        system_name: str,
        schema: Optional[Schema] = None,
        keys: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
        timestamp_format: str = "epoch",
    ) -> None:
        super().__init__(
            name,
            keys=keys,
            timestamp_field=timestamp_field,
            timestamp_format=timestamp_format,
        )
        self.system_name = system_name
        self.schema = schema

    def get_output_schema(self) -> Schema:
        if self.schema is None:
            raise FeathubError(
                f"{type(self).__name__} {self.name!r} has no declared schema."
            )
        return self.schema

    def get_output_fields(self) -> List[str]:
        return list(self.get_output_schema().field_names)


class Sink:
    """Marker base for sinks; carries `keep_timestamp_field` semantics
    (reference flink/table_builder/source_sink_utils.py:108-111)."""

    def __init__(self, keep_timestamp_field: bool = True) -> None:
        self.keep_timestamp_field = keep_timestamp_field
