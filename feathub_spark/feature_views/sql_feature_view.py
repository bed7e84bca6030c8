"""SqlFeatureView: run a raw SQL statement against previously-registered
views (reference feature_views/sql_feature_view.py:25-110).  On Spark every
built table is registered as a temp view and the statement runs through
``spark.sql``."""

from __future__ import annotations

from typing import List, Optional, Sequence

from feathub_spark.table.schema import Schema
from feathub_spark.table.table_descriptor import TableDescriptor


class SqlFeatureView(TableDescriptor):
    def __init__(
        self,
        name: str,
        sql_statement: str,
        schema: Schema,
        keys: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
        timestamp_format: str = "epoch",
        is_bounded: bool = True,
    ) -> None:
        super().__init__(
            name,
            keys=keys,
            timestamp_field=timestamp_field,
            timestamp_format=timestamp_format,
        )
        self.sql_statement = sql_statement
        self.schema = schema
        self._is_bounded = is_bounded

    def build(self, registry) -> "SqlFeatureView":
        return self

    def get_output_schema(self) -> Schema:
        return self.schema

    def get_output_fields(self) -> List[str]:
        return list(self.schema.field_names)

    def is_bounded(self) -> bool:
        return self._is_bounded
