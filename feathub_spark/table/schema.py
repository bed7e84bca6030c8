"""Schema: ordered (field name, dtype) pairs.

Semantics follow the reference Schema
(/root/reference/python/feathub/table/schema.py:23-110): fixed declared
schemas, a builder API, and the rule that user column names must not start or
end with ``__`` (reserved for engine metadata columns).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

from pyspark.sql import types as T

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.types import DType, dtype_from_json, to_spark_type


class Schema:
    def __init__(self, field_names: Sequence[str], field_types: Sequence[DType]) -> None:
        if len(field_names) != len(field_types):
            raise FeathubError("field_names and field_types must have equal length.")
        for name in field_names:
            if name.startswith("__") or name.endswith("__"):
                raise FeathubError(
                    f"Field name {name!r} is invalid: names wrapped in '__' are "
                    "reserved for engine metadata columns."
                )
        if len(set(field_names)) != len(field_names):
            raise FeathubError(f"Duplicate field names in {list(field_names)}.")
        self.field_names: List[str] = list(field_names)
        self.field_types: List[DType] = list(field_types)

    class Builder:
        def __init__(self) -> None:
            self._names: List[str] = []
            self._types: List[DType] = []

        def column(self, name: str, dtype: DType) -> "Schema.Builder":
            self._names.append(name)
            self._types.append(dtype)
            return self

        def build(self) -> "Schema":
            return Schema(self._names, self._types)

    @staticmethod
    def new_builder() -> "Schema.Builder":
        return Schema.Builder()

    def get_field_type(self, name: str) -> DType:
        try:
            return self.field_types[self.field_names.index(name)]
        except ValueError:
            raise FeathubError(f"Field {name!r} not in schema {self.field_names}.")

    def to_spark_struct(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(n, to_spark_type(t), True)
                for n, t in zip(self.field_names, self.field_types)
            ]
        )

    def to_json(self) -> Dict[str, Any]:
        return {
            "field_names": self.field_names,
            "field_types": [t.to_json() for t in self.field_types],
        }

    @staticmethod
    def from_json(obj: Dict[str, Any]) -> "Schema":
        return Schema(
            obj["field_names"], [dtype_from_json(t) for t in obj["field_types"]]
        )

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Schema)
            and self.field_names == other.field_names
            and self.field_types == other.field_types
        )

    def __repr__(self) -> str:
        cols = ", ".join(
            f"{n}: {t!r}" for n, t in zip(self.field_names, self.field_types)
        )
        return f"Schema({cols})"
