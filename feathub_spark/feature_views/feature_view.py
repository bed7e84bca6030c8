"""FeatureView base: a TableDescriptor derived from another table by a list
of Features (reference feature_views/feature_view.py:35-137)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

from feathub_spark.common.exceptions import RegistryError
from feathub_spark.common.types import DType
from feathub_spark.table.schema import Schema
from feathub_spark.table.table_descriptor import TableDescriptor
from feathub_spark.feature_views.feature import Feature


class FeatureView(TableDescriptor):
    def __init__(
        self,
        name: str,
        source: Union[str, TableDescriptor],
        features: Sequence[Union[str, Feature]],
        keep_source_fields: bool = False,
        timestamp_field: Optional[str] = None,
        timestamp_format: str = "epoch",
    ) -> None:
        super().__init__(
            name,
            keys=None,
            timestamp_field=timestamp_field,
            timestamp_format=timestamp_format,
        )
        self.source = source
        self.features: List[Union[str, Feature]] = list(features)
        self.keep_source_fields = keep_source_fields

    def is_resolved(self) -> bool:
        return (
            isinstance(self.source, TableDescriptor)
            and self.source.is_resolved()
            and all(
                isinstance(f, Feature) and f.dtype is not None for f in self.features
            )
        )

    def get_resolved_features(self) -> List[Feature]:
        if not self.is_resolved():
            raise RegistryError(f"FeatureView {self.name} is not resolved; call build().")
        return self.features  # type: ignore[return-value]

    def get_resolved_source(self) -> TableDescriptor:
        if not isinstance(self.source, TableDescriptor):
            raise RegistryError(f"FeatureView {self.name} is not resolved; call build().")
        return self.source

    def get_feature(self, name: str) -> Feature:
        for f in self.get_resolved_features():
            if f.name == name:
                return f
        source = self.get_resolved_source()
        if isinstance(source, FeatureView):
            return source.get_feature(name)
        schema = source.get_output_schema()
        if name in schema.field_names:
            from feathub_spark.feature_views.transforms.expression_transform import (
                ExpressionTransform,
            )

            return Feature(
                name,
                transform=ExpressionTransform(f"`{name}`"),
                dtype=schema.get_field_type(name),
                keys=source.keys,
            )
        raise RegistryError(f"Feature {name!r} not found in {self.name}.")

    def is_bounded(self) -> bool:
        return self.get_resolved_source().is_bounded()

    # -- schema ---------------------------------------------------------
    def _source_types(self) -> Dict[str, DType]:
        schema = self.get_resolved_source().get_output_schema()
        return dict(zip(schema.field_names, schema.field_types))

    def get_output_fields(self) -> List[str]:
        """Output ordering per reference feature_view.py:56-59,137:
        keep_source_fields → source fields then new features (same-name
        feature overwrites in place); otherwise keys + timestamp_field +
        declared features."""
        source_fields = self.get_resolved_source().get_output_fields()
        feature_names = [f.name for f in self.get_resolved_features()]
        if self.keep_source_fields:
            out = list(source_fields)
        else:
            key_fields = [
                k
                for f in self.get_resolved_features()
                if f.keys is not None
                for k in f.keys
            ]
            if self.keys:
                key_fields.extend(self.keys)
            out = [f for f in source_fields if f in key_fields]
            if self.timestamp_field and self.timestamp_field not in out:
                out.append(self.timestamp_field)
        for name in feature_names:
            if name not in out:
                out.append(name)
        return out

    def get_output_schema(self) -> Schema:
        types: Dict[str, DType] = dict(self._source_types())
        for f in self.get_resolved_features():
            types[f.name] = f.dtype
        fields = self.get_output_fields()
        return Schema(fields, [types[f] for f in fields])
