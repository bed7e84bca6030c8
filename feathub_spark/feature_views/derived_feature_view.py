"""DerivedFeatureView: per-row transforms, point-in-time joins and
over-window aggregations over a source table.

Resolution semantics re-express the reference
(feature_views/derived_feature_view.py:79-265): feature strings may be
``{feature}`` (a source feature), ``{table}.{feature}`` (point-in-time join)
or ``{table}.{map_feature}[{key}]`` (map-entry join); every feature may only
depend on source fields and features declared before it; ``filter_expr`` is
applied after all transforms.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

from feathub_spark.common.exceptions import RegistryError
from feathub_spark.common.types import DType, MapType
from feathub_spark.dsl.parser import parse_expr
from feathub_spark.table.table_descriptor import TableDescriptor
from feathub_spark.feature_views.feature import Feature
from feathub_spark.feature_views.feature_view import FeatureView
from feathub_spark.feature_views.transforms.expression_transform import (
    ExpressionTransform,
)
from feathub_spark.feature_views.transforms.join_transform import JoinTransform
from feathub_spark.feature_views.transforms.over_window_transform import (
    OverWindowTransform,
)
from feathub_spark.feature_views.transforms.python_udf_transform import (
    PythonUdfTransform,
)
from feathub_spark.feature_views.transforms.sliding_window_transform import (
    SlidingWindowTransform,
)

_JOIN_REF_RE = re.compile(
    r"^\s*(?P<table>[A-Za-z_][\w]*)\.(?P<feature>[A-Za-z_][\w]*)"
    r"(?:\[(?P<key>.+)\])?\s*$"
)


def _parse_map_key(raw: str):
    raw = raw.strip()
    if raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1]
    try:
        return int(raw)
    except ValueError:
        raise RegistryError(f"Unsupported map key literal {raw!r} in join feature.")


class DerivedFeatureView(FeatureView):
    def __init__(
        self,
        name: str,
        source: Union[str, TableDescriptor],
        features: Sequence[Union[str, Feature]],
        keep_source_fields: bool = False,
        filter_expr: Optional[str] = None,
    ) -> None:
        super().__init__(name, source, features, keep_source_fields)
        self.filter_expr = filter_expr

    def build(self, registry) -> "DerivedFeatureView":
        source = (
            registry.get_features(self.source)
            if isinstance(self.source, str)
            else self.source.build(registry)
        )
        source_schema = source.get_output_schema()
        variable_types: Dict[str, DType] = dict(
            zip(source_schema.field_names, source_schema.field_types)
        )

        resolved: List[Feature] = []
        seen_names = set(variable_types) if self.keep_source_fields else set()
        for raw in self.features:
            feature = self._resolve_feature(raw, variable_types, source, registry)
            # two entries of one map ("t.m['a']", "t.m['b']") would both
            # default to the map's name — disambiguate the later ones with
            # a key suffix (a single entry keeps the plain map name)
            if (
                feature.name in seen_names
                and isinstance(feature.transform, JoinTransform)
                and feature.transform.map_key is not None
            ):
                safe_key = re.sub(r"\W", "_", str(feature.transform.map_key))
                feature = Feature(
                    f"{feature.name}_{safe_key}",
                    transform=feature.transform,
                    dtype=feature.dtype,
                    keys=feature.keys,
                )
            seen_names.add(feature.name)
            variable_types[feature.name] = feature.dtype
            resolved.append(feature)

        view = DerivedFeatureView(
            self.name,
            source,
            resolved,
            keep_source_fields=self.keep_source_fields,
            filter_expr=self.filter_expr,
        )
        # View keys: source keys, else the common key set declared by the
        # view's features (reference test_join_transform.py asserts the view
        # inherits the join feature's keys when the source has none).
        if source.keys is not None:
            view.keys = source.keys
        else:
            feature_key_sets = {
                tuple(f.keys) for f in resolved if f.keys is not None
            }
            view.keys = (
                list(feature_key_sets.pop()) if len(feature_key_sets) == 1 else None
            )
        view.timestamp_field = source.timestamp_field
        view.timestamp_format = source.timestamp_format
        return view

    def _resolve_feature(
        self,
        raw: Union[str, Feature],
        variable_types: Dict[str, DType],
        source: TableDescriptor,
        registry,
    ) -> Feature:
        if isinstance(raw, str):
            m = _JOIN_REF_RE.match(raw)
            if m and m.group("table") != source.name:
                table_name = m.group("table")
                feature_name = m.group("feature")
                map_key = (
                    _parse_map_key(m.group("key")) if m.group("key") else None
                )
                right = registry.get_features(table_name)
                right_schema = right.get_output_schema()
                dtype = right_schema.get_field_type(feature_name)
                if map_key is not None:
                    if not isinstance(dtype, MapType):
                        raise RegistryError(
                            f"{raw!r}: {feature_name} is not map-typed."
                        )
                    dtype = dtype.value_dtype
                # default output name is the (map) feature's own name; a
                # second entry of the same map gets a key suffix in build()
                out_name = feature_name
                return Feature(
                    out_name,
                    transform=JoinTransform(table_name, feature_name, map_key),
                    dtype=dtype,
                    keys=right.keys,
                )
            # plain source feature reference; a self-qualified
            # '{source_name}.{feature}' form resolves like the bare name
            # (the reference resolves any 'table.feature' via the
            # registry, including the view's own source — previously the
            # prefix leaked into the lookup and always failed)
            name = raw.strip().strip("`")
            if m and m.group("table") == source.name and not m.group("key"):
                name = m.group("feature")
            if name not in variable_types:
                raise RegistryError(
                    f"Feature {raw!r} not found in source {source.name}."
                )
            return Feature(
                name,
                transform=ExpressionTransform(f"`{name}`"),
                dtype=variable_types[name],
                keys=source.keys,
            )

        feature = raw.copy()
        # Name-resolution validation runs for EVERY feature: with a
        # declared dtype the derivation path (which would have surfaced
        # unknown columns) is skipped, so a typo'd reference used to
        # defer to an opaque Spark AnalysisException at plan time.  The
        # reference validates every feature's variables/group_by_keys/
        # filter_expr at build (_validate).
        self._validate_feature_refs(feature, variable_types)
        if feature.dtype is None:
            feature.dtype = self._derive_dtype(feature, variable_types, registry)
        return feature

    def _validate_feature_refs(self, feature: Feature, variable_types) -> None:
        from feathub_spark.common.exceptions import ExpressionError
        from feathub_spark.dsl.ast import WINDOW_TIME_PLACEHOLDER

        tr = feature.transform
        exprs, group_keys = [], []
        if isinstance(tr, ExpressionTransform):
            exprs = [tr.expr]
        elif isinstance(tr, (OverWindowTransform, SlidingWindowTransform)):
            exprs = [tr.expr]
            if tr.filter_expr:
                exprs.append(tr.filter_expr)
            group_keys = list(tr.group_by_keys)
        else:
            return
        names = set()
        for e in exprs:
            try:
                names |= parse_expr(e).variables()
            except ExpressionError:
                # unparseable forms surface their own error downstream
                return
        names |= set(group_keys)
        unknown = sorted(
            n for n in names
            if n not in variable_types and n != WINDOW_TIME_PLACEHOLDER
        )
        if unknown:
            raise RegistryError(
                f"Feature {feature.name!r} references unknown column(s) "
                f"{unknown}; available: {sorted(variable_types)}."
            )

    def _derive_dtype(self, feature: Feature, variable_types, registry) -> DType:
        tr = feature.transform
        if isinstance(tr, ExpressionTransform):
            return parse_expr(tr.expr).eval_dtype(variable_types)
        if isinstance(tr, (OverWindowTransform, SlidingWindowTransform)):
            from feathub_spark.feature_views.transforms.agg_func import AggFunc

            if tr.agg_func in (AggFunc.ROW_NUMBER, AggFunc.COUNT):
                input_dtype = None
            else:
                input_dtype = parse_expr(tr.expr).eval_dtype(variable_types)
            return tr.agg_func.result_dtype(input_dtype)
        if isinstance(tr, JoinTransform):
            right = registry.get_features(tr.table_name)
            dtype = right.get_output_schema().get_field_type(tr.feature_name)
            if tr.map_key is not None:
                if not isinstance(dtype, MapType):
                    raise RegistryError(
                        f"{tr.feature_name} is not map-typed, cannot take entry."
                    )
                dtype = dtype.value_dtype
            return dtype
        if isinstance(tr, PythonUdfTransform):
            raise RegistryError(
                f"Feature {feature.name!r} with a Python UDF must declare dtype."
            )
        raise RegistryError(f"Cannot derive dtype for transform {tr!r}.")
