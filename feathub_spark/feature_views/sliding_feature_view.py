"""SlidingFeatureView: sliding-window aggregations emitting at step
boundaries, with optional pre- and post-sliding per-row expressions.

Semantics re-express the reference
(feature_views/sliding_feature_view.py:77-523):

- all SlidingWindowTransform features in one view share step_size and
  group_by_keys (different window sizes allowed);
- output = group_by_keys + window_time timestamp field + features;
- ``enable_empty_window_output`` (default True): when a window becomes empty,
  emit 0 for SUM/COUNT and NULL for other aggs at each step until expiry;
- ``skip_same_window_output`` (default True): only emit a step row when the
  aggregated values changed versus the previous step;
- enable=False with skip=True is rejected;
- post-sliding per-row features may only depend on the window_time field,
  sliding features, and group-by keys;
- window_time dtype: Int64 for epoch/epoch_millis formats, String otherwise.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

from feathub_spark.common.exceptions import FeathubError, RegistryError
from feathub_spark.common import types as t
from feathub_spark.dsl.ast import WINDOW_TIME_PLACEHOLDER
from feathub_spark.dsl.parser import parse_expr
from feathub_spark.table.table_descriptor import TableDescriptor
from feathub_spark.feature_views.feature import Feature
from feathub_spark.feature_views.feature_view import FeatureView
from feathub_spark.feature_views.transforms.expression_transform import (
    ExpressionTransform,
)
from feathub_spark.feature_views.transforms.sliding_window_transform import (
    SlidingWindowTransform,
)

WINDOW_TIME_EXPR = "GET_WINDOW_TIME()"


class SlidingFeatureView(FeatureView):
    def __init__(
        self,
        name: str,
        source: Union[str, TableDescriptor],
        features: Sequence[Union[str, Feature]],
        timestamp_field: str = "window_time",
        timestamp_format: str = "epoch_millis",
        filter_expr: Optional[str] = None,
        enable_empty_window_output: bool = True,
        skip_same_window_output: bool = True,
    ) -> None:
        if not enable_empty_window_output and skip_same_window_output:
            raise FeathubError(
                "skip_same_window_output=True requires "
                "enable_empty_window_output=True."
            )
        super().__init__(
            name,
            source,
            features,
            keep_source_fields=False,
            timestamp_field=timestamp_field,
            timestamp_format=timestamp_format,
        )
        self.filter_expr = filter_expr
        self.enable_empty_window_output = enable_empty_window_output
        self.skip_same_window_output = skip_same_window_output

    # -- helpers --------------------------------------------------------
    def _window_time_dtype(self) -> t.DType:
        if self.timestamp_format in ("epoch", "epoch_millis"):
            return t.Int64
        if self.timestamp_format == "timestamp":
            return t.Timestamp
        return t.String

    def sliding_features(self) -> List[Feature]:
        return [
            f
            for f in self.get_resolved_features()
            if isinstance(f.transform, SlidingWindowTransform)
        ]

    def pre_sliding_features(self) -> List[Feature]:
        """Expression features declared before the first sliding feature."""
        out = []
        for f in self.get_resolved_features():
            if isinstance(f.transform, SlidingWindowTransform):
                break
            if f.name == self.timestamp_field:
                continue
            out.append(f)
        return out

    def post_sliding_features(self) -> List[Feature]:
        out = []
        seen_sliding = False
        for f in self.get_resolved_features():
            if isinstance(f.transform, SlidingWindowTransform):
                seen_sliding = True
            elif seen_sliding and f.name != self.timestamp_field:
                out.append(f)
        return out

    @property
    def step_size_ms(self) -> int:
        return self.sliding_features()[0].transform.step_size_ms

    @property
    def group_by_keys(self) -> List[str]:
        return list(self.sliding_features()[0].transform.group_by_keys)

    # -- resolution -----------------------------------------------------
    def build(self, registry) -> "SlidingFeatureView":
        source = (
            registry.get_features(self.source)
            if isinstance(self.source, str)
            else self.source.build(registry)
        )
        source_schema = source.get_output_schema()
        variable_types: Dict[str, t.DType] = dict(
            zip(source_schema.field_names, source_schema.field_types)
        )

        resolved: List[Feature] = []
        seen_sliding = False
        for raw in self.features:
            if isinstance(raw, str):
                name = raw.strip().strip("`")
                if name not in variable_types:
                    raise RegistryError(
                        f"Feature {raw!r} not found in source {source.name}."
                    )
                feature = Feature(
                    name,
                    transform=ExpressionTransform(f"`{name}`"),
                    dtype=variable_types[name],
                )
            else:
                feature = raw.copy()
            # transform-kind check runs for EVERY feature (not only the
            # dtype-None path): an unsupported transform with a declared
            # dtype used to pass build and then silently vanish from the
            # dataframe builder's pre/post loops
            from feathub_spark.feature_views.transforms.python_udf_transform import (
                PythonUdfTransform,
            )

            if not isinstance(
                feature.transform,
                (ExpressionTransform, SlidingWindowTransform, PythonUdfTransform),
            ):
                raise RegistryError(
                    f"SlidingFeatureView does not support transform "
                    f"{feature.transform!r}."
                )
            if isinstance(feature.transform, SlidingWindowTransform):
                seen_sliding = True
            if feature.dtype is None:
                tr = feature.transform
                if isinstance(tr, ExpressionTransform):
                    vt = dict(variable_types)
                    if seen_sliding:
                        # only POST-sliding expressions may reference the
                        # window-time field — pre-features run before
                        # windowing, where no such column exists, and
                        # injecting it here deferred the failure to an
                        # opaque plan-time AnalysisException
                        vt[self.timestamp_field] = self._window_time_dtype()
                    feature.dtype = parse_expr(tr.expr).eval_dtype(vt)
                elif isinstance(tr, SlidingWindowTransform):
                    from feathub_spark.feature_views.transforms.agg_func import AggFunc

                    if tr.agg_func in (AggFunc.ROW_NUMBER, AggFunc.COUNT):
                        input_dtype = None
                    else:
                        input_dtype = parse_expr(tr.expr).eval_dtype(variable_types)
                    feature.dtype = tr.agg_func.result_dtype(input_dtype)
                else:
                    # PythonUdfTransform: no dtype derivation possible
                    raise RegistryError(
                        f"Feature {feature.name!r} with {type(tr).__name__} "
                        "needs an explicit dtype."
                    )
            variable_types[feature.name] = feature.dtype
            resolved.append(feature)

        # Append the window_time feature (reference sliding_feature_view.py:199-213).
        if not any(f.name == self.timestamp_field for f in resolved):
            resolved.append(
                Feature(
                    self.timestamp_field,
                    transform=ExpressionTransform(WINDOW_TIME_EXPR),
                    dtype=self._window_time_dtype(),
                )
            )

        view = SlidingFeatureView(
            self.name,
            source,
            resolved,
            timestamp_field=self.timestamp_field,
            timestamp_format=self.timestamp_format,
            filter_expr=self.filter_expr,
            enable_empty_window_output=self.enable_empty_window_output,
            skip_same_window_output=self.skip_same_window_output,
        )
        view._validate(source)
        view.keys = view.group_by_keys or None
        return view

    def _validate(self, source: TableDescriptor) -> None:
        sliding = self.sliding_features()
        if not sliding:
            raise FeathubError(
                f"SlidingFeatureView {self.name} needs at least one "
                "SlidingWindowTransform feature."
            )
        step_sizes = {f.transform.step_size_ms for f in sliding}
        key_tuples = {tuple(f.transform.group_by_keys) for f in sliding}
        if len(step_sizes) > 1 or len(key_tuples) > 1:
            raise FeathubError(
                "All sliding window features in one view must share step_size "
                "and group_by_keys."
            )
        if source.timestamp_field is None:
            raise FeathubError("SlidingFeatureView source needs a timestamp_field.")
        # Post-sliding features may only depend on window_time, sliding
        # features, and group keys (reference sliding_feature_view.py:490-523).
        # Pre-sliding per-row features are window INPUTS (per-row grain) and
        # do not survive aggregation, so post-sliding expressions cannot
        # reference them.
        allowed = (
            {f.name for f in sliding}
            | set(self.group_by_keys)
            | {self.timestamp_field}
        )
        for f in self.post_sliding_features():
            if isinstance(f.transform, ExpressionTransform):
                deps = parse_expr(f.transform.expr).variables()
                # the GET_WINDOW_TIME placeholder column is legal here
                bad = deps - allowed - {WINDOW_TIME_PLACEHOLDER}
                if bad:
                    raise FeathubError(
                        f"Post-sliding feature {f.name!r} depends on {sorted(bad)} "
                        "which are not available after windowing."
                    )
            # post features evaluate sequentially, so each validated
            # feature becomes referenceable by the ones after it
            # (reference sliding_feature_view.py:490-523 does the same)
            allowed.add(f.name)

    def get_output_fields(self) -> List[str]:
        fields = list(self.group_by_keys)
        fields.append(self.timestamp_field)
        # pre-sliding per-row features are inputs to the window aggregation,
        # not outputs: the view's grain is one row per (keys, window)
        pre_names = {f.name for f in self.pre_sliding_features()}
        for f in self.get_resolved_features():
            if f.name not in fields and f.name not in pre_names:
                fields.append(f.name)
        return fields

    def get_output_schema(self):
        from feathub_spark.table.schema import Schema

        types_by_name: Dict[str, t.DType] = dict(self._source_types())
        for f in self.get_resolved_features():
            types_by_name[f.name] = f.dtype
        types_by_name[self.timestamp_field] = self._window_time_dtype()
        fields = self.get_output_fields()
        return Schema(fields, [types_by_name[f] for f in fields])
