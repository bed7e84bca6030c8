"""Feature-monitoring metrics compiled into sliding-window transforms.

Per the reference (metric_stores/metric.py:75-315):

- Count(filter_expr, window_size)  → COUNT of 1 over the window
- Ratio(expr, window_size)         → AVG of CASE WHEN <feature><expr> THEN 1
                                     ELSE 0 END (NULL → 0)
- Average(window_size)             → AVG of the feature
- CountMap(window_size)            → VALUE_COUNTS of CAST(feature AS STRING)

window_size == 0 means the infinite window (emit per input).  Metric features
are appended to the materialized view and written to the metric sink in the
same job (piggybacking, reference metric_store.py:89-140).
"""

from __future__ import annotations

from datetime import timedelta
from typing import Optional

from feathub_spark.common import types as t
from feathub_spark.feature_views.feature import Feature
from feathub_spark.feature_views.transforms.sliding_window_transform import (
    SlidingWindowTransform,
)


class Metric:
    metric_type: str = "metric"

    def to_feature(self, feature_name: str, feature_dtype) -> Feature:
        raise NotImplementedError

    def _name(self, feature_name: str) -> str:
        return f"{feature_name}_{self.metric_type}"


class Count(Metric):
    metric_type = "count"

    def __init__(
        self,
        filter_expr: Optional[str] = None,
        window_size: timedelta = timedelta(0),
    ) -> None:
        self.filter_expr = filter_expr
        self.window_size = window_size

    def to_feature(self, feature_name: str, feature_dtype) -> Feature:
        filter_expr = (
            f"`{feature_name}` {self.filter_expr}" if self.filter_expr else None
        )
        return Feature(
            self._name(feature_name),
            transform=SlidingWindowTransform(
                "1",
                "COUNT",
                window_size=self.window_size,
                step_size=self.window_size,
                filter_expr=filter_expr,
            ),
            dtype=t.Int64,
        )


class Ratio(Metric):
    metric_type = "ratio"

    def __init__(self, expr: str, window_size: timedelta = timedelta(0)) -> None:
        self.expr = expr
        self.window_size = window_size

    def to_feature(self, feature_name: str, feature_dtype) -> Feature:
        return Feature(
            self._name(feature_name),
            transform=SlidingWindowTransform(
                f"CASE WHEN `{feature_name}` {self.expr} THEN 1.0 ELSE 0.0 END",
                "AVG",
                window_size=self.window_size,
                step_size=self.window_size,
            ),
            dtype=t.Float64,
        )


class Average(Metric):
    metric_type = "average"

    def __init__(self, window_size: timedelta = timedelta(0)) -> None:
        self.window_size = window_size

    def to_feature(self, feature_name: str, feature_dtype) -> Feature:
        return Feature(
            self._name(feature_name),
            transform=SlidingWindowTransform(
                f"CAST(`{feature_name}` AS DOUBLE)",
                "AVG",
                window_size=self.window_size,
                step_size=self.window_size,
            ),
            dtype=t.Float64,
        )


class CountMap(Metric):
    metric_type = "count_map"

    def __init__(self, window_size: timedelta = timedelta(0)) -> None:
        self.window_size = window_size

    def to_feature(self, feature_name: str, feature_dtype) -> Feature:
        return Feature(
            self._name(feature_name),
            transform=SlidingWindowTransform(
                f"CAST(`{feature_name}` AS STRING)",
                "VALUE_COUNTS",
                window_size=self.window_size,
                step_size=self.window_size,
            ),
            dtype=t.MapType(t.String, t.Int64),
        )
