"""Feature: a named column with a dtype, a transformation, and entity keys
(reference feature_views/feature.py:42-105).  ``transform`` given as a string
becomes an ExpressionTransform; keys default to the transform's
group_by_keys for window transforms."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from feathub_spark.common.types import DType
from feathub_spark.feature_views.transforms.expression_transform import (
    ExpressionTransform,
)
from feathub_spark.feature_views.transforms.over_window_transform import (
    OverWindowTransform,
)
from feathub_spark.feature_views.transforms.sliding_window_transform import (
    SlidingWindowTransform,
)
from feathub_spark.feature_views.transforms.transformation import Transformation


class Feature:
    def __init__(
        self,
        name: str,
        transform: Union[str, Transformation],
        dtype: Optional[DType] = None,
        keys: Optional[Sequence[str]] = None,
        description: str = "",
        metrics: Optional[Sequence] = None,
    ) -> None:
        self.name = name
        self.transform: Transformation = (
            ExpressionTransform(transform) if isinstance(transform, str) else transform
        )
        self.dtype = dtype
        if keys is None and isinstance(
            self.transform, (OverWindowTransform, SlidingWindowTransform)
        ):
            keys = self.transform.group_by_keys or None
        self.keys: Optional[List[str]] = list(keys) if keys is not None else None
        self.description = description
        # feature-monitoring metrics, compiled to sliding windows and
        # piggybacked on materialization (reference feature.py metrics param)
        self.metrics: List = list(metrics) if metrics else []

    def copy(self) -> "Feature":
        f = Feature.__new__(Feature)
        f.name = self.name
        f.transform = self.transform
        f.dtype = self.dtype
        f.keys = list(self.keys) if self.keys is not None else None
        f.description = self.description
        f.metrics = list(self.metrics)
        return f

    def __repr__(self) -> str:
        return (
            f"Feature(name={self.name!r}, dtype={self.dtype!r}, "
            f"transform={self.transform!r}, keys={self.keys!r})"
        )
