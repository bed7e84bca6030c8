"""Sliding/hopping window aggregation emitting at step boundaries.

Semantics per the reference
(feature_views/transforms/sliding_window_transform.py:23-101 and the batch
golden sweep processors/local/sliding_window_utils.py:116-327): windows are
aligned to the epoch; the window ending at ``wend`` covers rows with event
time in [wend - window_size, wend); emissions carry
``window_time = wend - 1ms``.  window_size == step_size == 0 means an
infinite window emitting per input row; exactly one of them being 0 is
rejected.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.time_utils import timedelta_ms
from feathub_spark.feature_views.transforms.agg_func import AggFunc
from feathub_spark.feature_views.transforms.transformation import Transformation


class SlidingWindowTransform(Transformation):
    def __init__(
        self,
        expr: str,
        agg_func: Union[str, AggFunc],
        window_size,
        step_size,
        group_by_keys: Sequence[str] = (),
        filter_expr: Optional[str] = None,
        limit: Optional[int] = None,
    ) -> None:
        self.expr = expr
        self.agg_func = (
            agg_func if isinstance(agg_func, AggFunc) else AggFunc.from_name(agg_func)
        )
        self.window_size_ms = timedelta_ms(window_size)
        self.step_size_ms = timedelta_ms(step_size)
        if (self.window_size_ms == 0) != (self.step_size_ms == 0):
            raise FeathubError(
                "window_size and step_size must both be zero (infinite window) "
                "or both be positive."
            )
        if self.window_size_ms > 0 and self.window_size_ms % self.step_size_ms != 0:
            raise FeathubError("window_size must be a multiple of step_size.")
        self.group_by_keys: List[str] = list(group_by_keys)
        self.filter_expr = filter_expr
        if limit is not None and limit <= 0:
            raise FeathubError("limit must be a positive integer.")
        self.limit = limit

    @property
    def is_infinite(self) -> bool:
        return self.window_size_ms == 0 and self.step_size_ms == 0

    def to_json(self):
        return {
            "type": "SlidingWindowTransform",
            "expr": self.expr,
            "agg_func": self.agg_func.value,
            "window_size_ms": self.window_size_ms,
            "step_size_ms": self.step_size_ms,
            "group_by_keys": self.group_by_keys,
            "filter_expr": self.filter_expr,
            "limit": self.limit,
        }
