"""Per-row trailing window aggregation.

Semantics per the reference (feature_views/transforms/over_window_transform.py:22-88,
golden loop processors/local/local_processor.py:525-603): for each row at t0
within its group_by_keys partition, aggregate rows with event time in
[t0 - window_size, t0] (both ends inclusive; unbounded when window_size is
None), optionally restricted by filter_expr, optionally restricted to the
``limit`` most recent matching rows.  Output row count equals input row count.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.time_utils import optional_timedelta_ms
from feathub_spark.feature_views.transforms.agg_func import AggFunc
from feathub_spark.feature_views.transforms.transformation import Transformation


class OverWindowTransform(Transformation):
    def __init__(
        self,
        expr: str,
        agg_func: Union[str, AggFunc],
        window_size=None,
        group_by_keys: Sequence[str] = (),
        filter_expr: Optional[str] = None,
        limit: Optional[int] = None,
    ) -> None:
        self.expr = expr
        self.agg_func = (
            agg_func if isinstance(agg_func, AggFunc) else AggFunc.from_name(agg_func)
        )
        self.window_size_ms: Optional[int] = optional_timedelta_ms(window_size)
        self.group_by_keys: List[str] = list(group_by_keys)
        self.filter_expr = filter_expr
        if limit is not None and limit <= 0:
            raise FeathubError("limit must be a positive integer.")
        self.limit = limit

    def to_json(self):
        return {
            "type": "OverWindowTransform",
            "expr": self.expr,
            "agg_func": self.agg_func.value,
            "window_size_ms": self.window_size_ms,
            "group_by_keys": self.group_by_keys,
            "filter_expr": self.filter_expr,
            "limit": self.limit,
        }
