"""Aggregation functions usable in over/sliding window transforms.

Inventory and result-type rules follow the reference
(/root/reference/python/feathub/feature_views/transforms/agg_func.py:21-53):
AVG→Float64; SUM/MAX/MIN/FIRST_VALUE/LAST_VALUE→input type;
ROW_NUMBER/COUNT→Int64; VALUE_COUNTS→Map(input, Int64);
COLLECT_LIST→Vector(input).
"""

from __future__ import annotations

from enum import Enum

from feathub_spark.common import types as t
from feathub_spark.common.exceptions import FeathubError


class AggFunc(Enum):
    AVG = "AVG"
    SUM = "SUM"
    MAX = "MAX"
    MIN = "MIN"
    FIRST_VALUE = "FIRST_VALUE"
    LAST_VALUE = "LAST_VALUE"
    ROW_NUMBER = "ROW_NUMBER"
    COUNT = "COUNT"
    VALUE_COUNTS = "VALUE_COUNTS"
    COLLECT_LIST = "COLLECT_LIST"

    @staticmethod
    def from_name(name: str) -> "AggFunc":
        try:
            return AggFunc(name.upper())
        except ValueError:
            raise FeathubError(f"Unknown aggregation function {name!r}.")

    def result_dtype(self, input_dtype: t.DType) -> t.DType:
        if self == AggFunc.AVG:
            return t.Float64
        if self in (AggFunc.SUM, AggFunc.MAX, AggFunc.MIN,
                    AggFunc.FIRST_VALUE, AggFunc.LAST_VALUE):
            return input_dtype
        if self in (AggFunc.ROW_NUMBER, AggFunc.COUNT):
            return t.Int64
        if self == AggFunc.VALUE_COUNTS:
            return t.MapType(input_dtype, t.Int64)
        if self == AggFunc.COLLECT_LIST:
            return t.VectorType(input_dtype)
        raise FeathubError(f"No result type for {self}.")

    def empty_window_default(self):
        """Value emitted for an empty window: 0 for SUM/COUNT, else NULL
        (reference flink/table_builder/aggregation_utils.py:95-120)."""
        if self in (AggFunc.SUM, AggFunc.COUNT):
            return 0
        return None
