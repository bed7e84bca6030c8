from feathub_spark.feature_views.transforms.agg_func import AggFunc
from feathub_spark.feature_views.transforms.transformation import Transformation
from feathub_spark.feature_views.transforms.expression_transform import (
    ExpressionTransform,
)
from feathub_spark.feature_views.transforms.join_transform import JoinTransform
from feathub_spark.feature_views.transforms.over_window_transform import (
    OverWindowTransform,
)
from feathub_spark.feature_views.transforms.sliding_window_transform import (
    SlidingWindowTransform,
)
from feathub_spark.feature_views.transforms.python_udf_transform import (
    PythonUdfTransform,
)

__all__ = [
    "AggFunc",
    "Transformation",
    "ExpressionTransform",
    "JoinTransform",
    "OverWindowTransform",
    "SlidingWindowTransform",
    "PythonUdfTransform",
]
