"""Scalar Python UDF transform.

Semantics per the reference
(feature_views/transforms/python_udf_transform.py:24-180): the udf receives a
row (as a mapping of field name → value) and returns the feature value; on
exception, either fail the job or substitute ``value_on_exception``.

Execution uses an Arrow-batched pandas UDF (the fast path); the user function
is applied per row of the batch.
"""

from __future__ import annotations

from typing import Any, Callable

from feathub_spark.feature_views.transforms.transformation import Transformation


class PythonUdfTransform(Transformation):
    def __init__(
        self,
        udf: Callable[[Any], Any],
        fail_on_exception: bool = True,
        value_on_exception: Any = None,
    ) -> None:
        self.udf = udf
        self.fail_on_exception = fail_on_exception
        self.value_on_exception = value_on_exception

    def to_json(self):
        return {
            "type": "PythonUdfTransform",
            "udf": getattr(self.udf, "__name__", "<lambda>"),
            "fail_on_exception": self.fail_on_exception,
        }

    def __eq__(self, other: object) -> bool:
        return self is other
