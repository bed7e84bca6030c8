"""Per-row expression transform (reference
feature_views/transforms/expression_transform.py:20-40): the feature's value
is a FeatHub expression over earlier columns; the planner casts the result to
the declared dtype."""

from __future__ import annotations

from feathub_spark.feature_views.transforms.transformation import Transformation


class ExpressionTransform(Transformation):
    def __init__(self, expr: str) -> None:
        self.expr = expr

    def to_json(self):
        return {"type": "ExpressionTransform", "expr": self.expr}
