"""Metric store: assembles metric views appended to a materialization job
(reference metric_stores/metric_store.py:89-265).

``build_metric_view(view)`` collects all Feature.metrics of a resolved view
and compiles one SlidingFeatureView computing every metric over the view's
output — piggybacked on the same job (one scan), then written to the metric
sink (Prometheus or any Sink) per report interval.
"""

from __future__ import annotations

from typing import List, Optional

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.feature_views.feature import Feature
from feathub_spark.feature_views.sliding_feature_view import SlidingFeatureView
from feathub_spark.table.table_descriptor import TableDescriptor


class MetricStore:
    def __init__(self, sink, namespace: str = "default") -> None:
        self.sink = sink
        self.namespace = namespace

    def build_metric_view(
        self, view: TableDescriptor, metrics_by_feature: dict
    ) -> Optional[SlidingFeatureView]:
        """metrics_by_feature: {feature_name: [Metric, ...]}."""
        features: List[Feature] = []
        for feature_name, metrics in metrics_by_feature.items():
            for metric in metrics:
                features.append(metric.to_feature(feature_name, None))
        if not features:
            return None
        steps = {f.transform.step_size_ms for f in features}
        if len(steps) > 1:
            raise FeathubError(
                "All metrics attached to one view must share window_size "
                "(they compile into a single sliding view)."
            )
        return SlidingFeatureView(
            name=f"{view.name}_metrics_{self.namespace}",
            source=view,
            features=features,
            enable_empty_window_output=False,
            skip_same_window_output=False,
        )

    def materialize(self, processor, view, metrics_by_feature: dict) -> None:
        metric_view = self.build_metric_view(view, metrics_by_feature)
        if metric_view is None:
            return
        built = processor.registry.build_features([metric_view])[0]
        processor.get_table(built).execute_insert(self.sink)
