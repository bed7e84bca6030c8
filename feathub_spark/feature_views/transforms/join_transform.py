"""Point-in-time (event-time as-of) feature join transform.

Semantics per the reference (feature_views/transforms/join_transform.py:20-100
and the golden nested-loop in processors/local/local_processor.py:453-523):
for each left row at time t, take the right-table row with the largest
right_time <= t matching equality on the join keys; NULL if none exists.

``map_key`` supports the ``table.map_feature[key]`` form
(reference derived_feature_view.py:244-257).
"""

from __future__ import annotations

from typing import Optional

from feathub_spark.feature_views.transforms.transformation import Transformation


class JoinTransform(Transformation):
    def __init__(
        self,
        table_name: str,
        feature_name: str,
        map_key: Optional[str] = None,
    ) -> None:
        self.table_name = table_name
        self.feature_name = feature_name
        self.map_key = map_key

    def to_json(self):
        return {
            "type": "JoinTransform",
            "table_name": self.table_name,
            "feature_name": self.feature_name,
            "map_key": self.map_key,
        }
