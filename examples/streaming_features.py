"""Streaming example: file-stream source → sliding-window features →
in-memory sink, with the same declarative view definition that the batch
planner accepts (stream-batch unification).

    python examples/streaming_features.py
"""

import os
import sys
import tempfile
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feathub_spark import (
    FeathubClient,
    Feature,
    FileSystemSource,
    Int64,
    Schema,
    SlidingFeatureView,
    String,
)
from feathub_spark.feature_views.transforms import SlidingWindowTransform

EVENTS = [
    ("alice", 10, "2024-01-01 00:05:00"),
    ("bob", 7, "2024-01-01 00:20:00"),
    ("alice", 3, "2024-01-01 01:10:00"),
    ("alice", 9, "2024-01-01 02:30:00"),
    ("bob", 1, "2024-01-01 03:00:00"),
    ("carol", 2, "2024-01-02 00:00:00"),  # pushes the watermark forward
]


def main() -> None:
    client = FeathubClient()
    in_dir = tempfile.mkdtemp()
    with open(os.path.join(in_dir, "batch0.csv"), "w") as f:
        f.write("user,amount,ts\n")
        for row in EVENTS:
            f.write(",".join(str(x) for x in row) + "\n")

    source = FileSystemSource(
        name="purchases_stream",
        path=in_dir,
        data_format="csv",
        schema=Schema.new_builder()
        .column("user", String)
        .column("amount", Int64)
        .column("ts", String)
        .build(),
        keys=["user"],
        timestamp_field="ts",
        timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = SlidingFeatureView(
        name="hourly_spend",
        source=source,
        features=[
            Feature(
                "spend_1h",
                transform=SlidingWindowTransform(
                    "amount", "SUM", window_size=timedelta(hours=1),
                    step_size=timedelta(hours=1), group_by_keys=["user"],
                ),
            ),
            Feature(
                "n_1h",
                transform=SlidingWindowTransform(
                    "amount", "COUNT", window_size=timedelta(hours=1),
                    step_size=timedelta(hours=1), group_by_keys=["user"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])

    df = client.processor.get_stream_dataframe(view)
    query = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("hourly_spend_out")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    client.spark.sql(
        "SELECT user, window_time, spend_1h, n_1h FROM hourly_spend_out "
        "ORDER BY user, window_time"
    ).show(truncate=False)


if __name__ == "__main__":
    main()
