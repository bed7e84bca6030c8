"""End-to-end example mirroring the reference's canonical NYC-taxi pipeline
(/root/reference/python/feathub/examples/nyc_taxi.py:123-236), re-expressed
on this engine: trip-duration expression feature, 90-day over-window
aggregates per dropoff location, and a second-level derived view.

Runs on a small generated sample so it works without the real dataset:
    python examples/nyc_taxi.py
"""

import os
import sys
import tempfile
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feathub_spark import (
    DerivedFeatureView,
    FeathubClient,
    Feature,
    FileSystemSource,
    Float64,
    Int64,
    PrintSink,
    Schema,
    String,
)
from feathub_spark.feature_views.transforms import OverWindowTransform

SAMPLE = [
    # trip_id, pickup, dropoff, DOLocationID, trip_distance, total_amount
    (1, "2020-01-01 00:10:00", "2020-01-01 00:25:00", 41, 2.1, 12.5),
    (2, "2020-01-01 00:30:00", "2020-01-01 00:50:00", 41, 4.0, 18.0),
    (3, "2020-01-01 01:00:00", "2020-01-01 01:05:00", 7, 0.9, 6.5),
    (4, "2020-01-01 01:10:00", "2020-01-01 01:40:00", 41, 7.5, 31.0),
    (5, "2020-01-01 02:00:00", "2020-01-01 02:12:00", 7, 1.8, 9.75),
]


def main() -> None:
    client = FeathubClient()

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "taxi.csv")
    with open(path, "w") as f:
        f.write("trip_id,lpep_pickup_datetime,lpep_dropoff_datetime,DOLocationID,trip_distance,total_amount\n")
        for row in SAMPLE:
            f.write(",".join(str(x) for x in row) + "\n")

    source = FileSystemSource(
        name="taxi",
        path=path,
        data_format="csv",
        schema=Schema.new_builder()
        .column("trip_id", Int64)
        .column("lpep_pickup_datetime", String)
        .column("lpep_dropoff_datetime", String)
        .column("DOLocationID", Int64)
        .column("trip_distance", Float64)
        .column("total_amount", Float64)
        .build(),
        keys=["DOLocationID"],
        timestamp_field="lpep_dropoff_datetime",
        timestamp_format="%Y-%m-%d %H:%M:%S",
    )

    feature_view_1 = DerivedFeatureView(
        name="taxi_with_duration",
        source=source,
        features=[
            Feature(
                "f_trip_time_duration",
                transform="UNIX_TIMESTAMP(lpep_dropoff_datetime) - "
                "UNIX_TIMESTAMP(lpep_pickup_datetime)",
            ),
        ],
        keep_source_fields=True,
    )

    feature_view_2 = DerivedFeatureView(
        name="taxi_with_window_stats",
        source=feature_view_1,
        features=[
            Feature(
                "f_location_avg_fare",
                transform=OverWindowTransform(
                    "total_amount", "AVG",
                    window_size=timedelta(days=90),
                    group_by_keys=["DOLocationID"],
                ),
            ),
            Feature(
                "f_location_max_fare",
                transform=OverWindowTransform(
                    "total_amount", "MAX",
                    window_size=timedelta(days=90),
                    group_by_keys=["DOLocationID"],
                ),
            ),
        ],
        keep_source_fields=True,
    )

    feature_view_3 = DerivedFeatureView(
        name="taxi_features",
        source=feature_view_2,
        features=[
            Feature("f_trip_time_minutes", transform="f_trip_time_duration / 60"),
            Feature("f_long_trip", transform="trip_distance > 5.0"),
        ],
        keep_source_fields=True,
    )

    client.build_features([source, feature_view_1, feature_view_2, feature_view_3])
    client.get_features(feature_view_3).execute_insert(PrintSink())


if __name__ == "__main__":
    main()
