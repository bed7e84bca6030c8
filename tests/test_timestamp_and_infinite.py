"""Zero-size (infinite) sliding windows and epoch/epoch_millis timestamp
format handling."""

import os
from datetime import timedelta

from feathub_spark import (
    DerivedFeatureView,
    Feature,
    FileSystemSource,
    Int64,
    Schema,
    SlidingFeatureView,
    String,
)
from feathub_spark.feature_views.transforms import (
    OverWindowTransform,
    SlidingWindowTransform,
)

EPOCH_ROWS = [
    ("a", 10, 1640995200),       # 2022-01-01 00:00:00
    ("a", 20, 1641081600),       # 2022-01-02
    ("b", 5, 1641081600),
    ("a", 30, 1641168000),       # 2022-01-03
]


def _epoch_source(tmp_path, name, millis=False):
    path = os.path.join(str(tmp_path), f"{name}.csv")
    with open(path, "w") as f:
        f.write("k,v,t\n")
        for k, v, t in EPOCH_ROWS:
            f.write(f"{k},{v},{t * 1000 if millis else t}\n")
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", Int64).build()
    )
    return FileSystemSource(
        name=name,
        path=path,
        data_format="csv",
        schema=schema,
        keys=["k"],
        timestamp_field="t",
        timestamp_format="epoch_millis" if millis else "epoch",
    )


def test_epoch_formats(client, tmp_path):
    for millis in (False, True):
        source = _epoch_source(tmp_path, f"epoch_src_{millis}", millis)
        view = DerivedFeatureView(
            name=f"epoch_view_{millis}",
            source=source,
            features=[
                Feature(
                    "running_sum",
                    transform=OverWindowTransform("v", "SUM", group_by_keys=["k"]),
                ),
            ],
            keep_source_fields=True,
        )
        client.build_features([source, view])
        df = client.get_features(view).to_pandas().sort_values(["k", "t"])
        assert df["running_sum"].tolist() == [10, 30, 60, 5]


def test_infinite_sliding_window(client, tmp_path):
    """window_size = step_size = 0: infinite window, one emission per input
    row, window_time = event time millis."""
    source = _epoch_source(tmp_path, "inf_src")
    view = SlidingFeatureView(
        name="inf_view",
        source=source,
        features=[
            Feature(
                "total_v",
                transform=SlidingWindowTransform(
                    "v", "SUM", window_size=timedelta(0), step_size=timedelta(0),
                    group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=True,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = (
        client.get_features(view)
        .to_pandas()
        .sort_values(["k", "window_time"])
        .reset_index(drop=True)
    )
    assert df["total_v"].tolist() == [10, 30, 60, 5]
    assert df["window_time"].tolist() == [
        1640995200000, 1641081600000, 1641168000000, 1641081600000,
    ]
