"""Regression tests for code-review findings."""

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
from feathub_spark.feature_views.transforms import JoinTransform, SlidingWindowTransform


def _source(tmp_path, name, fmt, time_values):
    path = os.path.join(str(tmp_path), f"{name}.csv")
    with open(path, "w") as f:
        f.write("k,v,t\n")
        for i, tv in enumerate(time_values):
            f.write(f'k{i % 2},{i * 10},"{tv}"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    return FileSystemSource(
        name=name, path=path, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format=fmt,
    )


def test_iso_t_timestamp_format(client, tmp_path):
    """ISO8601 'T' separator: the quoted Java literal must survive SQL
    embedding (review finding: unescaped quote broke the expression)."""
    source = _source(
        tmp_path, "iso_t_src", "%Y-%m-%dT%H:%M:%S",
        ["2022-01-01T08:00:00", "2022-01-01T09:00:00", "2022-01-01T10:00:00"],
    )
    view = DerivedFeatureView(
        name="iso_t_view",
        source=source,
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    from datetime import datetime

    df = client.get_features(
        view, start_datetime=datetime(2022, 1, 1, 8, 30)
    ).to_pandas()
    assert df["v"].tolist() == [10, 20]


def test_fractional_seconds_format(client, tmp_path):
    """%f fractions (variable digits) parse via the native cast path."""
    source = _source(
        tmp_path, "frac_src", "%Y-%m-%d %H:%M:%S.%f",
        ["2022-01-01 08:00:00.001", "2022-01-01 08:00:00.123456",
         "2022-01-01 08:00:01.5"],
    )
    view = DerivedFeatureView(
        name="frac_view",
        source=source,
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    from datetime import datetime

    # all three rows must have parsed (none silently dropped to NULL)
    df = client.get_features(
        view, start_datetime=datetime(2022, 1, 1)
    ).to_pandas()
    assert len(df) == 3


def test_map_entry_join_two_keys(client, tmp_path):
    """Two features joining DIFFERENT entries of the same map column must
    not collide (review finding: fusion dict was keyed by right column)."""
    source = _source(
        tmp_path, "mm_src", "%Y-%m-%d %H:%M:%S",
        ["2022-01-01 08:00:00", "2022-01-01 09:00:00", "2022-01-01 10:00:00"],
    )
    right = DerivedFeatureView(
        name="mm_right",
        source=source,
        features=[
            Feature("m", transform="MAP('a', v, 'b', v * 10)", keys=["k"]),
        ],
        keep_source_fields=True,
    )
    left = DerivedFeatureView(
        name="mm_left",
        source=source,
        features=[
            Feature("va", transform=JoinTransform("mm_right", "m", map_key="a"), keys=["k"]),
            Feature("vb", transform=JoinTransform("mm_right", "m", map_key="b"), keys=["k"]),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, right])
    client.build_features([left])
    df = client.get_features(left).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    assert (df["vb"] == df["va"] * 10).all()


def test_sliding_pre_feature_as_input_only(client, tmp_path):
    """A per-row expression feature feeding a sliding agg compiles (it is a
    window input, not an output column)."""
    source = _source(
        tmp_path, "pre_src", "%Y-%m-%d %H:%M:%S",
        ["2022-01-01 08:00:00", "2022-01-01 09:00:00", "2022-01-02 08:00:00"],
    )
    view = SlidingFeatureView(
        name="pre_view",
        source=source,
        features=[
            Feature("v3", transform="v * 3"),
            Feature(
                "sum_v3",
                transform=SlidingWindowTransform(
                    "v3", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert "v3" not in df.columns
    assert sorted(df["sum_v3"].tolist()) == [0, 30, 60]


def test_streaming_mixed_bounded_unbounded_over(client, tmp_path):
    """Unbounded + bounded over-windows sharing keys on a stream: the
    unbounded agg must not be corrupted by history pruning."""
    from feathub_spark.feature_views.transforms import OverWindowTransform

    d = os.path.join(str(tmp_path), "mix_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("k,v,t\n")
        f.write('x,1,"2022-01-01 00:00:00"\n')
        f.write('x,2,"2022-01-05 00:00:00"\n')
        f.write('x,4,"2022-01-09 00:00:00"\n')
        f.write('zed,0,"2022-02-01 00:00:00"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    source = FileSystemSource(
        name="mix_src", path=d, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = DerivedFeatureView(
        name="mix_view",
        source=source,
        features=[
            Feature("life_sum", transform=OverWindowTransform("v", "SUM", group_by_keys=["k"])),
            Feature(
                "sum_1d",
                transform=OverWindowTransform(
                    "v", "SUM", window_size=timedelta(days=1), group_by_keys=["k"]
                ),
            ),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.processor.get_stream_dataframe(view)
    q = (
        df.writeStream.outputMode("append").format("memory")
        .queryName("mix_out").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        r["t"]: (r.life_sum, r.sum_1d)
        for r in client.spark.sql("SELECT * FROM mix_out").collect()
        if r["k"] == "x"
    }
    # lifetime sums accumulate across rows far apart in time
    assert rows["2022-01-09 00:00:00"] == (7, 4)


def test_streaming_infinite_sliding(client, tmp_path):
    """window=step=0 on a stream routes to the stateful over-window
    operator instead of dividing by zero."""
    d = os.path.join(str(tmp_path), "inf_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("k,v,t\n")
        f.write('x,1,"2022-01-01 00:00:00"\n')
        f.write('x,2,"2022-01-01 01:00:00"\n')
        f.write('zed,0,"2022-02-01 00:00:00"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    source = FileSystemSource(
        name="infs_src", path=d, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = SlidingFeatureView(
        name="infs_view",
        source=source,
        features=[
            Feature(
                "total",
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
    df = client.processor.get_stream_dataframe(view)
    q = (
        df.writeStream.outputMode("append").format("memory")
        .queryName("infs_out").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    totals = sorted(
        r.total for r in client.spark.sql("SELECT * FROM infs_out").collect()
        if r["k"] == "x"
    )
    assert totals == [1, 3]
