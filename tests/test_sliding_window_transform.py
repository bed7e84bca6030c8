from datetime import timedelta

from feathub_spark import Feature, SlidingFeatureView
from feathub_spark.feature_views.transforms import SlidingWindowTransform

from tests.fixtures import write_f1_source

MS_DAY = 86_400_000
# epoch millis of 2022-01-02 00:00:00 UTC
JAN2 = 1641081600000


def _window_times(n):
    return [JAN2 + i * MS_DAY - 1 for i in range(n)]


def test_sliding_sum_keyless(client, tmp_path):
    """Reference golden case test_sliding_window_transform.py:89-119:
    SUM(cost), window=2d, step=1d, no key → 500, 1000, 1600, 1100, 0."""
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="sw1",
        source=source,
        features=[
            Feature(
                "total_cost",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=2), step_size=timedelta(days=1)
                ),
            ),
        ],
    )
    client.build_features([source, view])
    df = (
        client.get_features(view)
        .to_pandas()
        .sort_values("window_time")
        .reset_index(drop=True)
    )
    assert df["total_cost"].tolist() == [500, 1000, 1600, 1100, 0]
    assert df["window_time"].tolist() == _window_times(5)
    assert list(df.columns) == ["window_time", "total_cost"]


def test_sliding_keyed_multi_window(client, tmp_path):
    """Two window sizes sharing one step; per-key emissions with empty-window
    defaults and skip-same suppression."""
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="sw2",
        source=source,
        features=[
            Feature(
                "cost_1d",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
            Feature(
                "cnt_2d",
                transform=SlidingWindowTransform(
                    "cost", "COUNT", window_size=timedelta(days=2),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
    )
    client.build_features([source, view])
    df = (
        client.get_features(view)
        .to_pandas()
        .sort_values(["name", "window_time"])
        .reset_index(drop=True)
    )
    alex = df[df["name"] == "Alex"]
    # Alex rows: Jan1 100, Jan2 300, Jan3 600.
    # wend Jan2: 1d=100 2d-cnt=1 | Jan3: 1d=300 cnt=2 | Jan4: 1d=600 cnt=2
    # Jan5: 1d=0 cnt=1 | Jan6: 1d=0 cnt=0
    assert alex["cost_1d"].tolist() == [100, 300, 600, 0, 0]
    assert alex["cnt_2d"].tolist() == [1, 2, 2, 1, 0]
    jack = df[df["name"] == "Jack"]
    # Jack: Jan3 500 → Jan4: (500,1); Jan5: (0,1); Jan6: (0,0)
    assert jack["cost_1d"].tolist() == [500, 0, 0]
    assert jack["cnt_2d"].tolist() == [1, 1, 0]


def test_sliding_no_empty_output(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="sw3",
        source=source,
        features=[
            Feature(
                "total_cost",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=2),
                    step_size=timedelta(days=1),
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = (
        client.get_features(view)
        .to_pandas()
        .sort_values("window_time")
        .reset_index(drop=True)
    )
    assert df["total_cost"].tolist() == [500, 1000, 1600, 1100]


def test_sliding_skip_same_suppression(client, tmp_path):
    """With a 3d window, consecutive equal emissions are suppressed only when
    skip_same_window_output=True."""
    source = write_f1_source(tmp_path)

    def make_view(name, skip):
        return SlidingFeatureView(
            name=name,
            source=source,
            features=[
                Feature(
                    "max_cost",
                    transform=SlidingWindowTransform(
                        "cost", "MAX", window_size=timedelta(days=3),
                        step_size=timedelta(days=1),
                    ),
                ),
            ],
            skip_same_window_output=skip,
            enable_empty_window_output=True,
        )

    v_skip = make_view("sw4a", True)
    v_all = make_view("sw4b", False)
    client.build_features([source, v_skip, v_all])
    skip_vals = (
        client.get_features(v_skip).to_pandas().sort_values("window_time")["max_cost"].tolist()
    )
    all_vals = (
        client.get_features(v_all).to_pandas().sort_values("window_time")["max_cost"].tolist()
    )
    # windows ending Jan2..Jan6(+3d drain): max over trailing 3d of all rows
    # Jan2:400, Jan3:500(?)... rows: Jan1(100,400) Jan2(300,200) Jan3(500,600)
    # Jan2:max(100,400)=400; Jan3:max(...Jan1,Jan2)=400; Jan4:600; Jan5:600;
    # Jan6:600; Jan7(empty):NULL
    assert all_vals[:3] == [400.0, 400.0, 600.0]
    assert len(all_vals) == 6
    # skip-same drops the repeated 400 and 600s
    assert skip_vals[:2] == [400.0, 600.0]


def test_post_sliding_expression(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="sw5",
        source=source,
        features=[
            Feature(
                "total_cost",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=2),
                    step_size=timedelta(days=1),
                ),
            ),
            Feature("double_cost", transform="total_cost * 2"),
        ],
    )
    client.build_features([source, view])
    df = (
        client.get_features(view)
        .to_pandas()
        .sort_values("window_time")
        .reset_index(drop=True)
    )
    assert df["double_cost"].tolist() == [1000, 2000, 3200, 2200, 0]


def test_sliding_value_counts_long_single_key(client, tmp_path):
    """Hot-key stress for the distributive sliding VALUE_COUNTS plan: one
    key, 30k rows, 5000s window / 1000s step.  The array path would carry
    every in-window row through the partial and merge stages; the
    per-step count-map plan's partials are bounded by distinct values per
    step.  Spot-checked against directly computed windowed counts."""
    import os

    import pandas as pd

    from feathub_spark import FileSystemSource, Int64, Schema, String

    n = 30_000
    window_s, step_s = 5_000, 1_000
    values = [f"v{i % 7}" if i % 11 else None for i in range(n)]
    t0 = 1_640_000_000
    ts = [t0 + i for i in range(n)]
    pdf = pd.DataFrame({"k": "hot", "val": values, "ts": ts})
    path = os.path.join(str(tmp_path), "hotkey_svc.parquet")
    pdf.to_parquet(path)

    schema = (
        Schema.new_builder()
        .column("k", String)
        .column("val", String)
        .column("ts", Int64)
        .build()
    )
    source = FileSystemSource(
        name="hotkey_svc",
        path=path,
        data_format="parquet",
        schema=schema,
        keys=["k"],
        timestamp_field="ts",
        timestamp_format="epoch",
    )
    view = SlidingFeatureView(
        name="hotkey_svc_view",
        source=source,
        features=[
            Feature(
                "vc",
                transform=SlidingWindowTransform(
                    "val", "VALUE_COUNTS",
                    window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s),
                    group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    by_wt = {int(r["window_time"]): r["vc"] for _, r in df.iterrows()}
    # probe a few window ends: first, one mid-stream, one past the data end
    for wend_s in (
        (t0 // step_s + 1) * step_s,
        (t0 // step_s + 1) * step_s + 10 * step_s,
        (ts[-1] // step_s + 1) * step_s + 2 * step_s,
    ):
        expected = {}
        for v, tt in zip(values, ts):
            if wend_s - window_s <= tt < wend_s and v is not None:
                expected[v] = expected.get(v, 0) + 1
        got = by_wt.get(wend_s * 1000 - 1)
        got = dict(got) if got is not None else None
        assert got == (expected or None), f"window end {wend_s}"


def test_sliding_null_group_key_gets_real_aggregates(client, tmp_path):
    """Review finding: the empty-window grid join and the distributive
    VALUE_COUNTS join used plain key equality, so a NULL group-by key —
    a real group for groupBy — came back as empty-window defaults (0 /
    NULL) instead of its aggregates."""
    import os

    from feathub_spark import Schema
    from feathub_spark.common import types as t
    from feathub_spark.feature_tables.sources.file_system_source import (
        FileSystemSource,
    )

    path = os.path.join(str(tmp_path), "nullkey.csv")
    with open(path, "w") as f:
        f.write("name,cost,time\n")
        f.write("Alex,100,2022-01-01 10:00:00\n")
        f.write(",70,2022-01-01 11:00:00\n")   # NULL key
        f.write(",30,2022-01-02 11:00:00\n")   # NULL key, next day
    schema = (
        Schema.new_builder()
        .column("name", t.String)
        .column("cost", t.Int64)
        .column("time", t.String)
        .build()
    )
    source = FileSystemSource(
        name="nullkey_src",
        path=path,
        data_format="csv",
        schema=schema,
        keys=["name"],
        timestamp_field="time",
        timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = SlidingFeatureView(
        name="sw_nullkey",
        source=source,
        features=[
            Feature(
                "cost_1d",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
            Feature(
                "vc_1d",
                transform=SlidingWindowTransform(
                    "cost", "VALUE_COUNTS", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    nulls = df[df["name"].isnull()].sort_values("window_time")
    # the NULL-key group's windows carry its real sums and maps
    assert nulls["cost_1d"].tolist()[:2] == [70, 30]
    assert nulls["vc_1d"].tolist()[0] == {70: 1}
    assert nulls["vc_1d"].tolist()[1] == {30: 1}
