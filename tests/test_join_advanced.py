"""Advanced join semantics: valid-time expiry when joining a sliding view
with empty-window output disabled, and map-entry lookup joins."""

import math
from datetime import timedelta

from feathub_spark import DerivedFeatureView, Feature, SlidingFeatureView
from feathub_spark.feature_views.transforms import SlidingWindowTransform

from tests.fixtures import write_f1_source


def _nan_to_none(values):
    return [None if isinstance(v, float) and math.isnan(v) else v for v in values]


def test_valid_time_expiry_join(client, tmp_path):
    """Joining a sliding view with enable_empty_window_output=False: a joined
    value expires step_size after its window_time and is replaced by the agg
    default (0 for SUM) — reference join_utils.py:57-142."""
    source = write_f1_source(tmp_path)
    right = SlidingFeatureView(
        name="daily_cost_view",
        source=source,
        features=[
            Feature(
                "daily_cost",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    left = DerivedFeatureView(
        name="expiry_left_view",
        source=source,
        features=["daily_cost_view.daily_cost"],
        keep_source_fields=True,
    )
    client.build_features([source, right])
    client.build_features([left])
    df = (
        client.get_features(left)
        .to_pandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    # Left rows (time, name): Jan1 Alex/Emma, Jan2 Alex/Emma, Jan3 Jack/Alex.
    # daily_cost emits at window_time = day end - 1ms:
    #   Alex: Jan1→100 (valid through Jan2), Jan2→300 (through Jan3)
    #   Emma: Jan1→400, Jan2→200;  Jack: Jan3→500 (valid Jan4)
    # As-of at left times: Jan1 08:xx precedes the first emission → NULL;
    # Jan2 08:xx sees Jan1's window (not yet expired);
    # Jan3 08:xx sees Jan2's window (not yet expired); Jack sees nothing.
    assert _nan_to_none(df["daily_cost"].tolist()) == [
        None, None, 100, 400, None, 300,
    ]


def test_map_entry_lookup_join(client, tmp_path):
    """Feature string 'table.map_feature[key]' joins a single map entry
    (reference derived_feature_view.py:244-257)."""
    source = write_f1_source(tmp_path)
    right = DerivedFeatureView(
        name="map_right_view",
        source=source,
        features=[
            Feature(
                "cost_map",
                transform="MAP('raw', cost, 'double', cost * 2)",
                keys=["name"],
            ),
        ],
        keep_source_fields=True,
    )
    left = DerivedFeatureView(
        name="map_left_view",
        source=source,
        features=["map_right_view.cost_map['double']"],
        keep_source_fields=True,
    )
    client.build_features([source, right])
    client.build_features([left])
    df = (
        client.get_features(left)
        .to_pandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    # as-of self-join at equal times matches the same row → cost*2
    assert df["cost_map"].tolist() == [200, 800, 600, 400, 1000, 1200]


def test_binned_interval_join_matches_naive(spark):
    """The binned equi-join + post-filter must produce exactly the naive
    conditional join's matches, and its plan must stay equi-join shaped
    (no BroadcastNestedLoopJoin / CartesianProduct)."""
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.intervals import interval_join

    ev = spark.createDataFrame(
        [(i, i % 3, i * 137) for i in range(200)],
        "event_id long, k long, ts long",
    )
    iv = spark.createDataFrame(
        [
            (100 + j, j % 3, j * 450, j * 450 + 900)
            for j in range(40)
        ] + [(999, 0, 5000, 4000), (998, 1, None, 100)],  # inverted + NULL
        "iv_id long, k long, s long, e long",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            ev, iv, "ts", "s", "e", keys=["k"], bin_us=500
        ).collect()
    )
    naive = sorted(
        (r["event_id"], r["iv_id"])
        for r in ev.join(
            iv,
            (ev["k"] == iv["k"]) & (ev["ts"] >= iv["s"]) & (ev["ts"] <= iv["e"]),
        ).collect()
    )
    assert got == naive and len(got) > 0

    plan = interval_join(
        ev, iv, "ts", "s", "e", keys=["k"], bin_us=500
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # left join keeps unmatched events with NULL interval columns
    left = interval_join(
        ev, iv, "ts", "s", "e", keys=["k"], bin_us=500, how="left"
    )
    assert left.filter(F.col("iv_id").isNull()).count() == (
        200 - len({e for e, _ in naive})
    )
    matched_left = sorted(
        (r["event_id"], r["iv_id"])
        for r in left.filter(F.col("iv_id").isNotNull()).collect()
    )
    assert matched_left == naive
