import math

from feathub_spark import DerivedFeatureView, Feature

from tests.fixtures import write_f1_source, write_f2_source


def _nan_to_none(values):
    return [None if isinstance(v, float) and math.isnan(v) else v for v in values]


def test_point_in_time_join(client, tmp_path):
    """Reference golden case test_join_transform.py:28-115: as-of join of
    avg_cost onto the purchases table, then a derived expression on top."""
    source = write_f1_source(tmp_path)
    source_2 = write_f2_source(tmp_path)

    feature_view_1 = DerivedFeatureView(
        name="feature_view_1",
        source=source,
        features=[Feature("cost", transform="cost"), Feature("distance", transform="distance")],
        keep_source_fields=True,
    )
    feature_view_2 = DerivedFeatureView(
        name="feature_view_2",
        source=feature_view_1,
        features=[
            Feature("cost", transform="cost"),
            "distance",
            f"{source_2.name}.avg_cost",
        ],
        keep_source_fields=False,
    )
    feature_view_3 = DerivedFeatureView(
        name="feature_view_3",
        source=feature_view_2,
        features=[Feature("derived_cost", transform="avg_cost * distance")],
        keep_source_fields=True,
    )

    client.build_features([source])
    built = client.build_features([source_2, feature_view_2, feature_view_3])
    built_2, built_3 = built[1], built[2]
    assert built_2.keys == ["name"]
    assert built_3.keys == ["name"]

    df = (
        client.get_features(built_3)
        .to_pandas()
        .sort_values(by=["name", "time"])
        .reset_index(drop=True)
    )
    by_time = df.sort_values("time").reset_index(drop=True)
    assert _nan_to_none(by_time["avg_cost"].tolist()) == [
        None, None, 200.0, 400.0, None, 200.0,
    ]
    assert _nan_to_none(by_time["derived_cost"].tolist()) == [
        None, None, 40000.0, 100000.0, None, 160000.0,
    ]


def test_join_keeps_left_rows(client, tmp_path):
    source = write_f1_source(tmp_path)
    source_2 = write_f2_source(tmp_path)
    view = DerivedFeatureView(
        name="jv2",
        source=source,
        features=[f"{source_2.name}.avg_cost"],
        keep_source_fields=True,
    )
    client.build_features([source_2])
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert len(df) == 6
    assert list(df.columns) == ["name", "cost", "distance", "time", "avg_cost"]
