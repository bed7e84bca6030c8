import pandas as pd

from feathub_spark import DerivedFeatureView, Feature, Float64, Int64, String

from tests.fixtures import write_f1_source


def test_expression_features(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="v1",
        source=source,
        features=[
            Feature("total", transform="cost + distance"),
            Feature("cost_per_mile", transform="CAST(cost AS DOUBLE) / distance + 10"),
            Feature(
                "tier",
                transform="CASE WHEN cost > 300 THEN 'high' WHEN cost > 150 THEN 'mid' ELSE 'low' END",
            ),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert list(df.columns) == ["name", "cost", "distance", "time", "total", "cost_per_mile", "tier"]
    assert df["total"].tolist() == [200, 650, 500, 450, 1000, 1400]
    assert df["tier"].tolist() == ["low", "high", "mid", "mid", "high", "high"]
    assert df["cost_per_mile"].tolist() == [11.0, 11.6, 11.5, 10.8, 11.0, 10.75]


def test_filter_and_projection(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="v2",
        source=source,
        features=[Feature("total", transform="cost + distance", keys=["name"])],
        keep_source_fields=False,
        filter_expr="total > 400",
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert list(df.columns) == ["name", "time", "total"]
    assert df["total"].tolist() == [650, 500, 450, 1000, 1400]


def test_derived_dtypes(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="v3",
        source=source,
        features=[
            Feature("i", transform="cost + 1"),
            Feature("f", transform="cost + 0.5"),
            Feature("s", transform="CONCAT(name, '!')"),
        ],
        keep_source_fields=True,
    )
    built = client.build_features([source, view])[1]
    types_by_name = dict(
        zip(built.get_output_schema().field_names, built.get_output_schema().field_types)
    )
    assert types_by_name["i"] == Int64
    assert types_by_name["f"] == Float64
    assert types_by_name["s"] == String


def test_time_range_filter(client, tmp_path):
    from datetime import datetime

    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="v4",
        source=source,
        features=[Feature("total", transform="cost + distance")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(
        view,
        start_datetime=datetime(2022, 1, 2),
        end_datetime=datetime(2022, 1, 3),
    ).to_pandas()
    assert df["cost"].tolist() == [300, 200]


def test_key_filter(client, tmp_path):
    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="v5",
        source=source,
        features=[Feature("total", transform="cost + distance")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    keys = pd.DataFrame({"name": ["Alex"]})
    df = client.get_features(view, keys=keys).to_pandas()
    assert df["cost"].tolist() == [100, 300, 600]
