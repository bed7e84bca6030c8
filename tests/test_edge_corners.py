"""Corner-case coverage: keyless windows, expression group keys, multiple
window descriptors per view, nested-view JSON round-trip, non-ANSI NULL
semantics."""

from datetime import timedelta

from feathub_spark import DerivedFeatureView, Feature, SlidingFeatureView
from feathub_spark.feature_views.transforms import (
    OverWindowTransform,
    SlidingWindowTransform,
)

from tests.fixtures import write_f1_source


def test_keyless_over_window(client, tmp_path):
    """group_by_keys=[] → one global partition (reference keyless windows)."""
    source = write_f1_source(tmp_path, name="kl_src")
    view = DerivedFeatureView(
        name="kl_view",
        source=source,
        features=[
            Feature("running_total", transform=OverWindowTransform("cost", "SUM")),
            Feature("rank_overall", transform=OverWindowTransform("cost", "ROW_NUMBER")),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas().sort_values("time").reset_index(drop=True)
    assert df["running_total"].tolist() == [100, 500, 800, 1000, 1500, 2100]
    assert df["rank_overall"].tolist() == [1, 2, 3, 4, 5, 6]


def test_expression_group_by_key_sliding(client, tmp_path):
    """A pre-sliding expression feature used as the sliding group key
    (reference: 'expression group-by keys' sliding tests)."""
    source = write_f1_source(tmp_path, name="eg_src")
    view = SlidingFeatureView(
        name="eg_view",
        source=source,
        features=[
            Feature("cost_band", transform="CASE WHEN cost >= 400 THEN 'high' ELSE 'low' END"),
            Feature(
                "band_total",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=3),
                    step_size=timedelta(days=3), group_by_keys=["cost_band"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    by_band = df.groupby("cost_band")["band_total"].sum().to_dict()
    # high: 400+500+600=1500; low: 100+300+200=600
    assert by_band == {"high": 1500, "low": 600}
    assert "cost_band" in df.columns  # group key IS in the output


def test_two_window_descriptors_one_view(client, tmp_path):
    """Different group keys in one view → two window groups, both correct."""
    source = write_f1_source(tmp_path, name="two_src")
    view = DerivedFeatureView(
        name="two_view",
        source=source,
        features=[
            Feature("per_name", transform=OverWindowTransform("cost", "SUM", group_by_keys=["name"])),
            Feature("global_sum", transform=OverWindowTransform("cost", "SUM")),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas().sort_values("time").reset_index(drop=True)
    assert df["per_name"].tolist() == [100, 400, 400, 600, 500, 1000]
    assert df["global_sum"].tolist() == [100, 500, 800, 1000, 1500, 2100]


def test_json_roundtrip_nested_view(client, tmp_path):
    """A SlidingFeatureView over a DerivedFeatureView round-trips through
    the JSON codec with identical results."""
    import json

    from feathub_spark.registries.json_codec import (
        descriptor_from_json,
        descriptor_to_json,
    )

    source = write_f1_source(tmp_path, name="nest_src")
    inner = DerivedFeatureView(
        name="nest_inner",
        source=source,
        features=[Feature("total", transform="cost + distance")],
        keep_source_fields=True,
    )
    outer = SlidingFeatureView(
        name="nest_outer",
        source=inner,
        features=[
            Feature(
                "sum_total",
                transform=SlidingWindowTransform(
                    "total", "SUM", window_size=timedelta(days=2),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
    )
    client.build_features([source, inner])
    built = client.build_features([outer])[0]
    a = client.get_features(built).to_pandas()

    restored = descriptor_from_json(json.loads(json.dumps(descriptor_to_json(built))))
    rebuilt = client.build_features([restored])[0]
    b = client.get_features(rebuilt).to_pandas()
    cols = sorted(a.columns)
    assert a[cols].sort_values(cols).reset_index(drop=True).equals(
        b[cols].sort_values(cols).reset_index(drop=True)
    )


def test_division_null_semantics(client, tmp_path):
    """Non-ANSI mode: x/0 is NULL, map[missing] is NULL (reference
    NULL-on-error semantics)."""
    source = write_f1_source(tmp_path, name="div_src")
    view = DerivedFeatureView(
        name="div_view",
        source=source,
        features=[
            Feature("div0", transform="cost / (cost - cost)"),
            Feature("missing_key", transform="MAP('a', 1)['nope']"),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert df["div0"].isna().all()
    assert df["missing_key"].isna().all()
