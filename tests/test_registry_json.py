"""Descriptor JSON round-trips and the persistent FileRegistry."""

from datetime import timedelta

from feathub_spark import DerivedFeatureView, Feature, SlidingFeatureView, SparkProcessor
from feathub_spark.feature_views.transforms import (
    OverWindowTransform,
    SlidingWindowTransform,
)
from feathub_spark.registries.json_codec import (
    descriptor_from_json,
    descriptor_to_json,
)
from feathub_spark.registries.registry import FileRegistry

from tests.fixtures import write_f1_source


def _views(source):
    derived = DerivedFeatureView(
        name="rt_derived",
        source=source,
        features=[
            Feature("total", transform="cost + distance"),
            Feature(
                "avg_cost",
                transform=OverWindowTransform(
                    "cost", "AVG", window_size=timedelta(days=2),
                    group_by_keys=["name"], filter_expr="cost > 100", limit=3,
                ),
            ),
        ],
        keep_source_fields=True,
        filter_expr="cost > 50",
    )
    sliding = SlidingFeatureView(
        name="rt_sliding",
        source=source,
        features=[
            Feature(
                "sum_cost",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=2),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
    )
    return derived, sliding


def test_descriptor_json_roundtrip_produces_same_results(client, tmp_path):
    source = write_f1_source(tmp_path)
    derived, sliding = _views(source)
    client.build_features([source])
    built = client.build_features([derived, sliding])

    for original in built:
        obj = descriptor_to_json(original)
        import json

        restored = descriptor_from_json(json.loads(json.dumps(obj)))
        rebuilt = client.build_features([restored])[0]
        a = (
            client.get_features(original)
            .to_pandas()
            .sort_values(list(client.get_features(original).to_pandas().columns))
            .reset_index(drop=True)
        )
        b = (
            client.get_features(rebuilt)
            .to_pandas()
            .sort_values(list(a.columns))
            .reset_index(drop=True)
        )
        assert a.equals(b), f"round-trip changed results for {original.name}"


def test_file_registry_persistence(spark, tmp_path):
    reg_dir = str(tmp_path / "registry")
    source = write_f1_source(tmp_path)
    derived, _ = _views(source)

    reg1 = FileRegistry(reg_dir)
    proc1 = SparkProcessor(spark, reg1)
    reg1.build_features([source, derived])
    expected = proc1.get_table(reg1.get_features("rt_derived")).to_pandas()

    # a brand-new registry instance loads everything back from disk
    reg2 = FileRegistry(reg_dir)
    proc2 = SparkProcessor(spark, reg2)
    restored = reg2.get_features("rt_derived")
    got = proc2.get_table(restored).to_pandas()
    cols = sorted(expected.columns)
    assert got[cols].sort_values(cols).reset_index(drop=True).equals(
        expected[cols].sort_values(cols).reset_index(drop=True)
    )
