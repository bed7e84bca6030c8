"""Validation behavior parity: the rejections the reference enforces."""

from datetime import timedelta

import pytest

from feathub_spark import (
    DerivedFeatureView,
    Feature,
    KafkaSource,
    Schema,
    SlidingFeatureView,
)
from feathub_spark.common import types as t
from feathub_spark.common.exceptions import FeathubError, PlanError
from feathub_spark.feature_views.transforms import SlidingWindowTransform
from feathub_spark.table.schema import Schema as Schema2

from tests.fixtures import write_f1_source


def test_bounded_left_unbounded_right_join_rejected(client, tmp_path):
    """Reference flink_table_builder.py:383-397."""
    source = write_f1_source(tmp_path)
    kafka = KafkaSource(
        name="unbounded_right",
        bootstrap_server="localhost:9092",
        topic="t",
        schema=Schema(["name", "avg_cost", "time"], [t.String, t.Float64, t.Int64]),
        keys=["name"],
        timestamp_field="time",
        timestamp_format="epoch",
        is_bounded=False,
    )
    view = DerivedFeatureView(
        name="reject_join_view",
        source=source,
        features=["unbounded_right.avg_cost"],
        keep_source_fields=True,
    )
    client.build_features([kafka])
    client.build_features([source, view])
    with pytest.raises(PlanError, match="unbounded"):
        client.get_features(view)


def test_sliding_mixed_steps_rejected(tmp_path, client):
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="mixed_steps",
        source=source,
        features=[
            Feature("a", transform=SlidingWindowTransform(
                "cost", "SUM", window_size=timedelta(days=1), step_size=timedelta(days=1))),
            Feature("b", transform=SlidingWindowTransform(
                "cost", "SUM", window_size=timedelta(days=2), step_size=timedelta(hours=12))),
        ],
    )
    with pytest.raises(FeathubError, match="share step_size"):
        client.build_features([source, view])


def test_sliding_emission_config_rejected():
    with pytest.raises(FeathubError, match="skip_same_window_output"):
        SlidingFeatureView(
            name="bad_config",
            source="x",
            features=[],
            enable_empty_window_output=False,
            skip_same_window_output=True,
        )


def test_zero_window_mismatch_rejected():
    with pytest.raises(FeathubError, match="both"):
        SlidingWindowTransform(
            "v", "SUM", window_size=timedelta(0), step_size=timedelta(days=1)
        )
    with pytest.raises(FeathubError, match="multiple"):
        SlidingWindowTransform(
            "v", "SUM", window_size=timedelta(hours=5), step_size=timedelta(hours=2)
        )


def test_reserved_field_names_rejected():
    with pytest.raises(FeathubError, match="reserved"):
        Schema2(["__bad__"], [t.Int64])


def test_post_sliding_dependency_rejected(client, tmp_path):
    """Post-sliding features may only use window_time, sliding features and
    group keys (reference sliding_feature_view.py:490-523)."""
    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="bad_post",
        source=source,
        features=[
            Feature("s", transform=SlidingWindowTransform(
                "cost", "SUM", window_size=timedelta(days=1),
                step_size=timedelta(days=1), group_by_keys=["name"])),
            Feature("bad", transform="s + distance"),
        ],
    )
    with pytest.raises(FeathubError, match="distance"):
        client.build_features([source, view])


def test_udf_requires_declared_dtype(client, tmp_path):
    from feathub_spark.feature_views.transforms import PythonUdfTransform

    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="udf_no_dtype",
        source=source,
        features=[Feature("u", transform=PythonUdfTransform(lambda r: 1))],
        keep_source_fields=True,
    )
    with pytest.raises(FeathubError, match="dtype"):
        client.build_features([source, view])
