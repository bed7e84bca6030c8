"""Regression pins for the round-11 second review batch (dsl /
feature_views / join_utils / json_codec findings)."""

from datetime import timedelta

import pandas as pd
import pytest

from feathub_spark import DerivedFeatureView, Feature, Float64, Int64

from tests.fixtures import write_f1_source


def test_udf_feature_not_persisted_and_registry_stays_loadable(tmp_path):
    """PythonUdfTransform serialization must FAIL (not round-trip into a
    poison record): a registry holding a UDF view reloads cleanly with
    the serializable tables intact and the UDF view session-only."""
    import sqlite3

    from feathub_spark.common.exceptions import FeathubError
    from feathub_spark.feature_views.transforms.python_udf_transform import (
        PythonUdfTransform,
    )
    from feathub_spark.registries.json_codec import descriptor_to_json
    from feathub_spark.registries.sql_registry import SqlRegistry
    from tests.fixtures import write_f1_source as _w

    src = _w(tmp_path)
    udf_view = DerivedFeatureView(
        name="udfv",
        source=src,
        features=[
            Feature("u", transform=PythonUdfTransform(lambda r: 1), dtype=Int64)
        ],
        keep_source_fields=True,
    )
    with pytest.raises(FeathubError):
        descriptor_to_json(udf_view)

    db = str(tmp_path / "reg.db")
    reg = SqlRegistry(lambda: sqlite3.connect(db))
    reg.build_features([src, udf_view])
    reg.close()
    # a fresh registry over the same DB must load without error: the UDF
    # view was kept session-only, the source persisted
    reg2 = SqlRegistry(lambda: sqlite3.connect(db))
    assert src.name in reg2._tables
    assert "udfv" not in reg2._tables
    reg2.close()


def test_feature_metrics_survive_json_round_trip():
    from feathub_spark.metric_stores.metric import Average, Count
    from feathub_spark.registries.json_codec import (
        _feature_from_json,
        _feature_to_json,
    )

    f = Feature(
        "x",
        transform="`a` + 1",
        dtype=Int64,
        metrics=[
            Count(filter_expr="> 100", window_size=timedelta(hours=1)),
            Average(window_size=timedelta(minutes=5)),
        ],
    )
    back = _feature_from_json(_feature_to_json(f))
    assert [m.metric_type for m in back.metrics] == ["count", "average"]
    assert back.metrics[0].filter_expr == "> 100"
    assert back.metrics[0].window_size == timedelta(hours=1)
    assert back.metrics[1].window_size == timedelta(minutes=5)


def test_timedelta_ms_exact_integer_math():
    from feathub_spark.common.time_utils import timedelta_ms

    assert timedelta_ms(timedelta(milliseconds=1001)) == 1001
    assert timedelta_ms(timedelta(days=2, milliseconds=3)) == 2 * 86_400_000 + 3


def test_temporal_join_null_right_event_time_never_matches(spark):
    """A right row with NULL event time (unparseable timestamp) must not
    fill forward over early left rows."""
    from pyspark.sql import functions as F

    from feathub_spark.processors.spark.constants import EVENT_TIME_COL
    from feathub_spark.processors.spark.join_utils import temporal_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20)], "k long, t long"
    ).withColumn(EVENT_TIME_COL, F.timestamp_millis(F.col("t")))
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 15, 1.0)], "k long, rt long, v double"
    ).withColumn(EVENT_TIME_COL, F.timestamp_millis(F.col("rt")))
    out = {
        r["t"]: r["v"]
        for r in temporal_join(left, right, ["k"], {"v": "v"}).collect()
    }
    # t=10 precedes every VALID right row -> NULL, not the null-ts 99.0
    assert out[10] is None
    assert out[20] == 1.0


def test_sliding_view_rejects_unsupported_transform_with_dtype(client, tmp_path):
    """An OverWindowTransform inside a SlidingFeatureView must be
    rejected at build even when dtype is declared (it used to silently
    vanish from the output)."""
    from feathub_spark import SlidingFeatureView
    from feathub_spark.common.exceptions import RegistryError
    from feathub_spark.feature_views.transforms import (
        OverWindowTransform,
        SlidingWindowTransform,
    )

    source = write_f1_source(tmp_path)
    view = SlidingFeatureView(
        name="svx",
        source=source,
        features=[
            Feature(
                "bad",
                transform=OverWindowTransform(
                    "cost", "SUM", group_by_keys=["name"]
                ),
                dtype=Float64,
            ),
            Feature(
                "s",
                transform=SlidingWindowTransform(
                    "cost", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["name"],
                ),
            ),
        ],
    )
    with pytest.raises(RegistryError):
        client.build_features([source, view])


def test_derived_view_self_qualified_feature_resolves(client, tmp_path):
    """'{source_name}.{feature}' referencing the view's own source must
    resolve like the bare feature name (reference parity)."""
    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="selfq",
        source=source,
        features=[f"{source.name}.cost"],
        keep_source_fields=False,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert "cost" in df.columns and len(df) == 6


def test_derived_view_validates_refs_with_declared_dtype(client, tmp_path):
    """A typo'd column reference must fail at BUILD time with a clear
    error even when dtype is declared (derivation used to be skipped and
    the failure surfaced as a plan-time AnalysisException)."""
    from feathub_spark.common.exceptions import RegistryError

    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="typo",
        source=source,
        features=[Feature("y", transform="`typo_col` + 1", dtype=Int64)],
        keep_source_fields=True,
    )
    with pytest.raises(RegistryError, match="typo_col"):
        client.build_features([source, view])


def test_dsl_double_quoted_strings(spark):
    """Reference lexer parity: both quote styles are legal string
    literals."""
    from feathub_spark.dsl.parser import parse_expr, to_spark_sql

    ast = parse_expr('CASE WHEN `name` = "abc" THEN 1 ELSE 0 END')
    sql = to_spark_sql('CASE WHEN `name` = "abc" THEN 1 ELSE 0 END')
    df = spark.createDataFrame([("abc",), ("x",)], "name string")
    from pyspark.sql import functions as F

    vals = [r["m"] for r in df.select(F.expr(sql).alias("m")).collect()]
    assert vals == [1, 0]
    assert ast is not None
