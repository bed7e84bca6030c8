"""JSON ser/de for descriptors.

The reference registry round-trips every descriptor through JSON (its IT
base wraps the registry to prove it, feathub_it_test_base.py:59-95; the
MySQL registry persists the same JSON).  This codec covers the declarative
surface: schemas, dtypes, features, expression/join/window transforms, file
and datagen sources, derived/sliding/sql feature views.  Python UDF
transforms are not JSON-serializable (same restriction as the reference).
"""

from __future__ import annotations

from datetime import timedelta
from typing import Any, Dict

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.time_utils import timedelta_ms
from feathub_spark.table.schema import Schema
from feathub_spark.common.types import dtype_from_json


def descriptor_to_json(d) -> Dict[str, Any]:
    from feathub_spark.feature_tables.sources.datagen_source import (
        DataGenSource,
        RandomField,
        SequenceField,
    )
    from feathub_spark.feature_tables.sources.file_system_source import (
        FileSystemSource,
    )
    from feathub_spark.feature_views.derived_feature_view import DerivedFeatureView
    from feathub_spark.feature_views.sliding_feature_view import SlidingFeatureView
    from feathub_spark.feature_views.sql_feature_view import SqlFeatureView

    base = {
        "name": d.name,
        "keys": d.keys,
        "timestamp_field": d.timestamp_field,
        "timestamp_format": d.timestamp_format,
    }
    if isinstance(d, FileSystemSource):
        return {
            **base,
            "type": "FileSystemSource",
            "path": d.path,
            "data_format": d.data_format,
            "schema": d.schema.to_json() if d.schema else None,
            "schema_declared": d.schema_declared,
            # timedelta_ms does exact integer math (total_seconds()*1000
            # truncates: timedelta(milliseconds=1001) -> 1000)
            "max_out_of_orderness_ms": timedelta_ms(d.max_out_of_orderness),
            "data_format_props": d.data_format_props,
        }
    if isinstance(d, DataGenSource):
        fields = {}
        for fname, fc in d.field_configs.items():
            if isinstance(fc, SequenceField):
                fields[fname] = {"kind": "sequence", "start": fc.start, "end": fc.end}
            else:
                fields[fname] = {
                    "kind": "random", "minv": fc.minv, "maxv": fc.maxv,
                    "length": fc.length,
                }
        return {
            **base,
            "type": "DataGenSource",
            "schema": d.schema.to_json(),
            "number_of_rows": d.number_of_rows,
            "rows_per_second": d.rows_per_second,
            "field_configs": fields,
            "seed": d.seed,
        }
    if isinstance(d, SlidingFeatureView):
        return {
            **base,
            "type": "SlidingFeatureView",
            "source": descriptor_to_json(d.get_resolved_source())
            if not isinstance(d.source, str)
            else d.source,
            "features": [_feature_to_json(f) for f in d.features],
            "filter_expr": d.filter_expr,
            "enable_empty_window_output": d.enable_empty_window_output,
            "skip_same_window_output": d.skip_same_window_output,
        }
    if isinstance(d, DerivedFeatureView):
        return {
            **base,
            "type": "DerivedFeatureView",
            "source": descriptor_to_json(d.source)
            if not isinstance(d.source, str)
            else d.source,
            "features": [_feature_to_json(f) for f in d.features],
            "keep_source_fields": d.keep_source_fields,
            "filter_expr": d.filter_expr,
        }
    if isinstance(d, SqlFeatureView):
        return {
            **base,
            "type": "SqlFeatureView",
            "sql_statement": d.sql_statement,
            "schema": d.schema.to_json(),
            "is_bounded": d.is_bounded(),
        }
    raise FeathubError(f"JSON codec does not support {type(d).__name__}.")


def _feature_to_json(f) -> Dict[str, Any]:
    from feathub_spark.feature_views.transforms.python_udf_transform import (
        PythonUdfTransform,
    )

    if isinstance(f, str):
        return {"ref": f}
    if isinstance(f.transform, PythonUdfTransform):
        # serialization would SUCCEED (to_json renders the repr) but
        # deserialization cannot rebuild the callable — persisting it
        # poisons the registry: the next _load_all fails on this record
        # and every pending table behind it.  Raising here keeps the view
        # session-only (build_features' try/except skips persistence).
        raise FeathubError(
            "PythonUdfTransform features are not JSON-serializable; the "
            "view stays session-only."
        )
    return {
        "name": f.name,
        "dtype": f.dtype.to_json() if f.dtype is not None else None,
        "keys": f.keys,
        "transform": f.transform.to_json(),
        "description": f.description,
        "metrics": [_metric_to_json(m) for m in getattr(f, "metrics", [])],
    }


def _metric_to_json(m) -> Dict[str, Any]:
    out = {
        "metric_type": m.metric_type,
        "window_size_ms": timedelta_ms(m.window_size),
    }
    if hasattr(m, "filter_expr"):
        out["filter_expr"] = m.filter_expr
    if hasattr(m, "expr"):
        out["expr"] = m.expr
    return out


def _metric_from_json(obj: Dict[str, Any]):
    from feathub_spark.metric_stores.metric import Average, Count, CountMap, Ratio

    w = timedelta(milliseconds=obj.get("window_size_ms", 0))
    kind = obj["metric_type"]
    if kind == "count":
        return Count(filter_expr=obj.get("filter_expr"), window_size=w)
    if kind == "ratio":
        return Ratio(expr=obj["expr"], window_size=w)
    if kind == "average":
        return Average(window_size=w)
    if kind == "count_map":
        return CountMap(window_size=w)
    raise FeathubError(f"Unknown metric type {kind!r} in registry JSON.")


def _feature_from_json(obj: Dict[str, Any]):
    from feathub_spark.feature_views.feature import Feature

    if "ref" in obj:
        return obj["ref"]
    return Feature(
        obj["name"],
        transform=_transform_from_json(obj["transform"]),
        dtype=dtype_from_json(obj["dtype"]) if obj.get("dtype") else None,
        keys=obj.get("keys"),
        description=obj.get("description", ""),
        metrics=[_metric_from_json(m) for m in obj.get("metrics", [])],
    )


def _transform_from_json(obj: Dict[str, Any]):
    from feathub_spark.feature_views.transforms.expression_transform import (
        ExpressionTransform,
    )
    from feathub_spark.feature_views.transforms.join_transform import JoinTransform
    from feathub_spark.feature_views.transforms.over_window_transform import (
        OverWindowTransform,
    )
    from feathub_spark.feature_views.transforms.sliding_window_transform import (
        SlidingWindowTransform,
    )

    kind = obj["type"]
    if kind == "ExpressionTransform":
        return ExpressionTransform(obj["expr"])
    if kind == "JoinTransform":
        return JoinTransform(obj["table_name"], obj["feature_name"], obj.get("map_key"))
    if kind == "OverWindowTransform":
        return OverWindowTransform(
            obj["expr"],
            obj["agg_func"],
            window_size=(
                timedelta(milliseconds=obj["window_size_ms"])
                if obj.get("window_size_ms") is not None
                else None
            ),
            group_by_keys=obj.get("group_by_keys", []),
            filter_expr=obj.get("filter_expr"),
            limit=obj.get("limit"),
        )
    if kind == "SlidingWindowTransform":
        return SlidingWindowTransform(
            obj["expr"],
            obj["agg_func"],
            window_size=timedelta(milliseconds=obj["window_size_ms"]),
            step_size=timedelta(milliseconds=obj["step_size_ms"]),
            group_by_keys=obj.get("group_by_keys", []),
            filter_expr=obj.get("filter_expr"),
            limit=obj.get("limit"),
        )
    raise FeathubError(f"Cannot deserialize transform {kind!r}.")


def descriptor_from_json(obj: Dict[str, Any]):
    from feathub_spark.feature_tables.sources.datagen_source import (
        DataGenSource,
        RandomField,
        SequenceField,
    )
    from feathub_spark.feature_tables.sources.file_system_source import (
        FileSystemSource,
    )
    from feathub_spark.feature_views.derived_feature_view import DerivedFeatureView
    from feathub_spark.feature_views.sliding_feature_view import SlidingFeatureView
    from feathub_spark.feature_views.sql_feature_view import SqlFeatureView

    kind = obj["type"]
    if kind == "FileSystemSource":
        src = FileSystemSource(
            name=obj["name"],
            path=obj["path"],
            data_format=obj["data_format"],
            schema=Schema.from_json(obj["schema"]) if obj.get("schema") else None,
            keys=obj.get("keys"),
            timestamp_field=obj.get("timestamp_field"),
            timestamp_format=obj.get("timestamp_format", "epoch"),
            max_out_of_orderness=timedelta(
                milliseconds=obj.get("max_out_of_orderness_ms", 0)
            ),
            data_format_props=obj.get("data_format_props"),
        )
        src.schema_declared = obj.get("schema_declared", src.schema is not None)
        return src
    if kind == "DataGenSource":
        fields = {}
        for fname, fc in obj.get("field_configs", {}).items():
            if fc["kind"] == "sequence":
                fields[fname] = SequenceField(fc["start"], fc["end"])
            else:
                fields[fname] = RandomField(fc["minv"], fc["maxv"], fc["length"])
        return DataGenSource(
            name=obj["name"],
            schema=Schema.from_json(obj["schema"]),
            number_of_rows=obj.get("number_of_rows"),
            rows_per_second=obj.get("rows_per_second", 1000),
            field_configs=fields,
            keys=obj.get("keys"),
            timestamp_field=obj.get("timestamp_field"),
            timestamp_format=obj.get("timestamp_format", "epoch"),
            seed=obj.get("seed", 42),
        )
    if kind == "DerivedFeatureView":
        source = obj["source"]
        return DerivedFeatureView(
            name=obj["name"],
            source=source if isinstance(source, str) else descriptor_from_json(source),
            features=[_feature_from_json(f) for f in obj["features"]],
            keep_source_fields=obj.get("keep_source_fields", False),
            filter_expr=obj.get("filter_expr"),
        )
    if kind == "SlidingFeatureView":
        source = obj["source"]
        return SlidingFeatureView(
            name=obj["name"],
            source=source if isinstance(source, str) else descriptor_from_json(source),
            features=[_feature_from_json(f) for f in obj["features"]],
            timestamp_field=obj.get("timestamp_field", "window_time"),
            timestamp_format=obj.get("timestamp_format", "epoch_millis"),
            filter_expr=obj.get("filter_expr"),
            enable_empty_window_output=obj.get("enable_empty_window_output", True),
            skip_same_window_output=obj.get("skip_same_window_output", True),
        )
    if kind == "SqlFeatureView":
        return SqlFeatureView(
            name=obj["name"],
            sql_statement=obj["sql_statement"],
            schema=Schema.from_json(obj["schema"]),
            keys=obj.get("keys"),
            timestamp_field=obj.get("timestamp_field"),
            timestamp_format=obj.get("timestamp_format", "epoch"),
            is_bounded=obj.get("is_bounded", True),
        )
    raise FeathubError(f"Cannot deserialize descriptor {kind!r}.")
