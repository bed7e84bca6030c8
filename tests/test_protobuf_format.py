"""Protobuf wire-format codec + filesystem source/sink round trips
(reference feature_tables/format_config.py:23; wire format per
https://protobuf.dev/programming-guides/encoding/)."""

import datetime as dt
import os

import pytest

from feathub_spark.common import types as t
from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.protowire import (
    build_field_specs,
    decode_delimited,
    decode_message,
    encode_delimited,
    encode_row,
    parse_field_numbers_prop,
    read_varint,
    write_varint,
)
from feathub_spark.table.schema import Schema


def test_varint_round_trip():
    for v in [0, 1, 127, 128, 300, 2**31, 2**63 - 1, -1, -2**63]:
        buf = bytearray()
        write_varint(buf, v)
        decoded, pos = read_varint(bytes(buf), 0)
        assert decoded == v and pos == len(buf)


def test_known_wire_bytes():
    # protobuf.dev encoding guide example: field 1 varint 150 -> 08 96 01
    schema = Schema(["a"], [t.Int32])
    specs = build_field_specs(schema)
    assert encode_row({"a": 150}, specs) == bytes([0x08, 0x96, 0x01])
    # field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
    schema2 = Schema(["b"], [t.String])
    specs2 = build_field_specs(schema2, {"b": 2})
    assert encode_row({"b": "testing"}, specs2) == bytes(
        [0x12, 0x07]
    ) + b"testing"


SCHEMA = Schema(
    ["id", "name", "score", "flag", "ratio", "tags", "weights", "attrs", "ts", "blob"],
    [
        t.Int64,
        t.String,
        t.Float64,
        t.Bool,
        t.Float32,
        t.VectorType(t.String),
        t.VectorType(t.Float64),
        t.MapType(t.String, t.Int64),
        t.Timestamp,
        t.Bytes,
    ],
)

ROWS = [
    {
        "id": 7,
        "name": "alpha",
        "score": 1.5,
        "flag": True,
        "ratio": 0.25,
        "tags": ["x", "y"],
        "weights": [1.0, -2.5],
        "attrs": {"a": 1, "b": -3},
        "ts": dt.datetime(2024, 1, 2, 3, 4, 5),
        "blob": b"\x00\xff",
    },
    {
        "id": -42,
        "name": "",
        "score": None,
        "flag": False,
        "ratio": None,
        "tags": None,
        "weights": [],
        "attrs": None,
        "ts": None,
        "blob": None,
    },
]


def test_message_round_trip():
    specs = build_field_specs(SCHEMA)
    for row in ROWS:
        decoded = decode_message(encode_row(row, specs), specs)
        for k, v in row.items():
            got = decoded[k]
            if v is None or (isinstance(v, list) and not v):
                # NULLs and empty repeated fields are absent on the wire
                assert got is None, k
            elif k == "ratio":
                assert got == pytest.approx(v)
            else:
                assert got == v, k


def test_delimited_stream_and_unknown_fields():
    specs = build_field_specs(SCHEMA)
    payload = encode_delimited(ROWS, specs)
    decoded = list(decode_delimited(payload, specs))
    assert len(decoded) == 2 and decoded[0]["name"] == "alpha"
    # decoding with a narrower schema skips unknown fields by wire type
    narrow = Schema(["id", "score"], [t.Int64, t.Float64])
    nspecs = build_field_specs(narrow, {"id": 1, "score": 3})
    rows = list(decode_delimited(payload, nspecs))
    assert rows[0] == {"id": 7, "score": 1.5}


def test_field_number_props():
    assert parse_field_numbers_prop("a:1, b:3") == {"a": 1, "b": 3}
    with pytest.raises(FeathubError):
        build_field_specs(Schema(["a", "b"], [t.Int64, t.Int64]), {"a": 2, "b": 2})


def test_filesystem_sink_source_round_trip(spark, tmp_path):
    from feathub_spark import FileSystemSource
    from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
    from feathub_spark.processors.spark.source_sink_utils import (
        get_source_dataframe,
        insert_into_sink,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1.0, 2.0], {"k": 10}),
            (2, "b", -0.5, [], None),
            (3, None, None, None, {"x": -1, "y": 2}),
        ],
        "id bigint, name string, score double, emb array<double>, m map<string,bigint>",
    ).repartition(2)
    path = os.path.join(str(tmp_path), "pb_out")
    insert_into_sink(df, FileSystemSink(path, "protobuf"))
    files = [f for f in os.listdir(path) if f.endswith(".pb")]
    assert files, "expected part-*.pb files"

    source = FileSystemSource(
        name="pb_src",
        path=path,
        data_format="protobuf",
        schema=Schema(
            ["id", "name", "score", "emb", "m"],
            [t.Int64, t.String, t.Float64, t.VectorType(t.Float64),
             t.MapType(t.String, t.Int64)],
        ),
        keys=["id"],
    )
    back = get_source_dataframe(spark, source)
    got = {r["id"]: r.asDict() for r in back.collect()}
    assert got[1]["name"] == "a" and got[1]["emb"] == [1.0, 2.0]
    assert got[1]["m"] == {"k": 10}
    assert got[2]["score"] == -0.5 and got[2]["emb"] is None
    assert got[3]["name"] is None and got[3]["m"] == {"x": -1, "y": 2}


def test_protobuf_source_in_feature_view(spark, tmp_path):
    """End to end through the planner: protobuf source -> expression view."""
    from feathub_spark import (
        DerivedFeatureView,
        Feature,
        FeathubClient,
        FileSystemSource,
    )
    from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
    from feathub_spark.processors.spark.source_sink_utils import insert_into_sink

    src_df = spark.createDataFrame(
        [(1, 10.0, "2022-01-01 00:00:01"), (2, 20.0, "2022-01-01 00:00:02")],
        "k bigint, v double, time string",
    )
    path = os.path.join(str(tmp_path), "pb_feat")
    insert_into_sink(src_df, FileSystemSink(path, "protobuf"))

    client = FeathubClient(spark)
    source = FileSystemSource(
        name="pb_feat_src",
        path=path,
        data_format="protobuf",
        schema=Schema(["k", "v", "time"], [t.Int64, t.Float64, t.String]),
        keys=["k"],
        timestamp_field="time",
        timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = DerivedFeatureView(
        name="pb_view",
        source=source,
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    built = client.build_features([source, view])[-1]
    pdf = client.get_features(built).to_pandas().sort_values("k")
    assert list(pdf["v2"]) == [20.0, 40.0]


def test_kafka_value_protobuf_decode(spark):
    from feathub_spark.processors.spark.protobuf_io import decode_protobuf_column

    schema = Schema(["k", "v"], [t.Int64, t.String])
    specs = build_field_specs(schema)
    msgs = [encode_row({"k": i, "v": f"m{i}"}, specs) for i in range(3)]
    raw = spark.createDataFrame([(m,) for m in msgs], "value binary")
    out = decode_protobuf_column(raw, "value", schema)
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        (0, "m0"), (1, "m1"), (2, "m2"),
    ]


# ---------------------------------------------------------------------------
# randomized round-trip fuzz (hypothesis)
# ---------------------------------------------------------------------------

import math as _math

from hypothesis import given, settings
from hypothesis import strategies as st

_f32 = st.floats(width=32, allow_nan=True, allow_infinity=True)
_f64 = st.floats(allow_nan=True, allow_infinity=True)
_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_text = st.text(max_size=20)
_row_strategy = st.fixed_dictionaries(
    {
        "id": st.one_of(st.none(), _i64),
        "name": st.one_of(st.none(), _text),
        "score": st.one_of(st.none(), _f64),
        "flag": st.one_of(st.none(), st.booleans()),
        "ratio": st.one_of(st.none(), _f32),
        "tags": st.one_of(st.none(), st.lists(_text, max_size=5)),
        "weights": st.one_of(st.none(), st.lists(_f64, max_size=5)),
        "attrs": st.one_of(
            st.none(), st.dictionaries(_text, _i64, max_size=4)
        ),
        "ts": st.one_of(
            st.none(),
            st.datetimes(
                min_value=dt.datetime(1970, 1, 2),
                max_value=dt.datetime(2200, 1, 1),
            ),
        ),
        "blob": st.one_of(st.none(), st.binary(max_size=32)),
    }
)


def _fuzz_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (_math.isnan(a) and _math.isnan(b)) or a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_fuzz_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=200, deadline=None)
@given(row=_row_strategy)
def test_message_round_trip_fuzz(row):
    """Any schema-conformant value round-trips the wire codec exactly —
    full-range int64 (zigzag varints), float32/64 incl. NaN/inf, unicode
    strings, bytes, repeated and map fields, microsecond timestamps.
    NULLs and empty containers are absent on the wire and decode as None
    (proto3 presence semantics)."""
    specs = build_field_specs(SCHEMA)
    decoded = decode_message(encode_row(row, specs), specs)
    for k, v in row.items():
        got = decoded[k]
        if v is None or (isinstance(v, (list, dict)) and not v):
            assert got is None, k
        else:
            assert _fuzz_eq(got, v), (k, v, got)
