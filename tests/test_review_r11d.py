"""Regression pins for the round-11 fourth review batch (processor
shell, skew probe, common utilities)."""

from datetime import timedelta

import pytest


def test_strftime_microseconds_parse_fully(spark):
    """%f maps to SSSSSS (1-6 fraction digits, Python parity) — the old
    SSS silently NULLed 6-digit microsecond data in non-ISO formats."""
    from pyspark.sql import functions as F

    from feathub_spark.common.time_utils import event_time_sql

    df = spark.createDataFrame(
        [("01/02/2024 00:00:00.123456",), ("01/02/2024 00:00:00.9",)],
        "t string",
    )
    sql = event_time_sql("t", "%m/%d/%Y %H:%M:%S.%f")
    vals = [r[0] for r in df.select(F.expr(sql)).collect()]
    assert all(v is not None for v in vals)
    assert vals[0].microsecond == 123456


def test_skew_probe_all_null_timestamps_fall_back(spark):
    """An all-NULL probed time column must return 'no salting', not
    abort the compile with int(None)."""
    from pyspark.sql import functions as F

    from feathub_spark.processors.spark.skew_probe import decide_salt_chunk_ms

    df = spark.createDataFrame(
        [("k", None)] * 50, "k string, ts timestamp"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert (
        decide_salt_chunk_ms(df, ["k"], "ts", threshold=1.0, min_hot_rows=1)
        is None
    )


def test_salt_chunk_bool_spec_rejected(spark):
    """salt_chunk_ms=True must raise the bad-spec error, not silently
    compile a pathological 1ms-chunk plan (bool is an int subclass)."""
    from feathub_spark.processors.spark.skew_probe import resolve_salt_chunk_ms

    df = spark.createDataFrame([("k", 1)], "k string, v long")
    with pytest.raises(ValueError):
        resolve_salt_chunk_ms(True, df, ["k"], "v")


def test_protowire_map_entry_defaults_and_wire_mismatch():
    """A map entry omitting its default-valued key/value decodes to the
    proto3 default (never a None map key), and a wire-type/dtype
    mismatch raises instead of desynchronizing the parse."""
    from feathub_spark.common import types as t
    from feathub_spark.common.exceptions import FeathubError
    from feathub_spark.common.protowire import (
        FieldSpec,
        decode_message,
        encode_row,
    )

    mt = t.MapType(t.Int64, t.Float64)
    specs = [FieldSpec("m", 1, mt)]
    # entry with key omitted (key = 0): field 2 (double 1.5) only
    import struct

    entry = b"\x11" + struct.pack("<d", 1.5)  # tag(2,fixed64) + value
    buf = b"\x0a" + bytes([len(entry)]) + entry  # tag(1,len) + entry
    row = decode_message(buf, specs)
    assert row["m"] == {0: 1.5}

    # wire mismatch: declared int64 but encoded as fixed64
    specs2 = [FieldSpec("x", 1, t.Int64)]
    bad = b"\x09" + struct.pack("<d", 2.0)  # tag(1,fixed64)
    with pytest.raises(FeathubError, match="wire type"):
        decode_message(bad, specs2)
    # round-trip still clean
    enc = encode_row({"m": {3: 0.5}}, specs)
    assert decode_message(enc, specs)["m"] == {3: 0.5}


def test_skew_probe_cache_survives_across_get_table(spark, tmp_path):
    """The processor owns the probe memoization, so two get_table calls
    over the same descriptor run ONE probe job ('pay once')."""
    from feathub_spark import DerivedFeatureView, Feature, Float64
    from feathub_spark.feature_views.transforms import OverWindowTransform
    from feathub_spark.processors.spark.spark_processor import SparkProcessor
    from tests.fixtures import write_f1_source

    source = write_f1_source(tmp_path)
    view = DerivedFeatureView(
        name="probe_cache_view",
        source=source,
        features=[
            Feature(
                "s",
                transform=OverWindowTransform(
                    "cost", "SUM", group_by_keys=["name"]
                ),
                dtype=Float64,
            )
        ],
        keep_source_fields=True,
    )
    proc = SparkProcessor(spark, over_window_salt_chunk_ms="auto")
    built = proc.registry.build_features([source, view])
    proc.get_table(built[1]).to_pandas()
    assert len(proc._skew_probe_cache) >= 1
    before = dict(proc._skew_probe_cache)
    proc.get_table(built[1]).to_pandas()
    # same entries, nothing re-probed under a new key
    assert set(proc._skew_probe_cache) == set(before)


def test_release_caches_concurrent_threads():
    """Concurrent release_caches() calls (one per streaming query's
    foreachBatch thread) must not race the registries."""
    import threading

    from feathub_spark.common import caching

    class _FakeDF:
        def unpersist(self):
            return self

    with caching._LOCK:
        pass  # lock exists and is acquirable
    for _ in range(200):
        caching._ACTIVE.append(_FakeDF())
    errs = []

    def worker():
        try:
            caching.release_caches()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs and not caching._ACTIVE
