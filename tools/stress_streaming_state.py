"""Streaming state-size stress for the applyInPandasWithState operators.

docs/SCALE.md pins the sliding operator's measured number (100k events /
1,500 keys / shared 1d+7d windows); this tool re-runs that shape at an
arbitrary scale so the claim "state per key is bounded by max_window /
avg-interval rows, runtime grows linearly in event count" stays a
measurement, not an assertion.  The round-8 10x run (1M events, same key
count, ~10x denser per-key history) is recorded next to the original
number in SCALE.md.

Usage: python tools/stress_streaming_state.py [scale]   # default 10
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = 1_500
SPAN_S = 30 * 86_400  # events spread over 30 days


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_events = 100_000 * scale

    from pyspark.sql import functions as F

    from feathub_spark import (
        FileSystemSource,
        Int64,
        Schema,
        SlidingFeatureView,
        SparkProcessor,
        String,
        default_spark_session,
    )
    from feathub_spark.feature_views.feature import Feature
    from feathub_spark.feature_views.transforms import SlidingWindowTransform

    spark = default_spark_session("stress_streaming_state", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="stress_stream_")
    in_dir = os.path.join(workdir, "events")
    try:
        # deterministic scatter of timestamps (id * prime mod span) so every
        # trigger touches most keys and history stays dense
        spark.range(n_events).select(
            (F.col("id") % KEYS).cast("string").alias("k"),
            (F.col("id") % 100).alias("cost"),
            (F.col("id") * 1_000_003 % SPAN_S).alias("t"),
        ).coalesce(8).write.parquet(in_dir)

        schema = (
            Schema.new_builder()
            .column("k", String)
            .column("cost", Int64)
            .column("t", Int64)
            .build()
        )
        source = FileSystemSource(
            name="stress_stream_src",
            path=in_dir,
            data_format="parquet",
            schema=schema,
            keys=["k"],
            timestamp_field="t",
            timestamp_format="epoch",
            max_out_of_orderness=timedelta(seconds=10),
        )
        view = SlidingFeatureView(
            name="stress_stream_view",
            source=source,
            features=[
                Feature(
                    "sum_1d",
                    transform=SlidingWindowTransform(
                        "cost", "SUM", window_size=timedelta(days=1),
                        step_size=timedelta(days=1), group_by_keys=["k"],
                    ),
                ),
                Feature(
                    "cnt_7d",
                    transform=SlidingWindowTransform(
                        "cost", "COUNT", window_size=timedelta(days=7),
                        step_size=timedelta(days=1), group_by_keys=["k"],
                    ),
                ),
            ],
            enable_empty_window_output=False,
            skip_same_window_output=False,
        )
        proc = SparkProcessor(spark)
        proc.registry.build_features([source, view])

        t0 = time.time()
        q = (
            proc.get_stream_dataframe(view)
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1_800)
        wall = time.time() - t0
        print(
            f"RESULT stateful_sliding {n_events} events / {KEYS} keys "
            f"(1d+7d shared state): {wall:.1f}s on local[16]"
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
