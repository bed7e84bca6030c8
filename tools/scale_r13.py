"""Round-13 scale gate (verdict item 4): 1x -> 10x measurements for the
three round-12 additions the standing `make scale-gate` doesn't cover:

  A. FileSystemSink `partition_by` directory layouts — write cost at both
     scales plus the pruned-read wall (and a PartitionFilters assertion)
     on the 10x table;
  B. `compact_files` (datapipe/layout.py) — compacting a 200-small-file
     table, flat AND Hive-partitioned, at both scales;
  C. the deterministic-tie as-of ordering (join_utils.py appends the
     payload struct to the running-last window ORDER BY) — a narrow
     (1-field) vs WIDE (10-field, strings included) payload twin on a
     tie-heavy right side (every right row tripled at the same (key, ts)),
     confirming the extra sort key costs ~nothing at 10x.

Reuses the deterministic corpora from tools/scale_study.py (.localdata/
gen01 = sf0.1-equivalent, gen1 = sf1-equivalent); generates them if
absent.  Prints one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".localdata")


def _median3(fn) -> float:
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    from tools.scale_study import generate

    dirs = {}
    for scale, name in ((1, "gen01"), (10, "gen1")):
        d = os.path.join(DATA, name)
        dirs[scale] = d
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            generate(scale, d)

    from pyspark.sql import functions as F

    from feathub_spark import default_spark_session
    from feathub_spark.processors.spark.constants import EVENT_TIME_COL
    from feathub_spark.processors.spark.join_utils import temporal_join
    from feathub_spark.datapipe.layout import compact_files

    spark = default_spark_session("scale_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    results = {}
    work = os.path.join(DATA, "r13_gate")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # ---- Gate A: partition_by directory layout -------------------------
    from feathub_spark.feature_tables.sinks.file_system_sink import FileSystemSink
    from feathub_spark.processors.spark.source_sink_utils import insert_into_sink

    for scale in (1, 10):
        ev = spark.read.parquet(os.path.join(dirs[scale], "events.parquet"))
        out = os.path.join(work, f"partby_{scale}x")

        def _write(out=out, ev=ev):
            shutil.rmtree(out, ignore_errors=True)
            insert_into_sink(
                ev,
                FileSystemSink(
                    path=out, data_format="parquet",
                    partition_by=["event_type"],
                ),
            )

        results[f"partition_by write {scale}x"] = {"t": _median3(_write)}
        back = spark.read.parquet(out)
        one_type = back.filter(F.col("event_type") == "click")

        results[f"partition_by pruned read {scale}x"] = {
            "t": _median3(lambda: one_type.agg(F.sum("value")).collect()),
            "full": _median3(lambda: back.agg(F.sum("value")).collect()),
        }
        plan = one_type._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan.split(
            "PartitionFilters"
        )[1][:200], "partition pruning missing from the executed plan"

    # ---- Gate B: compact_files (flat + hive) ---------------------------
    for scale in (1, 10):
        ev = spark.read.parquet(os.path.join(dirs[scale], "events.parquet"))
        flat = os.path.join(work, f"compact_flat_{scale}x")
        ev.repartition(200).write.parquet(flat)
        t0 = time.time()
        stats = compact_files(spark, flat, target_mb=64)
        results[f"compact flat {scale}x"] = {
            "t": round(time.time() - t0, 3),
            "files": f"{stats['files_before']}->{stats['files_after']}",
            "mb": round(stats["bytes"] / 1e6, 1),
        }
        hive = os.path.join(work, f"compact_hive_{scale}x")
        ev.repartition(40).write.partitionBy("event_type").parquet(hive)
        t0 = time.time()
        stats = compact_files(spark, hive, target_mb=64)
        assert stats["partition_columns"] == ["event_type"]
        results[f"compact hive {scale}x"] = {
            "t": round(time.time() - t0, 3),
            "files": f"{stats['files_before']}->{stats['files_after']}",
        }
        n_dirs = len(
            [d for d in os.listdir(hive) if d.startswith("event_type=")]
        )
        assert n_dirs == 5, f"hive layout lost: {n_dirs} dirs"

    # ---- Gate C: deterministic-tie as-of, narrow vs wide payload -------
    for scale in (1, 10):
        ev = spark.read.parquet(os.path.join(dirs[scale], "events.parquet"))
        # pyarrow writes ts as TIMESTAMP_NTZ; the join contract wants TIMESTAMP
        ev_ts = F.col("ts").cast("timestamp")
        left = ev.select(
            "user_id", ev_ts.alias(EVENT_TIME_COL), "event_id"
        )
        # tie-heavy right: every (user_id, ts) carries 3 rows with
        # distinct payloads, so EVERY match exercises the tie ordering
        base = ev.select("user_id", ev_ts.alias(EVENT_TIME_COL),
                         "value", "event_type", "props")
        right = base
        for i in (1, 2):
            right = right.unionByName(
                base.withColumn("value", F.col("value") + i)
            )
        wide = right
        for i in range(7):
            wide = wide.withColumn(f"w{i}", F.col("value") * (i + 1))

        narrow_fields = {"rv": "value"}
        wide_fields = {
            "rv": "value", "rtype": "event_type", "rprops": "props",
            **{f"rw{i}": f"w{i}" for i in range(7)},
        }
        results[f"asof tie narrow {scale}x"] = {
            "t": _median3(
                lambda: temporal_join(left, right, ["user_id"], narrow_fields)
                .write.format("noop").mode("overwrite").save()
            )
        }
        results[f"asof tie wide {scale}x"] = {
            "t": _median3(
                lambda: temporal_join(left, wide, ["user_id"], wide_fields)
                .write.format("noop").mode("overwrite").save()
            )
        }

    for label in ("partition_by write", "compact flat", "compact hive",
                  "asof tie narrow", "asof tie wide"):
        r1, r10 = results[f"{label} 1x"]["t"], results[f"{label} 10x"]["t"]
        results[f"{label} 10x"]["ratio"] = round(r10 / max(r1, 1e-9), 2)
    wide10 = results["asof tie wide 10x"]["t"]
    narrow10 = results["asof tie narrow 10x"]["t"]
    results["asof tie wide 10x"]["vs_narrow"] = round(
        wide10 / max(narrow10, 1e-9), 2
    )

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results, separators=(",", ":")))


if __name__ == "__main__":
    main()
