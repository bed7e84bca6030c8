"""Round-13 scale gate for exact_quantiles (datapipe/profile.py): 1x ->
10x wall on the deterministic events corpus, side by side with the
percentile_approx(accuracy=1e8) plan it replaced in the
`approx_quantiles` driver query.

What the gate checks:
  - wall stays at-or-below linear on 10x rows with fixed cores (every
    shuffle after the first groupBy is bounded by the DISTINCT-value
    count, so it should be strongly sub-linear when the value domain
    saturates);
  - the two plans agree value-for-value at both scales (the sketch at
    accuracy=1e8 is exact while rows <= accuracy, so agreement is
    required here — at larger scales ONLY the exact plan keeps the
    guarantee);
  - the sketch plan's cost grows with its O(accuracy) state, the exact
    plan's with distinct values — the gap at 10x is the point.

Reuses the deterministic corpora from tools/scale_study.py (.localdata/
gen01, gen1); generates them if absent.  Prints one JSON line; paste
the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".localdata")

PROBS = [0.01, 0.25, 0.5, 0.75, 0.99]


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
        if not os.path.exists(os.path.join(d, "events.parquet")):
            generate(scale, d)

    from pyspark.sql import functions as F

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.profile import exact_quantiles

    spark = default_spark_session("scale-quantiles", cpus=32)
    out = {}
    for scale, d in dirs.items():
        ev = spark.read.parquet(os.path.join(d, "events.parquet")).withColumn(
            "value2", F.col("value") * 2
        )
        n = ev.count()
        nd = ev.select(F.countDistinct("value")).first()[0]

        def run_exact():
            exact_quantiles(ev, ["value", "value2"], PROBS).write.format(
                "noop"
            ).mode("overwrite").save()
            release_caches()
            spark.catalog.clearCache()

        def run_sketch():
            ev.agg(
                F.percentile_approx(F.col("value"), PROBS, 100_000_000),
                F.percentile_approx(F.col("value2"), PROBS, 100_000_000),
            ).write.format("noop").mode("overwrite").save()

        run_exact()  # warm
        exact_s = _median3(run_exact)
        run_sketch()
        sketch_s = _median3(run_sketch)

        got = {
            (r["column"], r["prob"]): r["value"]
            for r in exact_quantiles(ev, ["value", "value2"], PROBS).collect()
        }
        sk = ev.agg(
            F.percentile_approx(F.col("value"), PROBS, 100_000_000).alias("a"),
            F.percentile_approx(F.col("value2"), PROBS, 100_000_000).alias("b"),
        ).first()
        agree = all(
            got[("value", p)] == sk["a"][i] and got[("value2", p)] == sk["b"][i]
            for i, p in enumerate(PROBS)
        )
        release_caches()
        spark.catalog.clearCache()
        out[f"{scale}x"] = {
            "rows": n,
            "distinct_values": nd,
            "exact_quantiles_s": exact_s,
            "sketch_1e8_s": sketch_s,
            "plans_agree": agree,
        }
    r1, r10 = out["1x"], out["10x"]
    out["exact_ratio_10x"] = round(
        r10["exact_quantiles_s"] / r1["exact_quantiles_s"], 2
    )
    out["sketch_ratio_10x"] = round(r10["sketch_1e8_s"] / r1["sketch_1e8_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
