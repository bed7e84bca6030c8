"""Benchmark harness: runs the headline queries end-to-end (plan + execute +
noop sink) at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "expr_filter",
    "scalar_funcs",
    "over_cumulative",
    "over_range_1h",
    "over_rows_limit",
    "over_filtered",
    "pit_join",
    "sliding_2d_1d",
    "sliding_tumbling_1d",
    "sql_view_tpch_q1",
    "dedup_exact",
    "text_stats",
    "minhash_dedup",
    "simhash_pairs",
    "ann_topk",
    "embedding_neardup",
    "value_counts",
    "dsl_functions",
    "over_on_joined",
    "sliding_first_last",
    "over_collect_list",
    "token_metrics",
    "lsh_ann",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from feathub_spark import default_spark_session

    import __spark_entry__ as entry_mod

    spark = default_spark_session("feathub_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # Warm the JVM/codegen paths once with a trivial action.
    spark.range(1000).count()

    timings = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        # operators may persist() shared intermediates; drop them so later
        # queries measure cold and executor memory stays flat
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
