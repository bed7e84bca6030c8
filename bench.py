"""Benchmark harness: runs EVERY queries() entry end-to-end (plan + execute +
noop sink) at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3) and reports the
per-query MEDIAN: single runs proved noise-dominated (r4->r5 swung individual
queries 2-3.5x with zero engine-code change), so medians are the smallest
sample that yields a trustworthy round-over-round signal.  The headline
value is the sum of medians.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches

    import __spark_entry__ as entry_mod

    spark = default_spark_session("feathub_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # bench every query the correctness gate checks — no silent coverage gap
    qs = entry_mod.queries()

    # Warm the JVM/codegen paths once with a trivial action.
    spark.range(1000).count()

    timings = {}
    total = 0.0
    for name, fn in qs.items():
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            # operators persist shared intermediates through the caching
            # contract — release them (plus any stragglers) so every run
            # measures cold and executor memory stays flat
            release_caches()
            spark.catalog.clearCache()
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        total += med

    # Round-over-round comparability: the query set GROWS every round, so
    # the all-queries total is not comparable to earlier rounds' numbers.
    # Report the round-5 23-query headline subset as its own subtotal.
    r5_set = [
        "expr_filter", "scalar_funcs", "over_cumulative", "over_range_1h",
        "over_rows_limit", "over_filtered", "pit_join", "sliding_2d_1d",
        "sliding_tumbling_1d", "sql_view_tpch_q1", "dedup_exact",
        "text_stats", "minhash_dedup", "simhash_pairs", "ann_topk",
        "embedding_neardup", "value_counts", "dsl_functions",
        "over_on_joined", "sliding_first_last", "over_collect_list",
        "token_metrics", "lsh_ann",
    ]
    r5_total = sum(timings[q] for q in r5_set if q in timings)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "runs_per_query": repeats,
                "r5_subset_total": round(r5_total, 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
