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


# the two stable-code queries timed at bench start+end as drift controls
DRIFT_CONTROLS = ["char_entropy", "over_salted_1h"]

# round-6 per-query bench medians (sf0.1, median-of-3) — the pinned
# numeric denominator; see BASELINE.md 'Pinned numeric baseline'
R6_BASELINE = { "expr_filter": 0.629, "scalar_funcs": 0.727, "over_cumulative": 0.719, "over_range_1h": 0.663, "over_salted_1h": 1.434, "over_rows_limit": 0.471, "over_filtered": 0.464, "over_first_last": 0.445, "pit_join": 0.853, "sliding_2d_1d": 0.533, "sliding_value_counts": 1.226, "sliding_filtered": 0.448, "sliding_tumbling_1d": 0.384, "sql_view_tpch_q1": 0.251, "udf_token_count": 0.678, "datagen_seq": 0.076, "dedup_exact": 0.19, "text_stats": 0.416, "ngram_jaccard": 2.339, "minhash_dedup": 1.282, "simhash_pairs": 0.998, "ann_topk": 0.487, "embedding_neardup": 0.417, "value_counts": 1.209, "value_counts_2d": 1.916, "key_time_filter": 0.218, "multimodal_meta": 0.292, "multimodal_real": 0.291, "resize_plan": 0.285, "audio_meta": 0.295, "frame_sample": 0.137, "dsl_functions": 0.904, "over_on_joined": 1.187, "sliding_first_last": 0.556, "over_collect_list": 0.438, "token_metrics": 0.183, "lsh_ann": 0.786, "dedup_clusters": 3.089, "ivf_ann": 0.954, "ivf_ann_trained": 1.573, "sample_shard": 0.186, "pack_sequences": 0.336, "pii_redact": 0.521, "char_entropy": 1.696, "token_quantiles": 0.63, "ngram_topk": 0.697, "ngram_topk_global": 0.718, "repetition_signals": 0.904, "contamination": 1.026, "select_survivors": 3.149, "dup_passages": 1.542, "temperature_sample": 0.234, "normalize_text": 0.472, "remove_dup_passages": 12.507, "token_surprisal": 0.745, "video_meta": 0.41, "cluster_sample": 0.743, "boilerplate_lines": 1.58, "domain_filter": 0.33, "text_signals": 2.276, "index_match": 6.37, "compression_ratio": 0.44 }


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

    def _time_controls() -> dict:
        # Interleaved r6-pin control pair: char_entropy is compute-bound
        # (one heavy codegen stage over documents), over_salted_1h is
        # stage-count-bound (salted two-phase window, several exchanges).
        # Timing them at bench start AND end separates host drift from
        # engine change: their code is stable across rounds, so any move
        # in their ratio-to-pin is environment, and end/start exposes the
        # documented within-session drift.  3 repeats each, interleaved.
        out = {}
        runs = {n: [] for n in DRIFT_CONTROLS if n in qs}
        for _ in range(3):
            for n in runs:
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs[n].append(time.time() - t0)
                release_caches()
                spark.catalog.clearCache()
        for n, r in runs.items():
            out[n] = round(statistics.median(r), 3)
        return out

    drift_start = _time_controls()

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
    # ratio vs the pinned round-6 medians, over the 62 queries both rounds
    # ran (newer queries have no denominator); only meaningful at sf0.1
    common = [q for q in R6_BASELINE if q in timings]
    r6_total = sum(timings[q] for q in common)
    base_total = sum(R6_BASELINE[q] for q in common)
    vs_r6 = round(r6_total / base_total, 4) if base_total and sf == 0.1 else None

    drift_end = _time_controls()
    drift_control = {
        "controls": sorted(drift_start),
        "start": drift_start,
        "end": drift_end,
        # end/start on identical code = within-session drift factor
        "session_drift": round(
            statistics.median(
                [drift_end[n] / drift_start[n] for n in drift_start if drift_start[n] > 0]
            ),
            3,
        ) if drift_start else None,
        # control-medians / r6 pins = host factor vs the pinned baseline;
        # divide a query's vs_r6 ratio by this before calling it a
        # regression (only meaningful at sf0.1)
        "vs_r6_host_factor": round(
            statistics.median(
                [
                    statistics.median([drift_start[n], drift_end[n]]) / R6_BASELINE[n]
                    for n in drift_start
                    if n in R6_BASELINE
                ]
            ),
            3,
        ) if sf == 0.1 and drift_start else None,
    }

    # The grading driver keeps only the LAST 2000 characters of stdout and
    # parses the JSON line from them — 157 query timings overflow that
    # window (BENCH_r07/r08 recorded parsed=null).  So the PRINTED line
    # carries the slowest 50 per-query timings (aggregates computed over
    # ALL queries) and stays parseable inside the window; the COMPLETE
    # per-query record is written to BENCH_LOCAL.json at the repo root.
    # 40 (not 50): the r10 line measured 1397 chars at 50 shown and the
    # drift_control block adds ~230 — 40 keeps the whole JSON line safely
    # inside the driver's 2000-char window alongside its preceding logs
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:40]
    ) if len(timings) > 40 else timings
    base = {
        "drift_control": drift_control,
        "runs_per_query": repeats,
        "r5_subset_total": round(r5_total, 3),
        "r6_subset_total": round(r6_total, 3),
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "value": round(total, 3),
        "vs_r6_baseline": vs_r6,
        "sf": sf,
    }
    full = dict(queries=timings, queries_total_count=len(timings), **base)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            f.write(json.dumps(full, separators=(",", ":")) + "\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the headline line
    print(json.dumps(
        dict(
            queries=slowest,
            queries_total_count=len(timings),
            queries_shown=len(slowest),
            full_record_file="BENCH_LOCAL.json",
            **base,
        ),
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
