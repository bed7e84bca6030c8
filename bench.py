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


# round-12 per-query bench medians (sf0.1, median-of-3, drift-control
# host factor 0.991 — the neutral-host run BASELINE.md 'Round-12 pin
# table' records).  Covers ALL 157 r12 queries, so the >2x perf gate
# has a denominator for the 95 post-r6 queries R6_BASELINE misses;
# queries added after r12 (pca_apply...) get pinned at their first
# neutral-host round.
R12_BASELINE = { "pit_join": 1.215, "tokenize_ids": 1.606, "domain_filter": 0.293, "sql_view_tpch_q4": 0.496, "sql_view_tpch_q6": 0.232, "sql_view_tpch_q7": 1.016, "sql_view_tpch_q8": 1.108, "sql_view_tpch_q9": 0.98, "sql_view_tpch_q10": 0.866, "sql_view_tpch_q12": 0.499, "sql_view_tpch_q13": 0.579, "sql_view_tpch_q14": 0.367, "sql_view_tpch_q15": 0.477, "sql_view_tpch_q17": 0.525, "sql_view_tpch_q19": 0.487, "sql_view_tpch_q21": 1.079, "sql_view_tpch_q22": 0.489, "sql_view_running_total": 0.397, "sql_view_rollup": 0.602, "over_auto_salt_1h": 1.282, "minhash_index_match": 1.524, "zorder_key": 1.768, "dedup_clusters_star": 4.091, "approx_quantiles": 2.671, "pit_join_expiry": 0.843, "map_entry_join": 0.674, "lookup_join": 0.458, "cluster_split": 3.091, "dup_passage_pairs": 4.979, "quantile_sample": 0.245, "scd2_intervals": 0.725, "scd2_snapshot": 0.66, "scd2_merge": 1.659, "importance_weights": 0.847, "dedup_paragraphs": 0.184, "quantized_ann": 2.416, "hamming_ann": 0.704, "binary_rerank_ann": 1.292, "quantized_ann_arrow": 0.931, "time_weighted_avg": 0.696, "fuzzy_match": 0.197, "cohort_retention": 0.792, "attribution": 0.675, "transition_matrix": 0.858, "target_encode": 0.828, "cross_surprisal": 0.984, "strip_html": 0.222, "triangle_counts": 2.217, "clustering_coeff": 2.376, "char_entropy": 2.086, "pq_ann": 1.005, "ivf_pq_ann": 1.262, "sessionize": 1.041, "session_stats": 0.941, "funnel_steps": 0.675, "winsorize": 0.525, "snapshot_diff": 1.114, "bloom_prune": 1.049, "key_skew": 1.095, "json_features": 0.315, "negative_samples": 0.582, "resample_ffill": 0.592, "validate_rules": 1.175, "rank_normalize": 0.559, "robust_zscore": 1.125, "token_pmi": 0.798, "weighted_sample": 0.379, "merge_aggregates": 0.59, "weighted_sample_grouped": 0.745, "quality_buckets": 1.388, "decayed_sum": 1.006, "chunk_docs": 0.153, "bigram_surprisal": 1.48, "interval_join": 0.436, "corpus_drift": 0.872, "dataset_split": 0.09, "price_histogram": 1.144, "profile_stats": 1.934, "hll_distinct": 0.998, "cms_heavy_hitters": 1.013, "phrase_search": 0.645, "frame_sample_real": 0.352, "url_normalize": 0.192, "bm25_search": 1.391, "hybrid_rrf": 2.241, "dup_passages": 1.789, "temperature_sample": 0.38, "normalize_text": 0.538, "remove_dup_passages": 1.526, "token_surprisal": 0.912, "video_meta": 0.306, "video_meta_v1": 0.327, "multimodal_tolerant": 0.372, "cluster_sample": 0.538, "semantic_dedup": 1.169, "boilerplate_lines": 0.936, "text_signals": 1.321, "index_match": 2.382, "sql_view_tpch_q3": 0.714, "sql_view_tpch_q18": 1.001, "sample_shard": 0.221, "pack_sequences": 0.463, "pii_redact": 0.598, "token_quantiles": 0.556, "ngram_topk": 0.715, "ngram_topk_global": 0.689, "repetition_signals": 1.041, "contamination": 0.978, "expr_filter": 0.282, "scalar_funcs": 0.455, "over_cumulative": 0.46, "over_range_1h": 0.372, "over_salted_1h": 1.088, "over_rows_limit": 0.4, "over_filtered": 0.386, "over_first_last": 0.372, "sliding_2d_1d": 0.417, "sliding_value_counts": 1.057, "sliding_filtered": 0.511, "sliding_tumbling_1d": 0.425, "sql_view_tpch_q1": 0.29, "sql_view_tpch_q5": 1.133, "udf_token_count": 0.977, "datagen_seq": 0.056, "dedup_exact": 0.114, "text_stats": 0.226, "ngram_jaccard": 2.261, "minhash_dedup": 1.479, "simhash_pairs": 1.083, "ann_topk": 0.595, "embedding_neardup": 0.355, "value_counts": 1.401, "value_counts_2d": 2.406, "key_time_filter": 0.396, "multimodal_meta": 0.37, "multimodal_real": 0.29, "resize_plan": 0.262, "audio_meta": 0.26, "frame_sample": 0.075, "dsl_functions": 0.978, "over_on_joined": 1.356, "sliding_first_last": 0.696, "over_collect_list": 0.415, "token_metrics": 0.112, "lsh_ann": 0.941, "lsh_ann_multiprobe": 0.978, "dedup_clusters": 2.373, "pagerank": 2.756, "ivf_ann": 0.937, "ivf_ann_trained": 1.696, "select_survivors": 2.823, "mmr_rerank": 0.824, "remove_dup_passages_fast": 1.601, "index_match_fast": 1.856, "compression_ratio": 0.366, "bpe_tokenize": 1.339, "pca_whiten": 0.764 }


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

    # Interleaved sub-second control (r15, additions-only): the start/end
    # drift pair cannot see MID-SESSION host bursts, which r13/r14 showed
    # dominate individual per-query readings on this host.  One rep of a
    # cheap pinned control (expr_filter) every CTL_EVERY queries yields a
    # LOCAL host factor for each query's neighborhood; each query's
    # ctl_norm = (median / r12 pin) / nearest control factor is the
    # burst-corrected ratio the perf gate should read first.
    CTL_NAME = "expr_filter"
    CTL_PIN = R12_BASELINE.get(CTL_NAME)
    CTL_EVERY = 8
    ctl_samples: list[tuple[int, float]] = []  # (query_index, seconds)

    def _sample_control(idx: int) -> None:
        if CTL_NAME not in qs or not CTL_PIN:
            return
        t0 = time.time()
        qs[CTL_NAME](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ctl_samples.append((idx, time.time() - t0))
        release_caches()
        spark.catalog.clearCache()

    timings = {}
    total = 0.0
    for qi, (name, fn) in enumerate(qs.items()):
        if qi % CTL_EVERY == 0:
            _sample_control(qi)
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
    _sample_control(len(qs))

    # per-query control-normalized ratio vs the r12 pin, using the control
    # sample nearest (by queue position) to when the query ran
    def _ctl_norm_for(name: str, idx: int):
        pin = R12_BASELINE.get(name)
        # pins are sf0.1 medians — the ratio is meaningless elsewhere
        if sf != 0.1 or not pin or not ctl_samples or not CTL_PIN:
            return None
        nearest = min(ctl_samples, key=lambda s: abs(s[0] - idx))
        factor = nearest[1] / CTL_PIN
        if factor <= 0:
            return None
        return round((timings[name] / pin) / factor, 3)

    ctl_norm = {}
    for qi, name in enumerate(qs):
        r = _ctl_norm_for(name, qi)
        if r is not None:
            ctl_norm[name] = r

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
    # same ratio vs the round-12 pins — these cover the WHOLE r12 surface
    # (157 queries), so the 2x-per-query perf gate has a denominator for
    # every query, not just the 62 r6 veterans
    common12 = [q for q in R12_BASELINE if q in timings]
    r12_total = sum(timings[q] for q in common12)
    base12_total = sum(R12_BASELINE[q] for q in common12)
    vs_r12 = (
        round(r12_total / base12_total, 4)
        if base12_total and sf == 0.1
        else None
    )

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
        # same control-derived factor vs the r12 pins: divide a query's
        # ratio-to-r12-pin by this before calling it a regression
        "vs_r12_host_factor": round(
            statistics.median(
                [
                    statistics.median([drift_start[n], drift_end[n]])
                    / R12_BASELINE[n]
                    for n in drift_start
                    if n in R12_BASELINE
                ]
            ),
            3,
        ) if sf == 0.1 and drift_start else None,
    }

    # the per-query 2x gate over the FULL pinned surface: a query reading
    # more than 2x its r12 pin after host-factor normalization needs
    # same-round closure (BASELINE.md perf-closure protocol)
    hf12 = drift_control.get("vs_r12_host_factor") or 1.0
    over_2x_r12_pin = sorted(
        q
        for q in common12
        if timings[q] / (R12_BASELINE[q] * hf12) > 2.0
    ) if sf == 0.1 else []

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
    # the gate list re-read through the interleaved control: queries whose
    # ctl_norm still exceeds 2.0 after LOCAL burst correction (the raw
    # over_2x_r12_pin list stays printed unchanged for continuity)
    over_2x_ctl = sorted(
        q for q, r in ctl_norm.items() if r > 2.0
    ) if sf == 0.1 else []

    ctl_factors = (
        [s / CTL_PIN for _, s in ctl_samples] if CTL_PIN else []
    )
    # slim block for the printed line (the driver keeps only ~2000 chars
    # of stdout); the full sample list + per-query ratios go to
    # BENCH_LOCAL.json
    ctl_slim = {
        "control": CTL_NAME,
        "n": len(ctl_samples),
        "median_factor": round(statistics.median(ctl_factors), 3)
        if ctl_factors else None,
        "min_factor": round(min(ctl_factors), 3) if ctl_factors else None,
        "max_factor": round(max(ctl_factors), 3) if ctl_factors else None,
    }

    base = {
        "drift_control": drift_control,
        "ctl_interleaved": ctl_slim,
        "over_2x_r12_pin_ctl_norm": over_2x_ctl,
        "runs_per_query": repeats,
        "r5_subset_total": round(r5_total, 3),
        "r6_subset_total": round(r6_total, 3),
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "value": round(total, 3),
        "vs_r6_baseline": vs_r6,
        "vs_r12_baseline": vs_r12,
        "over_2x_r12_pin": over_2x_r12_pin,
        "sf": sf,
    }
    full = dict(queries=timings, queries_total_count=len(timings), **base)
    full["queries_ctl_norm"] = ctl_norm
    full["ctl_interleaved"] = dict(
        ctl_slim,
        pin=CTL_PIN,
        every=CTL_EVERY,
        samples=[[i, round(s, 3)] for i, s in ctl_samples],
    )
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            f.write(json.dumps(full, separators=(",", ":")) + "\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the headline line
    # ctl_norm ratios for the SHOWN queries, as an array aligned with the
    # `queries` dict's key order (a parallel keyed dict would blow the
    # driver's 2000-char stdout window; null = no r12 pin / no control)
    ctl_norm_shown = [
        round(ctl_norm[q], 2) if q in ctl_norm else None for q in slowest
    ]
    printed = dict(
        queries=slowest,
        ctl_norm_shown=ctl_norm_shown,
        queries_total_count=len(timings),
        queries_shown=len(slowest),
        full_record_file="BENCH_LOCAL.json",
        **base,
    )
    line = json.dumps(printed, separators=(",", ":"))
    if len(line) > 1950:
        # the driver parses the JSON line out of the LAST 2000 chars of
        # stdout — on a pathological run (many flag entries) drop the
        # shown-ratio array rather than risk truncating the line; the
        # full per-query ctl_norm map is in BENCH_LOCAL.json regardless
        printed.pop("ctl_norm_shown", None)
        line = json.dumps(printed, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
