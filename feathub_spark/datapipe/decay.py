"""Exponentially time-decayed trailing aggregates — the recency-weighted
feature the reference's plain SUM/AVG over-windows can't express (its
AggFunc set is unweighted, /root/reference/python/feathub/feature_views/
transforms/agg_func.py:20).

At each event t the feature is sum over events t_j in [t - window, t] of
v_j * 2^(-(t - t_j)/half_life): recent activity dominates, stale activity
fades smoothly instead of cliff-dropping at the window edge.

Plan shape: one per-key RANGE frame collects the in-window (ts, id, value)
triples, the array is sorted (total order via the id tie-break — frames
never feed a float sum in nondeterministic order) and folded in INTEGER
MICRO-UNITS (each term rounds to 1e-6 before an exact bigint sum), so the
result is reproducible across engines and partitionings.  Memory per row
is bounded by the window's event count — the same contract as the
engine's COLLECT_LIST frames; for windows too wide for that, the sliding
partial-aggregation layer is the right tool (decay is then approximated
per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def time_decayed_sum(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    half_life_us: int,
    window_us: int,
    id_col: str = None,
    out_col: str = "decayed_sum",
    count_col: str = "n_in_window",
) -> DataFrame:
    """Add ``out_col`` (the decayed sum, 6 dp) and ``count_col`` (events in
    the trailing window incl. the current row).  ``id_col`` makes the fold
    order total when timestamps tie (recommended).

    NULL ``value_col`` events follow SQL SUM/COUNT(*) semantics: they are
    skipped by the sum (a NULL term must not null the whole fold) but
    still counted by ``count_col``; a window whose values are ALL NULL
    yields NULL, exactly like SUM over an all-NULL group."""
    idc = id_col or ts_us_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_us_col).asc())
        .rangeBetween(-int(window_us), 0)
    )
    # the tie-break id rides in its NATIVE type (struct comparison works
    # for any orderable type) — CAST(uuid AS BIGINT) silently NULLed every
    # non-numeric id and defeated the determinism id_col exists for
    hist = F.expr(
        f"named_struct('t', CAST(`{ts_us_col}` AS BIGINT), "
        f"'i', `{idc}`, "
        f"'v', CAST(`{value_col}` AS DOUBLE))"
    )
    # sorted fold in integer micro-units: exact bigint sum, engine-stable.
    # NULL values are dropped BEFORE the fold (SQL SUM semantics — one
    # NULL term would otherwise null the accumulator and poison every
    # window containing it); an all-NULL window folds to NULL like SUM.
    fold = (
        f"CASE WHEN size(__histnn__) = 0 THEN NULL ELSE "
        f"round(aggregate(array_sort(__histnn__), CAST(0 AS BIGINT), "
        f"(acc, e) -> acc + CAST(round(e.v * power(CAST(2 AS DOUBLE), "
        f"-CAST(__t0__ - e.t AS DOUBLE) / {float(half_life_us)}) "
        f"* 1000000, 0) AS BIGINT)) / CAST(1000000 AS DOUBLE), 6) END"
    )
    return (
        ensure_parallelism(df)
        .withColumn("__hist__", F.collect_list(hist).over(w))
        # drop NaN alongside NULL: CAST(round(NaN*...,0) AS BIGINT) is a
        # fatal CAST_OVERFLOW under ANSI — one NaN value killed the job
        .withColumn(
            "__histnn__",
            F.expr("filter(__hist__, e -> e.v IS NOT NULL AND NOT isnan(e.v))"),
        )
        .withColumn("__t0__", F.col(ts_us_col).cast("bigint"))
        .withColumn(out_col, F.expr(fold))
        .withColumn(count_col, F.size("__hist__").cast("bigint"))
        .drop("__hist__", "__histnn__", "__t0__")
    )
