"""Regression pins for the round-11 third review batch (datapipe
analytics modules) — each reproduced against Spark 4.1.2 ANSI defaults
before the fix."""

import pytest
from pyspark.sql import functions as F


def test_funnel_ignores_null_timestamps(spark):
    """A NULL-ts first-step event sorts first, gets greedily consumed,
    and poisons the chain (no event is strictly-after NULL)."""
    from feathub_spark.datapipe.sessions import funnel_steps

    df = spark.createDataFrame(
        [
            ("k", None, "view"),
            ("k", 10, "view"),
            ("k", 20, "click"),
            ("k", 30, "buy"),
        ],
        "k string, tu long, tp string",
    )
    row = funnel_steps(df, "k", "tu", "tp", ["view", "click", "buy"]).collect()[0]
    assert row["n_steps"] == 3
    assert row["step_ts"] == [10, 20, 30]


def test_time_decayed_sum_skips_nan_values(spark):
    """One NaN value must not abort the job with an ANSI CAST_OVERFLOW;
    it drops like NULL (SQL SUM semantics)."""
    from feathub_spark.datapipe.decay import time_decayed_sum

    df = spark.createDataFrame(
        [("k", 1, float("nan")), ("k", 2, 1.0)], "k string, tu long, v double"
    )
    out = time_decayed_sum(
        df, "k", "tu", "v", half_life_us=1_000_000,
        window_us=10_000_000, id_col="tu",
    )
    rows = {r["tu"]: r for r in out.collect()}
    assert rows[2] is not None  # no CAST_OVERFLOW; NaN dropped


def test_pca_fit_and_project_tolerate_null_elements(spark):
    """A NULL ELEMENT inside a vector must not crash the moment fold or
    the projection batch; such vectors are excluded / project to NULL."""
    from feathub_spark.datapipe.decompose import fit_pca, pca_project

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, None],), ([5.0, 6.0],), ([2.0, 1.0],)],
        "v array<double>",
    )
    mean, comps, var = fit_pca(df, "v", k=1)
    assert len(mean) == 2 and len(comps) == 1
    out = pca_project(df, "v", k=1, model=(mean, comps, var)).collect()
    projected = [r[-1] for r in out]
    assert projected[1] is None  # null-element vector -> NULL projection
    assert all(p is not None for i, p in enumerate(projected) if i != 1)


def test_transition_matrix_null_state_is_real(spark):
    """A NULL state keeps BOTH its surrounding transitions: lead() over
    a struct separates 'next is NULL state' from 'sequence end', and the
    totals join is null-safe."""
    from feathub_spark.datapipe.sessions import transition_matrix

    df = spark.createDataFrame(
        [("k", 1, "A"), ("k", 2, None), ("k", 3, "B")],
        "k string, tu long, s string",
    )
    rows = {
        (r["from_state"], r["to_state"]): r["p"]
        for r in transition_matrix(df, "k", "tu", "s").collect()
    }
    assert rows == {("A", None): 1.0, (None, "B"): 1.0}


def test_cohort_retention_keeps_null_keys(spark):
    """NULL keys are a real cohort group (repo convention: key_skew,
    hll_distinct); the old groupBy+equi-join silently dropped them."""
    from feathub_spark.datapipe.sessions import cohort_retention

    df = spark.createDataFrame(
        [(None, 0), (None, 5), ("a", 0)], "k string, tu long"
    )
    rows = cohort_retention(df, "k", "tu", period_us=2).collect()
    total_active = sum(r["n_active"] for r in rows)
    # null key contributes periods 0 and 2; 'a' contributes period 0
    assert total_active == 3
    offsets = {
        (r["cohort_period"], r["period_offset"]): r["n_active"] for r in rows
    }
    assert offsets[(0, 2)] == 1  # the NULL key's retained period


def test_numeric_histogram_honors_partial_bounds(spark):
    """A supplied hi (with lo from data) must clip binning — it used to
    be silently recomputed from the data."""
    from feathub_spark.datapipe.profile import numeric_histogram

    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    rows = numeric_histogram(df, "v", n_bins=2, hi=5.0).collect()
    his = {r["bin"]: r["bin_hi"] for r in rows}
    assert max(his.values()) == 5.0  # top bin ends at the SUPPLIED hi


def test_zorder_key_nan_rows_do_not_zero_the_dimension(spark):
    """One NaN row must not collapse a whole z-dimension to bucket 0:
    bounds exclude NaN, so the other rows still spread across buckets."""
    from feathub_spark.datapipe.layout import zorder_key

    df = spark.createDataFrame(
        [(0.0, 1.0), (float("nan"), 2.0), (100.0, 3.0)], "a double, b double"
    )
    keys = [r["zorder_key"] for r in zorder_key(df, ["a", "b"]).collect()]
    # rows 0 and 2 differ in column a -> distinct keys (dimension alive)
    assert keys[0] != keys[2]
