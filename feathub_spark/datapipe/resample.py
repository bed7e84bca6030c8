"""Regular-grid resampling with forward fill — turning irregular event
streams into the fixed-cadence feature matrices training jobs consume
(one row per key per step, carrying the latest observation at that
instant plus its staleness).

Plan shape: the per-key grid derives from a groupBy min/max (grid rows
are generated, never stored), and the forward fill is the engine's
single-shuffle as-of pattern — UNION the events and the grid rows, one
window sort per key, last_value(ignoreNulls) carries observations
forward — no grid-to-events join, no per-grid-point probe.  A key's
cost is (its events + its grid points); a pathologically hot key
serializes only itself (same posture as sessionize; the over-window
time-chunk plan applies if that binds).  All grid arithmetic is exact
integer micros.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_cols: Sequence[str],
    step_us: int,
    start_us: Optional[int] = None,
    end_us: Optional[int] = None,
    id_col: Optional[str] = None,
) -> DataFrame:
    """One output row per key per grid instant: grid points run at
    ``step_us`` cadence from the first step-multiple at/after the key's
    first event (or ``start_us``) through the key's last event (or
    ``end_us``); each carries the latest value of every ``value_cols``
    with event time <= the grid instant (ties: the event at exactly the
    grid instant wins; among same-timestamp events the one with the
    largest ``id_col`` — pass it whenever timestamps can collide, or the
    pick is sort-order-dependent) and ``staleness_us`` = grid minus the
    time of the key's latest event at/before the grid instant (the last
    *observation*, regardless of column: if that event's value is NULL,
    the carried value comes from an older event but staleness still
    measures from the newer observation).  Grid points before a key's
    first event yield NULLs.

    Returns (key_col, grid_us, *value_cols, staleness_us)."""
    step_us = int(step_us)
    if step_us <= 0:
        raise ValueError("step_us must be positive")
    value_cols = list(value_cols)

    # tie-break on the id column's NATIVE type: a cast to long crashes on
    # non-numeric ids under ANSI (Spark 4's default) and silently NULLs
    # the tie order under non-ANSI — the exact nondeterminism id_col
    # exists to prevent
    tie = F.col(id_col) if id_col is not None else F.lit(0)
    base = ensure_parallelism(df).select(
        F.col(key_col),
        F.col(ts_us_col).cast("long").alias("__tu__"),
        tie.alias("__tie__"),
        *[F.col(c) for c in value_cols],
    )
    bounds = base.groupBy(key_col).agg(
        F.min("__tu__").alias("__lo__"), F.max("__tu__").alias("__hi__")
    )
    # first step-multiple >= __lo__.  SQL div truncates toward ZERO, so
    # the usual (__lo__ + step - 1) div step ceiling is wrong for
    # negative (pre-1970) timestamps; truncation is already the ceiling
    # there, and only positive non-multiples need the +1
    lo = (
        F.lit(int(start_us))
        if start_us is not None
        else F.expr(
            f"CASE WHEN __lo__ % {step_us} = 0 THEN __lo__ "
            f"ELSE ((__lo__ div {step_us}) + "
            f"(CASE WHEN __lo__ > 0 THEN 1 ELSE 0 END)) * {step_us} END"
        )
    )
    hi = F.lit(int(end_us)) if end_us is not None else F.col("__hi__")
    grid = (
        bounds.withColumn("__glo__", lo)
        .withColumn("__ghi__", hi)
        .filter(F.col("__glo__") <= F.col("__ghi__"))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(__glo__, __ghi__, CAST({step_us} AS BIGINT))")
            ).alias("__tu__"),
        )
        .withColumn("__is_grid__", F.lit(1))
    )
    events = base.withColumn("__is_grid__", F.lit(0))
    unioned = events.unionByName(
        grid.select(
            key_col, "__tu__",
            F.lit(None).cast(dict(base.dtypes)["__tie__"]).alias("__tie__"),
            *[F.lit(None).cast(dict(base.dtypes)[c]).alias(c)
              for c in value_cols],
            "__is_grid__",
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col("__tu__").asc(),
            F.col("__is_grid__").asc(),
            F.col("__tie__").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        key_col,
        "__tu__",
        "__is_grid__",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__is_grid__") == 0, F.col("__tu__")),
            ignorenulls=True,
        ).over(w).alias("__last_ev__"),
    )
    return filled.filter(F.col("__is_grid__") == 1).select(
        key_col,
        F.col("__tu__").alias("grid_us"),
        *value_cols,
        (F.col("__tu__") - F.col("__last_ev__")).alias("staleness_us"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    start_us: int,
    end_us: int,
    tie_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Time-weighted average over ``[start_us, end_us)``: each event's
    value holds until the key's next event (step-function/last-observation
    semantics — the TWAP convention), durations clip to the window, and
    the value in force AT ``start_us`` (the last event at/before it)
    counts from ``start_us``.  The average weights by OBSERVED coverage
    (``sum(v*dt)/sum(dt)``), so a key first observed mid-window isn't
    diluted by the unobserved prefix; ``coverage_us`` reports how much of
    the window the mean actually spans.

    Plan shape: one hash shuffle on the key, one lead() window, one
    groupBy — the same single-exchange family as scd2_intervals (the
    step function IS an SCD2 interval table on a numeric attribute).
    NULL values contribute no weighted mass but still close the previous
    event's interval (a NULL observation means "unknown", not "carry the
    old value harder").

    Returns (key_col, twa, coverage_us, n_events) per key with any
    in-window coverage; twa rounds to 6 dp."""
    ties = list(tie_cols or [])
    order = [F.col("__t__").asc()] + [F.col(c).asc() for c in ties]
    w = Window.partitionBy(key_col).orderBy(*order)
    stepped = (
        ensure_parallelism(df)
        .filter(F.col(ts_us_col) < end_us)
        .select(
            key_col,
            F.col(ts_us_col).alias("__t__"),
            F.col(value_col).cast("double").alias("__v__"),
            *ties,
        )
        .withColumn("__next__", F.lead("__t__").over(w))
        .withColumn("__lo__", F.greatest(F.col("__t__"), F.lit(start_us)))
        .withColumn(
            "__hi__",
            F.least(F.coalesce(F.col("__next__"), F.lit(end_us)),
                    F.lit(end_us)),
        )
        .withColumn(
            "__dt__",
            F.greatest(F.col("__hi__") - F.col("__lo__"), F.lit(0)),
        )
    )
    covered = stepped.filter(
        (F.col("__dt__") > 0) & F.col("__v__").isNotNull()
    )
    return (
        covered.groupBy(key_col)
        .agg(
            F.round(
                F.sum(F.col("__v__") * F.col("__dt__")) / F.sum("__dt__"), 6
            ).alias("twa"),
            F.sum("__dt__").cast("bigint").alias("coverage_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
