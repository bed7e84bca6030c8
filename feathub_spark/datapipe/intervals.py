"""Binned interval (range) join — the equi-join re-expression of
``event.ts BETWEEN interval.start AND interval.end``.

A naive conditional join compiles to BroadcastNestedLoopJoin (or a
cartesian product) because Spark has no native range-join strategy — the
classic corpus-scale trap.  The standard fix: quantize time into
fixed-width bins, explode each interval to the bins it covers (bounded by
interval_length / bin_width rows per interval), equi-join events on
(keys..., bin), then apply the exact BETWEEN as a post-filter.  An event's
timestamp lives in exactly one bin, so no dedup pass is needed — every
(event, interval) match is produced exactly once.

Pick ``bin_us`` near the TYPICAL interval length: wider bins cut the
interval fan-out, narrower bins cut the per-bin join fan-in; both stay
equi-join shaped either way.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: Optional[Sequence[str]] = None,
    bin_us: int = 3_600_000_000,
    how: str = "inner",
    max_interval_bins: int = 100_000,
) -> DataFrame:
    """Join each event row to every interval row with
    ``start <= ts <= end`` (and equal ``keys``, if given) via the binned
    equi-join.  All three time columns must be the same integer unit
    (epoch micros by convention).  ``how="inner"`` keeps matched events;
    ``how="left"`` keeps unmatched events with NULL interval columns.

    Scale shape: one narrow interval explode (fan-out
    interval_length / bin_us per row, HARD-CAPPED at
    ``max_interval_bins`` — a single corrupt year-9999 end timestamp
    would otherwise sequence tens of millions of bins and OOM its
    executor; longer intervals are dropped as data-hygiene rejects, like
    NULL and inverted ones), one equi-join shuffle on (keys..., bin),
    one post-filter.  No BroadcastNestedLoopJoin, no cartesian product,
    at any corpus size.  Size ``bin_us`` so real intervals stay far
    under the cap."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = list(keys or [])
    b = int(bin_us)
    iv = ensure_parallelism(intervals).filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
        & (
            (F.col(end_col).cast("bigint") / F.lit(b))
            - (F.col(start_col).cast("bigint") / F.lit(b))
            <= F.lit(int(max_interval_bins))
        )
    )
    iv = iv.withColumn(
        "__bin__",
        F.explode(
            F.expr(
                f"sequence(CAST(`{start_col}` AS BIGINT) DIV {b}, "
                f"CAST(`{end_col}` AS BIGINT) DIV {b})"
            )
        ),
    )
    ev = ensure_parallelism(events).withColumn(
        "__bin__", F.expr(f"CAST(`{ts_col}` AS BIGINT) DIV {b}")
    )
    on = keys + ["__bin__"]
    cond = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    if how == "inner":
        return ev.join(iv, on=on).filter(cond).drop("__bin__")
    # left: bin-join + exact filter inside the join condition so events
    # with no covering interval survive with NULLs
    iv2 = iv.withColumnRenamed("__bin__", "__ibin__")
    jc = F.col("__bin__") == F.col("__ibin__")
    for k in keys:
        jc = jc & (ev[k] == iv2[k])
    jc = jc & cond
    out = ev.join(iv2, on=jc, how="left")
    for k in keys:
        out = out.drop(iv2[k])
    return out.drop("__bin__", "__ibin__")
