"""Dataset profiling: fixed-width histograms and per-column statistics —
the routine data-quality surface a pipeline run reports before training
(row/null/distinct counts, ranges, value distributions).

Histograms use in-plan bounds (a 1-row broadcast min/max aggregate when
bounds are not supplied) and integer bin arithmetic, so results are exact
and engine-reproducible; the profiler is one wide aggregate pass per
table (count-distinct columns add Spark's expand, still one shuffle
round).  Nothing here collects to the driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, bin_lo, bin_hi,
    n) for every NON-EMPTY bin, bin 0 starting at ``lo``.  Without
    explicit bounds the exact min/max come from a 1-row broadcast
    aggregate (no collect, no second job).  Values exactly at ``hi`` land
    in the last bin; NULLs are dropped.  One map-side-combinable groupBy
    on the bin id."""
    v = F.col(value_col).cast("double")
    base = ensure_parallelism(df).filter(v.isNotNull()).select(v.alias("__v__"))
    if lo is None or hi is None:
        bounds = base.alias("__b__").agg(
            F.min("__v__").alias("__lo__"), F.max("__v__").alias("__hi__")
        )
        base = base.crossJoin(F.broadcast(bounds))
    else:
        base = base.withColumn("__lo__", F.lit(float(lo))).withColumn(
            "__hi__", F.lit(float(hi))
        )
    width = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(n_bins))
    bin_id = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("__v__") - F.col("__lo__")) / width).cast("int"),
        ),
    )
    return (
        base.withColumn("bin", bin_id.cast("int"))
        .groupBy("bin")
        .agg(
            F.round(F.first("__lo__") + F.col("bin") * F.first(width), 6
                    ).alias("bin_lo"),
            F.round(F.first("__lo__") + (F.col("bin") + 1) * F.first(width), 6
                    ).alias("bin_hi"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def profile_columns(
    df: DataFrame, cols: Optional[Sequence[str]] = None
) -> DataFrame:
    """Per-column profile in long format: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) with min/max rendered as strings so
    mixed types share one schema.  n_distinct is EXACT (count-distinct;
    at extreme widths switch to approx_count_distinct yourself — exactness
    is the point of a profile gate).  One aggregate pass."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}__"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}__"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}__"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}__"),
        ]
    wide = ensure_parallelism(df).agg(*aggs)
    structs = ", ".join(
        f"named_struct('column', '{c}', 'n_rows', __n__, "
        f"'n_nulls', __n__ - `__nn_{c}__`, 'n_distinct', `__nd_{c}__`, "
        f"'min_value', `__mn_{c}__`, 'max_value', `__mx_{c}__`)"
        for c in cols
    )
    return wide.select(
        F.explode(F.expr(f"array({structs})")).alias("__p__")
    ).select("__p__.*")
