"""Categorical feature encoders for training pipelines.

Target encoding (a.k.a. mean/impact encoding) replaces a categorical
value with the target's mean over that category.  The naive form leaks
the row's own label into its feature; the standard fixes are BOTH here:
leave-one-out (each row's own target is excluded from its category mean)
and additive smoothing toward the global mean (categories with few rows
shrink to the prior, so rare categories don't memorize their labels).

Plan shape: one map-side-combinable aggregate to the category-sized
(sum, count) table, broadcast back onto the rows, and the global prior
is a 1-row broadcast — no window over rows, no per-category sort, no
second scan.  Everything is arithmetic on the broadcast sums, so the
encode is a pure map stage after one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism

__all__ = ["target_encode"]


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    out_col: str = None,
    smoothing: float = 20.0,
    leave_one_out: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """Append ``out_col`` (default ``{category_col}_te``) =
    ``(cat_sum [- own] + smoothing * global_mean) /
    (cat_count [- 1] + smoothing)``.

    With ``leave_one_out`` a single-row category falls back entirely to
    the prior (0/0 avoided by the smoothing term).  Rows whose category
    is NULL or UNSEEN in the labeled data get the global mean; a
    NULL-TARGET row of a known category gets that category's smoothed
    (non-leave-one-out) mean — it is a serve-time row, and the trained
    category encoding is exactly what serving should emit.  Every other
    column rides through."""
    out_col = out_col or f"{category_col}_te"
    t = F.col(target_col).cast("double")
    cat_stats = (
        ensure_parallelism(df)
        .filter(F.col(category_col).isNotNull() & t.isNotNull())
        .groupBy(category_col)
        .agg(
            F.sum(t).alias("__csum__"),
            F.count(F.lit(1)).cast("double").alias("__cn__"),
        )
    )
    prior = cat_stats.agg(
        (F.sum("__csum__") / F.sum("__cn__")).alias("__gmean__")
    )
    joined = (
        df.join(F.broadcast(cat_stats), on=category_col, how="left")
        .crossJoin(F.broadcast(prior))
    )
    m = F.lit(float(smoothing))
    if leave_one_out:
        own = F.when(t.isNotNull(), t).otherwise(F.lit(0.0))
        dec = F.when(t.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
        num = F.col("__csum__") - own + m * F.col("__gmean__")
        den = F.col("__cn__") - dec + m
    else:
        num = F.col("__csum__") + m * F.col("__gmean__")
        den = F.col("__cn__") + m
    # nullif guards smoothing=0 + leave-one-out on a single-row category
    # (0.0/0.0 is NaN in Spark, not an error) — the prior is the
    # documented fallback when nothing remains to average
    ratio, gm = num / F.nullif(den, F.lit(0.0)), F.col("__gmean__")
    if round_dp is not None:
        ratio, gm = F.round(ratio, round_dp), F.round(gm, round_dp)
    enc = F.coalesce(
        F.when(F.col("__csum__").isNotNull(), ratio), gm
    )
    return joined.withColumn(out_col, enc).drop(
        "__csum__", "__cn__", "__gmean__"
    )
