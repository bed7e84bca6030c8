"""Snapshot differencing — the change-data-capture primitive for
incremental pipelines: given two keyed snapshots of the same logical
table, emit what was added, removed, or changed.  The continuous-ingest
counterpart of :mod:`feathub_spark.datapipe.passages`' incremental
fingerprint index: re-deriving features over 100 TB nightly is the thing
you do NOT do; diff the snapshots and reprocess only the delta.

Plan shape: ONE full-outer equi-join on the key (both sides shuffle once
on the same key — co-partitioned if the snapshots are bucketed by key,
see FileSystemSink bucket_by), change classification is pure per-row
expression work, and unchanged rows are dropped before anything else
consumes the result, so the output is delta-sized, not snapshot-sized.
NULL-safe comparison (<=>) treats NULL -> value and value -> NULL as real
changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] = None,
    change_col: str = "change_type",
) -> DataFrame:
    """Diff two snapshots of a keyed table.

    Returns one row per key whose state differs: ``change_col`` in
    {'added', 'removed', 'changed'} plus, for every compared column C,
    ``C_old`` and ``C_new`` (NULL on the absent side).  Unchanged keys
    are omitted.  ``compare_cols`` defaults to every non-key column the
    two snapshots share; comparison is NULL-safe.  Keys must be unique
    per snapshot (enforce upstream; duplicate keys would cross-join in
    the outer join)."""
    key_cols = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("no columns to compare")

    o = ensure_parallelism(old).select(
        *key_cols,
        F.lit(True).alias("__in_old__"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = ensure_parallelism(new).select(
        *key_cols,
        F.lit(True).alias("__in_new__"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")
    any_diff = None
    for c in compare_cols:
        d = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        any_diff = d if any_diff is None else (any_diff | d)
    change = (
        F.when(F.col("__in_old__").isNull(), F.lit("added"))
        .when(F.col("__in_new__").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    return (
        j.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(
            *key_cols,
            change_col,
            *[f"{c}_old" for c in compare_cols],
            *[f"{c}_new" for c in compare_cols],
        )
    )


def merge_aggregates(
    prev: DataFrame,
    delta: DataFrame,
    key_cols,
    agg_specs,
) -> DataFrame:
    """Incremental maintenance of a per-key aggregate table: fold RAW
    ``delta`` rows into yesterday's materialized ``prev`` aggregates
    without rescanning history — the reason a 100 TB nightly job can be
    a delta-sized job instead (pairs with :func:`diff_snapshots` for
    finding the delta).

    ``agg_specs`` maps output column -> (kind, value_col) with kind in
    {'count', 'sum', 'min', 'max'} — the distributive aggregates, which
    are exactly the ones mergeable from partials (avg = merged sum /
    merged count; for mergeable distinct counts see
    ``profile.hll_distinct``'s register tables).  ``prev`` must carry
    the same output columns from the previous run (an empty/missing key
    contributes identity: 0 for count/sum, NULL-skipping for min/max).
    For float sums prefer integer units upstream (exactness is what
    makes merged == recomputed verifiable).

    Plan: ONE groupBy over the delta + ONE co-keyed full-outer join with
    prev — cost scales with |delta| + |touched keys|, never with
    history.

    Returns (*key_cols, *agg_specs)."""
    key_cols = list(key_cols)
    aggs = []
    for out, (kind, col) in agg_specs.items():
        if kind == "count":
            aggs.append(F.count(F.col(col)).alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col)).alias(out))
        elif kind == "min":
            aggs.append(F.min(F.col(col)).alias(out))
        elif kind == "max":
            aggs.append(F.max(F.col(col)).alias(out))
        else:
            raise ValueError(f"unmergeable agg kind: {kind}")
    d = ensure_parallelism(delta).groupBy(*key_cols).agg(*aggs)
    p = prev.select(
        *key_cols, *[F.col(o).alias(f"__p_{o}__") for o in agg_specs]
    )
    j = p.join(d, on=key_cols, how="full_outer")
    merged = []
    for out, (kind, _) in agg_specs.items():
        a, b = F.col(f"__p_{out}__"), F.col(out)
        if kind in ("count", "sum"):
            zero = F.lit(0).cast("bigint") if kind == "count" else F.lit(0)
            m = F.coalesce(a, zero) + F.coalesce(b, zero)
        elif kind == "min":
            m = F.least(a, b)
        else:
            m = F.greatest(a, b)
        merged.append(m.alias(out))
    return j.select(*key_cols, *merged)
