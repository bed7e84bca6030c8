"""SCD2 temporal tables: collapse an append-only change log into
slowly-changing-dimension validity intervals and reconstruct exact
point-in-time snapshots from them.

This is the materialized dual of the engine's point-in-time as-of join
(processors/spark/join_utils.py): the as-of join answers "what was the
value at each left-row's time" per probe, while an SCD2 table answers it
for ANY time with a plain range filter — the right shape when one
dimension is probed by many downstream queries.  The reference models
this implicitly through its timestamped feature tables
(/root/reference/python/feathub/table/table_descriptor.py keys+timestamp
contract); here it's an explicit, materializable operator.

Scale shape (100 TB): one hash shuffle on the key columns; both window
passes and the interval close-out reuse that single exchange (the lead()
runs on the already-partitioned change rows).  No joins, no driver
collection.  Hot keys serialize within their window task exactly like
over-windows — for power-law keys, bound the per-key change-row count
upstream or use the salted over-window variants' chunking idea.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feathub_spark.common.parallelism import ensure_parallelism

__all__ = ["scd2_intervals", "scd2_merge", "scd2_snapshot"]


def _as_list(x: Union[str, Sequence[str], None]) -> list:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def scd2_intervals(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
    ts_col: str,
    attr_cols: Union[str, Sequence[str]],
    tie_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Input: one row per observed state ``(keys..., ts, attrs...)`` —
    an append-only event/CDC stream.  Output: one row per *distinct
    consecutive state* with ``valid_from`` (the ts of the first event
    carrying that state) and ``valid_to`` (the ts of the next state
    change; NULL for the currently-open interval).  Consecutive rows
    whose attributes are unchanged (null-safe comparison) are collapsed
    into the earlier interval.

    ``tie_cols`` break ordering ties for events sharing a timestamp; with
    ties, earlier rows become zero-length ``[t, t)`` intervals that no
    snapshot selects — the last row in tie order wins at time t, which is
    the standard CDC convention.  Pass a unique event id for
    deterministic results whenever timestamps can collide.

    Columns: ``(*key_cols, *attr_cols, valid_from, valid_to)``.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    ties = _as_list(tie_cols)
    if not keys or not attrs:
        raise ValueError("scd2_intervals needs key_cols and attr_cols")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in ties]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = F.row_number().over(w) == 1
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))

    changes = (
        ensure_parallelism(df)
        .select(*keys, *attrs, F.col(ts_col), *(c for c in ties))
        .withColumn("__chg__", changed)
        .filter(F.col("__chg__"))
    )
    # Same partition keys as the first window: the filtered rows are
    # already hash-distributed by `keys`, so this window adds a sort but
    # no second exchange.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return changes.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )


def scd2_merge(
    intervals: DataFrame,
    delta: DataFrame,
    key_cols: Union[str, Sequence[str]],
    ts_col: str,
    attr_cols: Union[str, Sequence[str]],
    tie_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Incrementally fold a new batch of change events into an existing
    SCD2 interval table — under the append-only contract below the output
    is row-identical to rebuilding from the full concatenated log (unit-
    and oracle-verified, including randomized planted boundary events),
    but the work touches only the DELTA's keys: closed intervals never
    change (a closed interval is immutable history), and open intervals
    of keys absent from the delta pass through untouched.

    Append-only contract: rebuild-identity requires every delta event to
    be AT or AFTER its key's last observation in the base log.  The
    interval table stores only ``valid_from`` — consecutive unchanged
    observations collapse into one interval, so a delta landing INSIDE an
    open interval's collapsed span (after ``valid_from`` but before a
    later same-state observation) cannot be reconstructed from the table
    alone; an append-only CDC log never produces such events.  A delta
    event strictly BEFORE ``valid_from`` is LATE — it would rewrite
    closed history — and is dropped (mirroring the streaming operator's
    watermark contract); route late data through a full rebuild if it
    must count.  Snapshot note: only the OPEN intervals are cached (see
    below); the closed branch re-reads the live input per action, so
    when ``intervals`` scans a MUTABLE source, run one action per merge
    (or pre-persist the input yourself) — the standard single-snapshot
    caveat of any multi-branch plan over mutable storage.

    A delta event AT exactly ``valid_from`` is kept when
    ``tie_cols`` are present and tie-resolved against the open interval's
    seed row: the seed carries NULL ``tie_cols`` (NULLS FIRST), so the
    delta wins at that instant and the seed state collapses to a
    zero-length ``[t, t)`` interval — exactly what a full rebuild
    produces whenever new events' tie values sort after existing ones
    (the monotone-event-id CDC convention).  With non-monotone tie
    values a full rebuild could instead keep the ORIGINAL event at t
    (its real tie value is not stored on the interval), so equal-ts
    identity additionally assumes monotone ties.

    Plan shape: one shuffle of the (small) delta by key, one broadcast-
    friendly semi/anti split of the open intervals, and the interval
    rebuild runs only over open-seed + delta rows per affected key.
    Closed intervals stream through with no shuffle at all.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    ties = _as_list(tie_cols)
    if not keys or not attrs:
        raise ValueError("scd2_merge needs key_cols and attr_cols")

    from feathub_spark.common.caching import register_cache

    closed = intervals.filter(F.col("valid_to").isNotNull()).select(
        *keys, *attrs, "valid_from", "valid_to"
    )
    # ONLY the open intervals are cached: they feed four consumers
    # (untouched anti join, affected semi join, the seed, the late-delta
    # filter) and are bounded by the LIVE key count, while the closed
    # history — the bulk of the table — is consumed exactly once and
    # must keep streaming straight into the union.  When `intervals`
    # arrives as a live scd2_intervals subplan its window work still
    # replays once per branch; pre-persist the input yourself if that
    # matters more than keeping history un-materialized.  (Caller
    # releases via release_caches().)
    open_iv = register_cache(intervals.filter(F.col("valid_to").isNull()))
    dkeys = delta.select(*keys).distinct()

    # NULL-SAFE key matching throughout: scd2_intervals groups NULL keys
    # (partitionBy treats NULLs as one group), so a NULL-key open interval
    # is a real row — plain equi-joins would route it to BOTH the
    # untouched branch and a from-scratch rebuild, emitting two
    # conflicting open intervals for the same key
    dk = dkeys.select(
        *[F.col(k).alias(f"__dk_{k}__") for k in keys]
    )
    null_safe = [
        F.col(k).eqNullSafe(F.col(f"__dk_{k}__")) for k in keys
    ]
    untouched_open = open_iv.join(dk, on=null_safe, how="left_anti").select(
        *keys, *attrs, "valid_from", "valid_to"
    )
    affected_open = open_iv.join(dk, on=null_safe, how="left_semi")

    # seed = the open interval replayed as the key's earliest event; late
    # delta rows (ts < seed ts) are dropped, equal-ts rows are kept and
    # win the tie against the seed's NULL tie_cols (see docstring)
    null_ties = [F.lit(None).cast(delta.schema[c].dataType).alias(c)
                 for c in ties]
    seed = affected_open.select(
        *keys, *attrs, F.col("valid_from").alias(ts_col), *null_ties
    )
    # without tie_cols an equal-ts seed-vs-delta order would be
    # nondeterministic, so equal-ts admission requires ties
    cmp = (
        F.col(ts_col) >= F.col("__seed_ts__")
        if ties
        else F.col(ts_col) > F.col("__seed_ts__")
    )
    seed_ts = affected_open.select(
        *[F.col(k).alias(f"__sk_{k}__") for k in keys],
        F.col("valid_from").alias("__seed_ts__"),
    )
    fresh = delta.join(
        seed_ts,
        on=[F.col(k).eqNullSafe(F.col(f"__sk_{k}__")) for k in keys],
        how="left",
    ).filter(F.col("__seed_ts__").isNull() | cmp).select(
        *keys, *attrs, ts_col, *ties
    )

    rebuilt = scd2_intervals(
        seed.unionByName(fresh), keys, ts_col, attrs, tie_cols=ties
    )
    return closed.unionByName(untouched_open).unionByName(rebuilt)


def scd2_snapshot(
    intervals: DataFrame,
    at,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time snapshot of an SCD2 interval table: the rows whose
    interval contains ``at`` (``valid_from <= at < valid_to``, open
    intervals have NULL ``valid_to``).  A plain filter — it pushes down
    to the scan, so a snapshot of a partitioned/z-ordered interval table
    reads only the matching row groups."""
    lit = F.lit(at)
    return intervals.filter(
        (F.col(valid_from_col) <= lit)
        & (F.col(valid_to_col).isNull() | (F.col(valid_to_col) > lit))
    )
