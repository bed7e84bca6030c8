"""Point-in-time (event-time as-of) join on Spark.

Golden semantics are the reference local nested loop
(processors/local/local_processor.py:453-523): for each left row at time t,
take the right row with the largest right_time <= t matching equality on the
join keys; NULL when none exists.  NULL join keys never match.

Physical strategy — union + last_value, not a theta join:

The reference Spark processor implements this as a ``l.ts >= r.ts`` theta
left-join followed by a row_number window filter
(spark/dataframe_builder/join_utils.py:72-110).  That materializes
|left| x |matching right| intermediate rows per key — quadratic in the hot
keys, catastrophic at 100 TB.  Instead we tag and union both sides, sort each
key partition once by (ts, side), and carry the latest right-side payload
forward with ``last(ignorenulls)`` over an unbounded-preceding rows frame.
One shuffle, linear state, no row explosion.  Right rows sort before left
rows at the same timestamp so ``right_ts == left_ts`` matches (inclusive
as-of).

Hot-key caveat: AQE's skew mitigation applies to joins, not window
operators — the plain union plan still serializes each key into one task.
``salt_chunk_ms`` opts into the time-chunked two-phase variant (the as-of
analog of evaluate_salted_over_window): per-(keys, chunk) last right
payload, exclusive prefix over the tiny chunk table, within-chunk running
last partitioned by (keys, chunk) — a hot key then parallelizes across its
time chunks at the cost of two extra (small) shuffles.

All joined features from one (right_table, keys) pair are fetched in a single
pass (join fusion, reference flink_table_builder.py:322-328): the right
payload travels as one struct column, which also guarantees all features come
from the same right row.

``valid_time_ms`` implements the expiry semantics of joining a sliding view
with empty-window output disabled (reference join_utils.py:57-142): a joined
value older than valid_time_ms is replaced by the agg default.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from feathub_spark.processors.spark.constants import EVENT_TIME_COL

_SIDE_COL = "__asof_side__"      # 0 = right, 1 = left: right first on ties
_PAYLOAD_COL = "__asof_payload__"
_RIGHT_TS = "__right_ts_ms__"
_CHUNK_COL = "__asof_chunk__"
_MS_COL = "__asof_us__"  # unix_micros — full event-time precision
_PREFIX_COL = "__asof_prefix__"


def _payload_orderable(unioned: DataFrame) -> bool:
    """True when the payload struct can participate in an ORDER BY /
    max_by (every field orderable — MapType fields, e.g. a joined
    VALUE_COUNTS feature, are not)."""
    from pyspark.sql import types as T

    def ok(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(ok(f.dataType) for f in dt.fields)
        return True

    return ok(unioned.schema[_PAYLOAD_COL].dataType)


def _chunked_asof_fill(
    unioned: DataFrame, keys: Sequence[str], chunk_ms: int
) -> DataFrame:
    """Hot-key-safe payload fill: split each key's timeline into chunks of
    ``chunk_ms`` so the running-last parallelizes across (keys, chunk)
    partitions instead of serializing the whole key into one task.

      1. per-(keys, chunk) last right payload — map-side combinable
         (max_by over right rows only; ties on right ts resolved
         arbitrarily, same as the reference);
      2. exclusive running last over the tiny per-key chunk grid;
      3. within-chunk running last + coalesce with the chunk prefix.
    """
    keys = list(keys)
    # FULL-precision (microsecond) ordering: the unsalted plan orders by
    # the raw event time, so ordering the chunked plan by truncated
    # millis would let a left row match a right row up to 999us in its
    # future on sub-millisecond data.  Chunk boundaries stay at chunk_ms
    # (the same instants, expressed in micros).
    us = F.unix_micros(F.col(EVENT_TIME_COL))
    base = unioned.withColumn(_MS_COL, us).withColumn(
        _CHUNK_COL, F.floor(F.col(_MS_COL) / F.lit(int(chunk_ms) * 1000))
    )

    # deterministic ties: among right rows sharing a timestamp the MAX
    # payload struct wins when orderable (same rule as the unsalted plan)
    tie = f", {_PAYLOAD_COL}" if _payload_orderable(base) else ""
    chunk_last = (
        base.filter(F.col(_SIDE_COL) == 0)
        .groupBy(*keys, _CHUNK_COL)
        .agg(
            F.expr(
                f"max_by({_PAYLOAD_COL}, struct({_MS_COL}{tie}))"
            ).alias("__chunk_payload__")
        )
    )
    grid = base.select(*keys, _CHUNK_COL).distinct()
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_CHUNK_COL))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        grid.join(chunk_last, on=keys + [_CHUNK_COL], how="left")
        .withColumn(
            _PREFIX_COL,
            F.last(F.col("__chunk_payload__"), ignorenulls=True).over(wprev),
        )
        .select(*keys, _CHUNK_COL, _PREFIX_COL)
    )

    joined = base.join(prefix, on=keys + [_CHUNK_COL], how="left")
    order = [F.col(_MS_COL).asc(), F.col(_SIDE_COL).asc()]
    if tie:
        # NULL payloads (left rows) sort first within a (ts, side) run,
        # never shadowing a real right payload
        order.append(F.col(_PAYLOAD_COL).asc_nulls_first())
    wchunk = (
        Window.partitionBy(*keys, F.col(_CHUNK_COL))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            _PAYLOAD_COL,
            F.coalesce(
                F.last(F.col(_PAYLOAD_COL), ignorenulls=True).over(wchunk),
                F.col(_PREFIX_COL),
            ),
        )
        .drop(_CHUNK_COL, _MS_COL, _PREFIX_COL)
    )


def temporal_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    right_fields: Dict[str, str],
    valid_time_ms: Optional[int] = None,
    defaults: Optional[Dict[str, object]] = None,
    salt_chunk_ms=None,
    probe_cache: Optional[dict] = None,
    decisions: Optional[list] = None,
) -> DataFrame:
    """As-of join ``right_fields`` (output column -> right column) onto left.

    Keyed by OUTPUT name so two features reading the same right column
    (e.g. one map feature under different entry keys) don't collide.
    Both inputs must carry the EVENT_TIME_COL metadata column.

    ``salt_chunk_ms`` opts into the hot-key-safe time-chunked plan (module
    docstring); results are identical up to right-timestamp ties.  An int
    is used as-is; ``"auto"`` / an AutoSalt policy runs the plan-time skew
    probe over the unioned stream (skew_probe.py) and salts only when a
    hot key is detected.  ``probe_cache`` memoizes probe verdicts;
    ``decisions`` (if given) receives ("asof", keys, chunk_ms_or_None).

    Right-timestamp ties are DETERMINISTIC when the payload is orderable
    (no map fields): the max payload struct wins, independent of the
    physical partition layout — without this the same pipeline produced
    different features on a different core count.  Both the plain and
    chunked plans apply the same rule, so they stay row-identical.
    """
    keys = list(keys)
    left_cols = left.columns

    payload = F.struct(
        F.unix_millis(F.col(EVENT_TIME_COL)).alias(_RIGHT_TS),
        *[F.col(rc).alias(out) for out, rc in right_fields.items()],
    )
    # Right rows with a NULL key can never match (SQL equality join), and
    # a NULL event time (an unparseable right timestamp) must never match
    # either: ascending NULLS FIRST would sort it to the partition head
    # and last(ignorenulls) would fill its payload forward over every
    # early left row — the golden rule is "largest right_time <= t".
    # (The chunked plan already drops NULL-chunk rows; the filter keeps
    # the two plans row-identical.)
    right_clean = right.filter(F.col(EVENT_TIME_COL).isNotNull())
    for k in keys:
        right_clean = right_clean.filter(F.col(k).isNotNull())
    right_tagged = right_clean.select(
        *[F.col(k) for k in keys],
        F.col(EVENT_TIME_COL),
        F.lit(0).alias(_SIDE_COL),
        payload.alias(_PAYLOAD_COL),
    )
    left_tagged = left.withColumn(_SIDE_COL, F.lit(1)).withColumn(
        _PAYLOAD_COL, F.lit(None).cast(right_tagged.schema[_PAYLOAD_COL].dataType)
    )

    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)
    if salt_chunk_ms is not None and not isinstance(salt_chunk_ms, int):
        from feathub_spark.processors.spark.skew_probe import resolve_salt_chunk_ms

        salt_chunk_ms = resolve_salt_chunk_ms(
            salt_chunk_ms, unioned, keys, EVENT_TIME_COL, cache=probe_cache
        )
    if decisions is not None:
        decisions.append(("asof", tuple(keys), salt_chunk_ms))
    if salt_chunk_ms is None:
        order = [F.col(EVENT_TIME_COL).asc(), F.col(_SIDE_COL).asc()]
        if _payload_orderable(unioned):
            # Deterministic right-timestamp ties: without this, the
            # winner among equal-(key, ts) right rows depended on the
            # physical partition layout — the same pipeline produced
            # DIFFERENT features on a different core/partition count.
            # The MAX payload struct wins; left rows' NULL payloads sort
            # first so they never shadow a real payload.  Map-typed
            # payloads (joined VALUE_COUNTS) are not orderable and keep
            # the arbitrary-tie behavior.
            order.append(F.col(_PAYLOAD_COL).asc_nulls_first())
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.withColumn(
            _PAYLOAD_COL, F.last(F.col(_PAYLOAD_COL), ignorenulls=True).over(w)
        )
    else:
        filled = _chunked_asof_fill(unioned, keys, salt_chunk_ms)
    result = filled.filter(F.col(_SIDE_COL) == 1)

    out_cols: Dict[str, Column] = {}
    for out in right_fields:
        col = F.col(f"{_PAYLOAD_COL}.{out}")
        if valid_time_ms is not None:
            expired = (
                F.unix_millis(F.col(EVENT_TIME_COL))
                >= F.col(f"{_PAYLOAD_COL}.{_RIGHT_TS}") + F.lit(valid_time_ms)
            )
            default_val = defaults.get(out) if defaults else None
            col = F.when(expired, F.lit(default_val)).otherwise(col)
        out_cols[out] = col

    # A joined feature may overwrite a same-named left column in place.
    select_cols: List[Column] = [
        out_cols[c].alias(c) if c in out_cols else F.col(c) for c in left_cols
    ]
    select_cols += [
        col.alias(n) for n, col in out_cols.items() if n not in left_cols
    ]
    return result.select(*select_cols)
