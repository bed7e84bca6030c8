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
One shuffle, linear state, no row explosion, and AQE handles skew.  Right
rows sort before left rows at the same timestamp so ``right_ts == left_ts``
matches (inclusive as-of).

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


def temporal_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    right_fields: Dict[str, str],
    valid_time_ms: Optional[int] = None,
    defaults: Optional[Dict[str, object]] = None,
) -> DataFrame:
    """As-of join ``right_fields`` (output column -> right column) onto left.

    Keyed by OUTPUT name so two features reading the same right column
    (e.g. one map feature under different entry keys) don't collide.
    Both inputs must carry the EVENT_TIME_COL metadata column.
    """
    keys = list(keys)
    left_cols = left.columns

    payload = F.struct(
        F.unix_millis(F.col(EVENT_TIME_COL)).alias(_RIGHT_TS),
        *[F.col(rc).alias(out) for out, rc in right_fields.items()],
    )
    # Right rows with a NULL key can never match (SQL equality join).
    right_clean = right
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
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(EVENT_TIME_COL).asc(), F.col(_SIDE_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _PAYLOAD_COL, F.last(F.col(_PAYLOAD_COL), ignorenulls=True).over(w)
    )
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
