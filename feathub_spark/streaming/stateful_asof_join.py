"""Streaming point-in-time (as-of) join as a stateful operator.

Flink runs the reference's temporal join with versioned-table state
(join_utils.py:243-331); Spark has no streaming as-of primitive, so this
operator re-creates it with applyInPandasWithState over the tagged UNION of
both streams (the same union-sort idea as the batch plan, with state
instead of a sort):

- both sides are watermarked; the union's watermark is the minimum, so
  when wm passes a left row's time, every right row at-or-before it has
  arrived;
- per join-key state: right history (ms, payload-json) + left rows pending
  the watermark;
- a left row at t emits joined with the largest right ms <= t, NULL if
  none — exactly the batch/golden semantics;
- right history is pruned to the as-of frontier: the single latest right
  row at-or-before the watermark survives (any future left row is newer
  than wm), plus everything after wm.  State is bounded by the
  out-of-orderness window, not the stream length.

Right-timestamp ties (two right rows with the same key AND timestamp):
the batch plan picks the MAX payload struct deterministically
(join_utils.py); this operator matches it by sorting rights on
(ms, parsed-payload tuple) — JSON field order is the struct field order,
so field-by-field Python comparison mirrors Spark's struct ordering for
numeric/string/bool fields (None sorts first, like Spark's null).  A
payload whose values defy comparison (mixed exotic types) falls back to
arrival order for that key.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feathub_spark.processors.spark.constants import EVENT_TIME_COL
from feathub_spark.streaming._state_json import dumps_state, loads_state

def _tie_encode(v):
    """Null-safe recursive ordering key for one payload value, mirroring
    Spark's ordering: nulls first at EVERY nesting level (a raw list with
    a None element raises TypeError against a number in Python's tuple
    compare, which would silently drop the whole tie sort to arrival
    order); arrays compare element-wise with prefix-shorter first, same
    as Spark.  Maps are unorderable in Spark — every dict encodes
    identically so map ties keep arrival order (the documented batch
    divergence) without poisoning the compare."""
    if v is None:
        return (0, 0)
    if isinstance(v, list):
        return (1, tuple(_tie_encode(x) for x in v))
    if isinstance(v, dict):
        return (1,)
    return (1, v)


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rights", T.StringType()),        # [[ms, rv_json], ...]
        T.StructField("pending_left", T.StringType()),  # [[ms, row_json], ...]
    ]
)


def stateful_asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: List[str],
    right_fields: dict,
) -> DataFrame:
    """right_fields: output column -> right column.  Both inputs are
    streaming DataFrames carrying a watermarked EVENT_TIME_COL."""
    left_cols = [c for c in left.columns if c != EVENT_TIME_COL]
    left_struct = T.StructType([left.schema[c] for c in left_cols])
    right_struct = T.StructType(
        [
            T.StructField(out, right.schema[rc].dataType)
            for out, rc in right_fields.items()
        ]
    )

    # rows whose timestamp failed to parse have no event-time position and
    # cannot participate in a temporal join
    left = left.filter(F.col(EVENT_TIME_COL).isNotNull())
    right = right.filter(F.col(EVENT_TIME_COL).isNotNull())
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.unix_millis(F.col(EVENT_TIME_COL)).alias("__ms__"),
        F.lit(1).alias("__side__"),
        F.to_json(F.struct(*[F.col(c) for c in left_cols])).alias("__payload__"),
        F.col(EVENT_TIME_COL),
    )
    r2 = right.filter(
        " AND ".join(f"`{k}` IS NOT NULL" for k in keys)
    ).select(
        *[F.col(k) for k in keys],
        F.unix_millis(F.col(EVENT_TIME_COL)).alias("__ms__"),
        F.lit(0).alias("__side__"),
        F.to_json(
            F.struct(*[F.col(rc).alias(out) for out, rc in right_fields.items()])
        ).alias("__payload__"),
        F.col(EVENT_TIME_COL),
    )
    unioned = l2.unionByName(r2)

    out_schema = T.StructType(
        [unioned.schema[k] for k in keys]
        + [
            T.StructField("__ms__", T.LongType()),
            T.StructField("__left_json__", T.StringType()),
            T.StructField("__right_json__", T.StringType()),
        ]
    )
    nk = len(keys)
    payload_fields = list(right_fields)  # struct field order for tie keys

    def process_key(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            rights_json, pending_json = state.get
            rights = loads_state(rights_json)
            pending = loads_state(pending_json)
        else:
            rights, pending = [], []

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ms = int(row[nk])
                side = int(row[nk + 1])
                payload = row[nk + 2]
                if side == 0:
                    rights.append([ms, payload])
                else:
                    pending.append([ms, payload])

        wm = state.getCurrentWatermarkMs()

        def _payload_key(rjson):
            # batch tie rule: max payload struct wins among equal ms.
            # Index by the declared field order (to_json DROPS null
            # fields, so positional parsing would misalign).  Note the
            # granularity difference vs batch: batch orders the running
            # last by unix_micros, so right rows distinct at sub-ms
            # become payload-ordered "ties" only here (parity tests pin
            # event times at ms boundaries).
            import json as _json

            vals = _json.loads(rjson)
            return tuple(_tie_encode(vals.get(n)) for n in payload_fields)

        try:
            rights.sort(key=lambda r: (r[0], _payload_key(r[1])))
        except TypeError:
            # uncomparable payload values — keep arrival order on ties
            rights.sort(key=lambda r: r[0])

        ready = sorted([p for p in pending if p[0] <= wm], key=lambda p: p[0])
        pending = [p for p in pending if p[0] > wm]

        emissions = []
        for ms, left_json in ready:
            match = None
            for rms, rjson in rights:
                if rms <= ms:
                    match = rjson
                else:
                    break
            emissions.append(list(key) + [ms, left_json, match])

        # prune: keep the single latest right <= wm (the as-of value for any
        # future left row) plus rights beyond the watermark
        at_or_before = [r for r in rights if r[0] <= wm]
        keep = at_or_before[-1:] + [r for r in rights if r[0] > wm]
        rights = keep

        state.update((dumps_state(rights), dumps_state(pending)))
        # re-arm only while left rows are buffered: the retained right
        # as-of value needs no timer (new data re-arms), and an
        # unconditional re-arm wakes every historical key on every
        # watermark advance forever — O(total keys) per trigger
        if pending:
            state.setTimeoutTimestamp(max(wm + 1, 1))

        if emissions:
            yield pd.DataFrame(
                emissions,
                columns=keys + ["__ms__", "__left_json__", "__right_json__"],
            )

    joined = unioned.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        process_key,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    restored = joined.withColumn(
        "__l__", F.from_json(F.col("__left_json__"), left_struct)
    ).withColumn("__r__", F.from_json(F.col("__right_json__"), right_struct))
    out_names = list(right_fields.keys())
    passthrough = [c for c in left_cols if c not in out_names]
    return restored.select(
        *[F.col(f"__l__.{c}").alias(c) for c in passthrough],
        F.timestamp_millis(F.col("__ms__")).alias(EVENT_TIME_COL),
        *[F.col(f"__r__.{n}").alias(n) for n in out_names],
    )
