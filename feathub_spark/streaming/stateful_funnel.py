"""Streaming ordered-funnel operator (the unbounded counterpart of
datapipe.sessions.funnel_steps).

The batch funnel is a greedy earliest-chain scan in event-time order —
an ONLINE algorithm — so the streaming form is exact, not approximate:
buffer events per key until the watermark passes them (late data within
the watermark re-sorts correctly; later is dropped, the standard
contract), walk the ready events in time order, and advance the chain
state exactly as the batch fold would.  One output row is emitted each
time a key's chain ADVANCES (append mode), carrying the new step count
and the chosen step timestamps; the final emission per key equals the
batch result over the same completed prefix (conformance-tested).

State per key is tiny and bounded: the chain (<= m timestamps) plus the
under-watermark buffer — no event history is retained once consumed,
unlike the over-window operator, because the greedy chain never
revisits past events.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feathub_spark.processors.spark.constants import EVENT_TIME_COL
from feathub_spark.streaming._state_json import dumps_state, loads_state

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),     # [ms, ...] chosen steps
        T.StructField("pending", T.StringType()),   # [[ms, type], ...]
    ]
)


def stateful_funnel(
    df: DataFrame,
    key_col: str,
    type_col: str,
    steps: List[str],
    event_time_col: str = EVENT_TIME_COL,
) -> DataFrame:
    """``df`` must be a streaming DataFrame with a watermark on
    ``event_time_col``.  Returns one row per chain advance:
    (key_col, n_steps, step_ts array<bigint> epoch-millis, advanced_ms).

    Liveness note: the operator prunes non-funnel event types at the scan
    (Catalyst pushes the IN filter below the watermark node), so ONLY
    funnel-type events advance the watermark.  On a stream where funnel
    types can go quiet for long stretches, either route a heartbeat
    through a funnel type or apply the type filter upstream of your own
    watermark policy."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must name at least one event type")
    m = len(steps)

    prepared = (
        df.filter(F.col(type_col).isin(steps))
        # a NULL event time (unparseable timestamp) reaches the pandas
        # batch as NaN and int(NaN) kills the query; the batch
        # funnel_steps filters the same way
        .filter(F.col(event_time_col).isNotNull())
        .withColumn("__ms__", F.unix_millis(F.col(event_time_col)))
        .select(key_col, "__ms__", F.col(type_col).alias("__tp__"),
                event_time_col)
    )
    key_field = prepared.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("n_steps", T.IntegerType()),
            T.StructField("step_ts", T.ArrayType(T.LongType())),
            T.StructField("advanced_ms", T.LongType()),
        ]
    )

    def process_key(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            chain_json, pending_json = state.get
            chain = loads_state(chain_json)
            pending = loads_state(pending_json)
        else:
            chain, pending = [], []

        if len(chain) == m:
            # Terminal: the funnel already completed for this key.  Don't
            # buffer the new events and don't re-arm the timeout — state
            # stays at the bounded m-element chain (needed to suppress
            # re-emission if more events arrive), never grows.
            return

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                pending.append([int(row[1]), row[2]])

        wm = state.getCurrentWatermarkMs()
        ready = sorted(
            (p for p in pending if p[0] <= wm), key=lambda p: (p[0], p[1])
        )
        pending = [p for p in pending if p[0] > wm]

        emissions = []
        for ms, tp in ready:
            k = len(chain)
            if k < m and tp == steps[k] and (k == 0 or ms > chain[-1]):
                chain.append(ms)
                emissions.append(
                    list(key) + [len(chain), list(chain), ms]
                )

        if len(chain) == m:
            # Completed this batch: drop buffered events (nothing can
            # advance any more) and stop re-arming the timeout so the key
            # is never woken again; the m-element chain alone remains.
            pending = []
        state.update((dumps_state(chain), dumps_state(pending)))
        # re-arm ONLY while events are buffered: an unconditional re-arm
        # wakes every historical key on every watermark advance forever
        # (per-trigger cost O(total distinct keys) on long streams)
        if len(chain) < m and pending:
            state.setTimeoutTimestamp(max(wm + 1, 1))

        if emissions:
            yield pd.DataFrame(
                emissions,
                columns=[key_col, "n_steps", "step_ts", "advanced_ms"],
            )

    return prepared.groupBy(F.col(key_col)).applyInPandasWithState(
        process_key,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
