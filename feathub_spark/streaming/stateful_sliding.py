"""Full-semantics streaming sliding windows: a custom stateful operator.

This is the engine's one genuinely custom physical operator, the Spark
analog of the reference's SlidingWindowKeyedProcessFunction
(java/feathub-udf/.../SlidingWindowKeyedProcessFunction.java:51-64 +
SlidingWindowUtils.java:63-186), re-designed for Structured Streaming's
``applyInPandasWithState``:

- per-key state holds the raw (ms, value...) history for the LARGEST window
  size only — all window sizes share it (the reference's headline state
  optimization, docs/content/deep-dive/optimizations.md:10-33);
- on every trigger, all step windows whose end <= watermark are emitted in
  order: empty windows emit 0 for SUM/COUNT and NULL otherwise
  (enable_empty_window_output), and emissions equal to the previous step are
  suppressed (skip_same_window_output);
- event-time timeout keeps keys draining after input stops: windows keep
  firing until the last window containing data has closed;
- history older than (watermark - max_window) is pruned each trigger.

Aggregations are computed in pandas per (key, window) — the same golden
semantics as the batch evaluator, verified against it in tests.
"""

from __future__ import annotations

import json
import math
from typing import Any, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feathub_spark.common.exceptions import PlanError
from feathub_spark.common.types import to_spark_type
from feathub_spark.dsl.parser import to_spark_sql
from feathub_spark.streaming._state_json import dumps_state, loads_state
from feathub_spark.feature_views.sliding_feature_view import SlidingFeatureView
from feathub_spark.feature_views.transforms.agg_func import AggFunc
from feathub_spark.processors.spark.constants import EVENT_TIME_COL, WINDOW_TIME_MS_COL

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("history", T.StringType()),     # json [[ms, v0, v1...], ...]
        T.StructField("last_wend", T.LongType()),      # last processed step end
        T.StructField("last_values", T.StringType()),  # json of last emission
        T.StructField("drain_wend", T.LongType()),     # first fully-empty wend
    ]
)


def _agg_pandas(agg: AggFunc, values: List[Any]) -> Any:
    """``values`` has one element per filter-passing WINDOW ROW (None for
    rows whose value expression is null).  Reference semantics (local
    aggregation_utils.py): COUNT/ROW_NUMBER = len(l), FIRST/LAST =
    l[0]/l[-1], COLLECT_LIST = list(l) — all INCLUDING null values;
    SUM/AVG/MIN/MAX/VALUE_COUNTS skip null values."""
    vals = [v for v in values if v is not None and not (isinstance(v, float) and math.isnan(v))]
    if agg == AggFunc.SUM:
        return sum(vals) if vals else 0
    if agg == AggFunc.COUNT or agg == AggFunc.ROW_NUMBER:
        return len(values)
    if agg == AggFunc.AVG:
        return (sum(vals) / len(vals)) if vals else None
    if agg == AggFunc.MAX:
        return max(vals) if vals else None
    if agg == AggFunc.MIN:
        return min(vals) if vals else None
    if agg == AggFunc.FIRST_VALUE:
        return values[0] if values else None
    if agg == AggFunc.LAST_VALUE:
        return values[-1] if values else None
    if agg == AggFunc.COLLECT_LIST:
        return list(values) if values else None
    if agg == AggFunc.VALUE_COUNTS:
        if not vals:
            return None
        out = {}
        for v in vals:
            out[v] = out.get(v, 0) + 1
        return out
    raise PlanError(f"Unsupported stateful sliding agg {agg}.")


def stateful_sliding_window(
    df: DataFrame,
    view: SlidingFeatureView,
) -> DataFrame:
    """Apply the stateful sliding operator to a streaming DataFrame carrying
    EVENT_TIME_COL.  Returns keys + window_time ms + agg feature columns."""
    keys = view.group_by_keys
    step_ms = view.step_size_ms
    sliding = view.sliding_features()
    field_names = [f.name for f in sliding]
    windows_ms = [f.transform.window_size_ms for f in sliding]
    max_window = max(windows_ms)
    aggs = [f.transform.agg_func for f in sliding]
    defaults = [f.transform.agg_func.empty_window_default() for f in sliding]
    value_exprs = [to_spark_sql(f.transform.expr) for f in sliding]
    filter_exprs = [
        to_spark_sql(f.transform.filter_expr) if f.transform.filter_expr else None
        for f in sliding
    ]
    limits = [f.transform.limit for f in sliding]
    enable_empty = view.enable_empty_window_output
    skip_same = view.skip_same_window_output

    # Pre-compute per-field raw value and filter-flag columns so the pandas
    # function only sees (keys..., ms, v0..vn, f0..fn) — expressions stay
    # JVM-side.  The flag is separate from the value: a filtered-out row
    # never enters the window, while a passing row with a NULL value still
    # occupies a limit slot.
    prepared = df
    for i, (vexpr, fexpr) in enumerate(zip(value_exprs, filter_exprs)):
        prepared = prepared.withColumn(f"__v{i}__", F.expr(vexpr))
        prepared = prepared.withColumn(
            f"__f{i}__",
            F.expr(f"coalesce({fexpr}, false)") if fexpr else F.lit(True),
        )
    # a NULL event time (unparseable timestamp) has no window and would
    # arrive in pandas as NaN, crashing int() in the state loop — drop it
    # like the stateful as-of join does
    prepared = prepared.filter(F.col(EVENT_TIME_COL).isNotNull())
    prepared = prepared.withColumn("__ms__", F.unix_millis(F.col(EVENT_TIME_COL)))
    # EVENT_TIME_COL stays in the projection: event-time timeout requires the
    # watermarked column to remain present in the child plan.
    prepared = prepared.select(
        *keys,
        "__ms__",
        *[f"__v{i}__" for i in range(len(sliding))],
        *[f"__f{i}__" for i in range(len(sliding))],
        EVENT_TIME_COL,
    )

    out_fields = [T.StructField(k, prepared.schema[k].dataType) for k in keys]
    out_fields.append(T.StructField(WINDOW_TIME_MS_COL, T.LongType()))
    for f_ in sliding:
        out_fields.append(T.StructField(f_.name, to_spark_type(f_.dtype)))
    out_schema = T.StructType(out_fields)

    n_fields = len(sliding)

    def process_key(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            history_json, last_wend, last_values_enc, drain_wend = state.get
            history = loads_state(history_json)
            # last_values is kept as its canonical JSON encoding (sort_keys +
            # default=str) and compared encoding-to-encoding: a parsed round
            # trip would stringify VALUE_COUNTS' non-string map keys and
            # defeat skip_same_window_output across micro-batches.
            if last_values_enc == "null":
                last_values_enc = None
            # Checkpoint upgrade compatibility: state written before the
            # nullable-Long encoding stored None as a -1 sentinel.  Only
            # decode -1 as None when -1 cannot be a REAL value on the
            # respective grid (last_wend is a step multiple; drain_wend a
            # step multiple plus max_window) — pre-epoch streams with a
            # grid that lands on -1 keep the new encoding's reading, the
            # unavoidable side of the old ambiguity.
            if last_wend == -1 and (-1) % step_ms != 0:
                last_wend = None
            if drain_wend == -1 and (
                max_window is None or (-1 - max_window) % step_ms != 0
            ):
                drain_wend = None
        else:
            history, last_wend, last_values_enc, drain_wend = [], None, None, None

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ms = int(row[len(key)])
                vals = list(row[len(key) + 1 : len(key) + 1 + n_fields])
                vals = [
                    None if (isinstance(v, float) and math.isnan(v)) else v
                    for v in vals
                ]
                flags = [
                    bool(x)
                    for x in row[len(key) + 1 + n_fields : len(key) + 1 + 2 * n_fields]
                ]
                history.append([ms] + vals + flags)

        wm = state.getCurrentWatermarkMs()

        emissions = []
        if history:
            history.sort(key=lambda r: r[0])
            last_ms = history[-1][0]
            new_drain = (last_ms // step_ms + 1) * step_ms + max_window
            drain_wend = new_drain if drain_wend is None else max(drain_wend, new_drain)

        if drain_wend is not None:
            # Loop start: after the last processed step, or — before any
            # emission — the first step end of the OLDEST row currently in
            # history.  last_wend must not be pinned at data arrival: an
            # earlier-timestamped row arriving in a later batch (still ahead
            # of the watermark) would otherwise have its windows skipped.
            if last_wend is not None:
                wend = last_wend + step_ms
            else:
                wend = (history[0][0] // step_ms + 1) * step_ms
            while wend <= wm and wend <= drain_wend:
                values = []
                for i in range(n_fields):
                    w = windows_ms[i]
                    in_win = [
                        r[1 + i]
                        for r in history
                        if wend - w <= r[0] < wend and r[1 + n_fields + i]
                    ]
                    if limits[i] is not None:
                        in_win = in_win[-limits[i]:]
                    v = _agg_pandas(aggs[i], in_win)
                    if v is None and defaults[i] is not None:
                        v = defaults[i]
                    values.append(v)
                # "empty" = no source ROW in the largest window — matching
                # the batch evaluator, which emits every window end that
                # received contributions (even all-default ones, e.g. a
                # populated window whose SUM is 0).
                any_rows = any(
                    wend - max_window <= r[0] < wend for r in history
                )
                should_emit = enable_empty or any_rows
                enc = json.dumps(values, sort_keys=True, default=str)
                if skip_same and last_values_enc is not None and enc == last_values_enc:
                    should_emit = False
                if should_emit:
                    emissions.append(list(key) + [wend - 1] + values)
                    last_values_enc = enc
                last_wend = wend
                wend += step_ms

            # Keep the rows a future window (> last_wend) can see — but
            # prune lazily: the reference prunes expired state only every
            # maxWindow/10 (SlidingWindowKeyedProcessFunction.java:76-105),
            # and the analog here skips the O(n) history rebuild until the
            # oldest retained row is at least that grace past expiry.  The
            # sorted history makes the staleness probe O(1); rows inside
            # the grace band are already excluded from every window by the
            # [wend - w, wend) membership test, so emissions are unchanged.
            if last_wend is not None and history:
                horizon = last_wend + step_ms - max_window
                grace = max(step_ms, max_window // 10)
                if history[0][0] < horizon - grace:
                    history = [r for r in history if r[0] >= horizon]

        done = (
            last_wend is not None
            and drain_wend is not None
            and last_wend >= drain_wend
        )
        if done:
            state.remove()
        else:
            state.update(
                (
                    dumps_state(history),
                    last_wend,
                    "null" if last_values_enc is None else last_values_enc,
                    drain_wend,
                )
            )
            # Wake at the next step past the watermark so windows keep
            # closing without new input (the Flink analog registers step
            # timers, SlidingWindowKeyedProcessFunction.java).
            state.setTimeoutTimestamp(max(wm + step_ms, 1))

        if emissions:
            yield pd.DataFrame(emissions, columns=[f.name for f in out_fields])

    return prepared.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        process_key,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
