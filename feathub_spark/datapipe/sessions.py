"""Gap-based sessionization — the classic feature-engineering operator the
reference's over/sliding windows don't cover (sessions have data-dependent
boundaries, not fixed sizes; cf. the reference's fixed-frame transforms,
/root/reference/python/feathub/feature_views/transforms/sliding_window_transform.py:30).

Batch is the standard gaps-and-islands shape: one per-key sort powers the
lag flag, the running session counter, and the per-session labels (Spark
evaluates all three window passes over a single Exchange+Sort of the key
partition).  Scale: per-key ordered windows — the same posture as every
event-time operator here; a pathologically hot key serializes its own
events only, and the over-window time-chunk plan applies if that ever
binds.  Everything is integer arithmetic on epoch-micros, so any SQL
engine replays the exact session labels.

Streaming: Spark's native ``session_window`` aggregation is the stateful
equivalent for summaries; per-event labeling streams via foreachBatch per
ingest unit (conformance-tested like the other corpus-aggregating ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    gap_us: int,
    id_col: str = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign every event a stable session label: a session breaks when
    the time since the key's previous event exceeds ``gap_us``
    (microseconds).  ``id_col`` breaks timestamp ties deterministically
    (strongly recommended; defaults to the timestamp alone).

    Adds: ``session_col`` ('<key>#<session-start-micros>' — stable across
    reruns and engines), ``session_seq`` (1-based event index within the
    session).  Input rows and columns pass through."""
    order = [F.col(ts_us_col).asc()] + (
        [F.col(id_col).asc()] if id_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_us_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_us_col) - prev > F.lit(int(gap_us))), 1
    ).otherwise(0)
    out = (
        ensure_parallelism(df)
        # a NULL timestamp has no position on the timeline: it would open
        # its own session but share the key-only label with every other
        # NULL-ts event (concat_ws skips NULLs), colliding session_ids
        .filter(F.col(ts_us_col).isNotNull())
        .withColumn("__new__", is_new)
        .withColumn("__sn__", F.sum("__new__").over(run))
    )
    ws = Window.partitionBy(key_col, "__sn__")
    return (
        out.withColumn("__start__", F.min(ts_us_col).over(ws))
        .withColumn(
            session_col,
            F.concat_ws(
                "#",
                F.col(key_col).cast("string"),
                F.col("__start__").cast("string"),
            ),
        )
        .withColumn(
            "session_seq",
            F.row_number().over(ws.orderBy(*order)).cast("bigint"),
        )
        .drop("__new__", "__sn__", "__start__")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    gap_us: int,
    id_col: str = None,
    agg_cols: dict = None,
) -> DataFrame:
    """Per-session summary over :func:`sessionize`'s labels: (key,
    session_id, session_start_us, session_end_us, duration_us, n_events)
    plus any extra aggregates passed as ``agg_cols`` (name -> Column).
    One map-side-combinable groupBy on (key, session) after the
    sessionizing sort."""
    labeled = sessionize(df, key_col, ts_us_col, gap_us, id_col)
    aggs = [
        F.min(ts_us_col).cast("bigint").alias("session_start_us"),
        F.max(ts_us_col).cast("bigint").alias("session_end_us"),
        (F.max(ts_us_col) - F.min(ts_us_col)).cast("bigint").alias("duration_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    return labeled.groupBy(key_col, "session_id").agg(*aggs)


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    type_col: str,
    steps,
    min_steps: int = 1,
) -> DataFrame:
    """Ordered funnel completion per key: how far through the event
    sequence ``steps`` (e.g. view -> click -> purchase) each key got, and
    when.  Semantics are the standard greedy earliest chain — step 1 is
    the key's earliest steps[0] event; step i is the earliest steps[i]
    event STRICTLY after the chosen step i-1 — which completes a chain
    whenever any chain exists.

    Plan: events are filtered to the funnel's types BEFORE the shuffle
    (at corpus scale the funnel vocabulary prunes ~everything at the
    scan), then ONE groupBy collects each key's (ts, type) pairs into a
    sorted array and a single aggregate() fold walks it with (steps
    completed, chosen timestamps) state — no per-step join round trips,
    no window pass per step.  Per-key arrays are bounded by that key's
    funnel-type events (the same hot-key posture as sessionization).
    Integer micros throughout, so any engine replays the chain exactly.

    Returns (key_col, n_steps, step_ts[array<bigint>]) for keys
    completing at least ``min_steps``."""
    from feathub_spark.common.time_utils import sql_string_literal

    steps = list(steps)
    if not steps:
        raise ValueError("steps must name at least one event type")
    m = len(steps)
    # sql_string_literal escapes backslashes too — a bare quote-doubling
    # left step names like "a\\b" to be unescaped by Spark's parser into
    # control characters that silently never match
    lits = ", ".join("'" + sql_string_literal(s) + "'" for s in steps)
    base = (
        ensure_parallelism(df)
        .filter(F.col(type_col).isin(steps))
        # a NULL-ts step event sorts FIRST (struct NULL field orders
        # smallest), gets greedily consumed, and poisons the chain: no
        # later event is strictly-after NULL — sessionize filters the
        # same way
        .filter(F.col(ts_us_col).isNotNull())
        .select(
            key_col,
            F.col(ts_us_col).cast("long").alias("__tu__"),
            F.col(type_col).alias("__tp__"),
        )
    )
    g = base.groupBy(key_col).agg(
        F.expr("array_sort(collect_list(struct(__tu__, __tp__)))").alias(
            "__evs__"
        )
    )
    fold = (
        "aggregate(__evs__, "
        "named_struct('k', 0, 'ts', CAST(array() AS ARRAY<BIGINT>)), "
        f"(acc, e) -> CASE WHEN acc.k < {m} "
        f"AND e.__tp__ = element_at(array({lits}), acc.k + 1) "
        "AND (acc.k = 0 OR e.__tu__ > element_at(acc.ts, acc.k)) "
        "THEN named_struct('k', acc.k + 1, "
        "'ts', concat(acc.ts, array(e.__tu__))) "
        "ELSE acc END, acc -> acc)"
    )
    return (
        g.withColumn("__f__", F.expr(fold))
        .select(
            key_col,
            F.col("__f__.k").cast("int").alias("n_steps"),
            F.col("__f__.ts").alias("step_ts"),
        )
        .filter(F.col("n_steps") >= F.lit(int(min_steps)))
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    period_us: int,
) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of their
    FIRST event (``floor(ts/period)``), and each (cohort, offset) cell
    counts how many of that cohort's keys were active ``offset`` periods
    later — the classic product-analytics retention triangle.
    ``retention_rate`` divides by the cohort's size (its offset-0 active
    count, which is every member by construction).

    Plan shape: one groupBy(key) for first-period, one distinct over
    (key, period) — both shuffle on the key and AQE coalesces them —
    then a map-side-combinable count to the (cohort, offset) grid, which
    is tiny (periods^2 / 2 cells).  The rate attaches via a
    cohort-sized broadcast self-join, never a window over the grid.

    Returns (cohort_period, period_offset, n_active, n_cohort,
    retention_rate) with the rate rounded to 6 dp."""
    from feathub_spark.common.caching import register_cache

    per = F.floor(F.col(ts_us_col) / F.lit(int(period_us)))
    # base feeds first-period AND the distinct-active branch; grid feeds
    # cohort sizes AND the final join — cache both so the corpus is
    # scanned and key-shuffled once, not per branch (caller releases via
    # release_caches())
    base = register_cache(
        ensure_parallelism(df)
        # NULL timestamps would floor() into spurious NULL period cells
        .filter(F.col(ts_us_col).isNotNull())
        .select(F.col(key_col).alias("__k__"), per.alias("__p__"))
    )
    # first-period via a window min over the SAME key shuffle the
    # distinct needs: NULL keys are a real (surfaced) cohort group — the
    # previous groupBy+equi-join silently dropped every NULL-key row
    active = base.distinct()
    wk = Window.partitionBy("__k__")
    grid = register_cache(
        active.withColumn("__c__", F.min("__p__").over(wk))
        .groupBy(
            F.col("__c__").alias("cohort_period"),
            (F.col("__p__") - F.col("__c__")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = grid.filter(F.col("period_offset") == 0).select(
        "cohort_period", F.col("n_active").alias("n_cohort")
    )
    return grid.join(F.broadcast(sizes), on="cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
            "retention_rate"
        ),
    )


def attribute_conversions(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    conversion_expr: str,
    touch_expr: str,
    lookback_us: int = None,
    tie_cols=None,
) -> DataFrame:
    """Last-touch attribution: every CONVERSION event (rows matching the
    SQL boolean ``conversion_expr``) is attributed to the key's most
    recent preceding TOUCH event (rows matching ``touch_expr``), if one
    exists within ``lookback_us`` (unbounded when None).  A touch at the
    same instant as the conversion counts (<=, the standard convention);
    unattributed conversions come back with NULL touch columns so funnel
    leakage is measurable.

    Plan shape: one window per key ordered by time — max(touch ts) over a
    RANGE frame carries the latest touch timestamp forward.  The RANGE
    frame (not ROWS) is what makes the same-instant convention hold
    unconditionally: every timestamp peer is inside the frame, so a touch
    tied with the conversion is seen no matter how the tie sorts, and the
    result is deterministic without tie columns (``tie_cols`` is kept for
    API compatibility but no longer affects the outcome — only the touch
    TIMESTAMP is carried, and peers share it by definition).  Single
    shuffle, no self-join; then a filter to conversions.

    Returns (key_col, conversion_ts_us, touch_ts_us, lag_us)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_us_col).asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = ensure_parallelism(df).select(
        key_col,
        F.col(ts_us_col),
        F.expr(conversion_expr).cast("boolean").alias("__conv__"),
        F.expr(touch_expr).cast("boolean").alias("__touch__"),
    )
    carried = base.withColumn(
        "__last_touch__",
        F.max(F.when(F.col("__touch__"), F.col(ts_us_col))).over(w),
    )
    out = carried.filter(F.col("__conv__")).withColumn(
        "lag_us", F.col(ts_us_col) - F.col("__last_touch__")
    )
    if lookback_us is not None:
        out = out.withColumn(
            "__last_touch__",
            F.when(
                F.col("lag_us") <= int(lookback_us), F.col("__last_touch__")
            ),
        ).withColumn(
            "lag_us",
            F.when(F.col("lag_us") <= int(lookback_us), F.col("lag_us")),
        )
    return out.select(
        key_col,
        F.col(ts_us_col).alias("conversion_ts_us"),
        F.col("__last_touch__").alias("touch_ts_us"),
        "lag_us",
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    state_col: str,
    tie_cols=None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    count every consecutive (state -> next_state) step within a key
    (ordered by time, ties broken by ``tie_cols``) and normalize per
    source state — the behavior-modeling summary behind next-event
    prediction and anomaly scoring.

    Plan shape: one lead() window per key (single shuffle), then a
    map-side-combinable count to the (from, to) grid — states^2 cells,
    corpus-size-independent — and the row normalization joins against a
    broadcast of the states-sized totals.

    Returns (from_state, to_state, n, p) with p rounded to 6 dp."""
    ties = list(tie_cols or [])
    order = [F.col(ts_us_col).asc()] + [F.col(c).asc() for c in ties]
    w = Window.partitionBy(key_col).orderBy(*order)
    # lead over a STRUCT distinguishes "next state is NULL" (a real
    # state, struct non-null with a NULL field) from "sequence end"
    # (struct itself NULL) — filtering lead(__s__) IS NOT NULL conflated
    # the two and erased every transition around a NULL state
    steps = (
        ensure_parallelism(df)
        .filter(F.col(ts_us_col).isNotNull())
        .select(key_col, ts_us_col, F.col(state_col).alias("__s__"), *ties)
        .withColumn("__nx__", F.lead(F.struct(F.col("__s__").alias("s"))).over(w))
        .filter(F.col("__nx__").isNotNull())
    )
    from feathub_spark.common.caching import register_cache

    # grid feeds the totals AND the final join — cache it (states^2
    # cells) so the corpus-scale lead() window runs once, not twice
    grid = register_cache(
        steps.groupBy(
            F.col("__s__").alias("from_state"),
            F.col("__nx__.s").alias("to_state"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = grid.groupBy("from_state").agg(F.sum("n").alias("__tot__"))
    # NULL from_state is a real group — a plain equi-join would drop it
    # (the hll_distinct convention: join null-safely)
    t = totals.select(
        F.col("from_state").alias("__fs__"), F.col("__tot__")
    )
    return (
        grid.join(
            F.broadcast(t), grid["from_state"].eqNullSafe(t["__fs__"])
        )
        .select(
            "from_state", "to_state", "n",
            F.round(F.col("n") / F.col("__tot__"), 6).alias("p"),
        )
    )
