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

from pyspark.sql import DataFrame, Window, functions as F

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
        # honor a PARTIAL bound: only the missing side comes from data —
        # previously a supplied hi (or lo) was silently recomputed and
        # the caller's clip had no effect
        bounds = base.alias("__b__").agg(
            (F.min("__v__") if lo is None else F.lit(float(lo))).alias("__lo__"),
            (F.max("__v__") if hi is None else F.lit(float(hi))).alias("__hi__"),
        )
        base = base.crossJoin(F.broadcast(bounds))
    else:
        base = base.withColumn("__lo__", F.lit(float(lo))).withColumn(
            "__hi__", F.lit(float(hi))
        )
    width = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(n_bins))
    # a constant column (hi == lo) makes width 0 — the division would
    # kill the job under ANSI (Spark 4's default); every value lands in
    # bin 0 with a degenerate [lo, lo] range instead
    bin_id = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("__v__") - F.col("__lo__")) / width).cast("int"),
            ),
        )
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
        # column names are interpolated into a SQL string literal —
        # escape quotes so a name like a'b can't garble the expression
        f"""named_struct('column', '{c.replace("'", "''")}', """
        f"'n_rows', __n__, "
        f"'n_nulls', __n__ - `__nn_{c}__`, 'n_distinct', `__nd_{c}__`, "
        f"'min_value', `__mn_{c}__`, 'max_value', `__mx_{c}__`)"
        for c in cols
    )
    return wide.select(
        F.explode(F.expr(f"array({structs})")).alias("__p__")
    ).select("__p__.*")


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-group distinct-count ESTIMATE via a portable HyperLogLog sketch
    (Flajolet et al. 2007), next to the exact count for error audit.

    The sketch is deliberately engine-portable rather than
    ``approx_count_distinct``: bucket = first ``p`` bits of
    md5(value || ':' || seed), rho = leading-zero rank of the next 40
    hash bits (via the binary-string length, so no float log on the hot
    path), registers = per-(group, bucket) MAX(rho) — all exact integer
    arithmetic any SQL engine reproduces bit-for-bit, which is what makes
    the estimate oracle-checkable AND what makes sketches MERGEABLE across
    shards/engines: a register table is a groupBy-MAX away from the union
    of two corpora's register tables.

    The harmonic sum runs in exact 2^-41 units (bigint; max 2^(p+41) <<
    2^63), then ONE double division + the standard small-range
    linear-counting correction (E <= 2.5m with untouched registers ->
    m*ln(m/zeros)).  Estimates round to 4 decimals.

    At 100 TB this is the cheap profile path the exact column can't be:
    registers shuffle p*2^p-ish bytes per group vs count-distinct's
    expand+reshuffle of every distinct value.  (The exact column here is
    the audit baseline; drop it in production profiling.)

    Returns (*group_cols, n_exact, n_registers, hll_estimate, rel_err).
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16] (hex-aligned)")
    m = 1 << p
    hexchars = p // 4
    # single-division estimator numerator, precomputed so both engines see
    # one identical double constant instead of a chain of float ops
    alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * float(1 << 41)
    group_cols = list(group_cols)

    h = f"md5(concat(CAST(`{value_col}` AS STRING), ':{seed}'))"
    bucket = f"CAST(conv(substr({h}, 1, {hexchars}), 16, 10) AS INT)"
    b40 = f"CAST(conv(substr({h}, {hexchars + 1}, 10), 16, 10) AS BIGINT)"
    rho = (
        f"CASE WHEN {b40} = 0 THEN 41 "
        f"ELSE 41 - length(conv({b40}, 10, 2)) END"
    )

    base = ensure_parallelism(df).filter(F.col(value_col).isNotNull())
    regs = (
        base.select(
            *group_cols,
            F.expr(bucket).alias("__bucket__"),
            F.expr(rho).cast("int").alias("__rho__"),
        )
        .groupBy(*group_cols, "__bucket__")
        .agg(F.max("__rho__").alias("__rho__"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 41 - __rho__)")
        ).alias("__sp__"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    s_units = F.col("__sp__") + zeros * F.lit(1 << 41)
    e_raw = F.lit(numerator) / s_units.cast("double")
    est = F.round(
        F.when(
            (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.expr(f"ln(CAST({m} AS DOUBLE) / __zeros__)"),
        ).otherwise(e_raw),
        4,
    )
    exact = base.groupBy(*group_cols).agg(
        F.countDistinct(F.col(value_col)).cast("bigint").alias("n_exact")
    )
    # NULL group keys are real groups here (both sides aggregate them),
    # but a plain equi-join drops them (NULL != NULL) — join null-safely
    ex = exact.alias("__ex__")
    pg = per_group.withColumn("__zeros__", zeros.cast("bigint")).alias("__pg__")
    return (
        ex.join(
            pg,
            on=[
                F.col(f"__ex__.{c}").eqNullSafe(F.col(f"__pg__.{c}"))
                for c in group_cols
            ],
        )
        .drop(*[F.col(f"__pg__.{c}") for c in group_cols])
        .withColumn("hll_estimate", est)
        .withColumn(
            "rel_err",
            F.round(
                (F.col("hll_estimate") - F.col("n_exact"))
                / F.col("n_exact").cast("double"),
                4,
            ),
        )
        .select(
            *group_cols, "n_exact", "n_registers", "hll_estimate", "rel_err"
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str,
    d: int = 4,
    w: int = 1024,
    min_count: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch (Cormode & Muthukrishnan
    2005) pre-filter: pass 1 folds every token occurrence into a d x w
    counter grid (cell = i*w + md5-hash_i(token) mod w, one map-side
    combinable groupBy — the sketch is CORPUS-SIZE-INDEPENDENT); pass 2
    re-streams the corpus, scores each occurrence against the broadcast
    sketch (est = min over the d rows), and drops sub-threshold tokens
    BEFORE the exact-count shuffle.  CMS never underestimates, so no true
    heavy hitter can be lost to the pre-filter — the output's exact counts
    are computed only for the surviving candidate set, which is the whole
    point at 100 TB: the second shuffle carries candidate occurrences, not
    the full token distribution.  Tokenization is the engine-wide
    whitespace rule; all arithmetic is exact integers, so the sketch and
    estimates reproduce bit-for-bit in any engine with md5.

    Returns (token, est_count, exact_count) for tokens whose CMS estimate
    reaches ``min_count``; est_count >= exact_count always."""
    from feathub_spark.datapipe.sampling import hash32

    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    occ = ensure_parallelism(df).select(
        F.explode(F.expr(toks)).alias("__tok__")
    )
    cell_cols = [
        (F.lit(i * w) + hash32("__tok__", seed + i) % F.lit(w)).alias(f"c{i}")
        for i in range(d)
    ]
    # sketch stored as a TRUE ARRAY indexed by cell id, gap-filled via a
    # spine join: array element_at is O(1) where a map lookup is an
    # O(d*w) linear scan PER occurrence (measured 8-15x at 16k entries)
    cells = (
        occ.select(F.explode(F.array(*cell_cols)).alias("__cell__"))
        .groupBy("__cell__")
        .count()
    )
    spine = df.sparkSession.range(d * w).select(F.col("id").alias("__cell__"))
    sketch = (
        spine.join(cells, on="__cell__", how="left")
        .select(
            "__cell__",
            F.coalesce(F.col("count"), F.lit(0)).cast("bigint").alias("__n__"),
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__cell__, __n__))), "
                "s -> s.__n__)"
            ).alias("__cms__")
        )
    )
    lookups = [
        F.element_at(
            F.col("__cms__"),
            (
                F.lit(i * w) + hash32("__tok__", seed + i) % F.lit(w) + F.lit(1)
            ).cast("int"),
        )
        for i in range(d)
    ]
    est = lookups[0] if d == 1 else F.least(*lookups)
    return (
        occ.crossJoin(F.broadcast(sketch))
        .withColumn("__est__", est)
        .filter(F.col("__est__") >= F.lit(min_count))
        .groupBy("__tok__")
        .agg(
            F.first("__est__").alias("est_count"),
            F.count(F.lit(1)).cast("bigint").alias("exact_count"),
        )
        .select(
            F.col("__tok__").alias("token"), "est_count", "exact_count"
        )
    )


def key_skew(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew diagnostic: the report to run BEFORE shuffling 100 TB
    on a key — surfaces the hot keys that will serialize a sort-merge
    join or over-window partition (and tells you whether to salt, use the
    over-window time-chunk plan, or AQE skew-join hints).

    One map-side-combinable groupBy builds per-key counts; the global
    stats (rows, distinct keys, max) fold to one broadcast row; the hot
    list is orderBy+limit (TakeOrderedAndProject, no corpus-wide sort)
    with a rank window over AT MOST top_k rows.  skew_factor =
    max_count / mean_count (1.0 = perfectly uniform); share = this key's
    fraction of all rows.  NULL keys count as a (surfaced) key.

    Returns top_k rows: (rank, key[string], n, share, n_rows, n_keys,
    skew_factor)."""
    counts = (
        ensure_parallelism(df)
        .groupBy(F.col(key_col).cast("string").alias("__k__"))
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    totals = counts.agg(
        F.sum("__n__").alias("__rows__"),
        F.count(F.lit(1)).alias("__keys__"),
        F.max("__n__").alias("__max__"),
    )
    hot = counts.orderBy(
        F.col("__n__").desc(), F.col("__k__").asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("__n__").desc(), F.col("__k__").asc())
    return (
        hot.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            F.col("__k__").alias("key"),
            F.col("__n__").alias("n"),
            F.round(F.col("__n__") / F.col("__rows__"), 6).alias("share"),
            F.col("__rows__").alias("n_rows"),
            F.col("__keys__").alias("n_keys"),
            # max is cast to double BEFORE the multiply: bigint*bigint
            # overflows (a fatal ANSI error) exactly at the 100 TB scale
            # this diagnostic exists for (1e11 rows x 1e8 keys > 2^63)
            F.round(
                F.col("__max__").cast("double") * F.col("__keys__")
                / F.col("__rows__").cast("double"),
                4,
            ).alias("skew_factor"),
        )
    )


def validate_rules(df: DataFrame, rules) -> DataFrame:
    """Declarative data-quality gate: evaluate a list of expectation
    rules in ONE wide aggregate pass and return a long-format report —
    the pre-training validation step a pipeline fails fast on.

    Rule shapes (dicts):
      {"rule": "not_null", "column": c, "max_frac": 0.0}
      {"rule": "range", "column": c, "lo": x, "hi": y, "max_frac": 0.0}
      {"rule": "accepted_values", "column": c, "values": [...],
       "max_frac": 0.0}
      {"rule": "unique", "columns": [c, ...]}   # non-null rows must be
                                                # pairwise distinct
      {"rule": "min_rows", "n": N}

    Violation fractions are over all rows (unique: over non-null rows);
    ``passed`` compares against ``max_frac`` (default 0).  Everything is
    conditional sums + count-distincts inside a single groupBy-less
    aggregate — no per-rule scan, no collect.

    Returns (rule_id, rule, column, n_rows, n_violations, viol_frac,
    passed)."""
    rules = list(rules)
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            aggs.append(
                F.sum(
                    F.when(F.col(r["column"]).isNull(), 1).otherwise(0)
                ).alias(f"__v{i}__")
            )
        elif kind == "range":
            c = F.col(r["column"])
            bad = c.isNull() | (c < F.lit(r["lo"])) | (c > F.lit(r["hi"]))
            aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"__v{i}__"))
        elif kind == "accepted_values":
            c = F.col(r["column"])
            bad = c.isNull() | ~c.isin(list(r["values"]))
            aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"__v{i}__"))
        elif kind == "unique":
            cols = [F.col(c) for c in r["columns"]]
            nn = cols[0].isNotNull()
            for c in cols[1:]:
                nn = nn & c.isNotNull()
            aggs.append(
                (
                    F.sum(F.when(nn, 1).otherwise(0))
                    - F.countDistinct(*cols)
                ).alias(f"__v{i}__")
            )
            aggs.append(
                F.sum(F.when(nn, 1).otherwise(0)).alias(f"__d{i}__")
            )
        elif kind == "min_rows":
            pass  # needs only __n__
        else:
            raise ValueError(f"unknown rule kind: {kind}")
    wide = ensure_parallelism(df).agg(*aggs)

    structs = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        # escaped for interpolation into the named_struct SQL literal
        col = (r.get("column") or ",".join(r.get("columns", []))).replace(
            "'", "''"
        )
        max_frac = float(r.get("max_frac", 0.0))
        if kind == "min_rows":
            viol = f"CASE WHEN __n__ >= {int(r['n'])} THEN 0 " \
                   f"ELSE {int(r['n'])} - __n__ END"
            denom = "__n__"
            passed = f"__n__ >= {int(r['n'])}"
        elif kind == "unique":
            viol = f"`__v{i}__`"
            denom = f"`__d{i}__`"
            passed = (
                f"CASE WHEN `__d{i}__` = 0 THEN TRUE ELSE "
                f"CAST(`__v{i}__` AS DOUBLE) / `__d{i}__` <= {max_frac} END"
            )
        else:
            viol = f"`__v{i}__`"
            denom = "__n__"
            passed = (
                f"CASE WHEN __n__ = 0 THEN TRUE ELSE "
                f"CAST(`__v{i}__` AS DOUBLE) / __n__ <= {max_frac} END"
            )
        structs.append(
            f"named_struct('rule_id', CAST({i} AS BIGINT), "
            f"'rule', '{kind}', 'column', '{col}', "
            f"'n_rows', CAST(__n__ AS BIGINT), "
            f"'n_violations', CAST({viol} AS BIGINT), "
            f"'viol_frac', CASE WHEN {denom} = 0 THEN CAST(0 AS DOUBLE) "
            f"ELSE round(CAST({viol} AS DOUBLE) / {denom}, 6) END, "
            f"'passed', {passed})"
        )
    return wide.select(
        F.explode(F.expr(f"array({', '.join(structs)})")).alias("__r__")
    ).select("__r__.*")


def exact_quantiles(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    by: Optional[Sequence[str]] = None,
    n_buckets: Optional[int] = None,
    max_distinct: Optional[int] = None,
    on_exceed: str = "fallback",
    fallback_accuracy: int = 10_000,
) -> DataFrame:
    """EXACT discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    element at 1-based rank ``max(1, ceil(prob * n))`` of the sorted
    non-NULL values) without a global sort AND without sketch state.

    Why this exists next to :func:`approx_quantiles`: a GK sketch is only
    exact when ``accuracy >= rows``, and its memory is O(accuracy) per
    merged sketch — "exact via percentile_approx(accuracy=1e8)" quietly
    holds ~1e8 sketch entries per column at scale, which is the data, not
    a sketch.  This operator gets exactness from rank arithmetic instead:

    1. ONE map-side-combinable groupBy builds (column, value) counts —
       every later shuffle is bounded by the DISTINCT-value count, never
       the row count;
    2. values bucket by DETERMINISTIC uniform ranges from a broadcast
       per-column (min, max) row — order-preserving, so per-bucket
       running sums plus a broadcast of per-bucket offsets form the
       exact global rank interval [lo, hi] of every value (the standard
       two-level prefix-sum, no single-task corpus sort).  Buckets are
       chosen over ``spark_partition_id`` on a range exchange because
       range-partition sampling is not re-execution-deterministic: two
       consumers of the same subplan could disagree on pids unless
       exchange reuse happens to kick in, while value-derived buckets
       cannot disagree.  Bucket skew only costs parallelism (a crowded
       bucket sorts more distinct values in one task), never
       correctness;
    3. each requested probability resolves to a target rank against the
       1-row-per-column totals and picks the unique value whose interval
       covers it.

    Scale contract: cost scales with distinct values, not rows — the
    right tool for bounded-domain columns (prices, quantities, lengths,
    scores).  For truly continuous high-cardinality columns at extreme
    scale, distinct ~ rows and :func:`approx_quantiles` with a SANE
    accuracy (1e4-1e5) is the honest trade.  Pass ``max_distinct`` to
    ENFORCE that contract instead of trusting the caller: one
    ``approx_count_distinct`` probe per column runs up front, and any
    column whose estimate exceeds the threshold either routes through
    :func:`approx_quantiles` at ``fallback_accuracy``
    (``on_exceed="fallback"``, the default — bounded-domain columns stay
    exact, continuous ones degrade to the documented rank-error bound
    instead of a row-count-sized shuffle) or raises ``ValueError`` with
    that guidance (``on_exceed="raise"``).  ``max_distinct=None`` (the
    default) keeps the unguarded exact path byte-for-byte unchanged.
    With ``by``, ranks are computed per group through one window
    partitioned by (group, column) — per-group distinct values sort
    within one task, the usual grouped contract (the probe is global
    per column either way — it guards the shuffle size, which sums over
    groups).

    Returns long format (``by``..., ``column``, ``prob``, ``value``)."""
    cols = list(cols)
    by = list(by) if by else []
    probs = [float(p) for p in probs]
    if on_exceed not in ("fallback", "raise"):
        raise ValueError(f"unknown on_exceed: {on_exceed!r}")
    if max_distinct is not None:
        est = df.agg(
            *[
                F.approx_count_distinct(F.col(c).cast("double")).alias(c)
                for c in cols
            ]
        ).first()
        over = [c for c in cols if (est[c] or 0) > int(max_distinct)]
        if over and on_exceed == "raise":
            raise ValueError(
                "exact_quantiles: column(s) "
                + ", ".join(repr(c) for c in over)
                + f" estimate more than max_distinct={max_distinct} "
                "distinct values — the exact rank path would shuffle a "
                "row-count-sized value table; use approx_quantiles "
                "(accuracy 1e4-1e5) for continuous high-cardinality "
                "columns, or raise max_distinct if the domain really is "
                "bounded"
            )
        if over:
            approx_part = approx_quantiles(
                df, over, probs, accuracy=fallback_accuracy, by=by
            )
            keep = [c for c in cols if c not in set(over)]
            if not keep:
                return approx_part
            exact_part = exact_quantiles(
                df, keep, probs, by=by, n_buckets=n_buckets
            )
            return exact_part.unionByName(approx_part)
    melted = (
        ensure_parallelism(df)
        .select(
            *by,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("__v__"),
                    )
                    for c in cols
                ])
            ).alias("__m__"),
        )
        .select(*by, "__m__.column", "__m__.__v__")
    )
    # the value-count table feeds ranks, bucket stats, per-bucket offsets
    # AND the probability targets; its shuffle subplan repeats per branch
    # in the PRINTED plan but executes once — every branch shares the
    # identical exchange, which ReusedExchange deduplicates at runtime
    # (verified via the plan audit's ok + the warm runtime staying flat
    # when a persist was added and removed).  NULL/NaN value rows pass
    # THROUGH the aggregation (one extra group per (group, column) at
    # most) and are filtered below it, so the grouped all-NULL surfacing
    # can read its group list off this same shared exchange instead of
    # re-executing ``df`` a second time.
    vc_all = melted.groupBy(*by, "column", "__v__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    # NaN drops with NULL: Spark's ordering ranks NaN as the LARGEST
    # double (p=1.0 would return NaN) while SQL engines like DuckDB
    # exclude it from quantiles — a quantile over NaN is meaningless,
    # so take the exclude semantics both for sanity and oracle parity
    vc = vc_all.filter(F.col("__v__").isNotNull() & ~F.isnan("__v__"))
    if by:
        w = (
            Window.partitionBy(*by, "column")
            .orderBy("__v__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ranked = vc.withColumn("__hi__", F.sum("__c__").over(w))
        totals = vc.groupBy(*by, "column").agg(F.sum("__c__").alias("__n__"))
        join_keys = by + ["column"]
    else:
        n_buckets = int(
            n_buckets or 8 * vc.sparkSession.sparkContext.defaultParallelism
        )
        colstats = vc.groupBy("column").agg(
            F.min("__v__").alias("__mn__"),
            F.max("__v__").alias("__mx__"),
            F.sum("__c__").alias("__n__"),
        )
        width = (F.col("__mx__") - F.col("__mn__")) / F.lit(float(n_buckets))
        # width 0 (constant column) -> everything in bucket 0; +-inf
        # bounds make width NaN/inf -> comparisons still clamp into range
        bucket = F.when(~(width > 0), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("__v__") - F.col("__mn__")) / width).cast("int"),
                ),
            )
        )
        parts = vc.join(
            F.broadcast(colstats.select("column", "__mn__", "__mx__")),
            on="column",
        ).withColumn("__bk__", bucket)
        wloc = (
            Window.partitionBy("column", "__bk__")
            .orderBy("__v__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        loc = parts.withColumn("__cl__", F.sum("__c__").over(wloc))
        # per-(column, bucket) totals fold to a tiny table; their running
        # sum over bucket order (within column) is each bucket's global
        # offset — broadcast back, never collected
        ptot = parts.groupBy("column", "__bk__").agg(
            F.sum("__c__").alias("__pt__")
        )
        woff = (
            Window.partitionBy("column")
            .orderBy("__bk__")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = ptot.withColumn(
            "__off__", F.coalesce(F.sum("__pt__").over(woff), F.lit(0))
        ).select("__bk__", "column", "__off__")
        ranked = loc.join(F.broadcast(offs), on=["__bk__", "column"]).withColumn(
            "__hi__", F.col("__off__") + F.col("__cl__")
        )
        totals = colstats.select("column", "__n__")
        join_keys = ["column"]
    ranked = ranked.withColumn("__lo__", F.col("__hi__") - F.col("__c__") + 1)
    targets = totals.select(
        *join_keys,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(p).alias("prob"),
                    F.greatest(
                        F.lit(1).cast("bigint"),
                        F.ceil(F.lit(p) * F.col("__n__")).cast("bigint"),
                    ).alias("__r__"),
                )
                for p in probs
            ])
        ).alias("__t__"),
    ).select(*join_keys, "__t__.prob", "__t__.__r__")
    if by:
        # null-safe on the group keys: groupBy keeps NULL as a real group,
        # so a plain equi-join here would silently drop that group's
        # quantiles (still a BroadcastHashJoin — Spark hashes null-safe
        # keys via coalesce).  'column' is a literal, never NULL.
        jcond = F.col("__rk__.column") == F.col("__tg__.column")
        for c in by:
            jcond = jcond & F.col(f"__rk__.{c}").eqNullSafe(F.col(f"__tg__.{c}"))
        found = (
            ranked.alias("__rk__")
            .join(F.broadcast(targets).alias("__tg__"), on=jcond)
            .filter(
                (F.col("__tg__.__r__") >= F.col("__rk__.__lo__"))
                & (F.col("__tg__.__r__") <= F.col("__rk__.__hi__"))
            )
            .select(
                *[F.col(f"__rk__.{c}").alias(c) for c in by],
                F.col("__rk__.column").alias("column"),
                F.col("__tg__.prob").alias("prob"),
                F.col("__rk__.__v__").alias("value"),
            )
        )
    else:
        found = (
            ranked.join(F.broadcast(targets), on=join_keys)
            .filter(
                (F.col("__r__") >= F.col("__lo__"))
                & (F.col("__r__") <= F.col("__hi__"))
            )
            .select("column", "prob", F.col("__v__").alias("value"))
        )
    # Contract parity with approx_quantiles: a (group,) column whose values
    # are ALL NULL/NaN survives the filter nowhere, so totals carries no row
    # for it and it would silently vanish from the report — approx_quantiles
    # instead surfaces it as NULL-value rows (its coalesce-to-NULL).  Emit
    # the same (by..., column, prob, NULL) rows for every requested
    # combination absent from totals.  The requested-columns frame is a
    # bounded driver literal; grouped calls derive the group list from the
    # PRE-value-filter count table (all-NULL groups still appear there), so
    # the distinct shares the aggregation's exchange instead of
    # re-executing ``df``; ungrouped calls pay only an anti-join against
    # the tiny totals.
    req_cols = df.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    if by:
        req = vc_all.select(*by).distinct().crossJoin(F.broadcast(req_cols))
        present = totals.select(*join_keys)
        cond = F.col("__rq__.column") == F.col("__pr__.column")
        for c in by:  # null-safe: NULL is a real group key in a groupBy
            cond = cond & F.col(f"__rq__.{c}").eqNullSafe(F.col(f"__pr__.{c}"))
        missing = req.alias("__rq__").join(
            present.alias("__pr__"), on=cond, how="left_anti"
        )
    else:
        missing = req_cols.join(
            totals.select("column"), on="column", how="left_anti"
        )
    null_rows = missing.select(
        *by,
        "column",
        F.explode(F.array(*[F.lit(p) for p in probs])).alias("prob"),
        F.lit(None).cast("double").alias("value"),
    )
    return found.unionByName(null_rows)


def approx_quantiles(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    accuracy: int = 10_000,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Mergeable approximate quantiles via Spark's built-in
    ``percentile_approx`` (a Greenwald-Khanna sketch — the engine-native
    scale path: per-partition sketches merge map-side, ONE shuffle, no
    global sort).  Rank error is bounded by ``rows / accuracy``, so at
    test scale (rows <= accuracy) results are EXACT and equal DuckDB's
    ``quantile_disc``; at 100 TB the same plan degrades gracefully to the
    documented rank-error bound instead of an impossible full sort.

    Returns long format (``by``..., ``column``, ``prob``, ``value``) —
    one row per (group, column, probability).  ``by`` adds per-group
    quantiles (same single-shuffle shape, keyed)."""
    cols = list(cols)
    by = list(by) if by else []
    probs = [float(p) for p in probs]
    aggs = [
        F.percentile_approx(F.col(c).cast("double"), probs, accuracy).alias(c)
        for c in cols
    ]
    base = (
        ensure_parallelism(df).groupBy(*by).agg(*aggs) if by
        else ensure_parallelism(df).agg(*aggs)
    )
    # melt via chained generators, NOT a union of per-column branches: a
    # DataFrame union re-evaluates its parent lineage per branch, so the
    # per-column form ran the whole sketch aggregation once PER COLUMN
    # (measured 2x wall on a 2-column profile).  One explode over an
    # array<struct> of the already-aggregated row keeps a single scan.
    probs_arr = F.array(*[F.lit(p) for p in probs])
    # an all-NULL column makes percentile_approx return NULL — coalesce
    # to a NULL-filled array so the report SURFACES the column as NULL
    # rows instead of silently omitting it (posexplode drops NULL arrays)
    null_vals = F.array(*[F.lit(None).cast("double")] * len(probs))
    melted = base.select(
        *by,
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(c), null_vals).alias("__vals__"),
            )
            for c in cols
        ])).alias("__s__"),
    ).select(*by, F.col("__s__.column").alias("column"),
             F.posexplode("__s__.__vals__").alias("__i__", "value"))
    return (
        melted.withColumn("prob", F.element_at(probs_arr, F.col("__i__") + 1))
        .select(*by, "column", "prob", "value")
    )
