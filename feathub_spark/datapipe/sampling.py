"""Deterministic sampling, sharding and sequence packing for training-data
pipelines.

Everything is driven by a *portable* uniform hash (md5 of the id, first 8
hex digits as a 32-bit integer) so results are reproducible run-to-run,
engine-to-engine, and at any parallelism: no rand(), no partition-dependent
state.  All computation is Catalyst expressions inside whole-stage codegen.

COMPOSITION RULE: use a DIFFERENT seed for each dependent stage.  Every
operator here decides membership by ``hash_fraction(id, seed) < rate``,
so a stage fed by a sampler that used the SAME seed sees only the
low-fraction ids — e.g. ``assign_splits(seed=7)`` after
``temperature_sample(seed=7)`` can never populate the upper split band
(the survivors all have f below the keep rate).  Distinct seeds make the
stages' hash draws independent.

- ``sample_by_hash``: keep a deterministic fraction of rows.
- ``stratified_sample``: per-group fractions (corpus mixing: "keep 100% of
  'de', 30% of 'en'"), one scan, no shuffle.
- ``temperature_sample``: n_s^alpha source mixing (the multilingual
  up/down-sampling rule) — per-group rates derived in-plan and broadcast
  back, deterministic hash membership.
- ``assign_shards``: stable shard id + position for sharded dataset writes;
  the (hash, id) sort key inside each shard is a deterministic global
  shuffle (the usual pre-training "document shuffle").
- ``pack_sequences``: GPT-style sequence packing — documents are
  concatenated in deterministic-shuffle order within each shard and the
  token stream is chunked into fixed-size context windows; each document is
  assigned its (pack_id, pack_offset) via a running token cumsum.  One
  window function per shard partition, no Python.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism

HASH_SPACE = float(1 << 32)


def hash32(id_col: str, seed: int = 0) -> Column:
    """First 32 bits of md5(id || ':' || seed) as a bigint in [0, 2^32).

    md5-based rather than xxhash64 so any engine (DuckDB, Trino, ...) can
    reproduce the exact sample/shard/pack assignment for audit."""
    return F.expr(
        f"CAST(conv(substr(md5(concat(CAST(`{id_col}` AS STRING), ':{seed}')), "
        f"1, 8), 16, 10) AS BIGINT)"
    )


def hash_fraction(id_col: str, seed: int = 0) -> Column:
    """Deterministic uniform fraction in [0, 1)."""
    return hash32(id_col, seed) / F.lit(HASH_SPACE)


def sample_by_hash(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose hash fraction < ``fraction`` (exact expectation,
    deterministic membership)."""
    return df.filter(hash_fraction(id_col, seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-group sampling rates in one scan (training-corpus mixing).

    Unknown groups get ``default_fraction``.  Membership depends only on
    (id, seed), so raising a group's rate strictly grows its sample
    (nested samples — handy for data-scaling ablations)."""
    rate = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(group_col) == value, F.lit(float(frac))).otherwise(rate)
    return df.filter(hash_fraction(id_col, seed) < rate)


def quantile_stratified_sample(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_bins: int = 10,
    fraction: float = 0.1,
    fractions: Optional[Sequence[float]] = None,
    accuracy: int = 10_000,
    seed: int = 0,
    bin_col: str = "value_bin",
) -> DataFrame:
    """Stratified sampling over a CONTINUOUS column via equal-frequency
    quantile bins — balance a skewed numeric signal (doc length, quality
    score, perplexity) in the training mix without hand-picked cut
    points.

    Bin thresholds come from ONE percentile_approx aggregate (GK sketch —
    mergeable, no global sort; exact when rows <= accuracy) broadcast
    back onto the scan; row bin = number of thresholds strictly below the
    value (NULLs land in bin 0).  Membership is the deterministic md5
    hash fraction per row, compared against the bin's rate — ``fraction``
    for every bin, or ``fractions[bin]`` per bin (len n_bins).  Appends
    ``bin_col`` and filters; one aggregate + a narrow filtered scan.
    Nested-sample property: raising a bin's rate strictly grows its
    sample, as in :func:`stratified_sample`."""
    if fractions is not None and len(fractions) != n_bins:
        raise ValueError(
            f"fractions must have n_bins={n_bins} entries, got {len(fractions)}"
        )
    probs = [i / n_bins for i in range(1, n_bins)]
    th = df.agg(
        F.percentile_approx(
            F.col(value_col).cast("double"), probs, accuracy
        ).alias("__th__")
    )
    # coalesce: percentile_approx over an all-NULL column returns NULL,
    # and size(filter(NULL, ...)) is -1 under non-ANSI semantics — every
    # row must land in bin 0 then (and element_at(rates, -1+1) would
    # throw INVALID_INDEX_OF_ZERO); NULL values drop out of the filter
    # lambda and land in bin 0 as documented
    out = ensure_parallelism(df).crossJoin(F.broadcast(th)).withColumn(
        bin_col,
        F.expr(
            f"size(filter(coalesce(__th__, CAST(array() AS ARRAY<DOUBLE>)), "
            f"t -> CAST(`{value_col}` AS DOUBLE) > t))"
        ),
    )
    if fractions is None:
        rate = F.lit(float(fraction))
    else:
        rates_arr = F.array(*[F.lit(float(x)) for x in fractions])
        rate = F.element_at(rates_arr, F.col(bin_col) + 1)
    return out.filter(hash_fraction(id_col, seed) < rate).drop("__th__")


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target_rows: int,
    alpha: float = 0.7,
    seed: int = 0,
    keep_rate_col: Optional[str] = None,
    renormalize: bool = True,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual up/down-sampling
    rule from multilingual-BERT / XLM-R / mT5): group s is sampled with
    probability proportional to n_s^alpha, flattening the source
    distribution for alpha < 1 so small sources are up-weighted relative
    to their raw share.  Expected output size is ~``target_rows`` exactly
    (in expectation): per-group keep rates are capped at 1.0, and with
    ``renormalize=True`` (default) the probability mass clipped off
    saturated small groups is redistributed over the unsaturated ones by
    the exact water-filling solution — rates are min(1, lam*w_s/n_s) with
    lam chosen so the expected total hits min(target_rows, corpus size)
    (without it, callers asking for N rows systematically get fewer
    whenever any group saturates — the round-6 advisor flag).  Set
    ``renormalize=False`` for the plain single-pass rule.

    Realized as: per-group counts (one map-side-combinable aggregate on a
    LOW-cardinality key — sources/languages, not documents), the
    water-filling threshold via cumulative-sum windows OVER THAT TINY
    TABLE (sorted by saturation point n_s/w_s, the candidate lam at each
    boundary is (T - sum n of saturated) / (sum w of unsaturated); exactly
    one boundary brackets its own candidate — no iteration, no collect),
    and a deterministic hash-fraction keep per row — the group-rate table
    is broadcast back, so the corpus itself is never shuffled.  Membership
    depends only on (id, seed): raising ``target_rows`` strictly grows the
    sample (nested samples), and any engine can replay the exact
    selection.

    Rates are rounded to 12 dp before the comparison so the keep decision
    is robust to last-ulp ``pow`` differences across engines.  Rows with
    NULL ``group_col`` are dropped (no defined mixture weight).  Pass
    ``keep_rate_col`` to keep the per-row applied rate for audit."""
    n = F.col("__n__").cast("double")
    w = F.pow(n, F.lit(float(alpha)))
    # NULL-group rows are dropped from the OUTPUT (no defined mixture
    # weight), so they must not inflate the normalization total either —
    # otherwise every real group's rate shrinks and the realized sample
    # undershoots target_rows
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    # empty-partitionBy / global-order windows are fine HERE: they run
    # over the per-group count table whose cardinality is the number of
    # sources/languages — bounded and tiny by definition, unlike per-row
    # global windows
    T = F.lit(float(target_rows))
    if renormalize:
        # water-filling: sort groups by saturation point ratio = n/w (the
        # lam at which the group's rate reaches 1).  If the first k groups
        # are saturated, lam = (T - sum_k n) / (sum_rest w); the correct k
        # is the one whose candidate lam falls inside [ratio_{k},
        # ratio_{k+1}) — checked per boundary row, exactly one matches.
        # No valid boundary means T >= corpus size: every rate is 1.
        ratio = (n / w).alias("__ratio__")
        aug = counts.select(F.col(group_col), F.col("__n__"), w.alias("__w__"), ratio)
        # every window below shares ONE (partition, order) spec so Catalyst
        # plans a single exchange + sort feeding stacked WindowExecs — the
        # old mix of orderBy windows and unordered partitionBy() globals
        # planned separate exchanges per spec (measured ~2x the pinned
        # query time from stage overhead alone on a 5-row counts table)
        ordw = Window.orderBy("__ratio__", group_col)
        before = ordw.rowsBetween(Window.unboundedPreceding, -1)
        whole = ordw.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        aug = aug.select(
            "*",
            F.coalesce(F.sum("__n__").over(before), F.lit(0)).cast("double").alias("__cn__"),
            F.coalesce(F.sum("__w__").over(before), F.lit(0.0)).alias("__cw__"),
            F.sum("__w__").over(whole).alias("__tw__"),
            F.lag("__ratio__").over(ordw).alias("__pr__"),
        )
        cand = (T - F.col("__cn__")) / (F.col("__tw__") - F.col("__cw__"))
        valid = (cand < F.col("__ratio__")) & (
            F.col("__pr__").isNull() | (cand >= F.col("__pr__"))
        )
        lam = F.max(F.when(valid, cand)).over(whole)
        rates = aug.select(
            group_col,
            F.round(
                F.when(lam.isNull(), F.lit(1.0)).otherwise(
                    F.least(F.lit(1.0), lam * F.col("__w__") / F.col("__n__"))
                ),
                12,
            ).alias("__rate__"),
        )
    else:
        tot = F.sum(w).over(Window.partitionBy())
        rates = counts.select(
            group_col,
            F.round(F.least(F.lit(1.0), T * (w / tot) / n), 12).alias("__rate__"),
        )
    out = df.join(F.broadcast(rates), on=group_col).filter(
        hash_fraction(id_col, seed) < F.col("__rate__")
    )
    if keep_rate_col:
        return out.withColumnRenamed("__rate__", keep_rate_col)
    return out.drop("__rate__")


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add ``shard`` (hash mod n_shards) and ``shard_pos`` (0-based rank by
    the deterministic shuffle key inside the shard).

    The shard is the unit of output parallelism at scale: repartition by
    ``shard`` and every writer task emits one contiguous, globally-shuffled
    shard — no driver-side ordering."""
    h = hash32(id_col, seed)
    w = Window.partitionBy("shard").orderBy(F.col("__h__"), F.col(id_col))
    return (
        df.withColumn("__h__", h)
        .withColumn("shard", (F.col("__h__") % n_shards).cast("int"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h__")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    n_shards: int = 1,
    seed: int = 0,
    eos_tokens: int = 0,
) -> DataFrame:
    """GPT-style packing: concatenate documents in deterministic-shuffle
    order per shard, then chunk the token stream into ``max_tokens``-sized
    context windows.  Documents may span pack boundaries (standard
    concat-and-chunk pre-training semantics; ``eos_tokens`` reserves
    separator tokens after each document).

    Output adds: shard, start offset in the shard's token stream,
    pack_id (context-window index of the document's first token) and
    pack_offset (position within that window).  The heavy op is one
    running-sum window per shard — shards bound partition size, so the
    plan scales by raising ``n_shards``, and AQE handles residual skew."""
    h = hash32(id_col, seed)
    doc_tokens = (F.col(token_col) + F.lit(int(eos_tokens))).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h__"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ensure_parallelism(df)
        .withColumn("__h__", h)
        .withColumn("shard", (F.col("__h__") % n_shards).cast("int"))
        .withColumn("start_offset", (F.sum(doc_tokens).over(w) - doc_tokens))
        .withColumn("pack_id", (F.col("start_offset") / max_tokens).cast("bigint"))
        .withColumn(
            "pack_offset", (F.col("start_offset") % max_tokens).cast("bigint")
        )
        .drop("__h__")
    )
    return out


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    seed: int = 0,
    group_col: Optional[str] = None,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test split assignment.

    ``weights`` maps split name -> fraction (must sum to ~1); each row
    lands in the split whose cumulative-weight interval contains its hash
    fraction.  With ``group_col`` the hash is taken over the GROUP value
    instead of the row id — the leakage-safe split: all rows of a
    near-duplicate cluster / domain / author land in the SAME split, so
    held-out data is never a near-copy of training data (the classic eval
    contamination bug).  NULL groups fall back to the row id.

    Pure per-row Catalyst (one md5 + a CASE ladder), no shuffle; exactly
    reproducible in any engine.  Split names are assigned in sorted-name
    order so the mapping is stable regardless of dict ordering."""
    total = sum(float(w) for w in weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key = (
        F.coalesce(F.col(group_col).cast("string"),
                   F.col(id_col).cast("string"))
        if group_col
        else F.col(id_col).cast("string")
    )
    out = df.withColumn("__k__", key).withColumn(
        "__f__", hash_fraction("__k__", seed)
    )
    cum = 0.0
    expr = None
    names = sorted(weights)
    for name in names[:-1]:
        cum += float(weights[name])
        branch = F.when(F.col("__f__") < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(
            F.col("__f__") < F.lit(cum), F.lit(name)
        )
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return out.withColumn(split_col, split).drop("__k__", "__f__")


def ring_negative_samples(
    corpus: DataFrame,
    queries: DataFrame,
    item_id_col: str,
    query_id_col: str,
    k: int = 5,
    seed: int = 0,
    exclude: DataFrame = None,
    bucket_bits: int = 12,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training
    via a CONSISTENT HASH RING: corpus items sit on a 32-bit md5 ring;
    each (query, slot j) probes position hash32(query + '#' + j) and
    takes the ring SUCCESSOR (smallest item hash >= probe, wrapping) —
    uniform-in-expectation negatives, reproducible in any engine, and
    never a corpus-per-query ranking.

    Plan shape: ONE equi-join on the ring bucket (high ``bucket_bits``
    bits) resolves almost every slot; slots whose bucket holds no
    successor resolve against a BROADCAST per-bucket-minimum summary
    (<= 2^bucket_bits rows, corpus-size-independent) — so the corpus
    shuffles once on the bucket id and the wrap/miss path never rescans
    it.  Pass ``exclude`` (query_id, item_id accidental-positive pairs)
    to anti-join collisions out; a query then yields < k negatives
    (rare at corpus scale; probe extra slots upstream if exact-k
    matters).

    Returns (query_id_col, slot, neg_id, neg_hash)."""
    n_buckets = 1 << bucket_bits
    width = (1 << 32) // n_buckets

    items = ensure_parallelism(corpus).select(
        F.col(item_id_col).alias("__iid__"),
        hash32(item_id_col, seed).alias("__ih__"),
    ).withColumn("__ib__", F.expr(f"__ih__ div {width}"))

    slots = (
        queries.select(F.col(query_id_col).alias("__qid__"))
        .distinct()
        .select(
            "__qid__", F.explode(F.expr(f"sequence(0, {k - 1})")).alias("slot")
        )
        .withColumn(
            "__probe__", F.concat(F.col("__qid__").cast("string"),
                                  F.lit("#"), F.col("slot").cast("string"))
        )
        .withColumn("__sh__", hash32("__probe__", seed))
        .withColumn("__sb__", F.expr(f"__sh__ div {width}"))
        .drop("__probe__")
    )

    # main pass: successor within the slot's own bucket
    hit = (
        slots.join(items, slots.__sb__ == items.__ib__, "left")
        .filter(F.col("__ih__") >= F.col("__sh__"))
        .groupBy("__qid__", "slot", "__sh__", "__sb__")
        .agg(F.min(F.struct("__ih__", "__iid__")).alias("__best__"))
    )
    resolved = hit.select(
        "__qid__", "slot",
        F.col("__best__.__iid__").alias("neg_id"),
        F.col("__best__.__ih__").alias("neg_hash"),
    )

    # miss pass: successor lives in a LATER non-empty bucket (or wraps to
    # the first) — resolved against the broadcast per-bucket minima
    summary = (
        items.groupBy("__ib__")
        .agg(F.min(F.struct("__ih__", "__iid__")).alias("__m__"))
        .agg(
            F.expr(
                "array_sort(collect_list(struct(__ib__, __m__.__ih__ AS h, "
                "__m__.__iid__ AS iid)))"
            ).alias("__summ__")
        )
    )
    pick = (
        "coalesce("
        "filter(__summ__, e -> e.__ib__ > __sb__)[0], "
        "__summ__[0])"
    )
    misses = (
        slots.join(
            hit.select("__qid__", "slot").withColumn("__hit__", F.lit(True)),
            on=["__qid__", "slot"], how="left",
        )
        .filter(F.col("__hit__").isNull())
        .crossJoin(F.broadcast(summary))
        .withColumn("__pick__", F.expr(pick))
        .select(
            "__qid__", "slot",
            F.col("__pick__.iid").alias("neg_id"),
            F.col("__pick__.h").alias("neg_hash"),
        )
    )
    out = resolved.unionByName(misses).withColumnRenamed(
        "__qid__", query_id_col
    )
    if exclude is not None:
        out = out.join(
            exclude.select(
                F.col(query_id_col), F.col(item_id_col).alias("neg_id")
            ),
            on=[query_id_col, "neg_id"],
            how="left_anti",
        )
    return out


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    seed: int = 0,
    group_col: str = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential ranks
    (Efraimidis & Spirakis 2006): every row draws the deterministic
    uniform u = (hash32(id, seed) + 1) / 2^32 and competes on key =
    -ln(u) / w — the k smallest keys are exactly a weight-proportional
    sample without replacement, with no sequential reservoir and no
    second pass (the distributed form of weighted reservoir sampling).

    ``sample_key`` is the LOG of that key, ln(-ln(u)) - ln(w) — a
    monotone transform that preserves the exact ranking while keeping
    RELATIVE precision at any weight magnitude (rounding -ln(u)/w itself
    to 9 dp collapsed every key to ~0 once weights reached ~1e10, quietly
    degrading the selection to smallest-id order).  -ln(u) is clamped at
    1e-300 so the u == 1 row gets a finite best-possible key instead of
    engine-divergent ln(0) handling.  Keys round to 9 dp with an id
    tiebreak so the selection is deterministic and engine-reproducible;
    rows with NULL or non-positive weight never qualify.  Ungrouped, the cut is
    orderBy+limit (TakeOrderedAndProject — parallel partial top-k, no
    corpus sort) and the rank window runs over <= k rows.  With
    ``group_col`` the cut takes k rows PER GROUP via the salted
    two-stage rank (rank within (group, salt) first, then over the
    <= n_salts*k survivors) — a hot group never funnels through one
    task.

    Returns (id_col, weight_col[, group_col], sample_key, rank)."""
    w = F.col(weight_col).cast("double")
    base = ensure_parallelism(df).filter(w.isNotNull() & (w > 0))
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    u = (hash32(id_col, seed) + F.lit(1)) / F.lit(HASH_SPACE)
    key = F.round(
        F.log(F.greatest(-F.log(u), F.lit(1e-300))) - F.log(w), 9
    )
    cols = [F.col(id_col), F.col(weight_col)] + (
        [F.col(group_col)] if group_col else []
    )
    scored = base.select(*cols, key.alias("sample_key"))
    order = [F.col("sample_key").asc(), F.col(id_col).asc()]
    if group_col:
        from feathub_spark.datapipe.similarity import _two_stage_topk

        return _two_stage_topk(
            scored, k, order, group_col=group_col, item_col=id_col
        )
    cut = scored.orderBy(*order).limit(k)
    rw = Window.orderBy(*order)
    return cut.withColumn("rank", F.row_number().over(rw).cast("bigint"))
