"""Corpus-quality operators for training-data pipelines: repetition
signals (Gopher-style) and benchmark-contamination detection.

Repetition signals are pure per-row Catalyst expressions — a sort + single
fold over the document's own n-gram array (O(k log k) per doc, no shuffle,
whole-stage codegen), so they scale linearly with executors regardless of
corpus size.  Contamination is a broadcast semi-join of each document's
distinct n-grams against the (small) benchmark gram set followed by one
map-side-combinable count aggregation — the standard decontamination plan
(cf. GPT-3/Gopher appendix methodology; reference has no equivalent, this
is part of the beyond-reference training-data surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from feathub_spark.common.caching import register_cache
from feathub_spark.common.parallelism import ensure_parallelism
from feathub_spark.datapipe.text import ngrams, ngrams_strict_sql


def _gram_stats_sql(grams_sql: str, finish: str = None) -> str:
    """Struct(top_n, top_g, dup, total) over one n-gram array:

    - ``top_n`` / ``top_g``: occurrence count and value of the most frequent
      gram (ties resolve to the lexicographically smallest gram — the fold
      walks the sorted array and only a strictly larger run replaces the
      champion).
    - ``dup``: total characters across all occurrences of grams that occur
      more than once.
    - ``total``: total characters across all gram occurrences.

    Computed by sorting the array and folding run-lengths in a single
    ``aggregate`` pass with a finish lambda to close the last run.  Pass
    ``finish`` (an expression over the closed top_n/top_g/dup/total —
    spelled {top_n}/{top_g}/{dup}/{total}) to emit a final scalar instead
    of the struct: higher-order functions get no common-subexpression
    elimination, so a Column that references the fold k times would run
    the O(k log k) pass k times per row."""
    acc0 = (
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, "
        "'top_n', 0L, 'top_g', CAST(NULL AS STRING), 'dup', 0L, 'total', 0L)"
    )
    # close the current run: fold it into top/dup
    close_top_n = "CASE WHEN acc.run > acc.top_n THEN acc.run ELSE acc.top_n END"
    close_top_g = "CASE WHEN acc.run > acc.top_n THEN acc.prev ELSE acc.top_g END"
    close_dup = (
        "acc.dup + CASE WHEN acc.run > 1 "
        "THEN acc.run * CAST(length(acc.prev) AS BIGINT) ELSE 0L END"
    )
    merge = (
        "(acc, g) -> CASE WHEN acc.prev IS NOT NULL AND g = acc.prev THEN "
        "named_struct('prev', g, 'run', acc.run + 1L, 'top_n', acc.top_n, "
        "'top_g', acc.top_g, 'dup', acc.dup, "
        "'total', acc.total + CAST(length(g) AS BIGINT)) "
        f"ELSE named_struct('prev', g, 'run', 1L, 'top_n', {close_top_n}, "
        f"'top_g', {close_top_g}, 'dup', {close_dup}, "
        "'total', acc.total + CAST(length(g) AS BIGINT)) END"
    )
    if finish is None:
        finish_body = (
            f"named_struct('top_n', {close_top_n}, 'top_g', {close_top_g}, "
            f"'dup', {close_dup}, 'total', acc.total)"
        )
    else:
        finish_body = finish.format(
            top_n=close_top_n, top_g=close_top_g,
            dup=close_dup, total="acc.total",
        )
    return (
        f"aggregate(array_sort({grams_sql}), {acc0}, {merge}, "
        f"acc -> {finish_body})"
    )


_TOP_FRAC_FINISH = (
    "CASE WHEN {total} > 0 THEN "
    "round(CAST(({top_n}) * length({top_g}) AS DOUBLE) / {total}, 6) "
    "ELSE CAST(0 AS DOUBLE) END"
)
_DUP_FRAC_FINISH = (
    "CASE WHEN {total} > 0 THEN "
    "round(CAST({dup} AS DOUBLE) / {total}, 6) "
    "ELSE CAST(0 AS DOUBLE) END"
)


def top_ngram_char_frac(text_col: str, n: int) -> Column:
    """Fraction of n-gram characters covered by the single most frequent
    word n-gram (Gopher "top n-gram fraction" repetition signal).
    Documents with fewer than ``n`` tokens have no n-grams and score 0
    (the whole-text fallback gram scored every short doc 1.0 — maximally
    repetitive); the ratio is computed inside the fold's finish lambda so
    the O(k log k) pass runs once per row."""
    return F.expr(
        _gram_stats_sql(ngrams_strict_sql(text_col, n), _TOP_FRAC_FINISH)
    )


def dup_ngram_char_frac(text_col: str, n: int) -> Column:
    """Fraction of n-gram characters inside word n-grams that occur more
    than once in the document (Gopher "duplicate n-gram fraction").
    Documents with fewer than ``n`` tokens score 0 (no n-grams); one fold
    pass per row (ratio in the finish lambda)."""
    return F.expr(
        _gram_stats_sql(ngrams_strict_sql(text_col, n), _DUP_FRAC_FINISH)
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard per-document repetition feature set: top-2/3-gram character
    fractions and the duplicate-5-gram character fraction.  High values on
    any of them are the usual low-quality/degenerate-text cut.

    Each n's fold is materialized into one intermediate struct column so
    the O(k log k) pass runs once per n (the ratio projections reference
    the struct, not the fold).  Documents with fewer than n tokens have
    no n-grams and score 0 on that signal (strict grams — the whole-text
    fallback would score every short doc as maximally repetitive)."""
    df = ensure_parallelism(df)
    stats_cols = {
        f"__st{n}__": F.expr(_gram_stats_sql(ngrams_strict_sql(text_col, n)))
        for n in (2, 3, 5)
    }
    top = (
        "CASE WHEN __st{n}__.total > 0 THEN "
        "round(CAST(__st{n}__.top_n * length(__st{n}__.top_g) AS DOUBLE) "
        "/ __st{n}__.total, 6) ELSE CAST(0 AS DOUBLE) END"
    )
    dup = (
        "CASE WHEN __st{n}__.total > 0 THEN "
        "round(CAST(__st{n}__.dup AS DOUBLE) / __st{n}__.total, 6) "
        "ELSE CAST(0 AS DOUBLE) END"
    )
    return (
        df.withColumns(stats_cols)
        .withColumns(
            {
                "top2_frac": F.expr(top.format(n=2)),
                "top3_frac": F.expr(top.format(n=3)),
                "dup5_frac": F.expr(dup.format(n=5)),
            }
        )
        .drop(*stats_cols)
    )


def contamination_check(
    df: DataFrame,
    benchmark_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of the document's
    DISTINCT word n-grams that also appear anywhere in ``benchmark_df``.

    Plan shape (scale posture): the benchmark gram set is collapsed to
    distinct grams and broadcast — corpus rows never shuffle for the probe;
    the only shuffle is the per-document count aggregation, which is
    map-side combinable.  Returns (id, n_grams, n_hits, contamination)."""
    bench_grams = (
        ensure_parallelism(benchmark_df)
        .select(F.explode(F.array_distinct(ngrams(text_col, n))).alias("__gram__"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    doc_grams = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(text_col, n))).alias("__gram__"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "__gram__", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit__").alias("n_hits"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        )
    )


def token_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average unigram surprisal -log2 p(token) under the
    corpus's OWN empirical unigram distribution — the cheap KenLM-style
    quality signal: very low surprisal flags boilerplate/repetitive docs,
    very high flags garbled or out-of-distribution text; quality pipelines
    cut both tails.

    Plan shape (scale posture): the exploded token stream is hash-
    repartitioned on the token key and the shuffle layer — not a persist
    — is the shared intermediate: NOTHING corpus-sized is ever cached (a
    corpus-sized MEMORY_AND_DISK persist at 100 TB competes with
    execution memory and spills; shuffle files are the storage layer
    built for exactly this).  Column pruning splits the consumers into
    two exchanges (verified in the executed plan,
    plans/r15/token_surprisal_after_executed.txt): the unigram count
    table and the 1-row corpus total share ONE token-only exchange
    (ReusedExchange), and the scoring join shuffles the (doc, token)
    stream once by the same key.  The corpus total attaches via a
    broadcast cross join — NO empty-partitionBy window anywhere, so no
    stage ever serializes the vocab through a single task (web-scale
    whitespace vocab reaches billions of distinct tokens — URL
    fragments, numbers, typos — far too large for a one-task window,
    and too large to collect or broadcast, which is why the scoring
    join shuffles by token instead of probing a broadcast vocab);
    per-doc scoring joins the token-partitioned stream against the
    co-partitioned unigram table and one groupBy(doc) averages.  No
    collect, no persist.  Documents with zero tokens drop out of the
    output (inner join).

    Returns (id_col, n_tokens, avg_surprisal) with avg_surprisal rounded
    to 6 dp (absorbs summation-order float noise across engines)."""
    toks = (
        f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    )
    exploded = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(F.expr(toks)).alias("__tok__"))
        .repartition(F.col("__tok__"))
    )
    counts = exploded.groupBy("__tok__").agg(
        F.count(F.lit(1)).alias("__n__")
    )
    # the shared-lineage total: aliasing keeps the analyzer from
    # resolving the cross join's columns through the common subtree (the
    # ambiguity a plain crossJoin over shared lineage hits)
    total = exploded.alias("__tot_side__").agg(
        F.count(F.lit(1)).alias("__tot__")
    )
    unigram = counts.crossJoin(F.broadcast(total)).select(
        "__tok__",
        (-F.log2(F.col("__n__") / F.col("__tot__"))).alias("__surp__"),
    )
    return (
        exploded.join(unigram, on="__tok__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("__surp__"), 6).alias("avg_surprisal"),
        )
    )


def importance_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_expr: str,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights for domain-targeted data selection
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much more likely its tokens
    are under the TARGET domain's unigram LM than under the full source
    pool's, ``avg_t log(p_target(t) / p_source(t))`` with add-``alpha``
    smoothing over the pooled vocabulary.  Select with any downstream
    sampler — ``sampling.weighted_sample(weight_col='exp(w)')`` gives the
    paper's Gumbel-top-k resampling, a plain threshold gives hard
    selection.

    ``target_expr`` is a SQL boolean over ``df``'s columns defining the
    target subset (e.g. ``"lang = 'de'"`` or a quality-bucket predicate);
    target rows ALSO count toward the source pool, matching the paper's
    raw-pool formulation.

    Plan shape (scale posture): same as :func:`token_surprisal` — the
    exploded (token, is_target) stream is hash-repartitioned on the
    token key and the shuffle layer is the shared intermediate: the
    per-token count table and the 1-row (total_src, total_tgt, vocab)
    broadcast share one pruned exchange (ReusedExchange), the per-doc
    scoring join shuffles the (doc, token) stream once by the same key,
    and nothing corpus-sized is persisted.  No windows over the vocab,
    no collect.

    Returns (id_col, n_tokens, importance_weight) with the weight rounded
    to 6 dp (absorbs cross-engine float summation noise).  Zero-token
    documents drop out (inner join), like the other token-LM signals.
    """
    toks = (
        f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    )
    exploded = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.expr(toks)).alias("__tok__"),
            F.expr(target_expr).cast("boolean").alias("__is_tgt__"),
        )
        .repartition(F.col("__tok__"))
    )
    counts = exploded.groupBy("__tok__").agg(
        F.count(F.lit(1)).alias("__n_src__"),
        F.sum(F.when(F.col("__is_tgt__"), 1).otherwise(0)).alias(
            "__n_tgt__"
        ),
    )
    # the same totals the old counts-table pass produced: sum(n_src) =
    # total occurrences, sum(n_tgt) = target occurrences, count(counts
    # rows) = distinct tokens — the countDistinct's partial phase is
    # aligned with the token partitioning, so no extra exchange
    totals = exploded.alias("__t__").agg(
        F.count(F.lit(1)).alias("__tot_src__"),
        F.sum(
            F.when(F.col("__is_tgt__"), 1).otherwise(0)
        ).alias("__tot_tgt__"),
        F.countDistinct("__tok__").alias("__vocab__"),
    )
    a = F.lit(float(alpha))
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "__tok__",
        (
            F.log((F.col("__n_tgt__") + a)
                  / (F.col("__tot_tgt__") + a * F.col("__vocab__")))
            - F.log((F.col("__n_src__") + a)
                    / (F.col("__tot_src__") + a * F.col("__vocab__")))
        ).alias("__lr__"),
    )
    return (
        exploded.join(ratio, on="__tok__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("__lr__"), 6).alias("importance_weight"),
        )
    )


def cross_surprisal(
    df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    ref_text_col: str = None,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style perplexity filtering: score every document under a
    unigram LM trained on a separate REFERENCE corpus (CCNet scores crawl
    text against a Wikipedia LM) — ``avg_t -log2 p_ref(t)`` with
    add-``alpha`` smoothing over the reference vocabulary plus one OOV
    bucket, so out-of-reference tokens get the floor probability
    ``alpha / (N + alpha*(V+1))`` instead of blowing up.  Unlike
    :func:`token_surprisal` (the corpus's OWN LM), the reference never
    sees the scored text — the signal is "does this look like the
    reference domain", the head/middle/tail cut of CCNet.

    Plan shape: the REFERENCE token stream is hash-repartitioned ONCE on
    the token key; that shared exchange feeds the per-token count table
    and the 1-row (N, V) broadcast (no persist — exchange reuse shares
    the shuffle output).  The scored corpus's exploded tokens left-join
    that LM on the token key (OOV = the null side), one groupBy(doc).
    Reference and scored corpus are each scanned once.

    Returns (id_col, n_tokens, n_oov, avg_surprisal) — surprisal rounded
    to 6 dp; zero-token documents drop out."""
    ref_text_col = ref_text_col or text_col

    def _toks(col):
        return f"filter(split(trim(lower(`{col}`)), '\\\\s+'), t -> t <> '')"

    ref_toks = (
        ensure_parallelism(ref_df)
        .select(F.explode(F.expr(_toks(ref_text_col))).alias("__tok__"))
        .repartition(F.col("__tok__"))
    )
    counts = ref_toks.groupBy("__tok__").agg(
        F.count(F.lit(1)).alias("__n__")
    )
    totals = ref_toks.alias("__r__").agg(
        F.count(F.lit(1)).alias("__tot__"),
        F.countDistinct("__tok__").alias("__vocab__"),
    )
    doc_toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.expr(_toks(text_col))).alias("__tok__")
    )
    a = F.lit(float(alpha))
    scored = (
        doc_toks.join(counts, on="__tok__", how="left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__surp__",
            -F.log2(
                (F.coalesce(F.col("__n__"), F.lit(0)) + a)
                / (F.col("__tot__") + a * (F.col("__vocab__") + 1))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("__n__").isNull().cast("int")).cast("bigint").alias(
            "n_oov"
        ),
        F.round(F.avg("__surp__"), 6).alias("avg_surprisal"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compressed-size / raw-size per document — the classic
    repetitiveness signal (Gopher / RefinedWeb): highly repetitive or
    templated text compresses far below ~0.4, high-entropy gibberish sits
    near 1.0; pipelines cut both tails.

    zlib is not expressible in Catalyst or ANSI SQL, so this is a
    sanctioned Arrow-batched Python stage (mapInPandas; DEFLATE at the
    fixed ``level`` so results are deterministic); correctness is pinned
    by golden tests against python zlib directly rather than a SQL
    oracle.  Empty/NULL text scores 0.0.  Narrow per-row compute, no
    shuffle."""
    import zlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def score_batches(batches):
        for batch in batches:
            vals = []
            for t in batch[text_col]:
                if t is None or t == "":
                    vals.append(0.0)
                else:
                    raw = t.encode("utf-8")
                    vals.append(
                        round(len(zlib.compress(raw, level)) / len(raw), 6)
                    )
            batch = batch.copy()
            batch[out_col] = vals
            yield batch

    return ensure_parallelism(df).mapInPandas(score_batches, schema=out_schema)


def quality_buckets(
    df: DataFrame,
    value_col: str,
    group_col: str = None,
    n_buckets: int = 3,
    precision: int = 3,
    labels=("head", "middle", "tail"),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact count-based quantile bucketing of a per-document quality
    signal, optionally per group — the CCNet recipe (Wenzek et al. 2020):
    score documents by LM perplexity per language and split each language
    into head/middle/tail thirds; pipelines keep the head or reweight by
    bucket.  Works over any numeric column (here typically
    :func:`token_surprisal`'s output).

    Scale shape: values are rounded to ``precision`` dp first, so the
    per-(group, value) count table is BOUNDED (signal range x
    10^precision rows per group, independent of corpus size); thresholds
    come from cumulative-count windows over that table; docs get their
    bucket from a broadcast threshold join — no per-group sort of corpus
    rows anywhere (an ntile over the group would serialize each group
    through one task).  Threshold i is the smallest value whose cumulative
    count reaches ceil(i*n/k) — pure integer arithmetic, engine-exact;
    ties at a threshold all land in the lower bucket (value-based
    bucketing, so equal scores never split across buckets).

    Rows with NULL ``value_col`` or NULL ``group_col`` are dropped (no
    defined quantile).  Returns the input plus ``bucket_col``."""
    if n_buckets != len(labels):
        raise ValueError(
            f"labels must have n_buckets={n_buckets} entries, got {len(labels)}"
        )
    grp = group_col or "__g__"
    base = df.filter(F.col(value_col).isNotNull())
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    else:
        base = base.withColumn(grp, F.lit(0))
    v = F.round(F.col(value_col).cast("double"), precision)
    counts = base.groupBy(F.col(grp), v.alias("__v__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    wv = Window.partitionBy(grp).orderBy("__v__")
    wg = Window.partitionBy(grp)
    aug = counts.select(
        grp,
        "__v__",
        F.sum("__c__").over(wv).alias("__cum__"),
        F.sum("__c__").over(wg).alias("__n__"),
    )
    thr_aggs = [
        F.min(
            F.when(
                F.col("__cum__")
                >= F.expr(f"({i} * __n__ + {n_buckets - 1}) div {n_buckets}"),
                F.col("__v__"),
            )
        ).alias(f"__t{i}__")
        for i in range(1, n_buckets)
    ]
    thresholds = aug.groupBy(grp).agg(*thr_aggs)
    out = base.join(F.broadcast(thresholds), on=grp)
    bucket = F.lit(labels[-1])
    for i in range(n_buckets - 1, 0, -1):
        bucket = F.when(v <= F.col(f"__t{i}__"), F.lit(labels[i - 1])).otherwise(
            bucket
        )
    out = out.withColumn(bucket_col, bucket).drop(
        *[f"__t{i}__" for i in range(1, n_buckets)]
    )
    if not group_col:
        out = out.drop(grp)
    return out


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document average bigram surprisal under the corpus's own
    interpolated bigram model — the next step up from
    :func:`token_surprisal`'s unigram signal and the cheap stand-in for a
    KenLM perplexity filter: score(w1 w2) = -log2(lam * p(w2|w1) +
    (1-lam) * p_cont(w2)), averaged over positions 2..n.  The backoff
    term is the Kneser-Ney CONTINUATION probability (how many distinct
    left-contexts a word follows / total bigram types), which scores
    "glued" boilerplate phrases low and genuinely novel continuations
    high.

    Plan shape: everything derives from ONE exploded bigram projection,
    hash-repartitioned on the bigram key — nothing corpus-sized is ever
    persisted (the bigram-count aggregation and the final scoring join
    each shuffle the stream once by that key; column pruning gives the
    count side a narrower (prev, cur)-only exchange).  The count table
    ``bi`` IS persisted via the ``common.caching`` contract — it is the
    LM itself (bigram-TYPE-sized, the minimal shared state) and feeds
    four consumers: the prefix totals (groupBy prev), the continuation
    counts (groupBy cur), the 1-row type total (broadcast cross join —
    no global window; same reasoning as token_surprisal) and the scoring
    join.  Documents with fewer than 2 tokens drop out.

    Returns (id_col, n_bigrams, avg_surprisal) rounded to 6 dp."""
    toks = (
        f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    )
    pairs = (
        f"transform(array({toks}), t -> CASE WHEN size(t) >= 2 THEN "
        f"transform(sequence(2, size(t)), i -> named_struct("
        f"'p', element_at(t, i - 1), 'c', element_at(t, i))) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<p: STRING, c: STRING>>) END)[0]"
    )
    exploded = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(F.expr(pairs)).alias("__bg__"))
        .select(
            id_col,
            F.col("__bg__.p").alias("__p__"),
            F.col("__bg__.c").alias("__c__"),
        )
        .repartition(F.col("__p__"), F.col("__c__"))
    )
    # the bigram count table feeds FOUR consumers (prefix totals,
    # continuation counts, the type total and the scoring join) — cache it
    # so the corpus-scale aggregation runs once; it is vocab-pair-bounded
    # (the LM model table), not corpus-bounded
    bi = register_cache(
        exploded.groupBy("__p__", "__c__").agg(
            F.count(F.lit(1)).alias("__n__")
        )
    )
    prefix = bi.groupBy("__p__").agg(F.sum("__n__").alias("__n1__"))
    cont = bi.groupBy("__c__").agg(F.count(F.lit(1)).alias("__k__"))
    types = bi.alias("__bi__").agg(F.count(F.lit(1)).alias("__t__"))
    p = (
        F.lit(float(lam)) * (F.col("__n__") / F.col("__n1__"))
        + F.lit(1.0 - float(lam)) * (F.col("__k__") / F.col("__t__"))
    )
    scores = (
        bi.join(prefix, on="__p__")
        .join(cont, on="__c__")
        .crossJoin(F.broadcast(types))
        .select("__p__", "__c__", (-F.log2(p)).alias("__s__"))
    )
    return (
        exploded.join(scores, on=["__p__", "__c__"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("__s__"), 6).alias("avg_surprisal"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str = None,
    lower_pct: int = 5,
    upper_pct: int = 95,
    precision: int = 3,
    out_col: str = None,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Robust outlier treatment: per-group EXACT percentile thresholds
    (integer percent ranks, e.g. p5/p95), values clipped into
    [lo, hi] (``out_col``, default ``<value_col>_w``) and flagged
    (``flag_col``) — the standard winsorization gate before training on
    heavy-tailed numeric features.

    Same scale shape as :func:`quality_buckets`: values round to
    ``precision`` dp so the per-(group, value) count table is BOUNDED
    regardless of corpus size; thresholds come from cumulative-count
    windows over that table (threshold = smallest value whose cumulative
    count reaches ceil(pct*n/100), pure integer arithmetic) and attach
    back by broadcast join — no per-group sort of corpus rows, no
    approx_percentile nondeterminism.  Comparisons and clipping operate
    on the ROUNDED value so the outcome is engine-exact.  NULL values
    (and NULL groups when grouped) are dropped.

    Adds: ``out_col``, ``flag_col``, ``winsor_lo``, ``winsor_hi``."""
    if not (0 <= lower_pct < upper_pct <= 100):
        raise ValueError("need 0 <= lower_pct < upper_pct <= 100")
    out_col = out_col or f"{value_col}_w"
    grp = group_col or "__g__"
    base = df.filter(F.col(value_col).isNotNull())
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    else:
        base = base.withColumn(grp, F.lit(0))
    v = F.round(F.col(value_col).cast("double"), precision)
    counts = base.groupBy(F.col(grp), v.alias("__v__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    wv = Window.partitionBy(grp).orderBy("__v__")
    wg = Window.partitionBy(grp)
    aug = counts.select(
        grp,
        "__v__",
        F.sum("__c__").over(wv).alias("__cum__"),
        F.sum("__c__").over(wg).alias("__n__"),
    )
    thresholds = aug.groupBy(grp).agg(
        F.min(
            F.when(
                F.col("__cum__")
                >= F.expr(f"({lower_pct} * __n__ + 99) div 100"),
                F.col("__v__"),
            )
        ).alias("winsor_lo"),
        F.min(
            F.when(
                F.col("__cum__")
                >= F.expr(f"({upper_pct} * __n__ + 99) div 100"),
                F.col("__v__"),
            )
        ).alias("winsor_hi"),
    )
    out = (
        base.join(F.broadcast(thresholds), on=grp)
        .withColumn(
            out_col,
            F.when(v < F.col("winsor_lo"), F.col("winsor_lo"))
            .when(v > F.col("winsor_hi"), F.col("winsor_hi"))
            .otherwise(v),
        )
        .withColumn(
            flag_col,
            (v < F.col("winsor_lo")) | (v > F.col("winsor_hi")),
        )
    )
    if not group_col:
        out = out.drop(grp)
    return out


def rank_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str = None,
    precision: int = 3,
    out_col: str = None,
) -> DataFrame:
    """Percentile-rank normalization of a numeric feature, optionally per
    group: out = (# values <= v) / n over the group — the rank transform
    that makes heavy-tailed features comparable across groups (and the
    continuous counterpart of :func:`quality_buckets`).

    Same bounded shape as winsorize/quality_buckets: values round to
    ``precision`` dp, the per-(group, value) count table carries
    cumulative counts (BOUNDED by signal range x 10^precision, not
    corpus size), and rows pick up their percentile by broadcast join —
    no per-group corpus sort, exact integer arithmetic until the one
    final division (rounded to 6 dp).  Ties share a percentile (the
    cumulative count through the tied value).  NULL values (and NULL
    groups when grouped) are dropped.

    Adds ``out_col`` (default ``<value_col>_pctile``) in (0, 1]."""
    out_col = out_col or f"{value_col}_pctile"
    grp = group_col or "__g__"
    base = df.filter(F.col(value_col).isNotNull())
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    else:
        base = base.withColumn(grp, F.lit(0))
    v = F.round(F.col(value_col).cast("double"), precision)
    counts = base.groupBy(F.col(grp), v.alias("__v__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    wv = Window.partitionBy(grp).orderBy("__v__")
    wg = Window.partitionBy(grp)
    aug = counts.select(
        grp,
        "__v__",
        F.round(
            F.sum("__c__").over(wv) / F.sum("__c__").over(wg).cast("double"),
            6,
        ).alias(out_col),
    )
    lut = aug.select(
        F.col(grp).alias("__ag__"), "__v__", out_col
    )
    out = (
        base.join(
            F.broadcast(lut),
            on=[F.col(grp) == F.col("__ag__"), v == F.col("__v__")],
        )
        .drop("__ag__", "__v__")
    )
    if not group_col:
        out = out.drop(grp)
    return out


def robust_zscore(
    df: DataFrame,
    value_col: str,
    group_col: str = None,
    precision: int = 3,
    z_threshold: float = 3.5,
    out_col: str = None,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Median/MAD robust z-score per group — the outlier detector that a
    single corrupt batch cannot skew the way it skews mean/stddev:

        z = (v - median) / (1.4826 * MAD),
        MAD = median(|v - median|)

    (1.4826 makes MAD consistent with sigma under normality; |z| >
    ``z_threshold`` flags the row, the classic 3.5 cut of Iglewicz &
    Hoaglin 1993).  Both medians are EXACT lower medians computed by the
    engine's bounded count-table method (values round to ``precision``
    dp; cumulative counts; threshold = position ceil(n/2)) — two bounded
    aggregation passes + broadcast joins, no per-group sort, no
    approx_percentile.  Groups with MAD = 0 yield NULL z (flag false).
    NULL values (and NULL groups when grouped) are dropped.

    Adds ``out_col`` (default ``<value_col>_rz``) and ``flag_col``."""
    out_col = out_col or f"{value_col}_rz"
    grp = group_col or "__g__"
    base = df.filter(F.col(value_col).isNotNull())
    if group_col:
        base = base.filter(F.col(group_col).isNotNull())
    else:
        base = base.withColumn(grp, F.lit(0))
    v = F.round(F.col(value_col).cast("double"), precision)

    def _median_of(rows: DataFrame, col) -> DataFrame:
        counts = rows.groupBy(F.col(grp), col.alias("__v__")).agg(
            F.count(F.lit(1)).alias("__c__")
        )
        wv = Window.partitionBy(grp).orderBy("__v__")
        wg = Window.partitionBy(grp)
        aug = counts.select(
            grp,
            "__v__",
            F.sum("__c__").over(wv).alias("__cum__"),
            F.sum("__c__").over(wg).alias("__n__"),
        )
        return aug.groupBy(grp).agg(
            F.min(
                F.when(
                    F.col("__cum__") >= F.expr("(__n__ + 1) div 2"),
                    F.col("__v__"),
                )
            ).alias("__med__")
        )

    med = _median_of(base, v).withColumnRenamed(grp, "__mg__")
    with_med = base.join(
        F.broadcast(med), F.col(grp) == F.col("__mg__")
    ).drop("__mg__")
    dev = F.round(F.abs(v - F.col("__med__")), precision)
    mad = (
        _median_of(with_med, dev)
        .withColumnRenamed("__med__", "__mad__")
        .withColumnRenamed(grp, "__ag__")
    )
    z = F.when(
        F.col("__mad__") > 0,
        F.round(
            (v - F.col("__med__")) / (F.lit(1.4826) * F.col("__mad__")), 6
        ),
    )
    out = (
        with_med.join(F.broadcast(mad), F.col(grp) == F.col("__ag__"))
        .drop("__ag__")
        .withColumn(out_col, z)
        .withColumn(
            flag_col,
            F.coalesce(
                F.abs(F.col(out_col)) > F.lit(float(z_threshold)),
                F.lit(False),
            ),
        )
        .drop("__med__", "__mad__")
    )
    if not group_col:
        out = out.drop(grp)
    return out
