"""Corpus drift monitoring: divergence between the token distributions of
two corpus snapshots (yesterday's crawl vs today's, corpus A vs corpus B)
— the standard early-warning signal for a source changing under a
training-data pipeline.

Plan shape: one map-side-combinable token count per side (vocab-sized
tables), a full outer join on the token key, 1-row totals attached via
broadcast cross joins (never a global window — the vocab is unbounded at
web scale), and a final 1-row aggregate.  Per-token divergence terms are
rounded into integer nano-units before summation, so the reduction is
exact bigint arithmetic — identical in any engine regardless of
aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.caching import register_cache
from feathub_spark.common.parallelism import ensure_parallelism


def token_kl_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Add-one-smoothed KL(P_a || P_b) and symmetric Jensen-Shannon
    divergence between the whitespace-token unigram distributions of two
    corpora, in bits.

    Smoothing: q(w) = (count_b(w) + 1) / (N_b + V) over the UNION vocab V
    (and likewise for p in the JS mixture), so tokens unseen on one side
    contribute finite mass.  Returns ONE row:
    (n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_union, kl_ab, js)."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            ensure_parallelism(df)
            .select(F.explode(F.expr(toks)).alias("__tok__"))
            .groupBy("__tok__")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = counts(df_a, "__na__")
    cb = counts(df_b, "__nb__")
    # the vocab-sized joined table feeds the totals aggregate AND the
    # divergence sum — cache it so both corpora tokenize/count once
    joined = register_cache(
        ca.join(cb, on="__tok__", how="full").select(
            "__tok__",
            F.coalesce("__na__", F.lit(0)).alias("__na__"),
            F.coalesce("__nb__", F.lit(0)).alias("__nb__"),
        )
    )
    tot = joined.alias("__j__").agg(
        F.sum("__na__").alias("__ta__"),
        F.sum("__nb__").alias("__tb__"),
        F.sum(F.when(F.col("__na__") > 0, 1).otherwise(0)).alias("__va__"),
        F.sum(F.when(F.col("__nb__") > 0, 1).otherwise(0)).alias("__vb__"),
        F.count(F.lit(1)).alias("__v__"),
    )
    w = joined.crossJoin(F.broadcast(tot))
    p = "((CAST(__na__ AS DOUBLE) + 1) / (CAST(__ta__ AS DOUBLE) + __v__))"
    q = "((CAST(__nb__ AS DOUBLE) + 1) / (CAST(__tb__ AS DOUBLE) + __v__))"
    m = f"(({p} + {q}) / 2)"
    # integer nano-unit terms: the final sums are exact bigint arithmetic
    kl_t = f"CAST(round({p} * log2({p} / {q}) * 1000000000, 0) AS BIGINT)"
    js_t = (
        f"CAST(round((({p} * log2({p} / {m})) + ({q} * log2({q} / {m}))) / 2 "
        f"* 1000000000, 0) AS BIGINT)"
    )
    return w.agg(
        F.first("__ta__").cast("bigint").alias("n_tokens_a"),
        F.first("__tb__").cast("bigint").alias("n_tokens_b"),
        F.first("__va__").cast("bigint").alias("vocab_a"),
        F.first("__vb__").cast("bigint").alias("vocab_b"),
        F.first("__v__").cast("bigint").alias("vocab_union"),
        F.round(
            F.sum(F.expr(kl_t)) / F.lit(1e9), 6
        ).alias("kl_ab"),
        F.round(
            F.sum(F.expr(js_t)) / F.lit(1e9), 6
        ).alias("js"),
    )
