"""Bloom-filter join pruning — the scan-side semi-join reduction for the
regime where the dimension key set is too large to broadcast raw but a
few-hundred-KB bit array is nothing: build an m-bit Bloom filter over the
build side's keys, broadcast the BITS, and drop probe rows whose key
cannot be in the build side before the real join's shuffle ever sees
them.  (Spark's own runtime bloom-pushdown exists for plain equi-joins;
this operator makes the filter an explicit, reusable, engine-portable
artifact — persist the 1-row bits table and prune tomorrow's ingest with
it, or apply it before an as-of/interval join the optimizer cannot push
into.)

Hashing is the repo-standard md5 scheme (hash32(key, seed+j) for the
j-th function), so set bits — and therefore the exact surviving row set,
INCLUDING false positives — are reproducible in any SQL engine.  Words
hold 62 usable bits (shifting 1::BIGINT past 62 overflows in engines
with checked shifts).

Guarantee: no false negatives ever; false-positive fraction ~= (set-bit
fraction)^k, tune m_bits to key count (m ~= 10 bits/key with k=3 gives
~1-2% FP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism

_WORD_BITS = 62


def bloom_filter_bits(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Fold a key column into a 1-row Bloom bit table (`__bloom__`:
    array<bigint>, ceil(m_bits/62) words).  One map-side-combinable
    groupBy over (word), then a bounded assemble — the bits never grow
    with the key count."""
    from feathub_spark.datapipe.sampling import hash32

    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS
    pos_cols = [
        (hash32(key_col, seed + j) % F.lit(m_bits)).alias(f"p{j}")
        for j in range(k)
    ]
    words = (
        ensure_parallelism(keys)
        .select(F.explode(F.array(*pos_cols)).alias("__pos__"))
        .select(
            F.expr(f"__pos__ div {_WORD_BITS}").alias("__word__"),
            F.expr(f"__pos__ % {_WORD_BITS}").alias("__bit__"),
        )
        .groupBy("__word__")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__bit__ AS INT)))"
            ).alias("__w__")
        )
    )
    return words.agg(
        F.expr(
            "map_from_entries(collect_list(struct("
            "CAST(__word__ AS INT) AS k, __w__ AS v)))"
        ).alias("__m__")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "w -> coalesce(element_at(__m__, CAST(w AS INT)), CAST(0 AS BIGINT)))"
        ).alias("__bloom__")
    )


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Keep only rows whose ``key_col`` passes the membership test against
    ``bloom`` (a :func:`bloom_filter_bits` result built with the SAME
    m_bits/k/seed).  The bits attach as a 1-row broadcast; the test is k
    shift-and-mask expressions per row, no shuffle, no join."""
    # hash32's md5 expression inlined as SQL text (matches
    # sampling.hash32 exactly — the portability contract)
    h = (
        "CAST(conv(substr(md5(concat(CAST(`{col}` AS STRING), ':{sd}')), "
        "1, 8), 16, 10) AS BIGINT) % {m}"
    )
    preds = []
    for j in range(k):
        p = h.format(col=key_col, sd=seed + j, m=m_bits)
        preds.append(
            f"((shiftright(element_at(__bloom__, "
            f"CAST(({p}) div {_WORD_BITS} AS INT) + 1), "
            f"CAST(({p}) % {_WORD_BITS} AS INT)) & 1) = 1)"
        )
    return (
        ensure_parallelism(df)
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(" AND ".join(preds)))
        .drop("__bloom__")
    )
