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
    groupBy over (word), a gap-filling left join against the word spine,
    then ONE sorted collect into a true ARRAY — arrays give O(1)
    element_at, where a map_from_entries lookup is an O(|map|) linear
    scan (measured: the map variant took 300s where this takes 2s at 4M
    bits, because both assembly and every probe re-scan the map).  The
    bits never grow with the key count."""
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
    spine = keys.sparkSession.range(n_words).select(
        F.col("id").alias("__word__")
    )
    full = spine.join(words, on="__word__", how="left").select(
        "__word__", F.coalesce(F.col("__w__"), F.lit(0)).alias("__w__")
    )
    return full.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__word__, __w__))), "
            "s -> s.__w__)"
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
    # the md5 appears twice per hash (word index div + bit position %) —
    # deliberately INLINE, not hoisted into a probe-side projection:
    # whole-stage codegen's subexpression elimination already evaluates
    # the repeated md5 once per row inside the fused filter, while a
    # withColumns projection below the broadcast join measured 2.0x
    # slower wall on the identical query (it breaks the scan->filter
    # fusion without saving any hashing)
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
