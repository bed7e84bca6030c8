"""Duplicate-passage detection via winnowing fingerprints.

The scalable stand-in for suffix-array exact substring dedup (the technique
popularized for LLM corpora by Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better"): suffix arrays need a global sort of every
suffix, which has no good distributed expression, but the *winnowing*
fingerprint scheme (Schleimer, Wilkerson, Aiken 2003 — the MOSS algorithm)
gives a content-defined selection of character-gram hashes with a hard
guarantee: any substring shared between two documents of length at least

    t = window + gram_len - 1   characters

produces at least one IDENTICAL selected fingerprint in both documents.  So
"documents sharing a >= t-char passage" reduces to an equi-join on the
fingerprint value — one map-side-combinable groupBy instead of an all-pairs
scan.

Plan shape (the 100 TB story):
- Gram hashing and window-min selection are pure Catalyst higher-order
  expressions inside whole-stage codegen: O(chars * gram_len) narrow
  per-row compute, ZERO shuffle.  The dual 31-bit polynomial char hash
  (same construction as :func:`feathub_spark.datapipe.dedup.simhash`'s
  ``hash_fn="poly"``) keeps every intermediate < 2^62, so the exact
  pipeline is reproducible in any ANSI SQL engine for oracle checks.
- Winnowing emits ~2/(window+1) fingerprints per character (the paper's
  density bound), i.e. the shuffled volume is a tunable fraction of corpus
  size — raise ``window`` to trade recall granularity for shuffle volume.
- The fingerprint -> doc-frequency aggregation is a map-side-combinable
  groupBy on the 8-byte fingerprint; the join back to per-doc rows reuses
  the same hash partitioning (no extra exchange on the counts side).

No reference counterpart: feathub (e.g.
/root/reference/python/feathub/feature_views/feature_view.py) has no text
dedup surface; this module is beyond-reference capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.caching import register_cache
from feathub_spark.common.parallelism import ensure_parallelism

_M31 = (1 << 31) - 1


def _gram_hashes_sql(text_col: str, gram_len: int, hash_fn: str = "poly") -> str:
    """array<bigint> of hashes of every ``gram_len``-character gram (1 per
    position), empty when the text is too short.

    ``hash_fn="xxhash64"`` is the production path (one JVM hash per
    position); ``"poly"`` is the dual-31-bit polynomial char fold — ~10x
    more arithmetic but every intermediate stays < 2^62, so any ANSI SQL
    engine reproduces it exactly for oracle checks (same construction as
    :func:`feathub_spark.datapipe.dedup.simhash`)."""
    if hash_fn == "xxhash64":
        gram = f"xxhash64(substr(`{text_col}`, i, {gram_len}))"
        body = (
            f"transform(sequence(1, length(`{text_col}`) - {gram_len} + 1), "
            f"i -> {gram})"
        )
    elif hash_fn == "poly":
        # char codes extracted ONCE into an int array: substr(text, j, 1)
        # is O(j) on UTF8String (variable-width scan), so per-gram char
        # lookups via substr made the fold O(n * L * n) per doc — the
        # jstack-confirmed hot spot.  element_at on the bound array is O(1).
        fold_a = (
            f"aggregate(sequence(i, i + {gram_len - 1}), CAST(7 AS BIGINT), "
            f"(h, j) -> (h * 1103515245 + element_at(ch, j)) % {_M31})"
        )
        fold_b = (
            f"aggregate(sequence(i, i + {gram_len - 1}), CAST(13 AS BIGINT), "
            f"(h, j) -> (h * 69069 + element_at(ch, j)) % {_M31})"
        )
        # split('') explodes the chars in ONE O(n) pass (a per-index substr
        # loop re-seeks the UTF-8 string from the start, O(n²) bytes/row)
        body = _let1(
            f"transform(split(`{text_col}`, ''), c -> CAST(ascii(c) AS BIGINT))",
            "ch",
            f"transform(sequence(1, length(`{text_col}`) - {gram_len} + 1), "
            f"i -> {fold_a} * 2147483648L + {fold_b})",
        )
    else:
        raise ValueError(f"unknown passages hash_fn: {hash_fn!r}")
    return (
        f"CASE WHEN length(`{text_col}`) >= {gram_len} THEN {body} "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def _let1(bound_expr: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``bound_expr`` ONCE and expose it as lambda
    variable ``var`` inside ``body`` (a transform over a 1-element array).

    This is load-bearing, not style: Catalyst's CollapseProject may inline
    an intermediate Project column into every one of its references, and
    higher-order functions evaluate interpreted — inlining the O(n·L)
    gram-hash array into per-window slice/min/position references turned
    the winnow selection O(n²·L) and a 500-doc corpus took CPU-hours
    (observed via jstack before this binding existed).  Lambda variables
    are bound once per evaluation, so the optimizer cannot duplicate the
    bound computation."""
    return f"element_at(transform(array({bound_expr}), {var} -> {body}), 1)"


def _poly_gram_hashes_np(text, gram_len):
    """Vectorized dual-31-bit polynomial gram hashes — bit-identical to the
    ``hash_fn="poly"`` SQL fold in :func:`_gram_hashes_sql` (same constants,
    same per-step modulus), but ~100x faster: Catalyst evaluates
    higher-order lambdas interpreted (one virtual call per char per
    position), while this folds all positions at once with ``gram_len``
    numpy passes.  utf-32 decode yields the same code points as the SQL
    ``split('') -> ascii`` extraction."""
    import numpy as np

    if text is None:
        return None
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = c.size - gram_len + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    ha = np.full(n, 7, dtype=np.int64)
    hb = np.full(n, 13, dtype=np.int64)
    for j in range(gram_len):
        seg = c[j : j + n]
        ha = (ha * 1103515245 + seg) % _M31
        hb = (hb * 69069 + seg) % _M31
    return ha * 2147483648 + hb


def _xxh64_np(data, lengths, seed: int = 42):
    """Vectorized XXH64 over rows of a (n, maxlen) uint8 matrix with
    per-row byte lengths.  Bit-identical to Spark's ``xxhash64`` function
    (Catalyst XXH64, default seed 42, a faithful implementation of the
    public xxHash spec) — pinned against it by a randomized fuzz test in
    test_passages.py including multibyte/astral-plane tails.  uint64
    arithmetic wraps mod 2^64 exactly like the JVM longs."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    n, maxlen = data.shape
    rows = np.arange(n)
    bl = lengths.astype(np.int64)

    def read_le(off, nbytes):
        # little-endian word at per-row byte offset; masked rows read
        # clipped garbage that np.where discards
        idx = np.clip(off[:, None] + np.arange(nbytes), 0, max(maxlen - 1, 0))
        vals = data[rows[:, None], idx].astype(np.uint64)
        return (vals << (np.arange(nbytes, dtype=np.uint64) * np.uint64(8))).sum(
            axis=1, dtype=np.uint64
        )

    mask64 = (1 << 64) - 1
    h = np.full(n, (seed + int(P5)) & mask64, dtype=np.uint64)

    big = bl >= 32
    nstripes = (bl // 32).astype(np.int64)
    if big.any():
        # scalar uint64 ops warn on wraparound (array ops don't) — wrap in
        # Python ints, which are exact, then cast once
        v1 = np.full(n, (seed + int(P1) + int(P2)) & mask64, dtype=np.uint64)
        v2 = np.full(n, (seed + int(P2)) & mask64, dtype=np.uint64)
        v3 = np.full(n, seed & mask64, dtype=np.uint64)
        v4 = np.full(n, (seed - int(P1)) & mask64, dtype=np.uint64)
        lanes = [v1, v2, v3, v4]
        for k in range(int(nstripes.max())):
            m = nstripes > k
            for lane in range(4):
                x = read_le(np.full(n, k * 32 + lane * 8), 8)
                v = lanes[lane]
                lanes[lane] = np.where(m, rotl(v + x * P2, 31) * P1, v)
        v1, v2, v3, v4 = lanes
        hb = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in lanes:
            hb = (hb ^ (rotl(v * P2, 31) * P1)) * P1 + P4
        h = np.where(big, hb, h)

    h = h + bl.astype(np.uint64)
    p = np.where(big, nstripes * 32, 0)
    for _ in range(3):  # tail < 32 bytes -> at most three 8-byte words
        m = (p + 8) <= bl
        if not m.any():
            break
        k1 = rotl(read_le(p, 8) * P2, 31) * P1
        h = np.where(m, rotl(h ^ k1, 27) * P1 + P4, h)
        p = np.where(m, p + 8, p)
    m = (p + 4) <= bl
    if m.any():
        h = np.where(m, rotl(h ^ (read_le(p, 4) * P1), 23) * P2 + P3, h)
        p = np.where(m, p + 4, p)
    for _ in range(3):  # at most three trailing bytes
        m = p < bl
        if not m.any():
            break
        b = data[rows, np.clip(p, 0, max(maxlen - 1, 0))].astype(np.uint64)
        h = np.where(m, rotl(h ^ (b * P5), 11) * P1, h)
        p = np.where(m, p + 1, p)
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def _xxh64_np_uniform(data, seed: int = 42):
    """XXH64 over rows of a (n, L) uint8 matrix where EVERY row has length
    L — the pure-ASCII gram case, where gram byte windows are fixed-width.
    Straight-line (no per-row masks, contiguous column slices instead of
    fancy-index gathers), same values as :func:`_xxh64_np`."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    n, L = data.shape
    shifts = np.arange(8, dtype=np.uint64) * np.uint64(8)

    def read_le(o, nb):
        v = data[:, o : o + nb].astype(np.uint64)
        return (v << shifts[:nb]).sum(axis=1, dtype=np.uint64)

    mask64 = (1 << 64) - 1
    if L >= 32:
        v1 = np.full(n, (seed + int(P1) + int(P2)) & mask64, dtype=np.uint64)
        v2 = np.full(n, (seed + int(P2)) & mask64, dtype=np.uint64)
        v3 = np.full(n, seed & mask64, dtype=np.uint64)
        v4 = np.full(n, (seed - int(P1)) & mask64, dtype=np.uint64)
        lanes = [v1, v2, v3, v4]
        for k in range(L // 32):
            for lane in range(4):
                x = read_le(k * 32 + lane * 8, 8)
                lanes[lane] = rotl(lanes[lane] + x * P2, 31) * P1
        v1, v2, v3, v4 = lanes
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in lanes:
            h = (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4
        p = (L // 32) * 32
    else:
        h = np.full(n, (seed + int(P5)) & mask64, dtype=np.uint64)
        p = 0
    h = h + np.uint64(L)
    while L - p >= 8:
        k1 = rotl(read_le(p, 8) * P2, 31) * P1
        h = rotl(h ^ k1, 27) * P1 + P4
        p += 8
    if L - p >= 4:
        h = rotl(h ^ (read_le(p, 4) * P1), 23) * P2 + P3
        p += 4
    while p < L:
        h = rotl(h ^ (data[:, p].astype(np.uint64) * P5), 11) * P1
        p += 1
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def _xxh64_gram_hashes_np(text, gram_len):
    """Per-position xxhash64 gram hashes, bit-identical to the SQL
    ``xxhash64(substr(text, i, gram_len))`` (Spark hashes the substring's
    UTF-8 bytes) but O(chars * gram_bytes) instead of the O(chars^2)
    byte-seeking that per-position ``substr`` costs on UTF8String."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    if text is None:
        return None
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = cp.size - gram_len + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size == cp.size:  # pure ASCII: fixed-width byte windows, no gather
        return _xxh64_np_uniform(sliding_window_view(b, gram_len)).view(np.int64)
    clen = (
        1 + (cp >= 0x80).astype(np.int64) + (cp >= 0x800) + (cp >= 0x10000)
    )
    off = np.zeros(cp.size + 1, dtype=np.int64)
    np.cumsum(clen, out=off[1:])
    starts = off[:n]
    bl = off[gram_len : gram_len + n] - starts
    idx = np.clip(starts[:, None] + np.arange(int(bl.max())), 0, b.size - 1)
    return _xxh64_np(b[idx], bl).view(np.int64)


_GRAM_HASHES_NP = {"poly": _poly_gram_hashes_np, "xxhash64": _xxh64_gram_hashes_np}


def _winnow_select_np(fp, window: int, positions: bool):
    """Window-min winnow selection over a gram-hash int64 array, matching
    the SQL fold value-for-value: first-occurrence distinct order
    (= array_distinct) and first-position min ties (= array_position)."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    if fp is None or fp.size == 0:
        return []
    w_eff = min(window, fp.size)
    sw = sliding_window_view(fp, w_eff)
    mins = sw.min(axis=1)
    if not positions:
        # pd.unique preserves first-occurrence order = array_distinct
        return pd.unique(mins).tolist()
    idx = sw.argmin(axis=1)  # first min index = array_position tie rule
    pos = (np.arange(sw.shape[0]) + idx + 1).tolist()
    pairs = dict.fromkeys(zip(mins.tolist(), pos))
    return [{"fp": f, "pos": p} for f, p in pairs]


_WINNOW_RET = {
    True: "array<struct<fp: bigint, pos: int>>",
    False: "array<bigint>",
}


def _winnow_arrow_udf(gram_len: int, window: int, positions: bool, hash_fn: str):
    """Scalar pandas_udf computing the winnow selection entirely in numpy
    (vectorized gram hashes + sliding-window min), matching the SQL path
    value-for-value including first-occurrence distinct order and
    first-position min ties.  Scalar (not mapInPandas) so only the text
    column crosses the Arrow boundary — the rest of the row stays JVM-side
    and the plan stays narrow (no shuffle)."""
    gram_hashes = _GRAM_HASHES_NP[hash_fn]

    def one(text):
        return _winnow_select_np(gram_hashes(text, gram_len), window, positions)

    @F.pandas_udf(_WINNOW_RET[positions])
    def winnow(texts):
        return texts.apply(one)

    return winnow


def _winnow_sql(gram_hashes_expr: str, window: int) -> str:
    """Distinct window-min fingerprints over the gram-hash array.

    Window w selects min(hashes[w .. w+W-1]) (W clamped to the array size
    for short docs).  The selected VALUE depends only on the hash content
    of the window, so two occurrences of the same >= window+gram_len-1
    char substring select the same fingerprint — the winnowing guarantee.
    """
    w_eff = "least({w}, size(gh))".format(w=window)
    body = (
        f"CASE WHEN size(gh) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE array_distinct(transform("
        f"sequence(1, size(gh) - {w_eff} + 1), "
        f"w -> array_min(slice(gh, w, {w_eff})))) END"
    )
    return _let1(gram_hashes_expr, "gh", body)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    hash_fn: str = "xxhash64",
    impl: str = "auto",
) -> DataFrame:
    """Append ``__fps__``: array<bigint> of distinct winnowing fingerprints.

    Any two documents sharing a substring of >= ``window + gram_len - 1``
    characters share at least one fingerprint value.  Narrow per-row
    compute only — no shuffle.

    ``impl``: "auto"/"arrow" pick the vectorized Arrow winnow — numpy gram
    hashing + sliding-window min, bit-identical to the SQL fold for both
    hash functions and ~3-10x faster (Catalyst evaluates higher-order
    lambdas interpreted, and per-position ``substr`` byte-seeks are
    O(chars^2) on UTF8String).  "sql" forces the pure-Catalyst fold
    (test_passages.py pins their equality)."""
    return _winnow_col(
        df, text_col, gram_len, window, hash_fn, impl,
        positions=False, out_col="__fps__",
    )


def _winnow_col(
    df: DataFrame,
    text_col: str,
    gram_len: int,
    window: int,
    hash_fn: str,
    impl: str,
    positions: bool,
    out_col: str,
) -> DataFrame:
    """Shared dispatch: append the winnow-selection column via the SQL fold
    or one of the value-identical Arrow fast paths (docstring of
    :func:`winnow_fingerprints`)."""
    if impl not in ("auto", "sql", "arrow"):
        raise ValueError(f"unknown passages impl: {impl!r}")
    df = ensure_parallelism(df)
    if impl != "sql" and hash_fn in _GRAM_HASHES_NP:
        udf = _winnow_arrow_udf(gram_len, window, positions, hash_fn)
        return df.withColumn(out_col, udf(F.col(text_col)))
    if positions:
        return df.withColumn(
            out_col, F.expr(_winnow_positions_sql(text_col, gram_len, window, hash_fn))
        )
    sel = _winnow_sql(_gram_hashes_sql(text_col, gram_len, hash_fn), window)
    return df.withColumn(out_col, F.expr(sel))


def _winnow_exploded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int,
    window: int,
    hash_fn: str,
    with_count: bool = False,
    outer: bool = False,
    positions: bool = False,
) -> DataFrame:
    """Flat (id[, __nfp__], __fp__[, __pos__]) rows straight out of the
    winnow selection — the shape every exploding consumer (posting lists,
    index builds, doc-frequency stats) reduces to anyway.

    The array-column route (``winnow_fingerprints`` + ``explode``) builds
    one Python list element per selected fingerprint inside the pandas
    UDF, ships them as Arrow list arrays, and pays a JVM explode — for a
    corpus emitting millions of selections that is millions of transient
    Python objects plus a wide intermediate (guide §4: keep batches in
    native code).  Here a ``mapInArrow`` pass keeps every selection in
    numpy end-to-end: per input batch it concatenates the per-row
    selections into flat int64 buffers and yields ONE Arrow batch of
    already-exploded rows (ids gathered via ``pyarrow.compute.take``, so
    any id type survives unchanged).

    ``outer=True`` mirrors ``explode_outer``: rows with zero selections
    emit one (id, 0, NULL) row.  Selection-set semantics are identical to
    the array route (distinct values; for ``positions`` distinct
    (fp, pos) pairs with the first-position min tie rule) — only row
    order differs, which no consumer observes.  Falls back to the
    array+explode route for hash functions without a numpy twin."""
    if positions and outer:
        raise ValueError("positions with outer is not supported")
    if hash_fn not in _GRAM_HASHES_NP:
        out_col = "__fpp__" if positions else "__fps__"
        base = _winnow_col(
            df, text_col, gram_len, window, hash_fn, "sql",
            positions=positions, out_col=out_col,
        )
        explode = F.explode_outer if outer else F.explode
        proj = [F.col(id_col)]
        if with_count:
            proj.append(F.size(out_col).cast("long").alias("__nfp__"))
        proj.append(explode(out_col).alias("__e__"))
        flat = base.select(*proj)
        if positions:
            return flat.select(
                *[c for c in flat.columns if c != "__e__"],
                F.col("__e__.fp").alias("__fp__"),
                F.col("__e__.pos").alias("__pos__"),
            )
        return flat.withColumnRenamed("__e__", "__fp__")

    gram_hashes = _GRAM_HASHES_NP[hash_fn]
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    fields = [T.StructField(id_col, id_type)]
    if with_count:
        fields.append(T.StructField("__nfp__", T.LongType()))
    fields.append(T.StructField("__fp__", T.LongType()))
    if positions:
        fields.append(T.StructField("__pos__", T.IntegerType()))
    out_schema = T.StructType(fields)

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        from numpy.lib.stride_tricks import sliding_window_view

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0)
            texts = rb.column(1).to_pylist()
            counts = np.empty(n, dtype=np.int64)
            sels, poss = [], []
            for r, t in enumerate(texts):
                fp = gram_hashes(t, gram_len)
                if fp is None or fp.size == 0:
                    counts[r] = 0
                    continue
                w_eff = min(window, fp.size)
                sw = sliding_window_view(fp, w_eff)
                mins = sw.min(axis=1)
                if positions:
                    # first-min-index tie rule = SQL array_position, then
                    # first-occurrence-distinct (fp, pos) pairs; np.unique
                    # over the stacked pair matrix keeps the same SET
                    pos = np.arange(sw.shape[0], dtype=np.int64) + sw.argmin(axis=1) + 1
                    pairs = np.unique(np.stack([mins, pos], axis=1), axis=0)
                    sel, p = pairs[:, 0], pairs[:, 1]
                    poss.append(p)
                else:
                    sel = np.unique(mins)
                counts[r] = sel.size
                sels.append(sel)
            rep = np.maximum(counts, 1) if outer else counts
            idx = np.repeat(np.arange(n, dtype=np.int64), rep)
            total = int(rep.sum())
            if total == 0:
                continue
            if outer:
                # rows with zero selections carry one NULL-fp output row
                vals = np.zeros(total, dtype=np.int64)
                mask = np.zeros(total, dtype=bool)
                ends = np.cumsum(rep)
                starts = ends - rep
                k = 0
                for r in range(n):
                    if counts[r] == 0:
                        mask[starts[r]] = True
                    else:
                        vals[starts[r] : ends[r]] = sels[k]
                        k += 1
                fp_arr = pa.array(vals, mask=mask)
            else:
                fp_arr = pa.array(
                    np.concatenate(sels) if sels
                    else np.empty(0, dtype=np.int64)
                )
            cols = [pc.take(ids, pa.array(idx))]
            if with_count:
                cols.append(pa.array(np.repeat(counts, rep)))
            cols.append(fp_arr)
            if positions:
                cols.append(
                    pa.array(
                        (np.concatenate(poss) if poss
                         else np.empty(0, dtype=np.int64)).astype(np.int32)
                    )
                )
            yield pa.RecordBatch.from_arrays(cols, [f.name for f in fields])

    proj = ensure_parallelism(df).select(F.col(id_col), F.col(text_col))
    return proj.mapInArrow(gen, out_schema)


def winnow_fingerprint_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    hash_fn: str = "xxhash64",
    impl: str = "auto",
) -> DataFrame:
    """Append ``__fpp__``: array<struct<fp:bigint, pos:int>> of distinct
    (fingerprint, 1-based gram position) selections — the position-carrying
    variant of :func:`winnow_fingerprints` used for span removal.  Each
    selection covers characters [pos, pos + gram_len - 1].  Within a
    window, ties on the min hash resolve to the FIRST position
    (deterministic)."""
    return _winnow_col(
        df, text_col, gram_len, window, hash_fn, impl,
        positions=True, out_col="__fpp__",
    )


def _winnow_positions_sql(
    text_col: str, gram_len: int, window: int, hash_fn: str
) -> str:
    w_eff = f"least({window}, size(gh))"
    per_window = _let1(
        f"slice(gh, w, {w_eff})",
        "sl",
        _let1(
            "array_min(sl)",
            "m",
            "named_struct('fp', m, "
            "'pos', CAST(w - 1 + array_position(sl, m) AS INT))",
        ),
    )
    body = (
        f"CASE WHEN size(gh) = 0 THEN "
        f"CAST(array() AS ARRAY<STRUCT<fp: BIGINT, pos: INT>>) "
        f"ELSE array_distinct(transform("
        f"sequence(1, size(gh) - {w_eff} + 1), "
        f"w -> {per_window})) END"
    )
    return _let1(_gram_hashes_sql(text_col, gram_len, hash_fn), "gh", body)


def remove_duplicate_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    min_occurrences: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cut corpus-duplicated passages out of the text (the ExactSubstr
    dedup of Lee et al. 2022, re-expressed via winnowing): every selected
    fingerprint occurring >= ``min_occurrences`` times corpus-wide (counting
    within-document repeats, as the paper does) marks its [pos, pos +
    gram_len - 1] character span; overlapping/adjacent spans merge; ALL
    marked occurrences are removed from every document.

    Returns (id_col, clean_text, n_dup_spans, n_dup_chars).

    Plan: narrow fingerprint+position extraction (no shuffle) -> occurrence
    explode -> map-side-combinable count per fingerprint -> semi-join of
    duplicated fingerprints (co-partitioned with the count exchange) ->
    per-doc sorted position list -> join back to the text.  Interval merge
    and text rebuild are per-row Catalyst folds over the doc's own span
    list (bounded by ~2·len/(window+1) winnowing selections), so the heavy
    string work never leaves codegen."""
    # the flat (id, fp, pos) occurrence emit feeds BOTH the duplicated-
    # fingerprint aggregate and the position join — cache the narrow
    # occurrence rows (one winnow UDF pass); the text side no longer
    # needs the UDF at all, it re-reads the source columns directly
    occ = register_cache(_winnow_exploded(
        df, text_col, id_col, gram_len, window, hash_fn, positions=True
    ))
    dup = (
        occ.groupBy("__fp__")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") >= min_occurrences)
        .select("__fp__")
    )
    doc_pos = (
        occ.join(dup, on="__fp__")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos__")).alias("__dpos__"))
    )
    out = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.col(text_col))
        .join(doc_pos, on=id_col, how="left")
    )
    L = gram_len
    merged = (
        f"aggregate(coalesce(__dpos__, CAST(array() AS ARRAY<INT>)), "
        f"CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>), "
        f"(acc, p) -> CASE WHEN size(acc) > 0 AND p <= element_at(acc, -1).e + 1 "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array(named_struct('s', element_at(acc, -1).s, "
        f"'e', greatest(element_at(acc, -1).e, p + {L - 1})))) "
        f"ELSE concat(acc, array(named_struct('s', p, 'e', p + {L - 1}))) END)"
    )
    out = out.withColumn("__spans__", F.expr(merged)).drop("__dpos__")
    clean = (
        f"aggregate(__spans__, "
        f"named_struct('prev', 1, 'out', ''), "
        f"(acc, iv) -> named_struct("
        f"'prev', iv.e + 1, "
        f"'out', concat(acc.out, substr(`{text_col}`, acc.prev, iv.s - acc.prev))), "
        f"acc -> concat(acc.out, "
        f"substr(`{text_col}`, acc.prev, length(`{text_col}`) - acc.prev + 1)))"
    )
    return out.select(
        F.col(id_col),
        F.expr(clean).alias("clean_text"),
        F.size("__spans__").cast("bigint").alias("n_dup_spans"),
        F.expr(
            "aggregate(__spans__, 0L, (a, iv) -> a + CAST(iv.e - iv.s + 1 AS BIGINT))"
        ).alias("n_dup_chars"),
    )


def dup_passage_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-passage signal.

    Returns (id_col, n_fingerprints, n_shared, dup_fraction) where
    ``n_shared`` counts this document's fingerprints that also occur in at
    least one OTHER document and ``dup_fraction = n_shared /
    n_fingerprints`` (0.0 for fingerprint-less short docs).  The standard
    corpus-hygiene filter is ``dup_fraction > threshold``.

    Shuffle budget: flat fingerprint emit (narrow) -> groupBy fingerprint
    (map-side combinable; counts reuse the exchange for the join) ->
    groupBy doc.  The exploded projection is persisted because it feeds
    both the doc-frequency aggregate and the join back."""
    fps = register_cache(_winnow_exploded(
        df, text_col, id_col, gram_len, window, hash_fn,
        with_count=True, outer=True,
    ))
    # docs contributing a fingerprint at most once (array_distinct upstream)
    # => count(*) per fingerprint == number of docs containing it
    counts = fps.filter(F.col("__fp__").isNotNull()).groupBy("__fp__").agg(
        F.count(F.lit(1)).alias("__df__")
    )
    return (
        fps.join(counts, on="__fp__", how="left")
        .groupBy(id_col)
        .agg(
            F.first("__nfp__").cast("bigint").alias("n_fingerprints"),
            F.sum(
                F.when(F.col("__df__") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("n_shared"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(F.col("__df__") >= 2, F.lit(1.0)).otherwise(
                            F.lit(0.0)
                        )
                    )
                    / F.nullif(F.first("__nfp__").cast("double"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


def dup_passage_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    min_shared: int = 1,
    max_doc_freq: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (i.e. candidate pairs sharing passages of >= window+gram_len-1 chars).

    Pairs expand from per-fingerprint sorted posting lists (one shuffle —
    see :func:`feathub_spark.datapipe.dedup._bucket_pairs`); fingerprints
    occurring in more than ``max_doc_freq`` documents are dropped first
    (boilerplate passages — license headers, navigation chrome — would
    otherwise expand quadratically; the cap bounds per-fingerprint fan-out
    exactly like the ngram_jaccard doc-frequency cut).  Pass
    ``max_doc_freq=None`` for exact recall on small corpora.

    Returns (id_a, id_b, n_shared_fingerprints)."""
    fps = _winnow_exploded(
        df, text_col, id_col, gram_len, window, hash_fn
    ).select(F.col(id_col).alias("__id__"), "__fp__")
    # one shuffle builds the sorted posting list per fingerprint; the
    # doc-frequency cut is a free size() filter on it, and pairs expand
    # in-array map-side (a < b once each, by the sorted order)
    postings = fps.groupBy("__fp__").agg(
        F.sort_array(F.collect_list("__id__")).alias("__ids__")
    )
    if max_doc_freq is not None:
        postings = postings.filter(F.size("__ids__") <= max_doc_freq)
    from feathub_spark.datapipe.dedup import _expand_id_pairs

    return (
        _expand_id_pairs(postings)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fingerprints"))
        .filter(F.col("n_shared_fingerprints") >= min_shared)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """CCNet/C4-style line-level boilerplate removal: drop every line whose
    normalized content appears in at least ``min_docs`` DISTINCT documents
    (navigation chrome, license headers, cookie banners), preserving the
    order of the surviving lines.  Blank/whitespace-only lines never count
    as boilerplate and are always kept (paragraph structure survives).

    ``normalize=True`` compares lines case-insensitively after trimming —
    the CCNet paragraph-hash convention; the ORIGINAL line text is what
    survives into the output.

    Plan shape — decide with small rows, move the text once (each input
    ROW is one document; ``id_col`` is assumed unique per document): the
    decision side explodes (doc, pos, md5-key) ONLY — line text never
    enters a shuffle — distinct (key, doc) pairs feed a map-side-
    combinable count per key, surviving keys join back against the
    exploded keys, and ONE per-doc aggregate collects the removed
    POSITIONS (an int array bounded by lines-per-doc).  The rebuild is a
    per-row Catalyst index-aware ``filter`` of the re-split original text
    against that position array, so the only exchange the text itself can
    cross is the final decision join (broadcast when the removed-position
    table is small).  The previous shape regrouped every (pos, removed,
    line-text) struct per document through a corpus-sized shuffle + sort.
    Documents whose every line is boilerplate come back with an empty
    string, not dropped.

    Returns (id_col, clean_text, n_lines, n_removed)."""
    norm = (
        f"md5(trim(lower(__line__)))" if normalize else "md5(__line__)"
    )
    src = ensure_parallelism(df)
    # NULL text would posexplode to zero rows and silently DROP the
    # document; coalesce keeps it as a single empty (always-kept) line
    split_lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    # blank/whitespace-only lines never count as boilerplate and are
    # always kept, so they can be dropped from the decision side entirely
    keyed = (
        src.select(
            F.col(id_col),
            F.posexplode(split_lines).alias("__pos__", "__line__"),
        )
        .filter(F.trim("__line__") != "")
        .select(id_col, "__pos__", F.expr(norm).alias("__k__"))
    )
    boiler_keys = (
        keyed.select("__k__", id_col)
        .distinct()
        .groupBy("__k__")
        .agg(F.count(F.lit(1)).alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
        .select("__k__")
    )
    removed = (
        keyed.join(boiler_keys, on="__k__")
        .groupBy(id_col)
        .agg(F.collect_list("__pos__").alias("__rm__"))
    )
    return (
        src.join(removed, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col(text_col),
            F.coalesce(
                F.col("__rm__"), F.expr("CAST(array() AS array<int>)")
            ).alias("__rm__"),
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.filter(
                    split_lines,
                    lambda l, i: ~F.array_contains(F.col("__rm__"), i),
                ),
                "\n",
            ).alias("clean_text"),
            F.size(split_lines).cast("bigint").alias("n_lines"),
            F.size("__rm__").cast("bigint").alias("n_removed"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    separator: str = "\n\n",
    normalize: bool = True,
) -> DataFrame:
    """INTRA-document repeated-paragraph removal: within each document,
    keep only the FIRST occurrence of every paragraph (scraped pages often
    repeat nav blocks, quoted replies, or template sections inside one
    document — the within-doc complement of the cross-doc
    :func:`remove_boilerplate_lines`).  Surviving paragraphs keep their
    original order and original text; ``normalize=True`` compares
    trimmed + lowercased content (the CCNet convention).  Blank/
    whitespace-only paragraphs are never treated as duplicates — document
    structure survives.

    Plan shape: pure per-row Catalyst — a split + one aggregate() fold
    over the document's own paragraph array, ZERO shuffle, whole-stage
    pipeline-able, scales with executors only.  The seen-set is the
    document's own distinct paragraph keys (array_contains per step:
    O(p^2) per doc on paragraph COUNT, which is small even for huge docs).

    Returns (id_col, clean_text, n_paragraphs, n_removed)."""
    import re

    def _sql_str(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    # split()'s pattern argument is a Java REGEX — quote the separator so
    # '|', '.', '++' etc. split literally; the rejoin uses the raw literal
    pat = _sql_str(re.escape(separator))
    sep = _sql_str(separator)
    key = "md5(trim(lower(s.p)))" if normalize else "md5(s.p)"
    fold = f"""
    aggregate(
      transform(split(coalesce(`{text_col}`, ''), '{pat}', -1),
                p -> struct(p AS p, {key.replace('s.p', 'p')} AS k,
                            trim(p) = '' AS blank)),
      struct(CAST(array() AS ARRAY<STRING>) AS seen,
             CAST(array() AS ARRAY<STRING>) AS kept,
             CAST(0 AS BIGINT) AS removed),
      (a, s) -> IF(s.blank,
                   struct(a.seen AS seen,
                          array_append(a.kept, s.p) AS kept,
                          a.removed AS removed),
                   IF(array_contains(a.seen, s.k),
                      struct(a.seen AS seen, a.kept AS kept,
                             a.removed + CAST(1 AS BIGINT) AS removed),
                      struct(array_append(a.seen, s.k) AS seen,
                             array_append(a.kept, s.p) AS kept,
                             a.removed AS removed))),
      a -> struct(array_join(a.kept, '{sep}') AS clean_text,
                  size(a.kept) + CAST(a.removed AS INT) AS n_paragraphs,
                  a.removed AS n_removed)
    )
    """
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.expr(fold).alias("__d__"),
    ).select(
        id_col,
        F.col("__d__.clean_text").alias("clean_text"),
        F.col("__d__.n_paragraphs").cast("bigint").alias("n_paragraphs"),
        F.col("__d__.n_removed").alias("n_removed"),
    )


def winnow_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Materializable fingerprint index (``fp``, ``doc_id``) for
    incremental dedup: write it out partitioned/bucketed by ``fp`` once,
    then check every NEW ingest shard against it with
    :func:`match_against_index` — no need to re-fingerprint the historical
    corpus per ingest."""
    return _winnow_exploded(
        df, text_col, id_col, gram_len, window, hash_fn
    ).select(F.col("__fp__").alias("fp"), F.col(id_col).alias("doc_id"))


def match_against_index(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 20,
    window: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Incremental duplicate-passage check: per NEW document, the fraction
    of its winnowing fingerprints already present in ``index`` (a
    (fp, doc_id) table from :func:`winnow_index` — typically the
    historical corpus, loaded from a bucketed table so the fp-key join
    needs no index-side shuffle).

    Same guarantee as :func:`dup_passage_stats`: a new doc sharing a
    passage of >= window + gram_len - 1 chars with ANY indexed doc scores
    n_matched >= 1.  Only the new shard is fingerprinted — the historical
    corpus is touched as a semi-joined key set.

    Returns (id_col, n_fingerprints, n_matched, dup_fraction)."""
    fps = _winnow_exploded(
        new_df, text_col, id_col, gram_len, window, hash_fn,
        with_count=True, outer=True,
    ).withColumnRenamed("__fp__", "fp")
    hits = index.select("fp").distinct().withColumn("__hit__", F.lit(True))
    return (
        fps.join(hits, on="fp", how="left")
        .groupBy(id_col)
        .agg(
            F.first("__nfp__").cast("bigint").alias("n_fingerprints"),
            F.sum(F.coalesce(F.col("__hit__").cast("int"), F.lit(0)))
            .cast("bigint").alias("n_matched"),
            F.round(
                F.coalesce(
                    F.sum(F.coalesce(F.col("__hit__").cast("double"), F.lit(0.0)))
                    / F.nullif(F.first("__nfp__").cast("double"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )
