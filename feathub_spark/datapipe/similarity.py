"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.  Dot
  products run as Catalyst higher-order expressions (zip_with + aggregate in
  double precision), top-k via per-query window rank; the (small) query set
  is broadcast so the corpus is scanned once with no shuffle of the corpus
  side.
- lsh_topk: the scale path — sign-random-projection (SimHash for vectors)
  bucketing; only candidates sharing >= 1 of the hyperplane-band buckets are
  scored.  Hyperplane coefficients derive deterministically from
  xxhash64(seed, plane, dim) so executors need no broadcast of plane
  matrices and reruns are reproducible.
- ivf_topk / train_ivf_codebook: inverted-file cells over a
  corpus-size-independent codebook; queries probe nprobe cells.
- pq_codebook / pq_encode / pq_topk: product quantization with asymmetric
  distance computation (Jegou et al. 2011) — the memory-compression path
  (64 floats -> m codes); encode and scoring are map-only broadcast folds
  in integer micro-units.

Every per-query top-k runs the salted two-stage rank (_two_stage_topk), so
no single task ever ranks a whole query's candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.parallelism import ensure_parallelism

def _two_stage_topk(
    scored: DataFrame,
    k: int,
    order_cols,
    group_col: str = "query_id",
    item_col: str = "neighbor_id",
    n_salts: int = 32,
) -> DataFrame:
    """Distributed per-query top-k: a single Window partitioned by query
    would funnel every scored row for a query through ONE task — at corpus
    scale that task is the whole job.  Instead rank within (query, salt)
    first (salt = xxhash64(item) mod n_salts, so the heavy pass runs
    n_salts-way parallel per query), keep each salt's top k — every global
    top-k row necessarily survives its own salt's cut — then rank the
    <= n_salts*k survivors per query for the exact global result.  Result
    rows and ranks are identical to the single-window plan; only the
    physical shape changes."""
    salt = F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_salts))
    w1 = Window.partitionBy(group_col, "__salt__").orderBy(*order_cols)
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        scored.withColumn("__salt__", salt)
        .withColumn("__prank__", F.row_number().over(w1))
        .filter(F.col("__prank__") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .drop("__salt__", "__prank__")
    )


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)}) / ({_NORM.format(v=a)} * {_NORM.format(v=b)})"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = None,
    impl: str = "sql",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row (self-matches excluded when
    ids collide).  Returns (query_id, neighbor_id, rank, cosine).

    ``impl="sql"`` (default) scores with Catalyst higher-order folds —
    the engine-reproducible path every oracle checks.  ``impl="arrow"``
    scores with one numpy GEMM per salt group (see _gemm_scored_topk):
    ~10-100x more throughput on wide corpora, same ranking up to
    float-accumulation-order ulps on near-ties."""
    query_id_col = query_id_col or id_col
    if impl == "arrow":
        return _gemm_scored_topk(
            corpus, queries, vec_col, id_col, k, query_id_col,
            integer=False,
        )
    norm = _NORM.format(v=f"`{vec_col}`")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        F.expr(norm).alias("__qn__"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        F.expr(norm).alias("__cn__"),
    )
    dot = _DOT.format(a="__qv__", b="__cv__")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(F.expr(dot) / (F.col("__qn__") * F.col("__cn__")), 6),
        )
        # zero-norm vectors score NaN (0/0) and Spark DESC ranks NaN
        # FIRST; NULL/ragged vectors score NULL and fill the tail.
        # Exclude both — the arrow twin and the hamming path already do
        # (np.isfinite / hamming IS NOT NULL), and a meaningless
        # rank-1-for-every-query row is never the wanted answer.
        .filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    )
    return _two_stage_topk(
        scored, k, [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "cosine")


def _gemm_scored_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    query_id_col: str,
    integer: bool,
    n_salts: int = 32,
    mode: str = "cosine",
    chunk_cells: int = 8_000_000,
) -> DataFrame:
    """Arrow/numpy GEMM scoring for the brute-force family — the
    vectorized throughput path: the corpus hashes into ``n_salts``
    groups, the (small) query set replicates to every group, and each
    group scores with ONE numpy matrix multiply (queries x batch) inside
    applyInPandas, emitting its local top-k per query; a final window
    over the <= n_salts*k survivors gives the exact global ranks.  Fully
    distributed — queries travel as rows, never through the driver.

    ``integer=True`` (quantized codes) runs the GEMM in int64: exact
    arithmetic, so results are bit-identical to the SQL fold.  Float
    GEMM accumulates pairwise where the SQL fold accumulates
    sequentially — cosines can differ in the last ulp, so float callers
    keep the SQL path for oracle checks and use this one for throughput.
    ``mode="hamming"`` scores bit-packed sign codes with a vectorized
    xor + uint8-LUT popcount (exact integers, ascending order) — also
    value-identical to the SQL fold.
    """
    import numpy as np
    import pandas as pd

    qid_t = queries.schema[query_id_col].dataType
    cid_t = corpus.schema[id_col].dataType
    spark = corpus.sparkSession
    salts = spark.range(n_salts).select(F.col("id").alias("__salt__"))
    qrep = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__v__"),
        )
        .crossJoin(F.broadcast(salts))
        .select(
            "__salt__", F.lit(True).alias("__is_q__"),
            F.col("query_id").cast("string").alias("__qid_s__"),
            F.lit(None).cast(cid_t).alias("neighbor_id"), "__v__",
        )
    )
    c = ensure_parallelism(corpus).select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("__salt__"),
        F.lit(False).alias("__is_q__"),
        F.lit(None).cast("string").alias("__qid_s__"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v__"),
    )
    tagged = qrep.unionByName(c)

    out_schema = T.StructType(
        [
            T.StructField("__qid_s__", T.StringType()),
            T.StructField("neighbor_id", cid_t),
            T.StructField("score", T.DoubleType()),
        ]
    )
    np_t = np.int64 if integer else np.float64
    _POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    descending = mode == "cosine"

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"__qid_s__": [], "neighbor_id": [], "score": []})

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL vectors can never score (the SQL fold's zip_with/aggregate
        # yields NULL for them), and a width-mismatched pair scores NULL
        # the same way — so score queries ONLY against corpus rows of the
        # SAME width, per distinct width (normally exactly one; ragged
        # input would otherwise crash np.stack instead of matching the
        # SQL path's exclude-NULLs behavior).
        pdf = pdf[pdf["__v__"].notna()]
        qm_all = pdf[pdf["__is_q__"]]
        cm_all = pdf[~pdf["__is_q__"]]
        if qm_all.empty or cm_all.empty:
            return _empty()
        widths_q = qm_all["__v__"].map(len)
        widths_c = cm_all["__v__"].map(len)
        outs = [
            _score_width(qm_all[widths_q == w], cm_all[widths_c == w])
            for w in sorted(set(widths_q) & set(widths_c))
        ]
        outs = [o for o in outs if o is not None]
        return pd.concat(outs, ignore_index=True) if outs else _empty()

    def _select(row, cid_arr, cid_s_arr, qid):
        """Top-(k+1) of one query's candidate scores on the composite
        (score, neighbor_id) order — the same order the global window
        uses, so score ties at the boundary keep the LOWEST ids,
        value-identical to the SQL path.  Two stable argsorts instead of
        lexsort: cid may be object-dtyped (string ids).  k+1 candidates
        as defense in depth should the self row survive the
        string-equality drop (exotic id formatting); the global
        self-filter then still leaves k.  The self row is dropped HERE,
        before truncation — it would otherwise always burn a top-k slot
        in its salt group and could evict the true k-th neighbor."""
        ok = np.isfinite(row) & (cid_s_arr != qid)
        idx = np.nonzero(ok)[0]
        if not len(idx):
            return None
        take = min(k + 1, len(idx))
        key = -row[idx] if descending else row[idx]
        if take < len(idx):
            by_id = np.argsort(cid_arr[idx], kind="stable")
            order = by_id[np.argsort(key[by_id], kind="stable")][:take]
        else:
            order = np.arange(len(idx))
        part = idx[order]
        return cid_arr[part], cid_s_arr[part], row[part]

    def _score_width(qm: pd.DataFrame, cm: pd.DataFrame):
        if qm.empty or cm.empty:
            return None
        Q = np.stack(qm["__v__"].to_numpy()).astype(np_t)
        C = np.stack(cm["__v__"].to_numpy()).astype(np_t)
        cid = cm["neighbor_id"].to_numpy()
        # string view of corpus ids for the self-row drop in _select
        cid_s = np.array([str(x) for x in cid], dtype=object)
        qids = qm["__qid_s__"].to_numpy()
        nq, words = Q.shape
        # Chunk the CORPUS axis so the score tensor stays bounded no
        # matter how large the salt group grows (the full nq x nc buffer
        # — and hamming's additional nq x nc x words xor tensor — scaled
        # with the corpus and could OOM a worker; same failure class as
        # the bounded pair-expansion buffers).  ~8M score cells per
        # chunk ≈ 64 MB; per-pair values are computed identically, and
        # top-(k+1)-of-chunk-top-(k+1)s equals the global top-(k+1)
        # under the same total (score, id) order, so results are
        # unchanged.
        if mode == "hamming":
            chunk = max(1, chunk_cells // max(1, nq * max(1, words)))
        else:
            chunk = max(1, chunk_cells // max(1, nq))
        if mode != "hamming":
            qn = np.sqrt((Q.astype(np.float64) ** 2).sum(axis=1))
        acc = [[] for _ in range(nq)]
        for s in range(0, len(C), chunk):
            Cc = C[s : s + chunk]
            if mode == "hamming":
                # xor the words, popcount byte-wise via a 256-entry LUT —
                # exact integers, identical to SQL bit_count
                x = np.bitwise_xor(Q[:, None, :], Cc[None, :, :])
                scores = _POP8[
                    x.view(np.uint8).reshape(len(Q), len(Cc), -1)
                ].sum(axis=-1, dtype=np.int64).astype(np.float64)
            else:
                cn = np.sqrt((Cc.astype(np.float64) ** 2).sum(axis=1))
                dots = (Q @ Cc.T).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    scores = dots / (qn[:, None] * cn[None, :])
            ccid = cid[s : s + chunk]
            ccid_s = cid_s[s : s + chunk]
            for i in range(nq):
                row = scores[i]
                if mode == "cosine":
                    # round BEFORE selection so the local cut and the
                    # global 6-dp window rank on the same key (unrounded
                    # selection can keep a different member of a rounded
                    # tie class)
                    row = np.round(row, 6)
                sel = _select(row, ccid, ccid_s, qids[i])
                if sel is not None:
                    acc[i].append(sel)
        frames = []
        for i in range(nq):
            if not acc[i]:
                continue
            if len(acc[i]) == 1:
                sc, ss, sr = acc[i][0]
            else:
                # merge the per-chunk winners with the SAME selection —
                # bounded input (n_chunks x (k+1) rows per query)
                mc = np.concatenate([a[0] for a in acc[i]])
                ms = np.concatenate([a[1] for a in acc[i]])
                mr = np.concatenate([a[2] for a in acc[i]])
                sc, ss, sr = _select(mr, mc, ms, qids[i])
            frames.append(
                pd.DataFrame(
                    {
                        "__qid_s__": qids[i],
                        "neighbor_id": sc,
                        "score": sr,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else None

    local = tagged.groupBy("__salt__").applyInPandas(
        score_group, schema=out_schema
    )
    score_name = "cosine" if mode == "cosine" else "hamming"
    score_col = (
        F.col("score") if mode == "cosine"
        else F.col("score").cast("bigint")
    )
    survivors = local.select(
        F.col("__qid_s__").cast(qid_t).alias("query_id"),
        "neighbor_id",
        score_col.alias(score_name),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    order = (
        F.col(score_name).desc() if descending else F.col(score_name).asc()
    )
    w = Window.partitionBy("query_id").orderBy(
        order, F.col("neighbor_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", score_name)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: ``scale =
    max(abs(v))/127``, ``q[i] = round(v[i]/scale)`` as TINYINT — 4x less
    memory/shuffle than float32 for ANN at scale, and because cosine is
    invariant to positive per-vector scaling, quantized cosine needs NO
    dequantization (see :func:`quantized_topk`).  All-zero vectors get
    scale 0 and an all-zero code.  Pure per-row Catalyst (two folds),
    zero shuffle; every other column rides through."""
    v = f"`{vec_col}`"
    mx = (
        f"aggregate({v}, CAST(0 AS DOUBLE), "
        f"(a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"
    )
    return ensure_parallelism(df).withColumn(
        scale_col, F.expr(f"{mx} / 127.0")
    ).withColumn(
        out_col,
        F.expr(
            f"IF(`{scale_col}` = 0, "
            f"transform({v}, x -> CAST(0 AS TINYINT)), "
            f"transform({v}, x -> CAST(round(CAST(x AS DOUBLE) / "
            f"`{scale_col}`) AS TINYINT)))"
        ),
    )


def quantized_topk(
    corpus_q: DataFrame,
    queries_q: DataFrame,
    qvec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = None,
    impl: str = "arrow",
) -> DataFrame:
    """Top-k cosine over int8-quantized vectors (from
    :func:`quantize_embeddings`): the dot product and norms run in exact
    64-bit INTEGER arithmetic (<= 127*127*dim per dot — no float
    accumulation order effects at all), and since cosine is scale-
    invariant the per-vector quantization scales cancel — scoring never
    touches a float vector.  Zero vectors score NULL cosine and are
    dropped.  Same plan shape as brute_force_topk: broadcast query set,
    single corpus scan, salted two-stage rank.

    The default ``impl="arrow"`` runs the int64 GEMM path
    (_gemm_scored_topk): integer matrix products are EXACT, so unlike
    the float case the results are value-identical to the Catalyst fold
    (``impl="sql"``, the form the oracles re-derive) — and the fold
    evaluates its zip_with/aggregate lambdas interpreted, measured 174 s
    vs the GEMM's 3 s at 20 queries x 200k x 64-dim corpus, so at scale
    the default is the only sane choice.  Both impls are driver-gated
    (quantized_ann pins sql, quantized_ann_arrow pins arrow) and
    randomized-pinned against a numpy model incl. tie/self edge cases.

    Returns (query_id, neighbor_id, rank, cosine)."""
    query_id_col = query_id_col or id_col
    if impl == "arrow":
        return _gemm_scored_topk(
            corpus_q, queries_q, qvec_col, id_col, k, query_id_col,
            integer=True,
        )
    idot = (
        "aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    q = queries_q.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qvec_col).alias("__qv__"),
        F.expr(idot.format(a=f"`{qvec_col}`", b=f"`{qvec_col}`")).alias(
            "__qn2__"
        ),
    )
    c = ensure_parallelism(corpus_q).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(qvec_col).alias("__cv__"),
        F.expr(idot.format(a=f"`{qvec_col}`", b=f"`{qvec_col}`")).alias(
            "__cn2__"
        ),
    )
    dot = idot.format(a="__qv__", b="__cv__")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter((F.col("__qn2__") > 0) & (F.col("__cn2__") > 0))
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot)
                / (F.sqrt(F.col("__qn2__")) * F.sqrt(F.col("__cn2__"))),
                6,
            ),
        )
    )
    return _two_stage_topk(
        scored, k, [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "cosine")


def binarize_embeddings(
    df: DataFrame,
    vec_col: str,
    out_col: str = "bvec",
) -> DataFrame:
    """1-bit sign binarization: pack ``sign(v[i]) > 0`` into
    ``ceil(dim/63)`` BIGINT words, 63 dimensions per word (bits 0..62 —
    the sign bit stays clear so the codes stay portable across engines
    whose left-shift overflows at bit 63) — ~32x less memory/shuffle than
    float32.  Hamming distance over the words approximates angular
    distance (the SimHash identity: ``P[bit differs] = angle/pi`` for
    random hyperplanes; for raw sign bits it's the standard
    binary-embedding retrieval scheme).  Pure per-row Catalyst, zero
    shuffle."""
    v = f"`{vec_col}`"
    nwords = f"CAST(ceil(size({v}) / 63.0) AS INT)"
    # empty-vector guard: sequence(0, -1) DESCENDS to [0, -1] in Spark
    # (default step -1 when start > stop), and the w = -1 word would
    # evaluate element_at(v, 0) — an error — so short-circuit to an
    # empty code instead
    pack = f"""
    CASE WHEN size({v}) <= 0 THEN CAST(array() AS ARRAY<BIGINT>) ELSE
    transform(sequence(0, {nwords} - 1), w ->
      aggregate(sequence(0, 62), CAST(0 AS BIGINT),
        (acc, j) -> IF(w * 63 + j < size({v})
                       AND CAST(element_at({v}, w * 63 + j + 1) AS DOUBLE) > 0,
                       acc + shiftleft(CAST(1 AS BIGINT), j), acc))) END
    """
    return ensure_parallelism(df).withColumn(out_col, F.expr(pack))


def hamming_topk(
    corpus_b: DataFrame,
    queries_b: DataFrame,
    bvec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = None,
    impl: str = "arrow",
) -> DataFrame:
    """Top-k nearest by Hamming distance over bit-packed sign codes (from
    :func:`binarize_embeddings`): ``sum_w bit_count(q[w] XOR c[w])`` —
    pure 64-bit integer ops, bit-identical in any engine, so the default
    ``impl="arrow"`` (vectorized xor + LUT popcount) and ``impl="sql"``
    (the Catalyst fold the oracles re-derive) return identical values;
    the gated queries pin one impl each.  Ties break on neighbor id.
    Same plan shape as brute_force_topk: broadcast query
    set, single corpus scan, salted two-stage rank.

    ``impl="arrow"`` scores with vectorized xor + LUT popcount
    (_gemm_scored_topk mode="hamming") — exact integers, value-identical
    to the SQL fold, pick by throughput.

    Returns (query_id, neighbor_id, rank, hamming)."""
    query_id_col = query_id_col or id_col
    if impl == "arrow":
        return _gemm_scored_topk(
            corpus_b, queries_b, bvec_col, id_col, k, query_id_col,
            integer=True, mode="hamming",
        )
    q = queries_b.select(
        F.col(query_id_col).alias("query_id"),
        F.col(bvec_col).alias("__qb__"),
    )
    c = ensure_parallelism(corpus_b).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bvec_col).alias("__cb__"),
    )
    ham = (
        "aggregate(zip_with(__qb__, __cb__, (x, y) -> bit_count(x ^ y)), "
        "0, (acc, v) -> acc + v)"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("hamming", F.expr(ham).cast("bigint"))
        # NULL hamming (NULL or width-mismatched bvec: zip_with pads with
        # null -> aggregate yields NULL) must be EXCLUDED — ascending sort
        # is NULLS FIRST, which would rank such rows #1 for every query
        .filter(F.col("hamming").isNotNull())
    )
    return _two_stage_topk(
        scored, k, [F.col("hamming").asc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "hamming")


def binary_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    expand: int = 10,
    query_id_col: str = None,
) -> DataFrame:
    """The production binary-prefilter pattern: Hamming top-(k*expand)
    over 1-bit sign codes selects candidates (the cheap 32x-compressed
    pass touches every corpus row but only 64-bit words), then ONLY the
    candidates' float vectors are fetched for an exact cosine rerank —
    the expensive arithmetic runs on k*expand rows per query instead of
    the corpus.  Raw sign bits are a coarse filter (recall rises with
    ``expand``; use :func:`lsh_topk` for tunable hyperplane codes).

    Returns (query_id, neighbor_id, rank, cosine)."""
    query_id_col = query_id_col or id_col
    cb = binarize_embeddings(corpus, vec_col)
    qb = binarize_embeddings(queries, vec_col).withColumnRenamed(
        vec_col, "__qfv__"
    )
    cands = hamming_topk(
        cb, qb, "bvec", id_col, k=k * expand, query_id_col=query_id_col
    )
    norm = _NORM.format(v=f"`{vec_col}`")
    withq = cands.join(
        F.broadcast(
            qb.select(
                F.col(query_id_col).alias("query_id"),
                F.col("__qfv__"),
                F.expr(_NORM.format(v="__qfv__")).alias("__qn__"),
            )
        ),
        on="query_id",
    )
    withc = withq.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cfv__"),
            F.expr(norm).alias("__cn__"),
        ),
        on="neighbor_id",
    )
    dot = _DOT.format(a="__qfv__", b="__cfv__")
    scored = withc.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(dot) / (F.col("__qn__") * F.col("__cn__")), 6
        ).alias("cosine"),
    ).filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    # ^ zero-norm guard, same as brute_force_topk (NaN ranks first DESC)
    return _two_stage_topk(
        scored, k, [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "cosine")


def _nearest_cells_arrow(
    df: DataFrame,
    ident_col: str,
    vec_col: str,
    cents: DataFrame,
    top_n: int,
    out_id: str,
) -> DataFrame:
    """Arrow twin of the crossJoin+round+window centroid assignment —
    value-identical ordering decisions, ~10x the throughput (the Catalyst
    fold evaluates n_centroids x dims interpreted lambdas per row; at
    256 x 64 that alone was 64 s for a 200k-row corpus).

    Bit-identity with the SQL form comes from replicating its exact
    float semantics: dots and norms accumulate SEQUENTIALLY over the
    dimension index (a python loop of vectorized adds executes the same
    IEEE op sequence per pair as the aggregate fold), cosine = dot /
    (norm_q * norm_c) in that literal shape, rounded to 6 dp before
    ranking.  Rank order replicates Spark's DESC semantics exactly:
    NaN cosines (zero-norm vectors) rank FIRST, NULL cosines (NULL or
    width-mismatched vectors — every centroid scores NULL, so such rows
    take the smallest cid) rank LAST, ties break by cid ascending.
    Known divergence: a vector CONTAINING a null element scores NULL in
    SQL but NaN here (Arrow conflates them); don't feed those.

    The codebook is collapsed via collect() — bounded by construction
    (n_centroids rows, corpus-size-independent), the same broadcast
    shape as the SQL form.  Returns (out_id, __<out_id>_v__, cell)."""
    import numpy as np
    import pandas as pd

    rows = cents.select("__cid__", "__cvec__").collect()
    if not rows or any(r["__cvec__"] is None for r in rows) or len(
        {len(r["__cvec__"]) for r in rows}
    ) != 1:
        raise FeathubError(
            "arrow assignment needs a non-empty, equal-width codebook"
        )
    cid_vals = [r["__cid__"] for r in rows]
    if any(v is None for v in cid_vals):
        raise FeathubError("arrow assignment needs non-null centroid ids")
    # ids keep their natural type: int64 when integral (the common case),
    # object otherwise (string/decimal ids crashed the old int() load).
    # Python str comparison orders by code point, which equals Spark's
    # UTF-8 byte order for valid Unicode — tie-breaks stay value-identical.
    try:
        cids = np.array([int(v) for v in cid_vals], dtype=np.int64)
        if not all(int(v) == v for v in cid_vals):  # e.g. float ids
            raise ValueError
    except (TypeError, ValueError):
        cids = np.array(cid_vals, dtype=object)
    C = np.stack(
        [np.asarray(r["__cvec__"], dtype=np.float64) for r in rows]
    )
    # pre-sort centroids ascending by cid: every selection below then takes
    # the FIRST hit (argmax / stable-sort prefix) as the smallest cid,
    # replacing the int64-only sentinel-min trick
    order0 = np.argsort(cids, kind="stable")
    cids, C = cids[order0], C[order0]
    m, d = C.shape
    nc = np.zeros(m)
    for dd in range(d):           # sequential, like the SQL norm fold
        nc = nc + C[:, dd] * C[:, dd]
    nc = np.sqrt(nc)
    vec_out = f"__{out_id}_v__"
    src = df.select(
        F.col(ident_col).alias(out_id), F.col(vec_col).alias(vec_out)
    )
    out_schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("cell", cents.schema["__cid__"].dataType)]
    )

    probe_default = cids[: min(top_n, m)]

    def assign_batches(batches):
        for pdf in batches:
            vs = pdf[vec_out]
            ok = vs.map(lambda v: v is not None and len(v) == d)
            outs = []
            bad = pdf[~ok]
            if len(bad):
                # all cosines NULL: row_number orders by cid asc alone,
                # so such rows take the top_n smallest cids
                rep = bad.loc[
                    bad.index.repeat(len(probe_default))
                ].reset_index(drop=True)
                rep["cell"] = list(probe_default) * len(bad)
                outs.append(rep)
            good = pdf[ok]
            if len(good):
                V = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in good[vec_out]]
                )
                dots = np.zeros((len(V), m))
                nv = np.zeros(len(V))
                for dd in range(d):   # sequential-order accumulation
                    dots = dots + V[:, dd : dd + 1] * C[None, :, dd]
                    nv = nv + V[:, dd] * V[:, dd]
                nv = np.sqrt(nv)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.round(dots / (nv[:, None] * nc[None, :]), 6)
                # Spark DESC order: NaN > +Inf > finite > -Inf (no NULLs
                # here — width/None rows were split off above)
                isnan = np.isnan(cos)
                if top_n == 1:
                    kv = np.where(isnan, np.inf, cos)
                    kmax = kv.max(axis=1, keepdims=True)
                    hit = kv == kmax
                    # NaN tier outranks a genuine +Inf value
                    if isnan.any():
                        rows_nan = isnan.any(axis=1)
                        hit[rows_nan] = isnan[rows_nan]
                    # centroids are cid-sorted: first hit = smallest cid.
                    # A no-hit row is unreachable today (kv is NaN-free so
                    # kv==kmax always fires; NaN rows get the isnan mask),
                    # but argmax on all-False would silently yield index 0
                    # — keep the old impossible-cell semantics by DROPPING
                    # such rows instead.
                    any_hit = hit.any(axis=1)
                    g = good[any_hit].copy() if not any_hit.all() else good.copy()
                    g["cell"] = cids[hit[any_hit].argmax(axis=1)]
                    outs.append(g)
                else:
                    recs = []
                    for i in range(len(V)):
                        tier = np.where(isnan[i], 2.0, 1.0)
                        kv = np.where(isnan[i], 0.0, cos[i])
                        # stable sort + cid-sorted input: score ties keep
                        # ascending-cid order without cids as a sort key
                        order = np.lexsort((-kv, -tier))[:top_n]
                        for c in cids[order]:
                            recs.append((good.iloc[i], c))
                    if recs:
                        g = pd.DataFrame(
                            [r[0] for r in recs]
                        ).reset_index(drop=True)
                        g["cell"] = [r[1] for r in recs]
                        outs.append(g)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return src.mapInPandas(assign_batches, schema=out_schema)


def ivf_codebook(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Deterministic hash-rank-sampled codebook: the ``n_centroids`` corpus
    rows with the smallest (hash32(id, seed), id) rank.

    The absolute size is the 100 TB property: the codebook is
    corpus-size-INDEPENDENT (always exactly min(n_centroids, |corpus|)
    rows), so broadcasting it never grows with the data — unlike a stride
    scheme where C = n/stride scales linearly and eventually OOMs every
    executor.  orderBy+limit compiles to TakeOrderedAndProject (parallel
    per-partition top-k, no full sort), and the md5-based hash32 makes the
    selection reproducible in any SQL engine for oracle checks.

    Returns (__cid__, __cvec__)."""
    from feathub_spark.datapipe.sampling import hash32

    return (
        corpus.select(
            F.col(id_col).alias("__cid__"),
            F.col(vec_col).alias("__cvec__"),
            hash32(id_col, seed).alias("__h__"),
        )
        .orderBy(F.col("__h__").asc(), F.col("__cid__").asc())
        .limit(n_centroids)
        .drop("__h__")
    )


def train_ivf_codebook(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 256,
    iterations: int = 2,
    seed: int = 0,
    impl: str = "arrow",
) -> DataFrame:
    """Lloyd-iteration (k-means) refinement of the hash-rank codebook,
    expressed entirely as DataFrame ops — fully deterministic, hence
    oracle-reproducible, unlike library k-means with sampled init.

    Per iteration: (1) assign every corpus row to its nearest centroid by
    cosine (one broadcast pass — the codebook is corpus-size-independent);
    (2) recompute each centroid as the component-wise mean of its members
    (posexplode -> per-(cell, dim) partial means -> rebuild the array
    ordered by dim).  For cosine scoring the un-normalized mean is
    equivalent to the spherical-k-means centroid (same direction).  Cells
    that attract no members disappear (the codebook may shrink); centroid
    ids stay the seed row's id for stable cell labels.

    At 100 TB each iteration costs one broadcast assignment pass plus a
    groupBy over (n_centroids x dims) cells — both corpus-shuffle-free
    beyond the map-side partial aggregation.

    Returns (__cid__, __cvec__), drop-in for :func:`ivf_topk`'s
    ``codebook``."""
    cents = ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    base = ensure_parallelism(corpus).select(
        F.col(id_col).alias("__mid__"), F.col(vec_col).alias("__mv__")
    )
    for _ in range(iterations):
        if impl == "arrow":
            assigned = _nearest_cells_arrow(
                base, "__mid__", "__mv__", cents, 1, "mid"
            ).select(
                F.col("mid").alias("__mid__"),
                F.col("__mid_v__").alias("__mv__"),
                F.col("cell").alias("__cid__"),
            )
        else:
            # norms hoisted out of the pair cosine (identical division
            # tree, bit-identical scores — see ivf_topk): the row norm is
            # computed once per corpus row, the centroid norm once per
            # centroid per round, instead of once per (row, centroid)
            scored = (
                base.withColumn("__mn__", F.expr(_NORM.format(v="__mv__")))
                .crossJoin(F.broadcast(
                    cents.withColumn("__cn__", F.expr(_NORM.format(v="__cvec__")))
                ))
                .withColumn(
                    "__acos__",
                    F.round(
                        F.expr(_DOT.format(a="__mv__", b="__cvec__"))
                        / (F.col("__mn__") * F.col("__cn__")),
                        6,
                    ),
                )
            )
            w = Window.partitionBy("__mid__").orderBy(
                F.col("__acos__").desc(), F.col("__cid__").asc()
            )
            assigned = (
                scored.withColumn("__arank__", F.row_number().over(w))
                .filter(F.col("__arank__") == 1)
                .select("__mid__", "__mv__", "__cid__")
            )
        cents = (
            assigned.select(
                "__cid__", F.posexplode("__mv__").alias("__dim__", "__x__")
            )
            .groupBy("__cid__", "__dim__")
            # 9-dp rounding absorbs float-summation order differences so the
            # trained codebook is bit-reproducible across engines (oracle)
            .agg(F.round(F.avg(F.col("__x__").cast("double")), 9).alias("__mean__"))
            .groupBy("__cid__")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(__dim__, __mean__))), "
                    "s -> s.__mean__)"
                ).alias("__cvec__")
            )
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 256,
    nprobe: int = 4,
    seed: int = 0,
    query_id_col: str = None,
    codebook: DataFrame = None,
    impl: str = "arrow",
) -> DataFrame:
    """IVF-style ANN: a deterministic hash-rank-sampled codebook of exactly
    ``n_centroids`` rows (see :func:`ivf_codebook`) partitions the corpus
    into cells by nearest centroid; each query probes its ``nprobe``
    nearest cells and scores only those members.

    ``impl`` selects the ASSIGNMENT pass only (candidate scoring is the
    Catalyst fold either way): the default "arrow" runs the bit-identical
    sequential-accumulation numpy twin (_nearest_cells_arrow — the SQL
    form's 256 x dims interpreted lambdas per corpus row measured 64 s at
    200k rows, the twin ~6 s); "sql" keeps the pure-Catalyst crossJoin +
    window form the oracles re-derive.

    This is the inverted-file index re-expressed relationally: the "index
    build" is one broadcast-join assignment pass (corpus x n_centroids —
    the broadcast side is corpus-size-independent by construction), the
    "search" is a cell-equi-join — so the 100 TB cost is O(n·n_centroids)
    narrow work plus one shuffle on cell id instead of a corpus-wide scan
    per query.  Fully deterministic (no sampled k-means seed), hence
    oracle-reproducible.  Pass ``codebook`` — e.g. from
    :func:`train_ivf_codebook` — to swap in trained centroids without
    touching the plan.

    Returns (query_id, neighbor_id, rank, cosine)."""
    query_id_col = query_id_col or id_col
    from feathub_spark.common.caching import register_cache

    # the codebook plan is consumed TWICE (member + probe assignment) —
    # uncached, the corpus-wide TakeOrdered behind ivf_codebook (or a
    # trained codebook's whole Lloyd loop) executed once per side.
    # n_centroids rows, corpus-size-independent; caller releases via
    # release_caches().
    cents = register_cache(
        codebook
        if codebook is not None
        else ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    )

    def assign(df: DataFrame, ident: str, out_id: str, top_n: int) -> DataFrame:
        if impl == "arrow":
            out = _nearest_cells_arrow(df, ident, vec_col, cents, top_n, out_id)
            return out.withColumn(
                f"__{out_id}_n__",
                F.expr(_NORM.format(v=f"__{out_id}_v__")),
            )
        # row and centroid norms hoisted OUT of the pair cosine: the
        # interpreted O(d) norm fold otherwise re-runs once per
        # (row, centroid) pair — n_centroids copies of identical work.
        # The division tree is unchanged (dot / (vn * cn)), so scores are
        # bit-identical to the inlined cosine_expr form the oracles use.
        scored = (
            df.select(
                F.col(ident).alias(out_id),
                F.col(vec_col).alias(f"__{out_id}_v__"),
                F.expr(_NORM.format(v=f"`{vec_col}`")).alias(f"__{out_id}_n__"),
            )
            .crossJoin(F.broadcast(
                cents.withColumn("__cn__", F.expr(_NORM.format(v="__cvec__")))
            ))
            .withColumn(
                "__acos__",
                F.round(
                    F.expr(_DOT.format(a=f"__{out_id}_v__", b="__cvec__"))
                    / (F.col(f"__{out_id}_n__") * F.col("__cn__")),
                    6,
                ),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("__acos__").desc(), F.col("__cid__").asc()
        )
        return (
            scored.withColumn("__arank__", F.row_number().over(w))
            .filter(F.col("__arank__") <= top_n)
            .select(
                out_id, f"__{out_id}_v__", f"__{out_id}_n__",
                F.col("__cid__").alias("cell"),
            )
        )

    members = assign(ensure_parallelism(corpus), id_col, "neighbor_id", 1)
    probes = assign(queries, query_id_col, "query_id", nprobe)
    cand = members.join(F.broadcast(probes), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # norms carried through the assignment — the candidate cosine pays
    # only the O(d) dot fold per pair
    scored = cand.withColumn(
        "cosine",
        F.round(
            F.expr(_DOT.format(a="__query_id_v__", b="__neighbor_id_v__"))
            / (F.col("__query_id_n__") * F.col("__neighbor_id_n__")),
            6,
        ),
    ).filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    # ^ same zero-norm guard as brute_force_topk: NaN (0/0) would rank
    # FIRST under DESC and evict true neighbors
    return _two_stage_topk(
        scored, k, [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "cosine")


def _srp_signature(
    vec_col: str, planes: int, dims, seed: int, weight_fn: str = "xxhash64"
) -> str:
    """Sign-random-projection signature: bit p = sign(sum_d w[p,d]*v[d]) with
    w[p,d] = xxhash64(seed, p, d) scaled to [-1,1] deterministically.

    ``dims=None`` derives the dimension range from the vector's own size
    (per-row), so callers need not know the embedding width up front.

    ``weight_fn="lcg"`` swaps xxhash64 for a plain 31-bit linear
    congruential generator seeded by (p, d) — worse dispersion than
    xxhash64, but exactly reproducible in any ANSI SQL engine (no int64
    overflow anywhere), which makes the whole bucketing pipeline
    oracle-checkable."""
    scale = float(1 << 62)
    # clamp BOTH zip_with sides to min(dims, width): zip_with pads the
    # shorter array with NULL, which (a) for vectors WIDER than dims gave
    # every trailing dimension one identical xxhash64(seed, p, NULL)
    # weight per plane — a correlated term that silently collapsed bucket
    # recall — and (b) for NARROWER vectors made the whole projection
    # NULL (acc + NULL), hashing every short vector into one all-zero
    # signature.  The clamped form projects onto the first
    # min(dims, width) dimensions — plain SRP on a prefix subspace.
    if dims is None:
        vec_expr = f"`{vec_col}`"
        dim_seq = f"sequence(0, size(`{vec_col}`) - 1)"
    else:
        vec_expr = f"slice(`{vec_col}`, 1, least({dims}, size(`{vec_col}`)))"
        dim_seq = f"sequence(0, least({dims - 1}, size(`{vec_col}`) - 1))"
    if weight_fn == "xxhash64":
        weight = f"(CAST(xxhash64({seed}, {{p}}, d) AS DOUBLE) / {scale})"
    elif weight_fn == "lcg":
        # 4096L forces bigint arithmetic — int32 lambda vars would wrap
        weight = (
            f"(CAST((1103515245L * ({{p}} * 4096L + d + {seed}) + 12345L) "
            f"% 2147483648L AS DOUBLE) / 1073741824.0 - 1.0)"
        )
    else:
        raise ValueError(f"unknown srp weight_fn: {weight_fn!r}")
    proj = (
        f"aggregate(zip_with({vec_expr}, {dim_seq}, "
        f"(x, d) -> CAST(x AS DOUBLE) * "
        f"{weight}), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    bits = (
        f"transform(sequence(0, {planes - 1}), "
        f"p -> CASE WHEN ({proj.replace('{p}', 'p')}) > 0 THEN 1 ELSE 0 END)"
    )
    return bits


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    planes: int = 16,
    bands: int = 4,
    dims: int = 64,
    seed: int = 7,
    query_id_col: str = None,
    weight_fn: str = "xxhash64",
    query_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: only candidates sharing an LSH band bucket with the
    query are scored.  Recall < 1.0 by design; at 100 TB this replaces the
    corpus-wide scan with a bucket-local join.

    ``query_probes`` > 0 enables MULTI-PROBE LSH (Lv et al. 2007): each
    query band additionally probes the buckets at Hamming distance 1 in
    its first ``query_probes`` bit positions, trading a per-QUERY
    constant-factor fan-out (bands * (1 + query_probes) probe rows —
    the corpus side is untouched, so index size and corpus shuffle don't
    change) for strictly-higher recall; with fewer hash tables this is
    how production LSH hits a recall target without replicating the
    corpus index."""
    query_id_col = query_id_col or id_col
    width = planes // bands
    query_probes = min(int(query_probes), width)

    def with_buckets(
        df: DataFrame, ident: str, out_id: str, probes: int = 0
    ) -> DataFrame:
        sig = _srp_signature(vec_col, planes, dims, seed, weight_fn)
        # the row norm is hoisted here (once per input row) rather than
        # recomputed inside the per-candidate cosine — same division tree,
        # bit-identical scores (see ivf_topk)
        base = df.select(
            F.col(ident).alias(out_id),
            F.col(vec_col).alias(f"__{out_id}_v__"),
            F.expr(_NORM.format(v=f"`{vec_col}`")).alias(f"__{out_id}_n__"),
            F.expr(sig).alias("__bits__"),
        ).select(
            out_id,
            f"__{out_id}_v__",
            f"__{out_id}_n__",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), "
                    f"b -> struct(b AS band, "
                    f"array_join(slice(__bits__, b * {width} + 1, {width}), '') AS bucket))"
                )
            ).alias("bb"),
        ).select(out_id, f"__{out_id}_v__", f"__{out_id}_n__", "bb.band", "bb.bucket")
        if probes <= 0:
            return base
        # f = 0 keeps the home bucket; f = 1..probes flips bit f
        flip = (
            "CASE WHEN f = 0 THEN bucket ELSE concat("
            "substr(bucket, 1, f - 1), "
            "CASE WHEN substr(bucket, f, 1) = '0' THEN '1' ELSE '0' END, "
            "substr(bucket, f + 1)) END"
        )
        return (
            base.select(
                out_id, f"__{out_id}_v__", f"__{out_id}_n__", "band", "bucket",
                F.explode(F.expr(f"sequence(0, {probes})")).alias("f"),
            )
            .select(
                out_id, f"__{out_id}_v__", f"__{out_id}_n__", "band",
                F.expr(flip).alias("bucket"),
            )
        )

    qb = with_buckets(queries, query_id_col, "query_id", query_probes)
    cb = with_buckets(ensure_parallelism(corpus), id_col, "neighbor_id")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            F.expr(_DOT.format(a="__query_id_v__", b="__neighbor_id_v__"))
            / (F.col("__query_id_n__") * F.col("__neighbor_id_n__")),
            6,
        ),
    ).filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    # ^ zero-norm guard, same as brute_force_topk (NaN ranks first DESC)
    return _two_stage_topk(
        scored, k, [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "cosine")


def cluster_balanced_sample(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    per_cell: int = 10,
    n_centroids: int = 256,
    seed: int = 0,
    sample_seed: int = 0,
    codebook: DataFrame = None,
    impl: str = "arrow",
) -> DataFrame:
    """Diversity-preserving corpus sampling: assign every row to its
    nearest codebook cell (cosine; the corpus-size-independent hash-rank
    codebook of :func:`ivf_codebook`, or a Lloyd-trained one via
    ``codebook``), then keep min(``per_cell``, |cell|) rows per cell by
    deterministic md5-hash rank — the standard cluster-balanced sampling
    for pre-training corpora (uniform sampling over-represents the dense
    clusters; per-cell caps flatten them).

    Scale: one broadcast assignment pass (the codebook never grows with
    the corpus), one shuffle on the cell id for the per-cell rank window —
    cells are bounded only by data skew, which the per-cell cap then
    discards anyway.  Fully deterministic: membership depends only on
    (vector, codebook) and (id, sample_seed).

    Returns (id_col, cell, cell_rank) for the kept rows."""
    from feathub_spark.datapipe.sampling import hash32

    cents = (
        codebook
        if codebook is not None
        else ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    )
    if impl == "arrow":
        members = _nearest_cells_arrow(
            corpus, id_col, vec_col, cents, 1, "mid"
        ).select(F.col("mid").alias(id_col), "cell")
    else:
        # norms hoisted out of the pair cosine (bit-identical scores —
        # see ivf_topk): once per row / per centroid, not per pair
        scored = (
            ensure_parallelism(corpus)
            .select(
                F.col(id_col),
                F.col(vec_col).alias("__v__"),
                F.expr(_NORM.format(v=f"`{vec_col}`")).alias("__vn__"),
            )
            .crossJoin(F.broadcast(
                cents.withColumn("__cn__", F.expr(_NORM.format(v="__cvec__")))
            ))
            .withColumn(
                "__acos__",
                F.round(
                    F.expr(_DOT.format(a="__v__", b="__cvec__"))
                    / (F.col("__vn__") * F.col("__cn__")),
                    6,
                ),
            )
        )
        w_assign = Window.partitionBy(id_col).orderBy(
            F.col("__acos__").desc(), F.col("__cid__").asc()
        )
        members = (
            scored.withColumn("__arank__", F.row_number().over(w_assign))
            .filter(F.col("__arank__") == 1)
            .select(id_col, F.col("__cid__").alias("cell"))
        )
    w_cell = Window.partitionBy("cell").orderBy(
        hash32(id_col, sample_seed).asc(), F.col(id_col).asc()
    )
    return (
        members.withColumn(
            "cell_rank", F.row_number().over(w_cell).cast("bigint")
        )
        .filter(F.col("cell_rank") <= per_cell)
        .select(id_col, "cell", "cell_rank")
    )


def pq_codebook(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Product-quantization codebooks: the vector space is split into ``m``
    equal-width subspaces and each gets ``n_codes`` centroids — the slices
    of the deterministic hash-rank sample (:func:`ivf_codebook`'s
    corpus-size-independent selection, so the broadcast never grows with
    the data).  Codes are compact 0..n_codes-1 in (hash, id) sample order;
    subvector components are cast to double up front so all downstream
    distance arithmetic is engine-stable.

    Returns (sub, code, subvec) — m * n_codes tiny rows."""
    from feathub_spark.datapipe.sampling import hash32

    cents = ivf_codebook(corpus, vec_col, id_col, n_codes, seed)
    # compact code ids by the same (hash, id) rank that selected the sample;
    # single-task window over <= n_codes rows — bounded by construction
    w = Window.orderBy(hash32("__cid__", seed).asc(), F.col("__cid__").asc())
    coded = cents.withColumn("code", (F.row_number().over(w) - 1).cast("int"))
    sub = (
        f"transform(sequence(0, {m - 1}), j -> named_struct("
        f"'sub', CAST(j AS INT), "
        f"'subvec', transform(slice(__cvec__, "
        f"j * (size(__cvec__) div {m}) + 1, size(__cvec__) div {m}), "
        f"x -> CAST(x AS DOUBLE))))"
    )
    return coded.select(
        F.explode(F.expr(sub)).alias("__s__"), "code"
    ).select(F.col("__s__.sub").alias("sub"), "code", F.col("__s__.subvec").alias("subvec"))


def _pq_sq_dist_micro(a: str, b: str) -> str:
    """Squared L2 distance between two double arrays in integer MICRO-units
    (round 6 dp, x1e6, bigint): downstream sums of these are exact integer
    arithmetic — identical in any engine regardless of summation order."""
    return (
        f"CAST(round(aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v) * 1000000, 0) AS BIGINT)"
    )


def _pq_cb_row(cb: DataFrame) -> DataFrame:
    """The PQ codebook collapsed to ONE sorted broadcast array row."""
    return cb.agg(
        F.expr("array_sort(collect_list(named_struct("
               "'sub', sub, 'code', code, 'subvec', subvec)))").alias("__cb__")
    )


def _pq_subs_expr(vec_col: str, m: int) -> str:
    """The vector pre-split into m double subvectors (one evaluation)."""
    return (
        f"transform(sequence(0, {m - 1}), j -> transform(slice(`{vec_col}`, "
        f"j * (size(`{vec_col}`) div {m}) + 1, size(`{vec_col}`) div {m}), "
        f"x -> CAST(x AS DOUBLE)))"
    )


def _pq_codes_expr(m: int) -> str:
    """Per-subspace argmin codes over the bound __cb__ row, reading the
    pre-split __subs__ column.  The candidate distance is let-bound via a
    1-element transform so the fold evaluates it once per entry (the HOF
    let-binding lesson)."""
    d2 = _pq_sq_dist_micro("element_at(__subs__, j + 1)", "e.subvec")
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"aggregate(filter(__cb__, e -> e.sub = j), "
        f"named_struct('d', CAST(NULL AS BIGINT), 'c', CAST(-1 AS INT)), "
        f"(acc, e) -> transform(array({d2}), dd -> "
        f"CASE WHEN acc.c = -1 OR dd < acc.d "
        f"THEN named_struct('d', dd, 'c', e.code) ELSE acc END)[0], "
        f"acc -> acc.c))"
    )


def pq_encode(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 0,
    codebook: DataFrame = None,
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte-ish codes (nearest codebook
    entry per subspace by squared L2, ties to the smaller code) — the
    memory-compression step that makes billion-scale ANN fit: 64 floats
    become 4 ints.

    Scale shape: the codebook is collapsed to ONE broadcast row and the
    argmin runs as a Catalyst fold over it per subspace — the encode pass
    is map-only (zero shuffle, no explode of the corpus).  Distances
    compare in integer micro-units (see :func:`_pq_sq_dist_micro`), so
    the assignment is engine-exact for oracles.

    Returns the corpus projected to (id_col, out_col array<int>)."""
    cb = (
        codebook
        if codebook is not None
        else pq_codebook(corpus, vec_col, id_col, m, n_codes, seed)
    )
    return (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col),
            F.expr(_pq_subs_expr(vec_col, m)).alias("__subs__"),
        )
        .crossJoin(F.broadcast(_pq_cb_row(cb)))
        .select(F.col(id_col), F.expr(_pq_codes_expr(m)).alias(out_col))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 0,
    query_id_col: str = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation (ADC,
    Jegou et al. 2011): the corpus is PQ-encoded once (m codes per
    vector), each query precomputes its m x n_codes lookup table of exact
    query-subvector-to-centroid distances, and every corpus row is scored
    by m table lookups instead of a d-dimensional dot product.

    Scale shape: encode is a map-only broadcast fold
    (:func:`pq_encode`); the per-query LUTs are tiny (m*n_codes entries)
    and broadcast; scoring is a map-only lookup sum in integer micro-units
    (exact in any engine); top-k runs the salted two-stage rank
    (:func:`_two_stage_topk`) so no single task ever sees a whole query's
    corpus.  This is the compressed-domain exhaustive scan — compose with
    IVF cells for the full IVF-PQ when even a compressed scan is too much.

    Returns (query_id, neighbor_id, rank, adc_dist) — adc_dist ascending,
    the approximate squared L2 distance."""
    query_id_col = query_id_col or id_col
    # the codebook plan (a corpus-wide TakeOrdered) feeds BOTH the encode
    # and the query LUT — cache it or it executes once per consumer
    # (caller releases via release_caches())
    from feathub_spark.common.caching import register_cache

    cb = register_cache(pq_codebook(corpus, vec_col, id_col, m, n_codes, seed))
    encoded = pq_encode(
        corpus, vec_col, id_col, m, n_codes, seed, codebook=cb
    ).withColumnRenamed(id_col, "neighbor_id")

    qsubs = (
        f"transform(sequence(0, {m - 1}), j -> transform(slice(`{vec_col}`, "
        f"j * (size(`{vec_col}`) div {m}) + 1, size(`{vec_col}`) div {m}), "
        f"x -> CAST(x AS DOUBLE)))"
    )
    lut = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.expr(qsubs).alias("__qs__")
        )
        .crossJoin(F.broadcast(cb))
        .select(
            "query_id", "sub", "code",
            F.expr(
                _pq_sq_dist_micro("element_at(__qs__, sub + 1)", "subvec")
            ).alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                "array_sort(collect_list(named_struct("
                "'sub', sub, 'code', code, 'd', d)))"
            ).alias("__lut__")
        )
    )
    # LUT is sorted by (sub, code) with compact codes, so entry (j, c)
    # lives at index j * (len/m) + c — pure arithmetic lookup, no probe
    score = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, j) -> "
        f"acc + element_at(__lut__, CAST(j * (size(__lut__) div {m}) "
        f"+ element_at(pq_codes, j + 1) + 1 AS INT)).d)"
    )
    scored = (
        encoded.crossJoin(F.broadcast(lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", F.round(F.expr(score) / F.lit(1e6), 6))
        # malformed external pq_codes (wrong length -> out-of-range
        # element_at) yield NULL distance; ascending sort is NULLS FIRST,
        # so exclude rather than rank them #1 (same guard as hamming_topk)
        .filter(F.col("adc_dist").isNotNull())
    )
    return _two_stage_topk(
        scored, k, [F.col("adc_dist").asc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "adc_dist")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 0,
    query_id_col: str = None,
) -> DataFrame:
    """IVF-PQ: the production billion-vector ANN shape — coarse inverted
    file cells bound WHICH rows each query scores (nprobe of n_centroids
    cells), product-quantization codes bound WHAT is stored and moved per
    row (m ints instead of d floats), and ADC lookup tables make scoring
    m integer adds.

    Plan shape: ONE map-only pass over the corpus computes both the cell
    assignment (argmax-cosine fold over the broadcast centroid array — no
    per-row window, no assignment shuffle) and the PQ codes
    (:func:`pq_encode`'s broadcast fold); the only corpus shuffle is the
    cell equi-join against the broadcast probe set; top-k runs the salted
    two-stage rank.  Codes quantize the RAW vectors (not residuals) so
    every distance is engine-exact integer arithmetic for the oracle;
    residual encoding is a recall refinement, not a plan change.

    Returns (query_id, neighbor_id, rank, adc_dist)."""
    query_id_col = query_id_col or id_col
    # both codebook plans are corpus-wide selections feeding two
    # consumers each (cents -> cents1 + probe scoring; cb -> encode +
    # LUT) — cache them or they execute once per consumer (caller
    # releases via release_caches())
    from feathub_spark.common.caching import register_cache

    cents = register_cache(
        ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    )
    cb = register_cache(pq_codebook(corpus, vec_col, id_col, m, n_codes, seed))

    # centroids collapsed to one sorted broadcast array row; each entry
    # carries its norm so the per-row assignment fold never recomputes it
    # (array_sort still orders by the leading unique cid — adding a
    # trailing field cannot change the order)
    cents1 = cents.agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'cid', __cid__, 'cvec', __cvec__, "
            f"'cn', {_NORM.format(v='__cvec__')})))"
        ).alias("__cents__")
    )
    # row norm hoisted to __vn__ (once per corpus row instead of once per
    # centroid inside the fold); the division tree is unchanged, so the
    # scores are bit-identical to the inlined cosine_expr the oracle uses
    cos = (
        f"({_DOT.format(a='`' + vec_col + '`', b='e.cvec')})"
        " / (__vn__ * e.cn)"
    )
    # accumulator 'c' is typed by the ID COLUMN, not hard-cast to bigint:
    # CAST('doc-a1' AS BIGINT) is NULL in non-ANSI mode, which silently
    # emptied every cell for non-numeric ids (review finding)
    cid_sql = cents.schema["__cid__"].dataType.simpleString()
    assign_fold = (
        "aggregate(__cents__, "
        f"named_struct('c', CAST(NULL AS {cid_sql}), 's', CAST(NULL AS DOUBLE)), "
        f"(acc, e) -> transform(array(round({cos}, 6)), sc -> "
        "CASE WHEN acc.c IS NULL OR sc > acc.s "
        "THEN named_struct('c', e.cid, 's', sc) "
        "ELSE acc END)[0], acc -> acc.c)"
    )
    # ONE corpus pass: both broadcast codebooks are attached and the cell
    # assignment + PQ codes come out of the same narrow select — no second
    # scan, no corpus self-join on the id
    members = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col),
            F.expr(_NORM.format(v=f"`{vec_col}`")).alias("__vn__"),
            F.expr(_pq_subs_expr(vec_col, m)).alias("__subs__"),
        )
        .crossJoin(F.broadcast(cents1))
        .crossJoin(F.broadcast(_pq_cb_row(cb)))
        .select(
            "neighbor_id",
            F.expr(assign_fold).alias("cell"),
            F.expr(_pq_codes_expr(m)).alias("pq_codes"),
        )
    )

    # query side: nprobe nearest cells (tiny: queries x centroids) + LUT
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    probe_scored = (
        qv.withColumn("__qn__", F.expr(_NORM.format(v="__qv__")))
        .crossJoin(F.broadcast(
            cents.withColumn("__cn__", F.expr(_NORM.format(v="__cvec__")))
        ))
        .withColumn(
            "__acos__",
            F.round(
                F.expr(_DOT.format(a="__qv__", b="__cvec__"))
                / (F.col("__qn__") * F.col("__cn__")),
                6,
            ),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__acos__").desc(), F.col("__cid__").asc()
    )
    probes = (
        probe_scored.withColumn("__pr__", F.row_number().over(wq))
        .filter(F.col("__pr__") <= nprobe)
        .select("query_id", F.col("__cid__").alias("cell"))
    )
    qsubs = (
        f"transform(sequence(0, {m - 1}), j -> transform(slice(__qv__, "
        f"j * (size(__qv__) div {m}) + 1, size(__qv__) div {m}), "
        f"x -> CAST(x AS DOUBLE)))"
    )
    lut = (
        qv.select("query_id", F.expr(qsubs).alias("__qs__"))
        .crossJoin(F.broadcast(cb))
        .select(
            "query_id", "sub", "code",
            F.expr(
                _pq_sq_dist_micro("element_at(__qs__, sub + 1)", "subvec")
            ).alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                "array_sort(collect_list(named_struct("
                "'sub', sub, 'code', code, 'd', d)))"
            ).alias("__lut__")
        )
    )
    probe_lut = probes.join(lut, on="query_id")
    score = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, j) -> "
        f"acc + element_at(__lut__, CAST(j * (size(__lut__) div {m}) "
        f"+ element_at(pq_codes, j + 1) + 1 AS INT)).d)"
    )
    scored = (
        members.join(F.broadcast(probe_lut), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", F.round(F.expr(score) / F.lit(1e6), 6))
        # malformed external pq_codes (wrong length -> out-of-range
        # element_at) yield NULL distance; ascending sort is NULLS FIRST,
        # so exclude rather than rank them #1 (same guard as hamming_topk)
        .filter(F.col("adc_dist").isNotNull())
    )
    return _two_stage_topk(
        scored, k, [F.col("adc_dist").asc(), F.col("neighbor_id").asc()]
    ).select("query_id", "neighbor_id", "rank", "adc_dist")


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.8,
    n_centroids: int = 256,
    seed: int = 0,
    codebook: DataFrame = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus by nearest codebook centroid, then
    inside each cluster mark as duplicates every pair with cosine >=
    ``threshold`` and keep, per duplicate neighborhood, the member FARTHEST
    from its centroid (the paper's keep-rule: the most atypical example
    carries the most information).  Greedy priority form: a row is dropped
    iff some same-cell row within ``threshold`` has strictly higher keep
    priority (lower centroid cosine, ties broken by id) — deterministic and
    relational, no iterative connected components needed.

    Scale: the codebook is corpus-size-independent (hash-rank
    :func:`ivf_codebook`, or pass a Lloyd-trained one); assignment is ONE
    map-only broadcast-fold pass (no per-row window, no assignment
    shuffle); the pair scan is an equi-join on the cell id, so work is
    sum(|cell|^2), bounded by the codebook granularity, never corpus x
    corpus (use more centroids — the paper uses ~0.1% of n — to keep cells
    small; a skewed cell shows up in the Spark UI as one hot cell-key
    task).  The assigned-members intermediate feeds both join sides and is
    persisted through the register_cache contract — call
    ``release_caches()`` after consuming the result.

    Returns one row per corpus row: (id_col, cell, centroid_cos, kept).
    """
    from feathub_spark.common.caching import register_cache

    cents = (
        codebook
        if codebook is not None
        else ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    )
    # each broadcast centroid entry carries its norm; the trailing field
    # cannot change array_sort order (leading cid is unique)
    cents1 = cents.agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'cid', __cid__, 'cvec', __cvec__, "
            f"'cn', {_NORM.format(v='__cvec__')})))"
        ).alias("__cents__")
    )
    # row norm hoisted to __vn__ — computed once per corpus row instead of
    # once per centroid inside the fold and once per candidate pair in the
    # verify join; identical division tree, bit-identical scores
    cos = f"({_DOT.format(a='__v__', b='e.cvec')}) / (__vn__ * e.cn)"
    # argmax-cosine fold over the broadcast centroid array; strict > keeps
    # the smallest cid on ties (array is cid-sorted), matching the oracle's
    # (acos DESC, cid ASC) rank.  The accumulator's 'c' is typed by the id
    # column — a hard CAST AS BIGINT silently NULLed non-numeric ids.
    cid_sql = cents.schema["__cid__"].dataType.simpleString()
    assign_fold = (
        "aggregate(__cents__, "
        f"named_struct('c', CAST(NULL AS {cid_sql}), 's', CAST(NULL AS DOUBLE)), "
        f"(acc, e) -> transform(array(round({cos}, 6)), sc -> "
        "CASE WHEN acc.c IS NULL OR sc > acc.s "
        "THEN named_struct('c', e.cid, 's', sc) "
        "ELSE acc END)[0], acc -> acc)"
    )
    members = register_cache(
        ensure_parallelism(corpus)
        .select(
            F.col(id_col),
            F.col(vec_col).alias("__v__"),
            F.expr(_NORM.format(v=f"`{vec_col}`")).alias("__vn__"),
        )
        .crossJoin(F.broadcast(cents1))
        .withColumn("__a__", F.expr(assign_fold))
        .select(
            F.col(id_col),
            F.col("__v__"),
            F.col("__vn__"),
            F.col("__a__.c").alias("cell"),
            F.col("__a__.s").alias("centroid_cos"),
        )
    )
    ma = members.select(
        F.col(id_col).alias("__ida__"),
        F.col("__v__").alias("__va__"),
        F.col("__vn__").alias("__na__"),
        "cell",
        F.col("centroid_cos").alias("__ca__"),
    )
    mb = members.select(
        F.col(id_col).alias("__idb__"),
        F.col("__v__").alias("__vb__"),
        F.col("__vn__").alias("__nb__"),
        F.col("cell").alias("__cellb__"),
        F.col("centroid_cos").alias("__cb__"),
    )
    dropped = (
        ma.join(mb, F.col("cell") == F.col("__cellb__"))
        .filter(F.col("__ida__") != F.col("__idb__"))
        .withColumn(
            "__pcos__",
            F.round(
                F.expr(_DOT.format(a="__va__", b="__vb__"))
                / (F.col("__na__") * F.col("__nb__")),
                6,
            ),
        )
        # NaN >= threshold is TRUE in Spark's ordering — a zero-norm
        # vector must not be "a duplicate of" a row it has no defined
        # similarity to
        .filter(~F.isnan(F.col("__pcos__")))
        .filter(F.col("__pcos__") >= F.lit(threshold))
        .filter(
            (F.col("__cb__") < F.col("__ca__"))
            | (
                (F.col("__cb__") == F.col("__ca__"))
                & (F.col("__idb__") < F.col("__ida__"))
            )
        )
        .select(F.col("__ida__").alias(id_col))
        .distinct()
        .withColumn("__dup__", F.lit(True))
    )
    return (
        members.join(dropped, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("centroid_cos"),
            F.col("__dup__").isNull().alias("kept"),
        )
    )
