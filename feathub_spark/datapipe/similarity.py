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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism

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
) -> DataFrame:
    """Exact top-k cosine neighbors per query row (self-matches excluded when
    ids collide).  Returns (query_id, neighbor_id, rank, cosine)."""
    query_id_col = query_id_col or id_col
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
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


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
        scored = base.crossJoin(F.broadcast(cents)).withColumn(
            "__acos__", F.round(F.expr(cosine_expr("__mv__", "__cvec__")), 6)
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
) -> DataFrame:
    """IVF-style ANN: a deterministic hash-rank-sampled codebook of exactly
    ``n_centroids`` rows (see :func:`ivf_codebook`) partitions the corpus
    into cells by nearest centroid; each query probes its ``nprobe``
    nearest cells and scores only those members.

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
    cents = (
        codebook
        if codebook is not None
        else ivf_codebook(corpus, vec_col, id_col, n_centroids, seed)
    )

    def assign(df: DataFrame, ident: str, out_id: str, top_n: int) -> DataFrame:
        scored = (
            df.select(F.col(ident).alias(out_id), F.col(vec_col).alias(f"__{out_id}_v__"))
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "__acos__",
                F.round(F.expr(cosine_expr(f"__{out_id}_v__", "__cvec__")), 6),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("__acos__").desc(), F.col("__cid__").asc()
        )
        return (
            scored.withColumn("__arank__", F.row_number().over(w))
            .filter(F.col("__arank__") <= top_n)
            .select(out_id, f"__{out_id}_v__", F.col("__cid__").alias("cell"))
        )

    members = assign(ensure_parallelism(corpus), id_col, "neighbor_id", 1)
    probes = assign(queries, query_id_col, "query_id", nprobe)
    cand = members.join(F.broadcast(probes), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(F.expr(cosine_expr("__query_id_v__", "__neighbor_id_v__")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


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
    dim_seq = (
        f"sequence(0, size(`{vec_col}`) - 1)" if dims is None
        else f"sequence(0, {dims - 1})"
    )
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
        f"aggregate(zip_with(`{vec_col}`, {dim_seq}, "
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
) -> DataFrame:
    """Approximate top-k: only candidates sharing an LSH band bucket with the
    query are scored.  Recall < 1.0 by design; at 100 TB this replaces the
    corpus-wide scan with a bucket-local join."""
    query_id_col = query_id_col or id_col
    width = planes // bands

    def with_buckets(df: DataFrame, ident: str, out_id: str) -> DataFrame:
        sig = _srp_signature(vec_col, planes, dims, seed, weight_fn)
        return (
            df.select(
                F.col(ident).alias(out_id),
                F.col(vec_col).alias(f"__{out_id}_v__"),
                F.expr(sig).alias("__bits__"),
            )
            .select(
                out_id,
                f"__{out_id}_v__",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, {bands - 1}), "
                        f"b -> struct(b AS band, "
                        f"array_join(slice(__bits__, b * {width} + 1, {width}), '') AS bucket))"
                    )
                ).alias("bb"),
            )
            .select(out_id, f"__{out_id}_v__", "bb.band", "bb.bucket")
        )

    qb = with_buckets(queries, query_id_col, "query_id")
    cb = with_buckets(ensure_parallelism(corpus), id_col, "neighbor_id")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(F.expr(cosine_expr("__query_id_v__", "__neighbor_id_v__")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    per_cell: int = 10,
    n_centroids: int = 256,
    seed: int = 0,
    sample_seed: int = 0,
    codebook: DataFrame = None,
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
    scored = (
        ensure_parallelism(corpus)
        .select(F.col(id_col), F.col(vec_col).alias("__v__"))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "__acos__", F.round(F.expr(cosine_expr("__v__", "__cvec__")), 6)
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
