"""Keyword retrieval: Okapi BM25 scoring over the corpus's own term
statistics — the lexical half of hybrid search (compose with
``similarity``'s ANN family for the vector half).

Plan shape: the token stream is pruned to the QUERY vocabulary BEFORE
the per-(doc, term) frequency aggregation — each occurrence left-probes
the broadcast query-term set at the scan and the groupBy key masks
non-query terms to NULL, so they collapse map-side into one
length-carrier row per doc and the only corpus-sized shuffle is gone
(same prune-before-shuffle pattern as phrase_search).  ONE tokenize
pass feeds both that aggregation and the corpus totals (N, avgdl):
explode_outer keeps a row for token-free docs, so the cached narrow
(doc, term, tf, len) table — bounded by query-term occurrences +
document count, never corpus tokens — carries every document's length,
and the stats attach as a 1-row broadcast.  Per-term partial scores
round into integer micro-units so the per-(query, doc) sum is exact
bigint arithmetic in any engine, and the final per-query top-k runs the
salted two-stage rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism
from feathub_spark.datapipe.similarity import _two_stage_topk


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str = "query_text",
    query_id_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query row under Okapi BM25
    (whitespace-lowercase terms):

        score(D, Q) = sum_t idf(t) * tf * (k1+1) /
                      (tf + k1 * (1 - b + b * |D| / avgdl))
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

    Returns (query_id, doc id, rank, bm25) — bm25 descending, ranks
    deterministic (ties break on the smaller document id)."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    qtoks = (
        f"filter(split(trim(lower(`{query_text_col}`)), '\\\\s+'), "
        f"t -> t <> '')"
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.expr(f"array_distinct({qtoks})")).alias("__term__"),
    )
    qvocab = F.broadcast(
        qterms.select("__term__").distinct().withColumn("__hit__", F.lit(1))
    )
    from feathub_spark.common.caching import register_cache

    # ONE tokenize pass feeds BOTH the per-(doc, term) aggregate and the
    # corpus length stats: every token occurrence (explode_outer keeps a
    # NULL row for empty/NULL-text docs, whose length must still reach
    # Okapi's N and avgdl) left-probes the broadcast query vocabulary AT
    # THE SCAN, and the groupBy key MASKS non-query terms to NULL — so
    # non-query tokens collapse map-side into one NULL-term row per doc
    # (the length carrier) and the shuffle stays bounded by query-term
    # occurrences + document count, never corpus tokens.  No driver
    # collect (a separate collect job measured ~0.9 s of fixed overhead
    # per call), no second tokenize scan (the r14 shape's ~15% local
    # regression), no corpus-sized cache (the r13 shape's 100 TB spill
    # hazard).  The length rides along (coalesce: size(NULL) is NULL,
    # and a NULL-text doc must carry len 0 like an empty one).  Cached
    # narrow: the frequencies, the scoring join and the stats all read
    # it (caller releases via release_caches()).
    occurrences = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.expr(toks).alias("__toks__"))
        .select(
            F.col(id_col),
            F.coalesce(F.size("__toks__").cast("double"), F.lit(0.0)).alias(
                "__len__"
            ),
            F.explode_outer("__toks__").alias("__term__"),
        )
        .join(qvocab, on="__term__", how="left")
    )
    pruned = register_cache(
        occurrences.groupBy(
            id_col,
            F.when(F.col("__hit__").isNotNull(), F.col("__term__")).alias(
                "__term__"
            ),
        ).agg(
            F.count("__hit__").cast("double").alias("__tf__"),
            F.first("__len__").alias("__len__"),
        )
    )
    doc_terms = pruned.filter(F.col("__term__").isNotNull())
    # corpus totals over EVERY document (empty/NULL-text docs carry
    # __len__ = 0 — deriving N/avgdl from token-bearing docs only would
    # deflate every idf as the empty-doc fraction grows).  The groupBy
    # (dup-id collapse, matching the previous doclens contract) reads
    # the doc-bounded cached rows.
    doclens = (
        pruned.groupBy(id_col).agg(F.first("__len__").alias("__l__"))
    )
    stats = doclens.alias("__dl__").agg(
        F.count(F.lit(1)).cast("double").alias("__N__"),
        F.avg("__l__").alias("__avgdl__"),
    )
    # document frequencies: doc_terms is already one row per (doc, term)
    # restricted to the query vocabulary, so df(t) is a plain count
    dfreq = doc_terms.groupBy("__term__").agg(
        F.count(F.lit(1)).cast("double").alias("__df__")
    )
    qside = (
        qterms.join(F.broadcast(dfreq), on="__term__")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf__",
            F.log((F.col("__N__") - F.col("__df__") + 0.5)
                  / (F.col("__df__") + 0.5) + 1.0),
        )
        .select("query_id", "__term__", "__idf__", "__avgdl__")
    )
    term_score = (
        F.col("__idf__")
        * (F.col("__tf__") * F.lit(float(k1) + 1.0))
        / (
            F.col("__tf__")
            + F.lit(float(k1))
            * (F.lit(1.0 - float(b))
               + F.lit(float(b)) * F.col("__len__") / F.col("__avgdl__"))
        )
    )
    scored = (
        doc_terms.join(F.broadcast(qside), on="__term__")
        # integer micro-unit partials: the per-(query, doc) sum is exact
        .withColumn(
            "__s__", F.round(term_score * F.lit(1e6), 0).cast("bigint")
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("__s__").alias("__sum__"))
        .withColumn("bm25", F.round(F.col("__sum__") / F.lit(1e6), 6))
    )
    return _two_stage_topk(
        scored, k, [F.col("bm25").desc(), F.col(id_col).asc()],
        item_col=id_col,
    ).select("query_id", id_col, "rank", "bm25")


def rrf_fuse(
    rankings,
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    combine heterogeneous rankers (BM25 + vector ANN = hybrid search):
    score(item) = sum over input lists of 1 / (c + rank), items missing
    from a list simply contribute nothing.

    ``rankings`` is a sequence of DataFrames, each with (query_col,
    item_col, rank_col).  Scores are exact integer nano-units (1e9 /
    (c + rank) rounds to the same bigint in any engine), so fusion is
    reproducible; ties break on the smaller item id.  One union + one
    map-side-combinable aggregation + the salted two-stage top-k.

    Returns (query_col, item_col, rank, rrf_score)."""
    rankings = list(rankings)
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking DataFrame")
    parts = [
        r.select(
            F.col(query_col),
            F.col(item_col),
            F.round(F.lit(1e9) / (F.lit(int(c)) + F.col(rank_col)), 0)
            .cast("bigint")
            .alias("__s__"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    scored = (
        unioned.groupBy(query_col, item_col)
        .agg(F.sum("__s__").alias("__sum__"))
        .withColumn(
            "rrf_score", F.round(F.col("__sum__") / F.lit(1e9), 9)
        )
    )
    return _two_stage_topk(
        scored, k,
        [F.col("rrf_score").desc(), F.col(item_col).asc()],
        group_col=query_col, item_col=item_col,
    ).select(query_col, item_col, "rank", "rrf_score")


def phrase_search(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase matching via POSITIONAL postings — the inverted-index
    query BM25's bag-of-words scoring cannot answer.

    Tokenization is the engine-wide whitespace-lowercase rule.  One
    posexplode pass emits (doc, token, position); postings are filtered to
    the phrase's terms BEFORE any shuffle (at corpus scale the phrase
    vocabulary prunes ~everything at the scan).  Instead of an m-way
    self-join on adjacent positions, each occurrence of phrase term i at
    position p votes for anchor p - i, and an anchor with votes from all m
    DISTINCT term indexes is a match — one groupBy((doc, anchor)) replaces
    m-1 joins, and repeated phrase terms (e.g. "the x the") are handled
    because an occurrence votes once per index it could fill.

    Returns (id_col, n_matches, first_pos) for matching documents only;
    first_pos is the 0-based token position of the earliest match."""
    from feathub_spark.common.time_utils import sql_string_literal

    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    m = len(terms)
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    # index votes: occurrences of term i at position p -> anchor p - i.
    # sql_string_literal escapes backslashes too — quote-doubling alone
    # left terms like "a\\b" to be unescaped into control characters
    # that silently never matched
    votes_expr = (
        "filter(flatten(transform(__idx__, i -> CASE "
        + " ".join(
            f"WHEN __tok__ = '{sql_string_literal(t)}' AND i = {i} "
            f"THEN array(named_struct('anchor', __pos__ - {i}, 'ti', {i}))"
            for i, t in enumerate(terms)
        )
        + " ELSE array() END)), v -> v.anchor >= 0)"
    )
    occ = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(toks)).alias("__pos__", "__tok__"),
        )
        .filter(F.col("__tok__").isin(terms))
        .withColumn("__idx__", F.expr(f"sequence(0, {m - 1})"))
        .select(id_col, F.explode(F.expr(votes_expr)).alias("__v__"))
        .select(id_col, F.col("__v__.anchor").alias("__anchor__"),
                F.col("__v__.ti").alias("__ti__"))
    )
    matches = (
        occ.groupBy(id_col, "__anchor__")
        .agg(F.countDistinct("__ti__").alias("__nti__"))
        .filter(F.col("__nti__") == m)
    )
    return matches.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("__anchor__").cast("bigint").alias("first_pos"),
    )


def mmr_rerank(
    candidates: DataFrame,
    query_id_col: str,
    item_id_col: str,
    rel_col: str,
    vec_col: str,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell & Goldstein
    1998) of a per-query candidate list — the rerank stage after
    BM25/ANN retrieval: greedily select k items maximizing

        lam * relevance - (1 - lam) * max_cosine(item, already_selected)

    so near-duplicate hits don't crowd the result page.  Ties break on
    the smaller item id; scores round to 6 dp before comparison so the
    selection is float-order deterministic.

    This is one of the engine's few sanctioned Python stages: the greedy
    argmax recurrence (each pick depends on every previous pick) has no
    relational form.  It runs as applyInPandas over per-QUERY groups —
    the candidate set per query is BOUNDED by the upstream retriever's k,
    so the grouped pandas task is O(k * |candidates| * dims) on a
    handful of rows regardless of corpus size, and queries parallelize
    across the shuffle.  (Cf. PythonUdfTransform's Arrow batching — same
    rationale, dataframe_builder.py.)

    Returns (query_id_col, item_id_col, mmr_rank, mmr_score); the id
    columns keep whatever types the candidates frame carries (string,
    int, ... — copied from candidates.schema, not assumed)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    in_fields = {f.name: f for f in candidates.schema.fields}
    out_schema = StructType(
        [
            StructField(
                query_id_col, in_fields[query_id_col].dataType, True
            ),
            StructField(item_id_col, in_fields[item_id_col].dataType, True),
            StructField("mmr_rank", LongType(), True),
            StructField("mmr_score", DoubleType(), True),
        ]
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        qid = pdf[query_id_col].iloc[0]
        items = pdf[item_id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype="float64")
        vecs = np.array(
            [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
        )
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        n = len(items)
        selected = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            best = None
            best_score = None
            for i in remaining:
                if selected:
                    pen = float(
                        max(unit[i] @ unit[j] for j in selected)
                    )
                else:
                    pen = 0.0
                score = round(lam * rel[i] - (1 - lam) * pen, 6)
                if (
                    best is None
                    or score > best_score
                    or (score == best_score and items[i] < items[best])
                ):
                    best, best_score = i, score
            selected.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                query_id_col: [qid] * len(selected),
                item_id_col: [items[i] for i in selected],
                "mmr_rank": list(range(1, len(selected) + 1)),
                "mmr_score": [
                    round(
                        lam * rel[i]
                        - (1 - lam)
                        * (
                            0.0
                            if rank == 0
                            else float(
                                max(
                                    unit[i] @ unit[j]
                                    for j in selected[:rank]
                                )
                            )
                        ),
                        6,
                    )
                    for rank, i in enumerate(selected)
                ],
            }
        )

    return (
        ensure_parallelism(candidates)
        .groupBy(query_id_col)
        .applyInPandas(_mmr, schema=out_schema)
    )
