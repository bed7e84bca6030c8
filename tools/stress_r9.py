"""10x stress for the round-9 session-2 optimized paths (verify-skill
rule: unit-scale green is not enough — three round-6 plans were quadratic
at 10x).  Covers the operators whose plans changed this session: the
join-free exact-Jaccard pair generation, the Arrow posting-pair
expansion behind dup_passage_pairs, the cached BM25 term table, the
cached tokenize_to_ids explode, and scd2_merge's cached interval input.

Usage: python tools/stress_r9.py [scale]   # default 10
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(label, fn):
    t0 = time.time()
    r = fn()
    print(f"[{time.time() - t0:6.1f}s] {label} -> {r}")
    return r


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches

    spark = default_spark_session("stress_r9", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(3)

    # corpus: 500 docs * scale, ~120 random words, 10% near-dup pairs
    words = [f"w{i}" for i in range(5000)]
    n_docs = 500 * scale
    texts = []
    for i in range(n_docs):
        body = " ".join(rnd.choice(words) for _ in range(120))
        texts.append((i, body))
        if i % 10 == 0:
            texts.append((n_docs + i, body[:300] + " tail " + body[300:]))
    docs = spark.createDataFrame(texts, "doc_id long, text string").repartition(16)
    docs.persist().count()

    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    timed(
        f"ngram_jaccard_pairs exact/None ({len(texts)} docs)",
        lambda: ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.2, max_doc_freq=None
        ).count(),
    )
    release_caches()

    from feathub_spark.datapipe.dedup import dedup_clusters

    # star CC now checkpoints the input pair list once (nodes + edges both
    # derive from it) and skips the duplicate-insensitive intermediate
    # distinct; the stress pins that the round count / wall stays flat
    # when the pair graph grows 10x
    pairs10 = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.2, max_doc_freq=None
    )
    timed(
        f"dedup_clusters star single-materialization ({len(texts)} docs)",
        lambda: dedup_clusters(pairs10, algorithm="star").count(),
    )
    release_caches()

    from feathub_spark.datapipe.passages import dup_passage_pairs

    timed(
        f"dup_passage_pairs arrow expansion ({len(texts)} docs)",
        lambda: dup_passage_pairs(
            docs, "text", "doc_id", gram_len=12, window=6,
            min_shared=2, hash_fn="poly",
        ).count(),
    )
    release_caches()

    from feathub_spark.datapipe.retrieval import bm25_search

    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.expr("array_join(slice(split(text, ' '), 1, 4), ' ')").alias(
            "query_text"
        ),
    )
    timed(
        f"bm25_search cached term table ({len(texts)} docs, "
        f"{queries.count()} queries)",
        lambda: bm25_search(docs, queries, "text", "doc_id", k=10).count(),
    )
    release_caches()

    from feathub_spark.datapipe.text import tokenize_to_ids

    timed(
        f"tokenize_to_ids cached explode ({len(texts)} docs)",
        lambda: tokenize_to_ids(docs, "text", "doc_id", vocab_size=4096)
        .agg(F.sum("n_tokens")).first()[0],
    )
    release_caches()

    from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge

    n_ev = 500_000 * scale
    log = spark.range(n_ev).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % 10_000)
        .alias("k"),
        F.col("id").alias("ts"),
        (F.xxhash64("id", F.lit(7)) % 4).cast("string").alias("v"),
    )
    base = scd2_intervals(log.filter(F.col("ts") <= n_ev // 2), "k", "ts", "v")
    timed(
        f"scd2_merge cached interval input (delta {n_ev // 2} events)",
        lambda: scd2_merge(
            base, log.filter(F.col("ts") > n_ev // 2), "k", "ts", "v"
        ).count(),
    )
    docs.unpersist()
    release_caches()


if __name__ == "__main__":
    main()
