"""Hybrid retrieval + corpus-curation pipeline with the round-7 session
operators:

    documents
      -> heavy-hitter vocabulary scan (count-min sketch pre-filter)
      -> frequency-vocab tokenization to integer-id arrays
      -> exact phrase search ("table hash") over positional postings
      -> BM25 keyword top-k fused with exact-cosine ANN (RRF)
      -> MMR diversification of the fused list
    embeddings
      -> SemDeDup semantic dedup (codebook cells + cosine pruning)
    events
      -> per-type winsorized values + HLL distinct-user estimates
      -> view -> click -> purchase funnel completion
    orders
      -> Bloom-pruned lineitem scan (urgent orders only)
      -> CDC diff between two snapshot variants

Runs on the bundled test data:
    python examples/retrieval_and_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feathub_spark import default_spark_session
from feathub_spark.common.caching import release_caches
from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune
from feathub_spark.datapipe.profile import (
    cms_heavy_hitters,
    hll_distinct,
    key_skew,
)
from feathub_spark.datapipe.quality import winsorize
from feathub_spark.datapipe.retrieval import (
    bm25_search,
    mmr_rerank,
    phrase_search,
    rrf_fuse,
)
from feathub_spark.datapipe.sessions import funnel_steps
from feathub_spark.datapipe.similarity import brute_force_topk, semantic_dedup
from feathub_spark.datapipe.snapshots import diff_snapshots
from feathub_spark.datapipe.text import tokenize_to_ids


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = default_spark_session("retrieval_and_curation", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    print("== corpus scan: heavy hitters (CMS pre-filter) ==")
    cms_heavy_hitters(docs, "text", d=2, w=64, min_count=50).orderBy(
        F.desc("exact_count")
    ).show(5, truncate=False)

    print("== tokenization to id arrays (top-50 vocab) ==")
    tokenize_to_ids(docs, "text", "doc_id", vocab_size=50).show(
        3, truncate=60
    )

    print("== exact phrase search: 'table hash' ==")
    phrase_search(docs, "text", "doc_id", "table hash").orderBy(
        F.desc("n_matches")
    ).show(5)

    print("== hybrid retrieval: BM25 + ANN -> RRF -> MMR ==")
    toks = "filter(split(trim(lower(text)), '\\\\s+'), t -> t <> '')"
    queries = docs.limit(2).select(
        F.col("doc_id").alias("query_id"),
        F.expr(f"array_join(slice({toks}, 1, 4), ' ')").alias("query_text"),
    )
    bm = bm25_search(docs, queries, "text", "doc_id", k=10).select(
        "query_id", F.col("doc_id").alias("item_id"), "rank"
    )
    qv = emb.join(
        queries.select(F.col("query_id").alias("vec_id")), on="vec_id"
    )
    ann = brute_force_topk(emb, qv, "embedding", "vec_id", k=10).select(
        "query_id", F.col("neighbor_id").alias("item_id"), "rank"
    )
    fused = rrf_fuse([bm, ann], k=10)
    cands = fused.join(
        emb.select(
            F.col("vec_id").alias("item_id"), F.col("embedding").alias("vec")
        ),
        on="item_id",
    ).select("query_id", "item_id", F.col("rrf_score").alias("rel"), "vec")
    mmr_rerank(cands, "query_id", "item_id", "rel", "vec", k=5, lam=0.7).show(
        10
    )

    print("== SemDeDup over embeddings ==")
    sd = semantic_dedup(emb, "embedding", "vec_id", threshold=0.35,
                        n_centroids=16)
    sd.groupBy("kept").count().show()
    release_caches()

    print("== event hygiene: winsorize + HLL distinct + funnel ==")
    winsorize(events, "value", group_col="event_type").select(
        "event_type", "winsor_lo", "winsor_hi"
    ).distinct().show()
    hll_distinct(events, "user_id", ["event_type"], p=8).show()
    if dict(events.dtypes).get("ts") == "bigint":   # nanos-as-long writer
        ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        ev = events.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )
    funnel_steps(
        ev, "user_id", "ts_us", "event_type", ["view", "click", "purchase"]
    ).groupBy("n_steps").count().orderBy("n_steps").show()

    print("== scan pruning: bloom filter on urgent orders ==")
    urgent = orders.filter("o_orderpriority = '1-URGENT'").select("o_orderkey")
    bits = bloom_filter_bits(urgent, "o_orderkey", m_bits=1 << 17, k=3)
    pruned = bloom_prune(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "l_orderkey", bits, m_bits=1 << 17, k=3,
    )
    print(
        "lineitem rows:", lineitem.count(),
        "-> bloom-pruned:", pruned.count(),
    )
    key_skew(lineitem, "l_orderkey", top_k=3).show()

    print("== CDC snapshot diff ==")
    old = orders.filter("o_orderkey % 7 != 0").select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter("o_orderkey % 5 != 0").select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1 "
            "ELSE o_totalprice END"
        ).alias("o_totalprice"),
    )
    diff_snapshots(old, new, ["o_orderkey"], ["o_totalprice"]).groupBy(
        "change_type"
    ).count().show()

    spark.stop()


if __name__ == "__main__":
    main()
