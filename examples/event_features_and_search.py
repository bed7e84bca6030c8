"""Event-feature engineering + embedding search with the round-7 operators:

    events
      -> gap-based sessionization (labels + per-session summaries)
      -> exponentially time-decayed activity features
      -> binned interval join (events onto promo/anchor windows)
    documents
      -> unigram + Kneser-Ney bigram surprisal
      -> CCNet-style per-language quality buckets
      -> corpus drift between two snapshot halves
    embeddings
      -> PQ encode (64 floats -> 4 codes) and IVF-PQ top-k search

Every stage is a lazy DataFrame transformation; each operator is
oracle-verified in __spark_entry__.py.

Runs on the bundled test data:
    python examples/event_features_and_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feathub_spark import default_spark_session
from feathub_spark.common.caching import release_caches
from feathub_spark.datapipe.decay import time_decayed_sum
from feathub_spark.datapipe.drift import token_kl_divergence
from feathub_spark.datapipe.intervals import interval_join
from feathub_spark.datapipe.quality import (
    bigram_surprisal,
    quality_buckets,
    token_surprisal,
)
from feathub_spark.datapipe.sessions import session_stats, sessionize
from feathub_spark.datapipe.similarity import ivf_pq_topk, pq_encode


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = default_spark_session("event_features_example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("event_id", "user_id", "ts_us", "value")
    )
    gap = 8 * 3600 * 1_000_000

    labeled = sessionize(events, "user_id", "ts_us", gap, id_col="event_id")
    print("sessionized events:")
    labeled.select("event_id", "user_id", "session_id", "session_seq").show(5)

    stats = session_stats(
        events, "user_id", "ts_us", gap, id_col="event_id",
        agg_cols={"sum_value": F.round(F.sum("value"), 2)},
    )
    print("longest sessions:")
    stats.orderBy(F.col("n_events").desc()).show(5)

    decayed = time_decayed_sum(
        events, "user_id", "ts_us", "value",
        half_life_us=6 * 3600 * 1_000_000,
        window_us=2 * 86400 * 1_000_000,
        id_col="event_id",
    )
    print("recency-weighted activity:")
    decayed.select("event_id", "user_id", "decayed_sum", "n_in_window").show(5)

    anchors = events.filter(F.col("event_id") % 50 == 0).select(
        "user_id",
        F.col("event_id").alias("anchor_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + 4 * 3600 * 1_000_000).alias("end_us"),
    )
    joined = interval_join(
        events, anchors, "ts_us", "start_us", "end_us",
        keys=["user_id"], bin_us=3_600_000_000,
    )
    print(f"events inside anchor windows: {joined.count()}")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    uni = token_surprisal(docs, "text", "doc_id")
    buckets = quality_buckets(
        uni.join(docs.select("doc_id", "lang"), "doc_id"),
        "avg_surprisal", group_col="lang",
    )
    print("quality buckets per language:")
    buckets.groupBy("lang", "bucket").count().orderBy("lang", "bucket").show(9)

    bi = bigram_surprisal(docs, "text", "doc_id")
    print("bigram surprisal extremes:")
    bi.orderBy(F.col("avg_surprisal").desc()).show(3)

    drift = token_kl_divergence(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    print("snapshot drift:")
    drift.show()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    codes = pq_encode(emb, "embedding", "vec_id", m=4, n_codes=16, seed=5)
    print("PQ codes (64 floats -> 4 ints):")
    codes.show(3)
    hits = ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") < 3), "embedding", "vec_id",
        k=3, n_centroids=32, nprobe=8, m=4, n_codes=16, seed=5,
    )
    print("IVF-PQ nearest neighbors:")
    hits.orderBy("query_id", "rank").show(9)

    release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
