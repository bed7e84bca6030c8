"""10x hot-key stress for the round-7 operators (the verify-skill rule:
unit-scale-clean plans can still be quadratic at 10x).  Prints wall
seconds per case; linear-ish growth and no single-task stage = pass.

Usage: python tools/stress_r7.py [scale]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(label, df):
    t0 = time.time()
    n = df.write.format("noop").mode("overwrite").save()
    print(f"{label:40s} {time.time() - t0:7.2f}s")
    return n


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches

    spark = default_spark_session("stress_r7", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")

    n_events = 20_000 * scale
    # ONE hot user holds half the events — the skew case
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 97))
        .alias("user_id"),
        (F.col("id") * 7_000_000 % (86_400_000_000 * 30)).alias("ts_us"),
        (F.col("id") % 100 / 10.0).alias("value"),
    )

    from feathub_spark.datapipe.decay import time_decayed_sum
    from feathub_spark.datapipe.sessions import session_stats, sessionize

    timed(
        f"sessionize hot-key ({n_events} ev, 50% one user)",
        sessionize(ev, "user_id", "ts_us", 3_600_000_000, id_col="event_id"),
    )
    timed(
        "session_stats hot-key",
        session_stats(ev, "user_id", "ts_us", 3_600_000_000, id_col="event_id"),
    )
    timed(
        "decayed_sum hot-key (1h window)",
        time_decayed_sum(
            ev, "user_id", "ts_us", "value",
            half_life_us=600_000_000, window_us=3_600_000_000,
            id_col="event_id",
        ),
    )

    n_vec = 5_000 * scale
    dims = 64
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dims}), "
            f"d -> CAST(xxhash64(id, d) % 1000 AS DOUBLE) / 1000)"
        ).alias("embedding"),
    )
    from feathub_spark.datapipe.similarity import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
    )

    q = vecs.filter(F.col("vec_id") < 8)
    timed(f"pq_encode ({n_vec} vecs)", pq_encode(vecs, "embedding", "vec_id"))
    timed(
        "pq_topk full ADC scan (8 queries)",
        pq_topk(vecs, q, "embedding", "vec_id", k=10),
    )
    timed(
        "ivf_pq_topk (64 cells, nprobe 4)",
        ivf_pq_topk(vecs, q, "embedding", "vec_id", k=10),
    )

    n_docs = 5_000 * scale
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 == 0, "en").otherwise(
            F.concat(F.lit("l"), (F.col("id") % 7).cast("string"))
        ).alias("lang"),
        (F.col("id") % 1000 / 37.0).alias("score"),
    )
    from feathub_spark.datapipe.quality import quality_buckets

    timed(
        f"quality_buckets ({n_docs} docs, hot lang)",
        quality_buckets(docs, "score", group_col="lang"),
    )

    from feathub_spark.datapipe.text import chunk_documents

    texts = spark.range(2_000 * scale).select(
        F.col("id").alias("doc_id"),
        F.expr("repeat(concat('chunkable text ', CAST(id AS STRING), ' '), 200)")
        .alias("text"),
    )
    timed("chunk_documents (~4KB docs)", chunk_documents(
        texts, "text", "doc_id", chunk_size=512, overlap=64
    ))

    # ---- round-7 session-2 operators ----

    from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune
    from feathub_spark.datapipe.profile import (
        cms_heavy_hitters,
        hll_distinct,
        key_skew,
    )
    from feathub_spark.datapipe.quality import winsorize
    from feathub_spark.datapipe.retrieval import phrase_search
    from feathub_spark.datapipe.sessions import funnel_steps
    from feathub_spark.datapipe.similarity import semantic_dedup
    from feathub_spark.datapipe.snapshots import diff_snapshots
    from feathub_spark.datapipe.text import tokenize_to_ids

    timed(
        "hll_distinct (hot user col)",
        hll_distinct(ev, "user_id", ["value"], p=8),
    )
    timed("key_skew (50%-hot key)", key_skew(ev, "user_id", top_k=10))
    timed(
        "winsorize hot group",
        winsorize(ev, "value", group_col="user_id"),
    )
    timed(
        "funnel hot user (50% of events)",
        funnel_steps(
            ev.withColumn(
                "etype",
                F.element_at(
                    F.expr("array('view','click','buy','other')"),
                    (F.col("event_id") % 4 + 1).cast("int"),
                ),
            ),
            "user_id", "ts_us", "etype", ["view", "click", "buy"],
        ),
    )

    # 2% of vectors are IDENTICAL -> one pathological semantic cell; the
    # pair join inside that cell is |cell|^2 (the documented caveat)
    dup_vecs = vecs.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 50 == 0,
            F.expr(f"transform(sequence(1, {dims}), d -> CAST(1.0 AS DOUBLE))"),
        ).otherwise(F.col("embedding")),
    )
    timed(
        f"semantic_dedup ({n_vec} vecs, 2% identical)",
        semantic_dedup(dup_vecs, "embedding", "vec_id",
                       threshold=0.9, n_centroids=256),
    )
    release_caches()

    phrase_docs = spark.range(2_000 * scale).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "repeat(concat('table hash join table hash scan ', "
            "CAST(id AS STRING), ' '), 100)"
        ).alias("text"),
    )
    timed(
        "phrase_search (every doc, 200 hits/doc)",
        phrase_search(phrase_docs, "text", "doc_id", "table hash"),
    )
    timed(
        "cms_heavy_hitters (dense hit corpus)",
        cms_heavy_hitters(phrase_docs, "text", d=4, w=1024, min_count=100),
    )
    timed(
        "tokenize_to_ids (vocab 4096)",
        tokenize_to_ids(phrase_docs, "text", "doc_id", vocab_size=4096),
    )

    keys10 = spark.range(50_000 * scale).select((F.col("id") * 3).alias("k"))
    bloom = bloom_filter_bits(keys10, "k", m_bits=1 << 22, k=3)
    timed(
        f"bloom build+prune ({50_000 * scale} keys, 4M bits)",
        bloom_prune(
            spark.range(200_000 * scale).select(F.col("id").alias("k")),
            "k", bloom, m_bits=1 << 22, k=3,
        ),
    )

    old_snap = spark.range(100_000 * scale).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
    ).filter("k % 7 != 0")
    new_snap = spark.range(100_000 * scale).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 11 == 0, -1).otherwise(F.col("id") % 1000)
        .alias("v"),
    ).filter("k % 5 != 0")
    timed(
        f"diff_snapshots ({100_000 * scale} keys)",
        diff_snapshots(old_snap, new_snap, ["k"], ["v"]),
    )

    from feathub_spark.datapipe.graph import pagerank
    from feathub_spark.datapipe.quality import rank_normalize
    from feathub_spark.datapipe.resample import resample_ffill
    from feathub_spark.datapipe.profile import validate_rules
    from feathub_spark.datapipe.sampling import ring_negative_samples

    # power-law-ish graph: node 0 touches 10% of edges (hot hub)
    n_edges = 50_000 * scale
    g = spark.range(n_edges).select(
        F.when(F.col("id") % 10 == 0, 0).otherwise(F.col("id") % 4997)
        .alias("id_a"),
        (F.col("id") * 31 % 4999).alias("id_b"),
    ).filter("id_a != id_b")
    timed(f"pagerank 3 rounds ({n_edges} edges, hot hub)",
          pagerank(g, iterations=3))

    timed("rank_normalize hot group",
          rank_normalize(ev, "value", group_col="user_id"))
    timed(
        "resample_ffill hot key (hourly grid)",
        resample_ffill(ev, "user_id", "ts_us", ["value"],
                       step_us=3_600_000_000, id_col="event_id"),
    )
    timed(
        "validate_rules (5 rules, one pass)",
        validate_rules(ev, [
            {"rule": "not_null", "column": "user_id"},
            {"rule": "range", "column": "value", "lo": 0, "hi": 9},
            {"rule": "accepted_values", "column": "user_id",
             "values": list(range(97))},
            {"rule": "unique", "columns": ["event_id"]},
            {"rule": "min_rows", "n": 1000},
        ]),
    )
    timed(
        f"ring_negative_samples (1000 queries x 8 over {5_000 * scale} items)",
        ring_negative_samples(
            vecs.select("vec_id"),
            spark.range(1000).select(F.col("id").alias("q")),
            "vec_id", "q", k=8,
        ),
    )
    release_caches()


if __name__ == "__main__":
    main()
