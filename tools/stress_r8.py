"""10x stress for the round-8 operators (verify-skill rule: unit-scale
plans can still be quadratic or single-task at 10x).  Prints wall seconds
per case; linear-ish growth and no blow-up = pass.

Usage: python tools/stress_r8.py [scale]   # default 10
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
    out = fn()
    print(f"{label:58s} {time.time() - t0:7.2f}s")
    return out


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import numpy as np

    from pyspark.sql import functions as F

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches

    spark = default_spark_session("stress_r8", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(3)

    # --- corpus: 5k docs * scale, ~120 words each, 10% near-dup pairs ----
    n_docs = 500 * scale
    words = [f"w{i}" for i in range(5000)]
    texts = []
    for i in range(n_docs):
        body = " ".join(rnd.choice(words) for _ in range(120))
        texts.append((i, body))
        if i % 10 == 0:
            texts.append((n_docs + i, body + " tail variation " + words[i % 5000]))
    docs = spark.createDataFrame(texts, "doc_id long, text string").repartition(16)
    docs.persist().count()

    from feathub_spark.datapipe.bpe import bpe_encode, bpe_train

    merges = timed(
        f"bpe_train 10 merges ({len(texts)} docs)",
        lambda: bpe_train(docs, "text", n_merges=10),
    )
    timed(
        "bpe_encode full corpus",
        lambda: bpe_encode(docs, "text", merges)
        .agg(F.sum("n_tokens")).first(),
    )
    release_caches()

    from feathub_spark.datapipe.dedup import (
        dedup_clusters,
        match_minhash_index,
        minhash_index,
    )

    old = docs.filter(F.col("doc_id") < n_docs)
    new = docs.filter(F.col("doc_id") >= n_docs)
    idx = minhash_index(old, "text", "doc_id")
    timed(
        f"minhash_index+match ({n_docs} hist, {len(texts) - n_docs} new)",
        lambda: match_minhash_index(new, idx, "text", "doc_id", threshold=0.5)
        .count(),
    )
    release_caches()

    # --- star CC: hot hub + long chain, 10x edges ------------------------
    hub = [(0, i) for i in range(1, 2000 * scale)]
    chain = [(100_000 + i, 100_001 + i) for i in range(200)]
    pairs = spark.createDataFrame(hub + chain, "id_a long, id_b long")
    labels = timed(
        f"dedup_clusters star (hub {2000 * scale} + chain 200)",
        lambda: dedup_clusters(pairs, algorithm="star", max_iterations=25)
        .agg(F.countDistinct("cluster_id")).first(),
    )
    assert labels[0] == 2, labels

    from feathub_spark.datapipe.layout import zorder_layout

    pts = spark.range(50_000 * scale).select(
        (F.xxhash64("id") % 65536).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 65536).alias("y"),
    )
    timed(
        f"zorder_layout ({50_000 * scale} rows, 32 parts)",
        lambda: zorder_layout(pts, ["x", "y"], num_partitions=32)
        .write.format("noop").mode("overwrite").save(),
    )

    from feathub_spark.datapipe.decompose import pca_project

    emb = spark.range(10_000 * scale).select(
        F.expr(
            "transform(sequence(1, 64), j -> "
            "CAST(xxhash64(id, j) % 1000 AS DOUBLE) / 250.0)"
        ).alias("v")
    )
    timed(
        f"pca_project whiten k=16 ({10_000 * scale} x 64)",
        lambda: pca_project(emb, "v", k=16, whiten=True)
        .write.format("noop").mode("overwrite").save(),
    )

    from feathub_spark.datapipe.profile import approx_quantiles

    big = spark.range(1_000_000 * scale).select(
        (F.xxhash64("id") % 100000).cast("double").alias("v"),
        (F.col("id") % 7).alias("g"),
    )
    timed(
        f"approx_quantiles per-group ({1_000_000 * scale} rows)",
        lambda: approx_quantiles(
            big, ["v"], [0.01, 0.5, 0.99], accuracy=10_000, by=["g"]
        ).count(),
    )
    from feathub_spark.datapipe.scd import scd2_intervals, scd2_snapshot

    # hot-key shape: 1 key holds 20% of the change log
    n_ev = 1_000_000 * scale
    log = spark.range(n_ev).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % 10_000)
        .alias("k"),
        F.col("id").alias("ts"),
        (F.xxhash64("id", F.lit(7)) % 4).cast("string").alias("v"),
    )
    iv = timed(
        f"scd2_intervals hot-key ({n_ev} rows, 20% one key)",
        lambda: scd2_intervals(log, "k", "ts", "v"),
    )
    timed(
        "scd2_snapshot over those intervals",
        lambda: scd2_snapshot(iv, n_ev // 2).count(),
    )
    from feathub_spark.datapipe.quality import importance_weights

    timed(
        f"importance_weights ({len(texts)} docs, 10% target)",
        lambda: importance_weights(
            docs.withColumn("tgt", F.col("doc_id") % 10 == 0),
            "text", "doc_id", "tgt",
        ).count(),
    )
    release_caches()

    from feathub_spark.datapipe.passages import dedup_paragraphs

    para_docs = docs.withColumn(
        "text",
        F.expr("concat(substr(text, 1, 60), '\\n\\n', text, '\\n\\n', "
               "substr(text, 1, 60))"),
    )
    timed(
        f"dedup_paragraphs ({len(texts)} docs, planted dups)",
        lambda: dedup_paragraphs(para_docs, "text", "doc_id")
        .write.format("noop").mode("overwrite").save(),
    )

    from feathub_spark.datapipe.similarity import (
        binarize_embeddings,
        hamming_topk,
        quantize_embeddings,
        quantized_topk,
    )

    emb2 = spark.range(20_000 * scale).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), j -> "
            "CAST(xxhash64(id, j) % 1000 AS FLOAT) / 250.0)"
        ).alias("embedding"),
    )
    dq = quantize_embeddings(emb2, "embedding")
    timed(
        f"quantized_topk[arrow default] 20q x {20_000 * scale} corpus",
        lambda: quantized_topk(
            dq, dq.filter(F.col("vec_id") < 20), "qvec", "vec_id", k=10
        ).count(),
    )
    if scale <= 1:
        # the Catalyst fold is the oracle form, not the scale path: the
        # interpreted zip_with/aggregate lambdas measured 174 s at 200k
        # corpus (r9) — only time it at unit scale
        timed(
            f"quantized_topk[sql fold] 20q x {20_000 * scale} corpus",
            lambda: quantized_topk(
                dq, dq.filter(F.col("vec_id") < 20), "qvec", "vec_id",
                k=10, impl="sql",
            ).count(),
        )
    db = binarize_embeddings(emb2, "embedding")
    timed(
        f"hamming_topk[arrow default] 20q x {20_000 * scale} corpus",
        lambda: hamming_topk(
            db, db.filter(F.col("vec_id") < 20), "bvec", "vec_id", k=10
        ).count(),
    )

    from feathub_spark.datapipe.resample import time_weighted_avg
    from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge

    n_ev2 = 1_000_000 * scale
    log2 = spark.range(n_ev2).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % 10_000)
        .alias("k"),
        F.col("id").alias("ts"),
        (F.xxhash64("id", F.lit(7)) % 4).cast("string").alias("v"),
        (F.xxhash64("id", F.lit(9)) % 100).cast("double").alias("x"),
    )
    base = scd2_intervals(log2.filter(F.col("ts") <= n_ev2 // 2), "k", "ts", "v")
    timed(
        f"scd2_merge delta={n_ev2 // 2} onto base",
        lambda: scd2_merge(
            base, log2.filter(F.col("ts") > n_ev2 // 2), "k", "ts", "v"
        ).count(),
    )
    timed(
        f"time_weighted_avg ({n_ev2} events, hot key)",
        lambda: time_weighted_avg(
            log2, "k", "ts", "x", n_ev2 // 4, 3 * n_ev2 // 4
        ).count(),
    )
    from feathub_spark.datapipe.graph import triangle_counts

    # hub graph: star center with 2k spokes * scale + ring closures; the
    # oriented wedge join must NOT explode on the hub's raw degree
    n_spokes = 2_000 * scale
    star = spark.range(1, n_spokes).select(
        F.lit(0).alias("id_a"), F.col("id").alias("id_b")
    )
    ring = spark.range(1, n_spokes - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    timed(
        f"triangle_counts hub graph ({2 * n_spokes} edges)",
        lambda: triangle_counts(star.unionByName(ring)).count(),
    )
    docs.unpersist()
    release_caches()


if __name__ == "__main__":
    main()
