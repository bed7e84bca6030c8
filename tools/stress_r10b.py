"""1x -> 10x stress for the round-10 SECOND-session changed paths
(verify-skill rule: unit-scale green is not enough).  Covers:

- label-propagation connected components on a LONG CHAIN (many rounds,
  so the mid-loop free_checkpoint fires once per round) plus dense
  blobs, checking zero residual cached RDD blocks after release;
- star CC on the same graph (per-round free of the superseded oriented
  edge list) with label/star result equality;
- undirected pagerank through the explode-symmetrize path on a
  hub-heavy graph (the union form double-ran the pair generation);
- approx_quantiles over FOUR columns (the melt bug scaled the wasted
  work linearly in the column count).

Each path runs at 1x and 10x; the wall-time ratio is printed so a
quadratic blow-up is visible (expect roughly linear, CC rounds excluded).

Usage: python tools/stress_r10b.py [scale]   # default 10
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
    dt = time.time() - t0
    print(f"[{dt:6.1f}s] {label} -> {r}")
    return dt


def cached_rdd_ids(spark):
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def run(spark, scale, rnd):
    from pyspark.sql import functions as F

    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.dedup import dedup_clusters
    from feathub_spark.datapipe.graph import pagerank
    from feathub_spark.datapipe.profile import approx_quantiles

    out = {}
    before = cached_rdd_ids(spark)

    # chain (diameter ~ 15 regardless of scale so label CC rounds stay
    # bounded) + dense blobs; ids shuffled so min-labels move
    chain_len = 15
    n_chains = 40 * scale
    n_blobs = 20 * scale
    pairs = []
    nid = 0
    for _ in range(n_chains):
        ids = [nid + j for j in range(chain_len)]
        rnd.shuffle(ids)
        pairs += list(zip(ids, ids[1:]))
        nid += chain_len
    for _ in range(n_blobs):
        ids = [nid + j for j in range(8)]
        pairs += [(a, b) for a in ids for b in ids if a < b]
        nid += 8
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(16)

    label = dedup_clusters(pdf)
    out["label_rows"] = label.count()
    label_sum = label.agg(F.sum("cluster_id")).first()[0]
    release_caches()
    assert not (cached_rdd_ids(spark) - before), "label CC left blocks"

    star = dedup_clusters(pdf, algorithm="star")
    out["star_rows"] = star.count()
    star_sum = star.agg(F.sum("cluster_id")).first()[0]
    release_caches()
    assert not (cached_rdd_ids(spark) - before), "star CC left blocks"
    assert label_sum == star_sum, (label_sum, star_sum)

    pr = pagerank(pdf, iterations=3)
    out["pagerank_rows"] = pr.count()
    release_caches()
    assert not (cached_rdd_ids(spark) - before), "pagerank left blocks"

    rows = 60_000 * scale
    df = spark.range(rows).select(
        (F.col("id") % 9973).cast("double").alias("a"),
        (F.col("id") % 101).cast("double").alias("b"),
        (F.col("id") * 7 % 977).cast("double").alias("c"),
        (F.col("id") * 13 % 31).cast("double").alias("d"),
    )
    q = approx_quantiles(
        df, ["a", "b", "c", "d"], [0.01, 0.5, 0.99], accuracy=1_000_000
    )
    out["quantile_rows"] = q.count()
    assert out["quantile_rows"] == 12
    release_caches()
    return out


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from feathub_spark import default_spark_session

    spark = default_spark_session("stress_r10b", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(1010)

    t1 = timed("all paths @1x", lambda: run(spark, 1, rnd))
    t10 = timed(f"all paths @{scale}x", lambda: run(spark, scale, rnd))
    print(f"wall ratio {scale}x/1x = {t10 / max(t1, 1e-9):.1f} "
          f"(roughly linear expected; >> {scale} means a blow-up)")


if __name__ == "__main__":
    main()
