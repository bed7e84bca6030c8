"""1x -> 10x stress for the round-10 changed paths (verify-skill rule:
unit-scale green is not enough).  Covers:

- the checkpointed triangle-family graph core (triangle_counts /
  clustering_coefficients share one canonical+oriented edge list) on a
  hub-heavy graph — the degree-orientation degeneracy bound must hold
  and the checkpoint must materialize exactly once;
- distributed BPE training with the batched merge planner forced on
  (local_vocab_threshold=0) over a corpus whose vocabulary GROWS with
  scale, plus the driver-side fast path at the same scale;
- temperature_sample's fused rate windows with a group count that grows
  with scale.

Usage: python tools/stress_r10.py [scale]   # default 10
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

    spark = default_spark_session("stress_r10", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(10)

    # -- graph family on a hub-heavy pair graph ---------------------------
    from feathub_spark.datapipe.graph import (
        clustering_coefficients,
        triangle_counts,
    )

    n_nodes = 2_000 * scale
    hub_spokes = 500 * scale  # one 500s-degree hub: the id-ordered killer
    edges = []
    for i in range(n_nodes):
        # ring + chords: plenty of triangles without quadratic wedges
        edges.append((i, (i + 1) % n_nodes))
        edges.append((i, (i + 2) % n_nodes))
    for i in range(hub_spokes):
        edges.append((0, rnd.randrange(1, n_nodes)))
    edf = spark.createDataFrame(edges, "id_a bigint, id_b bigint")

    timed(
        f"triangle_counts ring+hub ({len(edges)} edges)",
        lambda: triangle_counts(edf).count(),
    )
    release_caches()
    timed(
        "clustering_coefficients same graph",
        lambda: clustering_coefficients(edf).count(),
    )
    release_caches()

    # -- BPE: distributed batched loop + local fast path ------------------
    from feathub_spark.datapipe.bpe import bpe_train

    vocab_words = [
        "".join(rnd.choice("abcdefgh") for _ in range(rnd.randrange(2, 10)))
        for _ in range(300 * scale)
    ]
    texts = [
        " ".join(rnd.choice(vocab_words) for _ in range(rnd.randrange(5, 40)))
        for _ in range(400 * scale)
    ]
    tdf = spark.createDataFrame([(t,) for t in texts], "text string")

    dist = timed(
        f"bpe_train distributed batched ({len(texts)} docs, vocab ~{300*scale})",
        lambda: [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(
                tdf, "text", n_merges=12, local_vocab_threshold=0
            ).orderBy("rank").collect()
        ],
    )
    release_caches()
    loc = timed(
        "bpe_train driver-side fast path (same corpus)",
        lambda: [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(tdf, "text", n_merges=12).orderBy("rank").collect()
        ],
    )
    release_caches()
    assert dist == loc, "distributed and local BPE paths diverged"
    print(f"          bpe paths identical ({len(loc)} merges)")

    # -- temperature_sample with a growing group count --------------------
    from feathub_spark.datapipe.sampling import temperature_sample

    rows = [
        (i, f"g{rnd.randrange(20 * scale)}")
        for i in range(20_000 * scale)
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, lang string")
    timed(
        f"temperature_sample ({len(rows)} rows, {20*scale} groups)",
        lambda: temperature_sample(
            sdf, "doc_id", "lang", target_rows=len(rows) // 4, seed=3
        ).count(),
    )
    release_caches()


if __name__ == "__main__":
    main()
