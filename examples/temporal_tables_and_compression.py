"""Temporal tables + compressed retrieval with the round-8 operators:

    events
      -> SCD2 validity intervals from the raw change log
      -> nightly delta folded in with scd2_merge (row-identical to a
         full rebuild, but only delta keys are reworked)
      -> exact point-in-time snapshot (pushdown range filter)
      -> per-user time-weighted average value over a window (TWAP)
    documents
      -> intra-document repeated-paragraph removal (zero shuffle)
      -> DSIR importance weights against a target domain, composed with
         weighted_sample for importance resampling
    embeddings
      -> int8 quantization (4x) and 1-bit sign codes (~32x)
      -> Hamming prefilter -> exact cosine rerank (compute only on
         k*expand candidates per query)

Every stage is a lazy DataFrame transformation; each operator is
oracle-verified in __spark_entry__.py.

Runs on the bundled test data:
    python examples/temporal_tables_and_compression.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feathub_spark import default_spark_session
from feathub_spark.common.caching import release_caches
from feathub_spark.datapipe.passages import dedup_paragraphs
from feathub_spark.datapipe.quality import importance_weights
from feathub_spark.datapipe.resample import time_weighted_avg
from feathub_spark.datapipe.sampling import weighted_sample
from feathub_spark.datapipe.scd import (
    scd2_intervals,
    scd2_merge,
    scd2_snapshot,
)
from feathub_spark.datapipe.similarity import (
    binary_rerank_topk,
    quantize_embeddings,
    quantized_topk,
)

JAN_10 = 1_704_844_800_000_000
JAN_16 = 1_705_363_200_000_000
JAN_20 = 1_705_708_800_000_000


def main(sf_dir: str) -> None:
    spark = default_spark_session("temporal_tables_example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        events = events.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )

    # ---- 1. SCD2 temporal table, incrementally maintained --------------
    head = events.filter(F.col("ts_us") <= JAN_16)
    delta = events.filter(F.col("ts_us") > JAN_16)
    base = scd2_intervals(
        head, "user_id", "ts_us", "event_type", tie_cols="event_id"
    )
    merged = scd2_merge(
        base, delta, "user_id", "ts_us", "event_type", tie_cols="event_id"
    )
    print("SCD2 intervals after delta merge:", merged.count())

    snap = scd2_snapshot(merged, JAN_16)
    print("users with an active state at Jan 16:", snap.count())

    # ---- 2. time-weighted value features --------------------------------
    twa = time_weighted_avg(
        events, "user_id", "ts_us", "value", JAN_10, JAN_20,
        tie_cols=["event_id"],
    )
    twa.orderBy(F.col("twa").desc()).show(5)

    # ---- 3. corpus cleanup + domain-targeted selection ------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # plant a repeated paragraph to show the within-doc cleanup
    planted = docs.select(
        "doc_id", "lang",
        F.expr(
            "concat(substr(text, 1, 40), '\\n\\n', text, '\\n\\n', "
            "substr(text, 1, 40))"
        ).alias("text"),
    )
    cleaned = dedup_paragraphs(planted, "text", "doc_id")
    print(
        "paragraph dedup removed per doc (avg):",
        cleaned.agg(F.avg("n_removed")).first()[0],
    )

    w = importance_weights(docs, "text", "doc_id", "lang = 'de'")
    picked = weighted_sample(
        w.withColumn("wexp", F.exp(F.col("importance_weight") * 50)),
        "doc_id", "wexp", k=50, seed=7,
    )
    print("importance-resampled docs:", picked.count())
    release_caches()

    # ---- 4. compressed retrieval ----------------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)

    dq = quantize_embeddings(emb, "embedding")
    q8 = quantized_topk(
        dq, dq.filter(F.col("vec_id") < 5), "qvec", "vec_id", k=5
    )
    print("int8 top-k rows:", q8.count())

    rer = binary_rerank_topk(emb, queries, "embedding", "vec_id",
                             k=5, expand=10)
    rer.show(10)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
