"""End-to-end LLM training-data pipeline over the datapipe operators:

    raw corpus
      -> Unicode normalization (NFC + casefold, Arrow-batched)
      -> PII scrub (regexp codegen, no shuffle)
      -> quality + repetition + unigram-surprisal signals
      -> duplicate-passage REMOVAL (winnowing span cuts)
      -> near-duplicate pairs (n-gram Jaccard, posting-list candidates)
      -> connected-components clustering -> survivor selection
      -> benchmark-contamination filter (broadcast gram probe)
      -> temperature source mixing -> quantile-stratified length balance
      -> leakage-safe cluster split (near-dups never straddle train/val)
      -> BPE tokenizer trained on the surviving corpus
      -> deterministic sharding -> sequence packing

Every stage is a DataFrame transformation — the whole pipeline is one lazy
plan per output, scales by partitioning (no driver-side loops), and each
operator is oracle-verified in __spark_entry__.py.

Runs on the bundled test data:
    python examples/training_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feathub_spark import default_spark_session
from feathub_spark.datapipe.bpe import bpe_encode, bpe_train
from feathub_spark.datapipe.dedup import (
    dedup_clusters,
    ngram_jaccard_pairs,
    select_survivors,
)
from feathub_spark.datapipe.passages import remove_duplicate_passages
from feathub_spark.datapipe.quality import (
    contamination_check,
    repetition_signals,
    token_surprisal,
)
from feathub_spark.datapipe.sampling import (
    assign_shards,
    assign_splits,
    pack_sequences,
    quantile_stratified_sample,
    temperature_sample,
)
from feathub_spark.datapipe.text import (
    analyze_documents,
    normalize_text,
    pii_scrub,
    token_count,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = default_spark_session("training_data_pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"corpus: {docs.count()} documents")

    # 1. Unicode normalization, PII scrub, per-document text features
    normed = normalize_text(docs, "text").withColumn(
        "text", F.col("norm_text")
    ).drop("norm_text")
    clean = pii_scrub(normed).withColumn("text", F.col("clean_text")).drop("clean_text")
    featured = analyze_documents(clean)

    # 2. repetition + surprisal signals; drop repetitive/outlier docs
    signals = repetition_signals(featured, "text")
    surp = token_surprisal(featured, "text", "doc_id")
    kept = signals.join(
        surp.select("doc_id", "avg_surprisal"), "doc_id"
    ).filter(
        (F.col("top2_frac") < 0.2) & (F.col("dup5_frac") < 0.3)
        & (F.col("quality") > 0.3)
        & (F.col("avg_surprisal") > 2.0)  # cut the boilerplate tail
    )
    print(f"after quality/repetition/surprisal cuts: {kept.count()}")

    # 2b. cut corpus-duplicated passages out of the surviving text
    cuts = remove_duplicate_passages(kept, "text", "doc_id", gram_len=20, window=8)
    kept = kept.drop("text").join(
        cuts.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )
    print("passage cuts:", cuts.agg(F.sum("n_dup_chars")).collect()[0][0], "chars removed")

    # 3. near-dup pairs -> clusters -> one survivor per cluster
    pairs = ngram_jaccard_pairs(kept, "text", "doc_id", n=3, threshold=0.5)
    survivors = select_survivors(kept, pairs, "doc_id", "n_chars")
    deduped = kept.join(
        survivors.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    print(f"after near-dup removal: {deduped.count()}")

    # 4. benchmark contamination: drop docs overlapping the held-out set
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    contam = contamination_check(deduped, benchmark, "text", "doc_id", n=5)
    final_docs = deduped.join(
        contam.filter(F.col("contamination") < 0.5).select("doc_id"), "doc_id"
    )
    print(f"after contamination filter: {final_docs.count()}")

    # 5. temperature source mixing + length balancing
    mixed = temperature_sample(
        final_docs, "doc_id", "lang", target_rows=300, alpha=0.7, seed=7
    )
    mixed = quantile_stratified_sample(
        mixed.withColumn("text_len", F.length("text")),
        "doc_id", "text_len", n_bins=4,
        fractions=[1.0, 1.0, 0.9, 0.7], seed=7,  # trim the longest tail
    )

    # 5b. leakage-safe split: hash over the near-dup CLUSTER, so held-out
    # data is never a near-copy of training data
    labels = dedup_clusters(pairs).withColumnRenamed("id", "doc_id")
    with_cluster = mixed.join(labels, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    # NOTE: a DIFFERENT seed than the sampling stages above — sampling kept
    # only ids with hash_fraction(id, 7) below the keep rate, so re-using
    # seed 7 here would never reach the upper (valid) band of the ladder
    split = assign_splits(
        with_cluster, "doc_id", {"train": 0.9, "valid": 0.1},
        seed=13, group_col="cluster_id",
    )
    print("splits:", sorted(
        (r["split"], r["n"]) for r in
        split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    ))

    # 5c. BPE tokenizer trained on the surviving training text
    train_docs = split.filter(F.col("split") == "train")
    merges = bpe_train(train_docs, "text", n_merges=10, lowercase=True)
    encoded = bpe_encode(train_docs, "text", merges, lowercase=True)
    print("bpe:", merges.count(), "merges;",
          encoded.agg(F.sum("n_tokens")).collect()[0][0], "subword tokens")

    # 6. deterministic shards -> packing
    sharded = assign_shards(mixed, "doc_id", n_shards=4, seed=7)
    packed = pack_sequences(
        mixed.withColumn("n_tok", token_count("text")),
        "doc_id", "n_tok", max_tokens=2048, n_shards=4, seed=7,
    )
    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.max("pack_id").alias("max_pack"),
        F.sum("n_tok").alias("total_tokens"),
    ).collect()[0]
    print(
        f"packed {stats['docs']} docs, {stats['total_tokens']} tokens, "
        f"max pack id {stats['max_pack']}; shard sizes: "
        f"{sorted((r['shard'], r['n']) for r in sharded.groupBy('shard').agg(F.count(F.lit(1)).alias('n')).collect())}"
    )


if __name__ == "__main__":
    main()
