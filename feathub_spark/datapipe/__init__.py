"""Curated namespace for the training-data / corpus-processing operators.

Modules stay importable individually (``from feathub_spark.datapipe.dedup
import exact_dedup``); this package root re-exports the most-used entry
points so pipelines can read ``from feathub_spark.datapipe import ...``.
Everything here is lazy DataFrame -> DataFrame; operators that persist a
shared intermediate do so through ``feathub_spark.common.caching`` —
call ``release_caches()`` after consuming results.
"""

from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune
from feathub_spark.datapipe.dedup import (
    dedup_clusters,
    exact_dedup,
    fuzzy_match_pairs,
    match_minhash_index,
    minhash_index,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    select_survivors,
    simhash_pairs,
)
from feathub_spark.datapipe.graph import (
    clustering_coefficients,
    pagerank,
    triangle_counts,
)
from feathub_spark.datapipe.profile import (
    approx_quantiles,
    cms_heavy_hitters,
    exact_quantiles,
    hll_distinct,
    key_skew,
    numeric_histogram,
    profile_columns,
    validate_rules,
)
from feathub_spark.datapipe.quality import (
    cross_surprisal,
    importance_weights,
    quality_buckets,
    rank_normalize,
    robust_zscore,
    token_surprisal,
    winsorize,
)
from feathub_spark.datapipe.resample import resample_ffill, time_weighted_avg
from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge, scd2_snapshot
from feathub_spark.datapipe.bpe import (
    bpe_encode,
    bpe_train,
    word_frequencies,
)
from feathub_spark.datapipe.decompose import (
    fit_pca,
    pca_project,
)
from feathub_spark.datapipe.layout import (
    zorder_key,
    zorder_layout,
)
from feathub_spark.datapipe.retrieval import (
    bm25_search,
    mmr_rerank,
    phrase_search,
    rrf_fuse,
)
from feathub_spark.datapipe.sampling import (
    assign_shards,
    assign_splits,
    pack_sequences,
    ring_negative_samples,
    quantile_stratified_sample,
    stratified_sample,
    temperature_sample,
    weighted_sample,
)
from feathub_spark.datapipe.encode import target_encode
from feathub_spark.datapipe.sessions import (
    attribute_conversions,
    cohort_retention,
    funnel_steps,
    session_stats,
    sessionize,
    transition_matrix,
)
from feathub_spark.datapipe.similarity import (
    binarize_embeddings,
    binary_rerank_topk,
    brute_force_topk,
    cluster_balanced_sample,
    hamming_topk,
    ivf_pq_topk,
    ivf_topk,
    lsh_topk,
    pq_topk,
    quantize_embeddings,
    quantized_topk,
    semantic_dedup,
    train_ivf_codebook,
)
from feathub_spark.datapipe.snapshots import diff_snapshots, merge_aggregates
from feathub_spark.datapipe.text import (
    analyze_documents,
    normalize_text,
    strip_html,
    parse_json_features,
    pii_scrub,
    token_pmi,
    tokenize_to_ids,
)

__all__ = [
    "analyze_documents", "assign_shards", "assign_splits",
    "attribute_conversions", "clustering_coefficients",
    "cohort_retention", "cross_surprisal",
    "binarize_embeddings", "binary_rerank_topk", "hamming_topk",
    "bloom_filter_bits", "bloom_prune", "bm25_search", "brute_force_topk",
    "cluster_balanced_sample", "cms_heavy_hitters", "dedup_clusters",
    "diff_snapshots", "approx_quantiles", "exact_dedup", "exact_quantiles", "fuzzy_match_pairs", "fit_pca", "pca_project", "funnel_steps", "hll_distinct",
    "importance_weights", "ivf_pq_topk", "ivf_topk", "key_skew", "lsh_topk",
    "bpe_encode", "bpe_train", "word_frequencies",
    "match_minhash_index", "merge_aggregates", "minhash_index",
    "minhash_lsh_pairs", "mmr_rerank", "zorder_key", "zorder_layout",
    "ngram_jaccard_pairs", "normalize_text", "numeric_histogram",
    "pack_sequences", "pagerank", "parse_json_features", "phrase_search",
    "pii_scrub", "pq_topk", "profile_columns", "quality_buckets",
    "quantize_embeddings", "quantized_topk",
    "rank_normalize", "resample_ffill", "ring_negative_samples",
    "robust_zscore", "rrf_fuse", "select_survivors", "semantic_dedup",
    "quantile_stratified_sample", "scd2_intervals", "scd2_merge",
    "scd2_snapshot",
    "session_stats", "sessionize",
    "simhash_pairs", "stratified_sample", "strip_html",
    "target_encode", "temperature_sample", "time_weighted_avg",
    "token_pmi", "token_surprisal", "transition_matrix",
    "tokenize_to_ids", "train_ivf_codebook", "validate_rules",
    "weighted_sample", "winsorize",
]
