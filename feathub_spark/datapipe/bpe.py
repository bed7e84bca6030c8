"""Byte-pair-encoding tokenizer training and encoding, distributed.

The Sennrich et al. 2016 BPE procedure ("Neural Machine Translation of
Rare Words with Subword Units"): start from characters, repeatedly merge
the most frequent adjacent symbol pair.  The scalable insight is that BPE
trains on the WORD-FREQUENCY table, not the corpus: one shuffle reduces
N tokens to V distinct words with counts, and every merge iteration then
works on the vocab table (V rows, bounded by distinct-word count — at web
scale ~10^8, vs 10^12+ corpus tokens).  Plan shape per iteration:

- adjacent-pair extraction is a narrow per-row transform over each word's
  symbol array, weighted by the word count;
- the pair count is one map-side-combinable groupBy; the argmax is a
  TakeOrderedAndProject (count DESC, then lexicographic — fully
  deterministic), ONE row to the driver per iteration (bounded control
  flow, same posture as pagerank / dedup_clusters);
- the merge applies to the vocab table via an Arrow-batched pandas UDF
  (greedy left-to-right, the reference semantics), with localCheckpoint
  truncating lineage so n_merges iterations don't stack plans.

Encoding broadcasts the learned merge ranks (n_merges entries — tiny) and
applies them per document in one narrow mapInPandas-style pass, memoizing
per distinct word within each batch.

At 100 TB: train on the word-frequency table of a SAMPLE (the standard
practice — pass a pre-sampled df; merges stabilize long before full-corpus
counts), then encode the full corpus with the broadcast merge table — the
encode pass is embarrassingly parallel.

No reference counterpart: feathub has no tokenizer surface; this module is
beyond-reference capability alongside datapipe/text.py's frequency-vocab
tokenizer (tokenize_to_ids).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.caching import register_cache
from feathub_spark.common.parallelism import ensure_parallelism

END_OF_WORD = "</w>"

_WORD_SPLIT = r"\s+"


def merge_word(symbols: Sequence[str], left: str, right: str) -> List[str]:
    """Apply ONE merge to a symbol sequence, greedy left-to-right (the
    Sennrich reference semantics: after merging at position i, scanning
    resumes at i+2, so "aaa" under merge (a,a) becomes [aa, a])."""
    out: List[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def encode_word(word: str, ranks: dict, end_of_word: str = END_OF_WORD) -> List[str]:
    """Encode one word with a trained merge-rank dict {(l, r): rank}:
    repeatedly apply the LOWEST-rank pair present (exactly the order the
    merges were learned), greedy left-to-right within each application."""
    syms: List[str] = list(word)
    if end_of_word:
        syms.append(end_of_word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair[0], best_pair[1])
    return syms


def word_frequencies(
    df: DataFrame, text_col: str, lowercase: bool = False
) -> DataFrame:
    """(word, n) over whitespace-split tokens — the table BPE trains on.
    One explode + one map-side-combinable groupBy."""
    w = F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), _WORD_SPLIT))
    out = (
        ensure_parallelism(df)
        .select(w.alias("word"))
        .filter(F.col("word") != "")
    )
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _merge_udf(left: str, right: str):
    """pandas_udf applying one merge — a factory so the pair is bound at
    creation (a loop-scope closure would see mutated values if the lazy
    localCheckpoint ever recomputed after the loop advanced)."""

    @F.pandas_udf("array<string>")
    def apply_merge(col):
        return col.apply(lambda s: merge_word(s, left, right))

    return apply_merge


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_count: int = 2,
    end_of_word: str = END_OF_WORD,
    lowercase: bool = False,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns a DataFrame
    (rank int, left string, right string, pair_count bigint) ordered by
    rank — the merge table :func:`bpe_encode` consumes.

    Ties on pair count break lexicographically on (left, right), so the
    result is fully deterministic and reproducible by the pure-Python
    reference in tests/test_bpe.py.  Stops early when the best remaining
    pair occurs fewer than ``min_pair_count`` times (weighted by word
    frequency)."""
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col, lowercase=lowercase)
    # char-split plus the end-of-word marker as its own symbol
    syms = F.split(F.col("word"), "")
    if end_of_word:
        syms = F.concat(syms, F.array(F.lit(end_of_word)))
    # cache populates on the first iteration's top-1 collect — no separate
    # count() job (at 20+ merges the per-iteration JOB COUNT is the cost)
    cur = register_cache(vocab.select(syms.alias("s"), "n"))

    merges: List[Tuple[int, str, str, int]] = []
    pair_expr = (
        "transform(sequence(1, size(s) - 1), "
        "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"
    )
    try:
        for rank in range(int(n_merges)):
            top = (
                cur.filter(F.size("s") >= 2)
                .select(F.explode(F.expr(pair_expr)).alias("p"), "n")
                .groupBy("p.l", "p.r")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_pair_count:
                break
            left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((rank, left, right, c))
            nxt = register_cache(
                cur.select(_merge_udf(left, right)(F.col("s")).alias("s"), "n")
                .localCheckpoint(eager=False)
            )
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges,
    end_of_word: str = END_OF_WORD,
    lowercase: bool = False,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge table (the DataFrame from
    :func:`bpe_train`, or a list of (left, right) in rank order).  Appends
    ``out_col`` (array<string>) and ``n_<out_col>`` (bigint).  The merge
    table is bounded by n_merges, so it broadcasts as a plain closure dict;
    per-batch word memoization makes the common case one dict hit per
    token.  Narrow per-row compute, zero shuffle."""
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "left", "right").orderBy("rank").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(l, r) for l, r in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    @F.pandas_udf("array<string>")
    def encode(texts):
        memo: dict = {}

        def one(text):
            if text is None:
                return []
            toks: List[str] = []
            for w in text.split():
                if lowercase:
                    w = w.lower()
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w, ranks, end_of_word)
                    memo[w] = enc
                toks.extend(enc)
            return toks

        return texts.apply(one)

    out = ensure_parallelism(df).withColumn(out_col, encode(F.col(text_col)))
    return out.withColumn(f"n_{out_col}", F.size(out_col).cast("bigint"))
