"""Golden tests for datapipe.bpe: the distributed BPE trainer/encoder vs
an independent pure-Python reference (Sennrich et al. 2016 semantics:
word-frequency table, most-frequent adjacent pair, lexicographic
tie-break, greedy left-to-right merge application)."""

import random
from collections import Counter

import pytest

from feathub_spark.datapipe.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    encode_word,
    merge_word,
    plan_merge_batch,
    word_frequencies,
)


# -- pure-Python reference -------------------------------------------------

def _ref_word_freqs(texts, lowercase=False):
    c = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split():
            c[w.lower() if lowercase else w] += 1
    return c


def _ref_merge(symbols, left, right):
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _ref_train(texts, n_merges, min_pair_count=2, end_of_word=END_OF_WORD,
               lowercase=False):
    freqs = _ref_word_freqs(texts, lowercase)
    vocab = {w: list(w) + ([end_of_word] if end_of_word else [])
             for w in freqs}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, n in freqs.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max count, then lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        for w in vocab:
            vocab[w] = _ref_merge(vocab[w], l, r)
    return merges


def _ref_encode(text, merges, end_of_word=END_OF_WORD, lowercase=False):
    if text is None:
        return []
    ranks = {(l, r): rank for rank, l, r, _ in merges}
    toks = []
    for w in text.split():
        if lowercase:
            w = w.lower()
        s = list(w) + ([end_of_word] if end_of_word else [])
        while len(s) > 1:
            cands = [(ranks[p], p) for p in zip(s, s[1:]) if p in ranks]
            if not cands:
                break
            _, (l, r) = min(cands)
            s = _ref_merge(s, l, r)
        toks.extend(s)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new wider wide",
    "the low new wide river low",
    None,
    "",
    "éé éclair éclair ééé",  # multibyte
    "aaa aaaa aa aaa",       # overlapping-pair greediness
]


def test_merge_word_greedy_left_to_right():
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(["x", "a", "a", "y"], "a", "a") == ["x", "aa", "y"]
    assert merge_word([], "a", "a") == []


def test_word_frequencies_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {r["word"]: r["n"] for r in word_frequencies(df, "text").collect()}
    assert got == dict(_ref_word_freqs(TEXTS))


@pytest.mark.parametrize("lowercase", [False, True])
@pytest.mark.parametrize("local_threshold", [131_072, 0])
def test_bpe_train_matches_reference(spark, lowercase, local_threshold):
    """Both the driver-side fast path (default) and the distributed
    job-per-round loop (local_vocab_threshold=0) must match the
    sequential reference."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(
            df, "text", n_merges=12, lowercase=lowercase,
            local_vocab_threshold=local_threshold,
        ).orderBy("rank").collect()
    ]
    assert got == _ref_train(TEXTS, 12, lowercase=lowercase)
    assert len(got) > 0


def test_bpe_train_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    # every pair occurs exactly once -> below the default min of 2
    assert bpe_train(df, "text", n_merges=5).count() == 0


def test_bpe_encode_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(df, "text", n_merges=10)
    ref_merges = _ref_train(TEXTS, 10)
    out = bpe_encode(df.withColumn("i", __import__("pyspark").sql.functions.monotonically_increasing_id()),
                     "text", merges)
    got = {r["text"]: (r["tokens"], r["n_tokens"]) for r in out.collect()}
    for t in TEXTS:
        if t is None:
            continue
        exp = _ref_encode(t, ref_merges)
        assert got[t] == (exp, len(exp)), t
    # NULL text encodes to an empty token array, not NULL
    null_rows = [r for r in out.collect() if r["text"] is None]
    assert null_rows and null_rows[0]["tokens"] == [] and null_rows[0]["n_tokens"] == 0


def test_bpe_randomized_roundtrip_property(spark):
    """Fuzz: trained-then-encoded tokens always reassemble the original
    word (concatenation modulo the end-of-word marker), and the spark
    pipeline tracks the reference on random corpora."""
    rnd = random.Random(17)
    words = ["".join(rnd.choice("abcde") for _ in range(rnd.randrange(1, 8)))
             for _ in range(30)]
    texts = [" ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 20)))
             for _ in range(25)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_df = bpe_train(df, "text", n_merges=15)
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in merges_df.orderBy("rank").collect()]
    assert got == _ref_train(texts, 15)
    out = bpe_encode(df, "text", merges_df).collect()
    for r in out:
        rebuilt = "".join(r["tokens"]).replace(END_OF_WORD, " ").strip()
        assert rebuilt == " ".join(r["text"].split())


def _batched_train(texts, n_merges, min_pair_count=2, end_of_word=END_OF_WORD,
                   top_k=8):
    """Pure-Python mirror of bpe_train's batched control flow — exercises
    plan_merge_batch without Spark so the fuzz loop can run hundreds of
    corpora."""
    freqs = _ref_word_freqs(texts)
    vocab = {w: list(w) + ([end_of_word] if end_of_word else [])
             for w in freqs}
    merges = []
    while len(merges) < n_merges:
        pairs = Counter()
        for w, n in freqs.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += n
        rows = sorted(
            ((l, r, c) for (l, r), c in pairs.items()),
            key=lambda x: (-x[2], x[0], x[1]),
        )[:top_k]
        batch, stop = plan_merge_batch(
            rows, n_merges - len(merges), min_pair_count,
            truncated=len(rows) == top_k,
        )
        if not batch:
            break
        for l, r, c in batch:
            merges.append((len(merges), l, r, c))
            for w in vocab:
                vocab[w] = _ref_merge(vocab[w], l, r)
    return merges


def test_plan_merge_batch_accepts_top1():
    rows = [("a", "b", 10), ("a", "c", 9)]
    batch, stop = plan_merge_batch(rows, 5, 2, truncated=False)
    assert batch[0] == ("a", "b", 10) and not stop


def test_plan_merge_batch_stops_on_floor_only_when_empty():
    batch, stop = plan_merge_batch([("a", "b", 1)], 5, 2, truncated=False)
    assert batch == [] and stop
    # sub-floor row AFTER an accepted pair ends the batch but not training:
    # minted pairs may still clear the floor next round
    batch, stop = plan_merge_batch(
        [("a", "b", 10), ("c", "d", 1)], 5, 2, truncated=False
    )
    assert batch == [("a", "b", 10)] and not stop


def test_plan_merge_batch_rejects_symbol_overlap():
    # (b, c) shares b with (a, b); (x, ab) collides with the created string
    rows = [("a", "b", 100), ("b", "c", 90), ("x", "ab", 80)]
    batch, _ = plan_merge_batch(rows, 5, 2, truncated=False)
    assert batch == [("a", "b", 100)]


def test_batched_trainer_matches_sequential_reference_fuzz():
    """The load-bearing equivalence test: batched training must be
    BIT-IDENTICAL to one-merge-at-a-time greedy training on adversarial
    corpora (tiny alphabets force created-symbol collisions; small top_k
    forces the truncation bounds)."""
    rnd = random.Random(4242)
    for trial in range(300):
        alpha = "ab cde abcd abcde".split()[trial % 4]
        words = ["".join(rnd.choice(alpha) for _ in range(rnd.randrange(1, 9)))
                 for _ in range(rnd.randrange(3, 25))]
        texts = [" ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 15)))
                 for _ in range(rnd.randrange(2, 12))]
        n_merges = rnd.randrange(1, 20)
        floor = rnd.choice([1, 2, 3])
        eow = rnd.choice([END_OF_WORD, ""])
        top_k = rnd.choice([3, 6, 50])
        got = _batched_train(texts, n_merges, min_pair_count=floor,
                             end_of_word=eow, top_k=top_k)
        exp = _ref_train(texts, n_merges, min_pair_count=floor,
                         end_of_word=eow)
        assert got == exp, (trial, alpha, n_merges, floor, eow, top_k, texts)


def test_local_trainer_matches_sequential_reference_fuzz():
    """The driver-side incremental-statistics trainer must be
    bit-identical to the naive recount-every-round reference — the
    incremental bookkeeping (per-word stat subtraction, containment
    index upkeep) is the bug-prone part."""
    from feathub_spark.datapipe.bpe import _train_local

    rnd = random.Random(987)
    for trial in range(300):
        alpha = "ab cde abcd abcde".split()[trial % 4]
        words = ["".join(rnd.choice(alpha) for _ in range(rnd.randrange(1, 9)))
                 for _ in range(rnd.randrange(3, 25))]
        texts = [" ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 15)))
                 for _ in range(rnd.randrange(2, 12))]
        n_merges = rnd.randrange(1, 20)
        floor = rnd.choice([1, 2, 3])
        eow = rnd.choice([END_OF_WORD, ""])
        freqs = sorted(_ref_word_freqs(texts).items())
        got = _train_local(freqs, n_merges, floor, eow)
        exp = _ref_train(texts, n_merges, min_pair_count=floor, end_of_word=eow)
        assert got == exp, (trial, alpha, n_merges, floor, eow, texts)


def test_encode_word_unknown_chars_pass_through():
    ranks = {("a", "b"): 0}
    assert encode_word("zq", ranks, end_of_word="") == ["z", "q"]
    assert encode_word("ab", ranks, end_of_word="") == ["ab"]
