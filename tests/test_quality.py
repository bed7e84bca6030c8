"""Golden tests for datapipe.quality (Gopher-style repetition signals,
benchmark contamination) and dedup.select_survivors.

The repetition expectations are computed by an independent pure-Python
reference implementation so the intricate single-pass SQL fold in
``_gram_stats_sql`` (run closing, tie-breaking, finish lambda) is checked
against first-principles counts, not against itself.
"""

import re
from collections import Counter

import pytest

from feathub_spark.datapipe.dedup import select_survivors
from feathub_spark.datapipe.quality import (
    contamination_check,
    dup_ngram_char_frac,
    repetition_signals,
    top_ngram_char_frac,
)


def _ref_grams(text, n):
    # ASCII whitespace class (not \s): Python's \s is Unicode-aware (NBSP,
    # U+2028, ...) while Spark's split and DuckDB's string_split_regex treat
    # \s as ASCII — keep the reference aligned with the engines under test.
    toks = [t for t in re.split(r"[ \t\n\r\f\v]+", text.strip().lower()) if t]
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    # strict semantics (review finding): a document shorter than n tokens
    # has NO n-grams — the old whole-text fallback gram scored every
    # short doc as maximally repetitive (top-frac 1.0)
    return []


def _ref_stats(text, n):
    c = Counter(_ref_grams(text, n))
    total = sum(cnt * len(g) for g, cnt in c.items())
    if total == 0:
        return 0.0, 0.0
    dup = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
    top_n = max(c.values())
    top_g = min(g for g, cnt in c.items() if cnt == top_n)
    top_chars = top_n * len(top_g)
    return round(top_chars / total, 6), round(dup / total, 6)


DOCS = [
    (0, "a a a a"),
    (1, "x y x y z"),
    (2, "a b c d"),
    (3, ""),
    (4, "   "),
    (5, "single"),
    (6, "the cat sat on the mat and the cat ran"),
    (7, "one two three one two three one two three"),
    (8, "Mixed CASE    spacing\tand   tabs here"),
]


def test_top_and_dup_ngram_frac_match_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for n in (2, 3, 5):
        out = {
            r["doc_id"]: (r["top"], r["dup"])
            for r in df.select(
                "doc_id",
                top_ngram_char_frac("text", n).alias("top"),
                dup_ngram_char_frac("text", n).alias("dup"),
            ).collect()
        }
        for doc_id, text in DOCS:
            exp_top, exp_dup = _ref_stats(text, n)
            got_top, got_dup = out[doc_id]
            assert got_top == pytest.approx(exp_top, abs=1e-9), (n, doc_id)
            assert got_dup == pytest.approx(exp_dup, abs=1e-9), (n, doc_id)


def test_repetition_signals_columns(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df, "text").collect()}
    assert set(out[0].asDict()) == {
        "doc_id",
        "text",
        "top2_frac",
        "top3_frac",
        "dup5_frac",
    }
    for doc_id, text in DOCS:
        exp_top2, _ = _ref_stats(text, 2)
        exp_top3, _ = _ref_stats(text, 3)
        _, exp_dup5 = _ref_stats(text, 5)
        r = out[doc_id]
        assert r["top2_frac"] == pytest.approx(exp_top2, abs=1e-9), doc_id
        assert r["top3_frac"] == pytest.approx(exp_top3, abs=1e-9), doc_id
        assert r["dup5_frac"] == pytest.approx(exp_dup5, abs=1e-9), doc_id


def test_gram_stats_tie_prefers_lexicographically_smallest(spark):
    # all bigrams occur exactly once -> champion is the smallest gram
    df = spark.createDataFrame([(0, "b a c a")], "doc_id long, text string")
    row = df.select(top_ngram_char_frac("text", 2).alias("f")).collect()[0]
    # grams: "b a", "a c", "c a" each len 3, once -> top = "a c", 3/9
    assert row["f"] == pytest.approx(round(3 / 9, 6))


def test_gram_stats_closes_last_run(spark):
    # the most frequent gram is the LAST run of the sorted array ("z z");
    # without the finish lambda the fold would miss it
    df = spark.createDataFrame([(0, "z z z a b")], "doc_id long, text string")
    row = df.select(top_ngram_char_frac("text", 2).alias("f")).collect()[0]
    # bigrams: "z z" x2, "z a", "a b"; sorted puts "z z" last.
    # total = 2*3 + 3 + 3 = 12, top = 6
    assert row["f"] == pytest.approx(0.5)


def test_contamination_check(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "totally different words here"),
            (4, "x"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta zeta")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(docs, bench, "text", "doc_id", n=3).collect()
    }
    # bench 3-grams: {alpha beta gamma, beta gamma delta, gamma delta zeta}
    # doc 1 grams: {alpha beta gamma, beta gamma delta} -> 2/2 hits
    assert (out[1]["n_grams"], out[1]["n_hits"]) == (2, 2)
    assert out[1]["contamination"] == pytest.approx(1.0)
    # doc 2 grams: {alpha beta gamma, beta gamma epsilon} -> 1/2
    assert (out[2]["n_grams"], out[2]["n_hits"]) == (2, 1)
    assert out[2]["contamination"] == pytest.approx(0.5)
    # doc 3: no overlap
    assert (out[3]["n_grams"], out[3]["n_hits"]) == (2, 0)
    assert out[3]["contamination"] == pytest.approx(0.0)
    # doc 4: shorter than n -> single full-join gram, no hit
    assert (out[4]["n_grams"], out[4]["n_hits"]) == (1, 0)


def test_contamination_counts_distinct_grams_once(spark):
    # the same contaminated gram repeated in a doc counts once (distinct)
    docs = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    row = contamination_check(docs, bench, "text", "doc_id", n=3).collect()[0]
    # distinct 3-grams of doc 1: {a b c, b c a, c a b} -> 1 hit of 3
    assert (row["n_grams"], row["n_hits"]) == (3, 1)
    assert row["contamination"] == pytest.approx(round(1 / 3, 6))


def test_select_survivors(spark):
    rows = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 5), (5, 5), (6, 99)],
        "id long, sz long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r
        for r in select_survivors(rows, pairs, "id", "sz").collect()
    }
    assert len(out) == 6
    # cluster {1,2,3}: 2 has the largest sz
    assert [out[i]["keep"] for i in (1, 2, 3)] == [0, 1, 0]
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    # cluster {4,5}: tie on sz -> smallest id survives
    assert (out[4]["keep"], out[5]["keep"]) == (1, 0)
    # unpaired row is its own singleton cluster and survives
    assert (out[6]["cluster_id"], out[6]["keep"]) == (6, 1)


def test_select_survivors_keeps_exactly_one_per_cluster(spark):
    rows = spark.createDataFrame(
        [(i, i % 3) for i in range(20)], "id long, sz long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)], "id_a long, id_b long"
    )
    out = select_survivors(rows, pairs, "id", "sz")
    per_cluster = {}
    for r in out.collect():
        per_cluster.setdefault(r["cluster_id"], []).append(r["keep"])
    for cid, keeps in per_cluster.items():
        assert sum(keeps) == 1, cid


def test_token_surprisal_matches_python_model(spark):
    import math
    from collections import Counter

    from feathub_spark.datapipe.quality import token_surprisal

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "zyzzyva qwerty"),
        (4, "   "),
    ]
    toks = {
        i: [t for t in re.split(r"[ \t\n\r\f\v]+", s.strip().lower()) if t]
        for i, s in rows
    }
    cnt = Counter(t for ts in toks.values() for t in ts)
    N = sum(cnt.values())
    exp = {}
    for i, ts in toks.items():
        if not ts:
            continue  # token-less docs drop out (documented inner join)
        surp = [-math.log2(cnt[t] / N) for t in ts]
        exp[i] = (len(ts), round(sum(surp) / len(surp), 6))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_surprisal"])
        for r in token_surprisal(df, "text", "doc_id").collect()
    }
    assert got == exp
    # the all-common-token doc scores lower than the rare-token doc
    assert got[2][1] < got[3][1]
    assert 4 not in got


def test_compression_ratio_matches_zlib(spark):
    import zlib

    from feathub_spark.datapipe.quality import compression_ratio

    rows = [
        (1, "abc " * 200),                       # highly repetitive
        (2, "The quick brown fox jumps over the lazy dog; varied prose."),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df, "text", "doc_id").collect()
    }
    for i, t in rows:
        if not t:
            assert got[i] == 0.0
        else:
            raw = t.encode()
            assert got[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert got[1] < 0.1 < got[2]


def test_bigram_surprisal_matches_python_model(spark):
    """Interpolated KN-backoff bigram surprisal vs a direct python replay
    of the same model (counts, prefix totals, continuation counts)."""
    import math
    from collections import Counter

    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.quality import bigram_surprisal

    docs = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "a dog sat",
        4: "single",          # < 2 tokens -> drops out
        5: "",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    lam = 0.75

    pairs = {
        i: list(zip(t.split(), t.split()[1:]))
        for i, t in ((i, v.lower()) for i, v in docs.items())
    }
    bi = Counter(p for ps in pairs.values() for p in ps)
    n1 = Counter()
    cont = Counter()
    for (p, c), n in bi.items():
        n1[p] += n
        cont[c] += 1
    ty = len(bi)

    def score(p, c):
        return -math.log2(lam * (bi[(p, c)] / n1[p]) + (1 - lam) * (cont[c] / ty))

    expected = {
        i: (len(ps), round(sum(score(*x) for x in ps) / len(ps), 6))
        for i, ps in pairs.items() if ps
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_surprisal"])
        for r in bigram_surprisal(df, "text", "doc_id", lam=lam).collect()
    }
    release_caches()
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0]
        assert abs(got[i][1] - expected[i][1]) < 1e-6
    # sub-2-token docs dropped; all-unique-prefix bigrams (p(w2|w1)=1)
    # score lowest — doc 3's bigrams are fully predictable continuations
    assert 4 not in got and 5 not in got
    assert got[3][1] == min(v[1] for v in got.values())


def test_token_kl_divergence_matches_python_model(spark):
    import math
    from collections import Counter

    from feathub_spark.datapipe.drift import token_kl_divergence

    a_docs = ["the cat sat", "the dog ran", "the the the"]
    b_docs = ["the cat sat", "a bird flew", "over the moon"]
    df_a = spark.createDataFrame([(i, t) for i, t in enumerate(a_docs)],
                                 "doc_id long, text string")
    df_b = spark.createDataFrame([(i, t) for i, t in enumerate(b_docs)],
                                 "doc_id long, text string")
    ca = Counter(w for t in a_docs for w in t.split())
    cb = Counter(w for t in b_docs for w in t.split())
    vocab = set(ca) | set(cb)
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)

    def p(w):
        return (ca[w] + 1) / (ta + v)

    def q(w):
        return (cb[w] + 1) / (tb + v)

    kl = round(sum(
        int(round(p(w) * math.log2(p(w) / q(w)) * 1e9)) for w in vocab
    ) / 1e9, 6)
    js = round(sum(
        int(round((p(w) * math.log2(p(w) / ((p(w) + q(w)) / 2))
                   + q(w) * math.log2(q(w) / ((p(w) + q(w)) / 2))) / 2 * 1e9))
        for w in vocab
    ) / 1e9, 6)

    r = token_kl_divergence(df_a, df_b, "text").collect()[0]
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (ta, tb)
    assert (r["vocab_a"], r["vocab_b"], r["vocab_union"]) == (
        len(ca), len(cb), v
    )
    assert r["kl_ab"] == kl and r["js"] == js
    # identical corpora diverge by ~zero
    same = token_kl_divergence(df_a, df_a, "text").collect()[0]
    assert same["kl_ab"] == 0.0 and same["js"] == 0.0


def test_winsorize_exact_thresholds(spark):
    """p25/p75 on 1..100: thresholds land on exact integer ranks
    (ceil semantics), clipping and flags follow the rounded value."""
    from feathub_spark.datapipe.quality import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], ["id", "v"]
    )
    out = {
        r.id: r
        for r in winsorize(df, "v", lower_pct=25, upper_pct=75).collect()
    }
    assert len(out) == 100
    lo, hi = out[1].winsor_lo, out[1].winsor_hi
    assert (lo, hi) == (25.0, 75.0)
    assert out[10].v_w == 25.0 and out[10].is_outlier
    assert out[90].v_w == 75.0 and out[90].is_outlier
    assert out[50].v_w == 50.0 and not out[50].is_outlier
    # boundary values are inside (not outliers)
    assert not out[25].is_outlier and not out[75].is_outlier
    # grouped: each group gets its own thresholds
    g = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)]
        + [("b", float(10 * i)) for i in range(1, 11)],
        ["g", "v"],
    )
    rows = winsorize(g, "v", group_col="g", lower_pct=10, upper_pct=90).collect()
    th = {(r.g): (r.winsor_lo, r.winsor_hi) for r in rows}
    assert th == {"a": (1.0, 9.0), "b": (10.0, 90.0)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, "v", lower_pct=50, upper_pct=40)


def test_validate_rules_report(spark):
    from feathub_spark.datapipe.profile import validate_rules

    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, 60.0, "A"),       # range violation
            (None, 20.0, "X"),    # null key + bad value
            (1, None, "N"),       # dup key + null quantity (range viol)
        ],
        ["k", "q", "flag"],
    )
    out = {
        r.rule: r
        for r in validate_rules(
            df,
            [
                {"rule": "not_null", "column": "k"},
                {"rule": "range", "column": "q", "lo": 0, "hi": 50,
                 "max_frac": 0.6},
                {"rule": "accepted_values", "column": "flag",
                 "values": ["A", "N", "R"]},
                {"rule": "unique", "columns": ["k"]},
                {"rule": "min_rows", "n": 10},
            ],
        ).collect()
    }
    assert out["not_null"].n_violations == 1 and not out["not_null"].passed
    # NULL q and 60.0 both violate range, but max_frac=0.6 tolerates 2/4
    assert out["range"].n_violations == 2 and out["range"].passed
    assert out["accepted_values"].n_violations == 1
    # 3 non-null keys, 2 distinct -> 1 duplicate
    assert out["unique"].n_violations == 1 and not out["unique"].passed
    assert out["min_rows"].n_violations == 6 and not out["min_rows"].passed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_rules(df, [])
    with _pytest.raises(ValueError):
        validate_rules(df, [{"rule": "nope", "column": "k"}])


def test_rank_normalize_percentiles(spark):
    from feathub_spark.datapipe.quality import rank_normalize

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10, 20, 20, 30, 40])],
        ["id", "v"],
    )
    out = {r.id: r.v_pctile for r in rank_normalize(df, "v").collect()}
    # cumulative through ties: 10->0.2, 20->0.6 (both), 30->0.8, 40->1.0
    assert out == {0: 0.2, 1: 0.6, 2: 0.6, 3: 0.8, 4: 1.0}
    g = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 100.0), ("b", 200.0)], ["g", "v"]
    )
    gout = {
        (r.g, r.v): r.v_pctile
        for r in rank_normalize(g, "v", group_col="g").collect()
    }
    assert gout == {
        ("a", 1.0): 0.5, ("a", 2.0): 1.0,
        ("b", 100.0): 0.5, ("b", 200.0): 1.0,
    }


def test_robust_zscore_outlier_immunity(spark):
    from feathub_spark.datapipe.quality import robust_zscore

    vals = [10.0] * 5 + [11.0] * 5 + [9.0] * 5 + [100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    out = {r.id: r for r in robust_zscore(df, "v").collect()}
    # median 10, MAD 1 -> z(100) = 90 / 1.4826
    assert out[15].is_outlier and abs(out[15].v_rz - 90 / 1.4826) < 1e-3
    assert not any(out[i].is_outlier for i in range(15))
    # constant group: MAD = 0 -> NULL z, never flagged
    const = spark.createDataFrame([(i, 5.0) for i in range(4)], ["id", "v"])
    rows = robust_zscore(const, "v").collect()
    assert all(r.v_rz is None and not r.is_outlier for r in rows)
    # grouped: each group judged on its own spread
    g = spark.createDataFrame(
        [("a", float(x)) for x in [1, 2, 3, 2, 1, 50]]
        + [("b", float(x)) for x in [100, 200, 300, 200, 100]],
        ["g", "v"],
    )
    got = {
        (r.g, r.v): r.is_outlier
        for r in robust_zscore(g, "v", group_col="g").collect()
    }
    assert got[("a", 50.0)] is True
    assert got[("b", 300.0)] is False


def test_importance_weights_golden(spark):
    """Hand-computed DSIR weights on a 3-doc corpus: target tokens score
    positive, off-target negative, and the exact smoothed log-ratios match
    a first-principles Python replica."""
    import math

    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.quality import importance_weights

    docs = [
        (1, "aa aa bb", True),   # target
        (2, "bb cc", False),
        (3, "aa cc cc", False),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, tgt boolean")
    out = {
        r.doc_id: r
        for r in importance_weights(df, "text", "doc_id", "tgt").collect()
    }
    release_caches()

    # replica: pooled vocab {aa,bb,cc}, alpha=0.5
    src = Counter({"aa": 3, "bb": 2, "cc": 3})
    tgt = Counter({"aa": 2, "bb": 1})
    v, a = 3, 0.5
    tot_s, tot_t = sum(src.values()), sum(tgt.values())

    def lr(t):
        return math.log((tgt[t] + a) / (tot_t + a * v)) - math.log(
            (src[t] + a) / (tot_s + a * v)
        )

    for doc_id, text, _ in docs:
        toks = text.split()
        want = round(sum(lr(t) for t in toks) / len(toks), 6)
        assert out[doc_id].n_tokens == len(toks)
        assert abs(out[doc_id].importance_weight - want) < 1e-9, (
            doc_id, out[doc_id].importance_weight, want,
        )
    # the pure-target doc outranks the pure-source docs
    assert out[1].importance_weight > out[2].importance_weight
    assert out[1].importance_weight > out[3].importance_weight


def test_cross_surprisal_golden(spark):
    """Hand-computed reference-LM scoring: known probabilities, OOV
    bucket floor, zero-token drop, and the reference never seeing the
    scored text."""
    import math

    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.quality import cross_surprisal

    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog")], "i long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "the cat"), (11, "zebra unknown"), (12, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in cross_surprisal(docs, ref, "text", "doc_id").collect()
    }
    release_caches()
    # ref counts: the:2 cat:1 sat:1 dog:1 -> N=5, V=4; denom = 5 + 0.5*5
    p_the, p_cat, p_oov = 2.5 / 7.5, 1.5 / 7.5, 0.5 / 7.5
    assert out[10].n_oov == 0
    assert abs(
        out[10].avg_surprisal
        - round((-math.log2(p_the) - math.log2(p_cat)) / 2, 6)
    ) < 1e-9
    assert out[11].n_oov == 2
    assert abs(out[11].avg_surprisal - round(-math.log2(p_oov), 6)) < 1e-9
    assert 12 not in out
    # in-domain text scores lower surprisal than out-of-domain
    assert out[10].avg_surprisal < out[11].avg_surprisal
