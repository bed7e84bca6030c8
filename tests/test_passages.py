"""Golden tests for datapipe.passages (winnowing duplicate-passage
detection).

Expectations come from an independent pure-Python winnowing implementation
(gram hash, window-min selection, doc-frequency counting) so the Catalyst
higher-order expression pipeline is checked against first principles, plus
a property check of the winnowing guarantee itself: a planted shared
substring of length >= window + gram_len - 1 always yields a shared
fingerprint.
"""

import random

import pytest

from feathub_spark.datapipe.passages import (
    dup_passage_pairs,
    dup_passage_stats,
    winnow_fingerprints,
)

M31 = (1 << 31) - 1


def _ref_gram_hashes(text, gram_len):
    if len(text) < gram_len:
        return []
    out = []
    for i in range(len(text) - gram_len + 1):
        a, b = 7, 13
        for ch in text[i : i + gram_len]:
            c = ord(ch)
            a = (a * 1103515245 + c) % M31
            b = (b * 69069 + c) % M31
        out.append(a * 2147483648 + b)
    return out


def _ref_fingerprints(text, gram_len, window):
    hs = _ref_gram_hashes(text, gram_len)
    if not hs:
        return set()
    w_eff = min(window, len(hs))
    return {min(hs[w : w + w_eff]) for w in range(len(hs) - w_eff + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a completely different text with no overlap whatsoever here now"),
    (3, "zz the quick brown fox jumps over the lazy dog near the river bank yy"),
    (4, "short"),
    (5, ""),
    (6, "a completely different text with no overlap whatsoever here now"),
]
L, W = 8, 4


def _ref_corpus(docs=DOCS, gram_len=L, window=W):
    fp_docs = {}
    per_doc = {}
    for i, t in docs:
        fps = _ref_fingerprints(t, gram_len, window)
        per_doc[i] = fps
        for fp in fps:
            fp_docs.setdefault(fp, set()).add(i)
    return per_doc, fp_docs


def test_winnow_fingerprints_match_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: set(r["__fps__"])
        for r in winnow_fingerprints(df, "text", "doc_id", L, W, hash_fn="poly").collect()
    }
    per_doc, _ = _ref_corpus()
    assert got == per_doc


def test_dup_passage_stats_golden(spark):
    per_doc, fp_docs = _ref_corpus()
    exp = {}
    for i, fps in per_doc.items():
        shared = sum(1 for fp in fps if len(fp_docs[fp]) >= 2)
        exp[i] = (
            len(fps),
            shared,
            round(shared / len(fps), 6) if fps else 0.0,
        )
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_fingerprints"], r["n_shared"], r["dup_fraction"])
        for r in dup_passage_stats(df, "text", "doc_id", L, W, hash_fn="poly").collect()
    }
    assert got == exp
    # exact-duplicate docs (2, 6) are fully shared; short/empty docs are 0-safe
    assert got[2][2] == 1.0 and got[6][2] == 1.0
    assert got[4] == (0, 0, 0.0) and got[5] == (0, 0, 0.0)


def test_dup_passage_pairs_golden(spark):
    _, fp_docs = _ref_corpus()
    exp = {}
    for fp, ds in fp_docs.items():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                exp[(ds[x], ds[y])] = exp.get((ds[x], ds[y]), 0) + 1
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_fingerprints"]
        for r in dup_passage_pairs(
            df, "text", "doc_id", L, W, hash_fn="poly"
        ).collect()
    }
    assert got == exp
    assert (1, 3) in got and (2, 6) in got


def test_winnowing_guarantee_on_planted_passages(spark):
    """Random docs with a planted shared passage of exactly t = W + L - 1
    chars must always pair; the same corpus WITHOUT the plant (almost
    surely) must not."""
    rnd = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    passage = "".join(rnd.choice(alpha) for _ in range(W + L - 1))
    rows = []
    for i in range(12):
        filler = "".join(rnd.choice(alpha) for _ in range(120))
        if i in (3, 9):
            pos = rnd.randrange(0, len(filler) - 1)
            filler = filler[:pos] + passage + filler[pos:]
        rows.append((i, filler))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dup_passage_pairs(df, "text", "doc_id", L, W).collect()
    }
    assert (3, 9) in pairs


def test_max_doc_freq_drops_boilerplate(spark):
    boiler = "this exact license header appears in every single document"
    rows = [(i, boiler + f" unique tail {i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def ref_pairs(cap):
        _, fp_docs = _ref_corpus(rows)
        exp = {}
        for fp, ds in fp_docs.items():
            if cap is not None and len(ds) > cap:
                continue  # the doc-frequency cut drops ubiquitous fingerprints
            ds = sorted(ds)
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    exp[(ds[x], ds[y])] = exp.get((ds[x], ds[y]), 0) + 1
        return exp

    # exact-recall mode: every pair shares the boilerplate fingerprints
    allp = {
        (r["id_a"], r["id_b"]): r["n_shared_fingerprints"]
        for r in dup_passage_pairs(
            df, "text", "doc_id", L, W, max_doc_freq=None, hash_fn="poly"
        ).collect()
    }
    assert allp == ref_pairs(None)
    assert len(allp) == 45  # all C(10,2) pairs share the boilerplate
    # with a doc-frequency cap the corpus-wide boilerplate fingerprints are
    # dropped; only boundary-region fingerprints (boilerplate|tail windows
    # that winnow differently per doc) can still pair a subset of docs
    capped = {
        (r["id_a"], r["id_b"]): r["n_shared_fingerprints"]
        for r in dup_passage_pairs(
            df, "text", "doc_id", L, W, max_doc_freq=5, hash_fn="poly"
        ).collect()
    }
    assert capped == ref_pairs(5)
    assert len(capped) < len(allp)


def test_stats_plan_is_shuffle_only(spark):
    """No cartesian/broadcast-nested-loop anywhere in the stats plan."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = dup_passage_stats(df, "text", "doc_id", L, W)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _ref_remove(docs, gram_len, window, min_occ):
    from collections import Counter

    occ = []
    for i, t in docs:
        hs = _ref_gram_hashes(t, gram_len)
        sels = set()
        if hs:
            w_eff = min(window, len(hs))
            for w in range(len(hs) - w_eff + 1):
                sl = hs[w : w + w_eff]
                m = min(sl)
                sels.add((m, w + sl.index(m) + 1))  # 1-based gram position
        for fp, pos in sels:
            occ.append((i, fp, pos))
    cnt = Counter(fp for _, fp, _ in occ)
    per_doc = {}
    for i, fp, pos in occ:
        if cnt[fp] >= min_occ:
            per_doc.setdefault(i, []).append(pos)
    out = {}
    for i, t in docs:
        spans = []
        for p in sorted(per_doc.get(i, [])):
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + gram_len - 1))
            else:
                spans.append((p, p + gram_len - 1))
        kept, prev = [], 1
        for s, e in spans:
            kept.append(t[prev - 1 : s - 1])
            prev = e + 1
        kept.append(t[prev - 1 :])
        out[i] = ("".join(kept), len(spans), sum(e - s + 1 for s, e in spans))
    return out


def test_remove_duplicate_passages_golden(spark):
    from feathub_spark.datapipe.passages import remove_duplicate_passages

    docs = DOCS + [
        # within-doc repetition: the same clause twice in one document
        (7, "repeat me please repeat me please and then something else"),
    ]
    exp = _ref_remove(docs, L, W, 2)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_dup_spans"], r["n_dup_chars"])
        for r in remove_duplicate_passages(
            df, "text", "doc_id", L, W, hash_fn="poly"
        ).collect()
    }
    assert got == exp
    # exact duplicates (docs 2 and 6) are cut to (nearly) nothing
    assert len(got[2][0]) < 10 and got[2] == got[6]
    # the shared passage between docs 1 and 3 is removed from both, the
    # unique zz/yy affixes of doc 3 survive
    assert got[3][0].startswith("zz") and got[3][0].endswith("yy")
    assert got[1][1] >= 1 and got[3][1] >= 1
    # untouched docs come back verbatim with zero spans
    assert got[4] == ("short", 0, 0) and got[5] == ("", 0, 0)
    # the within-doc repeat is detected without any cross-doc copy
    assert got[7][1] >= 1 and got[7][2] > 0


def test_remove_duplicate_passages_threshold(spark):
    from feathub_spark.datapipe.passages import remove_duplicate_passages

    # passage appears in 3 docs; min_occurrences=4 leaves everything intact
    rows = [(i, f"prefix {i} common shared sentence body tail {i}") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_passages(
            df, "text", "doc_id", L, W, min_occurrences=4, hash_fn="poly"
        ).collect()
    }
    assert got == {i: t for i, t in rows}


def test_winnow_unicode_text(spark):
    """Non-ASCII chars: Spark's ascii() returns the full code point (like
    Python ord), so the poly hash stays cross-engine-consistent beyond
    ASCII; identical unicode docs still collide on every fingerprint."""
    rows = [
        (1, "héllo wörld héllo wörld répeat"),
        (2, "héllo wörld héllo wörld répeat"),
        (3, "nothing alike"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["__fps__"])
        for r in winnow_fingerprints(
            df, "text", "doc_id", L, W, hash_fn="poly"
        ).collect()
    }
    per_doc, _ = _ref_corpus(rows)  # Python ord-based reference
    assert got == per_doc
    assert got[1] == got[2] and got[1] != got[3]


def test_remove_boilerplate_lines(spark):
    from collections import defaultdict

    from feathub_spark.datapipe.passages import remove_boilerplate_lines

    header = "COPYRIGHT 2026 example corp"
    footer = "subscribe to our newsletter"
    rows = [
        (1, f"{header}\nunique body one\n\n{footer}"),
        (2, f"{header}\nunique body two\n{footer}"),
        (3, f"{header.lower()}\nunique body three"),   # case-insensitive hit
        (4, "totally independent document"),
        (5, ""),
        (6, f"repeat me\nrepeat me\nunique body six"),  # within-doc repeat only
    ]

    def ref(min_docs):
        docs_per_key = defaultdict(set)
        for i, t in rows:
            for ln in t.split("\n"):
                if ln.strip():
                    docs_per_key[ln.strip().lower()].add(i)
        out = {}
        for i, t in rows:
            lines = t.split("\n")
            removed = [
                bool(ln.strip()) and len(docs_per_key[ln.strip().lower()]) >= min_docs
                for ln in lines
            ]
            out[i] = (
                "\n".join(l for l, r in zip(lines, removed) if not r),
                len(lines),
                sum(removed),
            )
        return out

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, "text", "doc_id").collect()
    }
    assert got == ref(2)
    # headers/footers gone, bodies and blank lines kept
    assert got[1][0] == "unique body one\n"
    assert got[2][0] == "unique body two"
    assert got[3][0] == "unique body three"
    # untouched docs come back verbatim (incl. the empty doc)
    assert got[4] == ("totally independent document", 1, 0)
    assert got[5] == ("", 1, 0)
    # a line repeated only WITHIN one doc is not boilerplate
    assert got[6] == (rows[5][1], 3, 0)

    # higher threshold: the footer (2 docs) survives, the header (3) dies
    got3 = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            df, "text", "doc_id", min_docs=3
        ).collect()
    }
    assert got3 == {i: c for i, (c, _, _) in ref(3).items()}
    assert footer in got3[1] and header not in got3[1]


def test_match_against_index(spark):
    from feathub_spark.datapipe.passages import match_against_index, winnow_index

    hist = [(i, t) for i, t in DOCS if i in (1, 2)]
    new = [
        (10, DOCS[0][1]),                       # exact copy of indexed doc 1
        (11, "zz " + DOCS[0][1][:30] + " tail"),  # shares a long prefix
        (12, "entirely novel content nothing indexed matches here"),
        (13, ""),
    ]
    hist_df = spark.createDataFrame(hist, ["doc_id", "text"])
    new_df = spark.createDataFrame(new, ["doc_id", "text"])
    index = winnow_index(hist_df, "text", "doc_id", L, W, hash_fn="poly")
    got = {
        r["doc_id"]: (r["n_fingerprints"], r["n_matched"], r["dup_fraction"])
        for r in match_against_index(
            new_df, index, "text", "doc_id", L, W, hash_fn="poly"
        ).collect()
    }
    # independent reference: fingerprint sets via the pure-Python model
    hist_fps = set()
    for _, t in hist:
        hist_fps |= _ref_fingerprints(t, L, W)
    for i, t in new:
        fps = _ref_fingerprints(t, L, W)
        matched = len(fps & hist_fps)
        exp_frac = round(matched / len(fps), 6) if fps else 0.0
        assert got[i] == (len(fps), matched, exp_frac), i
    assert got[10][2] == 1.0           # exact copy fully matched
    assert got[11][1] >= 1             # shared >= t-char passage detected
    assert got[12][1] == 0 and got[13] == (0, 0, 0.0)


def test_remove_boilerplate_lines_null_text(spark):
    from feathub_spark.datapipe.passages import remove_boilerplate_lines

    rows = [(1, "shared\nbody a"), (2, "shared\nbody b"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, "text", "doc_id").collect()
    }
    # NULL-text docs are RETAINED as empty, not silently dropped
    assert got[3] == ("", 1, 0)
    assert got[1] == ("body a", 2, 1)


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_remove_duplicate_passages_randomized(spark, seed):
    """Randomized conformance: small-alphabet corpora (forcing hash-run
    ties, within-doc repeats and overlapping spans) with planted shared
    passages must match the pure-Python reference exactly — including
    span-merge boundaries and fully-cut documents."""
    rnd = random.Random(seed)
    alpha = "ab c"  # tiny alphabet: many natural repeats and collisions
    passages = [
        "".join(rnd.choice(alpha) for _ in range(rnd.randint(W + L - 1, 30)))
        for _ in range(3)
    ]
    docs = []
    for i in range(30):
        n = rnd.randint(0, 120)
        t = "".join(rnd.choice(alpha) for _ in range(n))
        # plant 0-2 shared passages at random offsets
        for _ in range(rnd.randint(0, 2)):
            p = rnd.choice(passages)
            pos = rnd.randint(0, len(t))
            t = t[:pos] + p + t[pos:]
        docs.append((i, t))
    exp = _ref_remove(docs, L, W, 2)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from feathub_spark.datapipe.passages import remove_duplicate_passages

    got = {
        r["doc_id"]: (r["clean_text"], r["n_dup_spans"], r["n_dup_chars"])
        for r in remove_duplicate_passages(
            df, "text", "doc_id", L, W, hash_fn="poly"
        ).collect()
    }
    assert got == exp


@pytest.mark.parametrize("seed,min_docs", [(5, 2), (9, 3)])
def test_remove_boilerplate_lines_randomized(spark, seed, min_docs):
    from collections import defaultdict

    from feathub_spark.datapipe.passages import remove_boilerplate_lines

    rnd = random.Random(seed)
    pool = [f"line {i} body" for i in range(8)] + ["", "   ", "UNIQ"]
    docs = []
    for i in range(25):
        k = rnd.randint(0, 6)
        lines = [rnd.choice(pool) for _ in range(k)]
        # make some lines genuinely unique to this doc
        if rnd.random() < 0.5:
            lines.append(f"only in doc {i}")
        docs.append((i, "\n".join(lines)))

    docs_per_key = defaultdict(set)
    for i, t in docs:
        for ln in t.split("\n"):
            if ln.strip():
                docs_per_key[ln.strip().lower()].add(i)
    exp = {}
    for i, t in docs:
        lines = t.split("\n")
        removed = [
            bool(ln.strip()) and len(docs_per_key[ln.strip().lower()]) >= min_docs
            for ln in lines
        ]
        exp[i] = (
            "\n".join(l for l, r in zip(lines, removed) if not r),
            len(lines),
            sum(removed),
        )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(
            df, "text", "doc_id", min_docs=min_docs
        ).collect()
    }
    assert got == exp


@pytest.mark.parametrize("hash_fn", ["poly", "xxhash64"])
@pytest.mark.parametrize("positions", [False, True])
def test_arrow_winnow_matches_sql_bit_for_bit(spark, positions, hash_fn):
    """The vectorized Arrow winnow path (impl='arrow') must reproduce the
    Catalyst SQL fold exactly — values, order, position tie-breaks, NULL and
    short-text handling, and non-ASCII code points."""
    from feathub_spark.datapipe.passages import winnow_fingerprint_positions

    rnd = random.Random(99)
    alpha = "abcde fgh\nij" + "éü中𝄞"  # multibyte + astral-plane code point
    docs = [
        (0, None),
        (1, ""),
        (2, "tiny"),
        (3, "exactly8"),  # len == gram_len
        (4, "x" * 40),  # all-equal hashes: min ties in every window
        (5, "éü中𝄞éü中𝄞éü中𝄞éü中𝄞"),
    ] + [
        (10 + i, "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 120))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fn = winnow_fingerprint_positions if positions else winnow_fingerprints
    kw = dict(gram_len=8, window=4, hash_fn=hash_fn)
    col = "__fpp__" if positions else "__fps__"
    sql = {r["doc_id"]: r[col] for r in fn(df, "text", "doc_id", impl="sql", **kw).collect()}
    arrow = {r["doc_id"]: r[col] for r in fn(df, "text", "doc_id", impl="arrow", **kw).collect()}
    assert arrow == sql


def test_impl_validation(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="impl"):
        winnow_fingerprints(df, "text", "doc_id", impl="nope")
    with pytest.raises(ValueError, match="hash_fn"):
        winnow_fingerprints(df, "text", "doc_id", hash_fn="md5")


def test_numpy_xxh64_matches_spark_exactly(spark):
    """_xxh64_gram_hashes_np must reproduce Spark's xxhash64(substr(...))
    bit-for-bit for every position — fuzzed over lengths that cross every
    algorithm boundary (empty tail, 4-byte tail, 8-byte words, >=32-byte
    stripes) and over 1/2/3/4-byte UTF-8 code points."""
    import numpy as np

    from pyspark.sql import functions as F

    from feathub_spark.datapipe.passages import _xxh64_gram_hashes_np

    rnd = random.Random(4242)
    alpha = "abcdefgh ijklmnop" + "é߿ࠀ中𝄞𐍈"
    ascii_alpha = "abcdefgh ijklmnop"  # exercises the uniform-width path
    texts = []
    # gram byte lengths from 3 (3 ASCII) up past 32 (12 astral chars = 48B)
    for glen in (3, 7, 8, 9, 12, 31, 32, 33, 40):
        for a in (alpha, ascii_alpha):
            for _ in range(3):
                texts.append(
                    ("".join(rnd.choice(a) for _ in range(rnd.randrange(glen, glen + 60))), glen)
                )
    texts += [("", 5), ("ab", 5), ("𝄞" * 20, 8), ("x" * 80, 36)]

    for i, (t, glen) in enumerate(texts):
        df = spark.createDataFrame([(t,)], ["text"])
        exp = df.select(
            F.expr(
                f"CASE WHEN length(text) >= {glen} THEN "
                f"transform(sequence(1, length(text) - {glen} + 1), "
                f"i -> xxhash64(substr(text, i, {glen}))) "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ).alias("h")
        ).first()["h"]
        got = _xxh64_gram_hashes_np(t, glen)
        assert got.tolist() == list(exp), (i, t[:40], glen)
    assert _xxh64_gram_hashes_np(None, 5) is None


def test_numpy_xxh64_hypothesis_fuzz(spark):
    """Property fuzz beyond the curated boundary cases: arbitrary unicode
    text (all UTF-8 widths, any length) and gram lengths must reproduce
    Spark's xxhash64 per position bit-for-bit."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from feathub_spark.datapipe.passages import _xxh64_gram_hashes_np

    # surrogates excluded: not encodable to UTF-8 (Spark strings are UTF-8)
    chars = st.characters(blacklist_categories=("Cs",))

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=chars, max_size=90), st.integers(2, 40))
    def check(text, glen):
        exp = spark.createDataFrame([(text,)], ["t"]).select(
            F.expr(
                f"CASE WHEN length(t) >= {glen} THEN "
                f"transform(sequence(1, length(t) - {glen} + 1), "
                f"i -> xxhash64(substr(t, i, {glen}))) "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ).alias("h")
        ).first()["h"]
        got = _xxh64_gram_hashes_np(text, glen)
        assert got.tolist() == list(exp), (repr(text), glen)

    check()


def test_dedup_paragraphs_semantics(spark):
    from feathub_spark.datapipe.passages import dedup_paragraphs

    df = spark.createDataFrame(
        [
            # normalized dups ("hello" ~ "Hello", "World  " ~ "world"),
            # blank paragraph preserved and never counted as dup
            (1, "Hello\n\nworld\n\nhello\n\n\n\nWorld  \n\nnew"),
            (2, None),
            (3, ""),
            (4, "same\n\nsame\n\nsame"),
            (5, "only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_paragraphs(df, "text", "doc_id").collect()}
    assert got[1].clean_text == "Hello\n\nworld\n\n\n\nnew"
    assert (got[1].n_paragraphs, got[1].n_removed) == (6, 2)
    assert got[2].clean_text == "" and got[2].n_removed == 0
    assert got[3].clean_text == "" and got[3].n_paragraphs == 1
    assert got[4].clean_text == "same" and got[4].n_removed == 2
    assert got[5].clean_text == "only" and got[5].n_removed == 0

    # normalize=False keeps case-variant paragraphs
    raw = {r.doc_id: r for r in dedup_paragraphs(
        df, "text", "doc_id", normalize=False).collect()}
    assert raw[1].n_removed == 0

    # custom separator
    one = spark.createDataFrame([(9, "a|b|a|c")], "doc_id long, text string")
    got9 = dedup_paragraphs(one, "text", "doc_id", separator="|").collect()[0]
    assert got9.clean_text == "a|b|c" and got9.n_removed == 1

    # zero shuffle: the whole operator is a per-row projection
    plan = (
        dedup_paragraphs(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
