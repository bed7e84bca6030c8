"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation is JVM-side Catalyst expressions (split / regexp /
higher-order array functions) — no Python UDFs — so these scale linearly with
executors and stay inside whole-stage codegen.  Functions return Column
expressions; ``analyze_documents`` assembles the standard per-document
feature set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from feathub_spark.common.parallelism import ensure_parallelism

# Minimal stopword inventories for the n-gram/stopword language heuristic.
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf"],
}


def tokens(text_col: str) -> Column:
    """Whitespace tokens, empty strings dropped (mirrors str.split())."""
    return F.expr(
        f"filter(split(trim(`{text_col}`), '\\\\s+'), t -> t <> '')"
    )


def token_count(text_col: str) -> Column:
    return F.size(tokens(text_col)).cast("bigint")


def distinct_token_count(text_col: str) -> Column:
    return F.size(F.array_distinct(tokens(text_col))).cast("bigint")


def char_count(text_col: str) -> Column:
    return F.length(F.col(text_col)).cast("bigint")


def avg_token_length(text_col: str) -> Column:
    t = tokens(text_col)
    total = F.expr(
        f"aggregate(filter(split(trim(`{text_col}`), '\\\\s+'), t -> t <> ''), "
        f"CAST(0 AS DOUBLE), (a, x) -> a + length(x))"
    )
    # token-less docs report 0.0 like the sibling ratio metrics — the
    # unguarded 0/0 was NULL in non-ANSI mode and a job-killing
    # DIVIDE_BY_ZERO under ANSI (Spark 4's default)
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def fingerprint_md5(text_col: str) -> Column:
    """Deterministic document fingerprint (md5 hex)."""
    return F.md5(F.col(text_col))


def fingerprint_sha256(text_col: str) -> Column:
    return F.sha2(F.col(text_col), 256)


def stopword_ratio(text_col: str, lang: str = "en") -> Column:
    words = _LANG_STOPWORDS[lang]
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    toks = f"filter(split(trim(`{text_col}`), '\\\\s+'), t -> t <> '')"
    return F.expr(
        f"CASE WHEN size({toks}) > 0 THEN "
        f"CAST(size(filter({toks}, t -> array_contains({arr}, lower(t)))) AS DOUBLE)"
        f" / size({toks}) ELSE CAST(0 AS DOUBLE) END"
    )


def language_guess(text_col: str) -> Column:
    """Stopword-overlap language heuristic: the language whose stopword list
    overlaps the document's tokens most; 'und' (undetermined) when nothing
    matches.  Deterministic tie-break by language code order."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    scores = []
    for lang in sorted(_LANG_STOPWORDS):
        arr = "array(" + ", ".join(f"'{w}'" for w in _LANG_STOPWORDS[lang]) + ")"
        scores.append(
            f"struct(size(filter({toks}, t -> array_contains({arr}, t))) AS score, "
            f"'{lang}' AS lang)"
        )
    best = f"array_max(array({', '.join(scores)}))"
    return F.expr(f"CASE WHEN {best}.score > 0 THEN {best}.lang ELSE 'und' END")


def quality_score(text_col: str) -> Column:
    """Heuristic quality in [0,1]: combines length band, mean token length
    band, punctuation ratio and repetition (distinct-token ratio)."""
    toks = f"filter(split(trim(`{text_col}`), '\\\\s+'), t -> t <> '')"
    n = f"size({toks})"
    distinct_ratio = f"(CAST(size(array_distinct({toks})) AS DOUBLE) / {n})"
    len_ok = f"(CASE WHEN {n} >= 10 AND {n} <= 100000 THEN 1.0 ELSE 0.0 END)"
    mean_len = (
        f"(aggregate({toks}, CAST(0 AS DOUBLE), (a, x) -> a + length(x)) / {n})"
    )
    mean_len_ok = f"(CASE WHEN {mean_len} >= 2 AND {mean_len} <= 12 THEN 1.0 ELSE 0.0 END)"
    return F.expr(
        f"CASE WHEN {n} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"round(0.4 * {len_ok} + 0.3 * {mean_len_ok} + 0.3 * {distinct_ratio}, 6) END"
    )


def char_entropy(text_col: str) -> Column:
    """Shannon entropy (bits/char) of the character distribution — a
    standard gibberish/compression-quality signal.  Pure Catalyst, one
    pass: sort the characters, then a single run-closing fold accumulates
    -p*log2(p) per run (the chars array is evaluated ONCE — a per-distinct
    histogram lambda would re-derive it for every distinct char, O(d·n²)
    per row).  Sorted order makes the float fold deterministic; empty
    strings score 0."""
    n = f"length(`{text_col}`)"
    # split('') explodes the chars in ONE pass — a per-index substr loop
    # re-seeks the UTF-8 string from the start each time, O(n²) bytes/row
    chars = f"array_sort(transform(split(`{text_col}`, ''), c -> ascii(c)))"
    term = f"(CAST(s.run AS DOUBLE) / {n}) * log2(CAST(s.run AS DOUBLE) / {n})"
    return F.expr(
        f"CASE WHEN {n} > 0 THEN round(-aggregate({chars}, "
        f"named_struct('prev', CAST(NULL AS INT), "
        f"'run', CAST(0 AS BIGINT), 'acc', CAST(0 AS DOUBLE)), "
        f"(s, c) -> CASE WHEN s.prev IS NULL OR c = s.prev "
        f"THEN named_struct('prev', c, 'run', s.run + 1, 'acc', s.acc) "
        f"ELSE named_struct('prev', c, 'run', CAST(1 AS BIGINT), "
        f"'acc', s.acc + {term}) END, "
        f"s -> s.acc + {term}), 6) ELSE CAST(0 AS DOUBLE) END"
    )


def printable_ratio(text_col: str) -> Column:
    """Fraction of characters in the printable ASCII range [32, 126] —
    a cheap binary-junk / encoding-corruption signal."""
    chars = f"transform(split(`{text_col}`, ''), c -> ascii(c))"
    return F.expr(
        f"CASE WHEN length(`{text_col}`) > 0 THEN "
        f"round(CAST(size(filter({chars}, c -> c >= 32 AND c <= 126)) AS DOUBLE) "
        f"/ length(`{text_col}`), 6) ELSE CAST(0 AS DOUBLE) END"
    )


BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_like_token_count(text_col: str) -> Column:
    """Token count under a GPT-style pre-tokenization regex (words, numbers,
    punctuation runs with leading-space affinity) — the usual cheap proxy
    for LLM token budgets when no tokenizer model is loaded."""
    # double the backslash: Spark's SQL string literal unescapes '\\s' to
    # 's' (already inside a-z), which silently turned the trailing class
    # into [^A-Za-z0-9] and counted WHITESPACE RUNS as punctuation tokens
    pattern = BPE_ISH_PATTERN.replace("\\", "\\\\")
    return F.expr(
        f"size(regexp_extract_all(`{text_col}`, '{pattern}', 0))"
    ).cast("bigint")


def rolling_fingerprint(text_col: str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the character stream: a positional
    fingerprint (unlike md5, nearby edits perturb it predictably), computed
    entirely in Catalyst expressions."""
    # split('') explodes chars in one pass (per-index substr re-seeks the
    # UTF-8 string from the start: O(n²) bytes per row)
    return F.expr(
        f"aggregate(transform(split(`{text_col}`, ''), c -> ascii(c)), "
        f"CAST(7 AS BIGINT), (h, c) -> (h * {base} + c) % {mod})"
    )


# PII patterns: shared Java-regex/RE2 subset (no lookarounds, no backrefs)
# so Spark and any RE2-based engine (DuckDB, Go) match identically.
PII_PATTERNS = {
    # (?i:...) — scheme matches case-insensitively in both Java regex and
    # RE2, so 'HTTPS://x' cannot evade redaction or domain extraction
    "url": r"(?i:https?)://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()-]{6,}[0-9]",
}
# Redaction order matters (a URL may embed an email-shaped userinfo part;
# an IP could be re-matched by the phone pattern) — apply in this order.
PII_ORDER = ["url", "email", "ipv4", "phone"]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Redact URLs, emails, IPv4 addresses and international-format phone
    numbers, replacing each with <KIND>; adds one match-count column per
    kind (n_url, n_email, ...) for filtering/stats.

    Pure regexp_replace/regexp_extract_all Catalyst expressions — linear
    per-row work, no shuffle, whole-stage codegen."""
    counts = {
        f"n_{kind}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("bigint")
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = F.col(text_col)
    for kind in PII_ORDER:
        redacted = F.regexp_replace(
            redacted, F.lit(PII_PATTERNS[kind]), F.lit(f"<{kind.upper()}>")
        )
    return df.withColumns({**counts, out_col: redacted})


def ngrams_sql(text_col: str, n: int = 2) -> str:
    """SQL expression string for :func:`ngrams` (composable into larger
    Catalyst expressions without a Column round-trip)."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE array(array_join({toks}, ' ')) END"
    )


def ngrams(text_col: str, n: int = 2) -> Column:
    """All (overlapping, order-preserving) word n-grams of the lowercased
    token stream; documents shorter than n yield their single full-token
    join (mirrors the shingle construction in datapipe.dedup)."""
    return F.expr(ngrams_sql(text_col, n))


def ngrams_strict_sql(text_col: str, n: int = 2) -> str:
    """Like :func:`ngrams_sql` but documents shorter than ``n`` tokens
    yield an EMPTY list instead of the whole-text fallback gram.  The
    fallback is right for shingle/dedup semantics (a short doc must still
    have a signature); it is WRONG for repetition statistics, where a
    single fallback gram makes every short document score as maximally
    repetitive (top-frac 1.0)."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def ngram_topk(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 10,
    group_col: str = None,
) -> DataFrame:
    """Corpus-level most-frequent n-grams (optionally per group, e.g. per
    language): explode -> count -> per-group top-k.

    The count aggregation is map-side combinable (partial counts per
    partition before the single shuffle on the gram key), and only the
    per-group top-k window touches the distinct-gram space — the standard
    scalable corpus-stats plan.  Ties rank lexicographically for
    determinism.

    Without ``group_col`` the per-group window would have an EMPTY
    partitionBy — every distinct gram in the corpus funneled through one
    task — so the global case instead uses orderBy+limit, which compiles
    to TakeOrderedAndProject (parallel per-partition partial top-k, no
    global sort, no Window); ranks are then derived from the k surviving
    rows by a window-free sort_array/posexplode fold."""
    group = [group_col] if group_col else []
    exploded = (
        ensure_parallelism(df)
        # STRICT n-grams: corpus frequency stats must not let documents
        # shorter than n inject their whole text — or empty docs an
        # empty-string gram — into the top-k counts (the whole-text
        # fallback is right only for shingle/dedup signatures)
        .select(
            *group,
            F.explode(F.expr(ngrams_strict_sql(text_col, n))).alias("gram"),
        )
    )
    counts = exploded.groupBy(*group, "gram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    if group_col:
        w = Window.partitionBy(*group).orderBy(
            F.col("n_occurrences").desc(), F.col("gram").asc()
        )
        return (
            counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(*group, "rank", "gram", "n_occurrences")
        )
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)
    # rank the k survivors without a global Window: struct sort ascending on
    # (-count, gram) == (count desc, gram asc), then positional explode
    packed = topk.select(
        F.struct(
            (-F.col("n_occurrences")).alias("neg"),
            F.col("gram").alias("gram"),
            F.col("n_occurrences").alias("n_occurrences"),
        ).alias("s")
    ).agg(F.sort_array(F.collect_list("s")).alias("xs"))
    return (
        packed.select(F.posexplode("xs").alias("pos", "s"))
        .select(
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            F.col("s.gram").alias("gram"),
            F.col("s.n_occurrences").alias("n_occurrences"),
        )
    )


def token_count_quantiles(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT token-count quantiles per group (discrete, lower-value
    convention: the value at row position 1 + floor((n-1)·q) of the sorted
    counts) — the standard corpus length-distribution report.

    Scale posture: quantile-by-counting, not quantile-by-sorting — rows
    collapse to (group, n_tok) histogram cells first (map-side combinable),
    and the cumulative window runs over DISTINCT token counts per group
    (bounded by the value range, never the row count), so a 10^9-document
    language never serializes its rows into one task.  Exact and
    deterministic, hence oracle-checkable — unlike percentile_approx."""
    counts = (
        ensure_parallelism(df)
        .select(F.col(group_col), token_count(text_col).alias("__tok__"))
        .groupBy(group_col, "__tok__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("__tok__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(group_col)
    ranked = counts.withColumn("__cum__", F.sum("__c__").over(wcum)).withColumn(
        "__tot__", F.sum("__c__").over(wtot)
    )
    aggs = [F.max("__tot__").cast("bigint").alias("n_docs")]
    for q in qs:
        target = 1 + F.floor((F.col("__tot__") - 1) * F.lit(float(q)))
        # round, don't truncate: int(0.29*100) is 28 in binary floats,
        # and 0.99/0.999 must not collide on the same alias
        name = "p" + str(round(q * 100, 1)).removesuffix(".0").replace(".", "_")
        aggs.append(
            F.min(
                F.when(F.col("__cum__") >= target, F.col("__tok__"))
            ).cast("bigint").alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
    casefold: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Canonical text normalization for dedup/tokenizer pre-passes:
    Unicode normalization (NFC/NFKC/NFD/NFKD) + optional casefold +
    whitespace collapse.

    Spark has no Unicode-normalization builtin, so the normalize+casefold
    step is the one sanctioned Python stage: an Arrow-batched pandas UDF
    (pandas ``str`` ops over the whole batch — no per-row Python call
    overhead beyond the vectorized map).  The whitespace collapse stays
    JVM-side as a Catalyst ``regexp_replace`` so the common cheap part of
    the pipeline never leaves codegen.  Per-row narrow compute, no
    shuffle — scales linearly with executors; the Arrow transfer is the
    honest cost of correct Unicode handling (str.casefold's full case
    folding — e.g. ss -> ss — is not expressible as a JVM builtin either).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown unicode normalization form: {form!r}")

    def _norm_fn(s):
        out = s.str.normalize(form)
        if casefold:
            out = out.str.casefold()
        return out

    # real annotation objects: the module-level `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf rejects
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")

    col = _norm(F.col(text_col))
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return ensure_parallelism(df).withColumn(out_col, col)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    return ensure_parallelism(df).withColumns(
        {
            "n_tokens": token_count(text_col),
            "n_distinct_tokens": distinct_token_count(text_col),
            "n_chars_calc": char_count(text_col),
            "n_bpe_tokens": bpe_like_token_count(text_col),
            "fingerprint": fingerprint_md5(text_col),
            "lang_guess": language_guess(text_col),
            "quality": quality_score(text_col),
            "entropy": char_entropy(text_col),
            "printable_frac": printable_ratio(text_col),
        }
    )


URL_PATTERN = r"(?i:https?)://[^\s]+"
# host = authority up to the first /, :, ?, # — shared Java-regex/RE2
# subset so Spark and DuckDB extract identically
# four backslashes: Python -> \\s in the SQL literal -> regex \s
# optional userinfo ('user@' / 'user:pass@') is stripped before the host
# capture — without it, 'https://x@badsite.com/' yielded 'x@badsite.com'
# (and 'user:pass@host' yielded 'user'), letting a crawl URL evade a
# domain blocklist by writing a userinfo component.  The userinfo class
# excludes ?# so an '@' inside a query string can never hijack the host.
_HOST_PATTERN = r"(?i:https?)://(?:[^/\\s?#]*@)?([^/\\s:?#]+)"


# The common two-level public suffixes (public-suffix-list subset): hosts
# under these need THREE labels to name a registered domain — without the
# set, every *.co.uk host collapses to 'co.uk' and a blocklist entry like
# 'badsite.co.uk' can never match (round-6 advisor flag).
DEFAULT_TWO_LEVEL_SUFFIXES = (
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "org.uk",
    "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng", "com.ua",
    "co.th", "ac.th", "or.th", "go.th", "in.th",
    "co.il", "org.il", "ac.il", "gov.il", "net.il",
)


def url_domains(text_col: str, extra_suffixes=DEFAULT_TWO_LEVEL_SUFFIXES) -> Column:
    """Sorted distinct registered domains referenced by the text's URLs.

    Registered domain = last two dot-labels of the lowercased host with a
    leading "www." stripped — EXCEPT hosts whose last two labels form a
    two-level public suffix in ``extra_suffixes`` (co.uk, com.au, ...),
    which take the last THREE labels (public-suffix-lite with the
    high-traffic ccTLD second-level suffixes covered; pass a different
    sequence to extend, or ``()`` for the plain two-label rule).  The
    suffix probe is a literal-array ``array_contains`` — the whole
    extraction stays a pure Catalyst expression with an exact
    cross-engine oracle.  Pure per-row compute, no shuffle."""
    hosts = (
        f"transform(regexp_extract_all(`{text_col}`, '{_HOST_PATTERN}', 1), "
        f"h -> regexp_replace(lower(h), '^www\\\\.', ''))"
    )
    if extra_suffixes:
        sufs = ", ".join(
            "'" + str(s).lower().replace("'", "") + "'" for s in extra_suffixes
        )
        take3 = (
            f"array_contains(array({sufs}), "
            "concat(element_at(p, -2), '.', element_at(p, -1)))"
        )
        pick = (
            f"CASE WHEN size(p) >= 3 AND {take3} "
            "THEN concat(element_at(p, -3), '.', "
            "element_at(p, -2), '.', element_at(p, -1)) "
            "WHEN size(p) >= 2 THEN concat(element_at(p, -2), '.', "
            "element_at(p, -1)) ELSE h END"
        )
    else:
        pick = (
            "CASE WHEN size(p) >= 2 THEN concat(element_at(p, -2), '.', "
            "element_at(p, -1)) ELSE h END"
        )
    # let-bind the split so Catalyst evaluates it once per host, not once
    # per element_at (see the HOF let-binding lesson)
    dom = (
        "transform({hosts}, h -> "
        "transform(array(split(h, '\\\\.')), p -> {pick})[0])"
    ).format(hosts=hosts, pick=pick)
    return F.expr(f"array_sort(array_distinct({dom}))")


def domain_blocklist_filter(
    df: DataFrame,
    text_col: str,
    blocklist,
    keep: bool = True,
    flag_col: str = "blocked",
    extra_suffixes=DEFAULT_TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Annotate (and optionally drop) documents referencing blocklisted
    registered domains — the standard crawl-hygiene filter.

    ``blocklist`` is a Python sequence (compiled into the plan as a
    literal array — the usual case, blocklists are small) or a 1-column
    DataFrame joined via broadcast.  ``keep=True`` returns all rows with a
    boolean ``flag_col``; ``keep=False`` drops flagged rows.  No shuffle
    either way.  ``extra_suffixes`` feeds :func:`url_domains` so
    'badsite.co.uk'-style blocklist entries match."""
    doms = url_domains(text_col, extra_suffixes)
    if isinstance(blocklist, DataFrame):
        # collapse the blocklist to ONE array row and broadcast it — a
        # bounded 1-row build side; an explode+groupBy(all columns)
        # alternative would collapse duplicate input rows and cannot group
        # map-typed columns
        bcol = blocklist.columns[0]
        # url_domains emits lowercased domains — lower the blocklist side
        # too, else a mixed-case entry can never match anything
        bl_arr = blocklist.agg(
            F.collect_set(F.lower(F.col(bcol).cast("string"))).alias("__bl__")
        )
        flagged = (
            df.crossJoin(F.broadcast(bl_arr))
            .withColumn(flag_col, F.arrays_overlap(doms, F.col("__bl__")))
            .drop("__bl__")
        )
    else:
        flagged = df.withColumn(
            flag_col,
            F.arrays_overlap(
                doms, F.array(*[F.lit(str(d).lower()) for d in blocklist])
            )
            if blocklist
            else F.lit(False),
        )
    if keep:
        return flagged
    return flagged.filter(~F.col(flag_col)).drop(flag_col)


# Unicode script ranges (code-point intervals, public Unicode block data):
# enough resolution for corpus routing without a full script database.
_SCRIPT_RANGES = {
    "latin": [(0x0041, 0x005A), (0x0061, 0x007A), (0x00C0, 0x024F)],
    "cyrillic": [(0x0400, 0x04FF)],
    "greek": [(0x0370, 0x03FF)],
    "arabic": [(0x0600, 0x06FF)],
    "cjk": [(0x4E00, 0x9FFF), (0x3040, 0x30FF), (0xAC00, 0xD7AF)],
}


def script_ratios(text_col: str) -> Column:
    """map<string,double> of per-script character fractions (letters only —
    the denominator excludes digits/punct/whitespace so mixed-markup pages
    still classify cleanly); empty/scriptless text yields an empty map.
    One split('') pass, counts folded per range — pure Catalyst."""
    chars = f"transform(split(`{text_col}`, ''), c -> ascii(c))"
    counts = []
    for name in sorted(_SCRIPT_RANGES):
        cond = " OR ".join(
            f"(c >= {lo} AND c <= {hi})" for lo, hi in _SCRIPT_RANGES[name]
        )
        counts.append(f"size(filter(cs, c -> {cond}))")
    all_cond = " OR ".join(
        f"(c >= {lo} AND c <= {hi})"
        for rs in _SCRIPT_RANGES.values()
        for lo, hi in rs
    )
    total = f"size(filter(cs, c -> {all_cond}))"
    entries = ", ".join(
        f"struct('{name}' AS k, round(CAST({cnt} AS DOUBLE) / tot, 6) AS v)"
        for name, cnt in zip(sorted(_SCRIPT_RANGES), counts)
    )
    body = (
        f"element_at(transform(array({total}), tot -> "
        f"CASE WHEN tot = 0 THEN map() ELSE "
        f"map_from_entries(filter(array({entries}), e -> e.v > 0)) END), 1)"
    )
    # bind the char array once (see passages._let1 for why this matters)
    return F.expr(
        f"element_at(transform(array({chars}), cs -> {body}), 1)"
    )


def structure_signals(text_col: str) -> Column:
    """struct of cheap document-structure fractions used for code/markup
    routing (StarCoder-style heuristics): fraction of lines that look like
    markdown headings, fenced-code markers, list items or indented code,
    plus bracket/semicolon character density.  Pure Catalyst, one
    line-split pass."""
    lines = f"split(`{text_col}`, '\\n', -1)"

    def frac(cond):
        return (
            f"round(CAST(size(filter(ls, l -> {cond})) AS DOUBLE) "
            f"/ size(ls), 6)"
        )

    heading = frac("l rlike '^#{1,6} '")
    fence = frac("l rlike '^```'")
    bullet = frac("l rlike '^\\\\s*([-*+]|[0-9]+\\\\.) '")
    indented = frac("l rlike '^(    |\\\\t)'")
    dens = (
        f"CASE WHEN length(`{text_col}`) > 0 THEN "
        f"round(CAST(size(filter(transform(split(`{text_col}`, ''), c -> ascii(c)), "
        f"c -> c IN (59, 123, 125, 40, 41, 91, 93))) AS DOUBLE) "
        f"/ length(`{text_col}`), 6) ELSE CAST(0 AS DOUBLE) END"
    )
    return F.expr(
        f"element_at(transform(array({lines}), ls -> named_struct("
        f"'heading_frac', {heading}, "
        f"'fence_frac', {fence}, "
        f"'bullet_frac', {bullet}, "
        f"'indent_frac', {indented}, "
        f"'punct_density', {dens})), 1)"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int,
    overlap: int = 0,
    min_chunk_chars: int = 1,
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the standard chunker feeding embedding / RAG indexing pipelines (the
    char-level sibling of ``sampling.pack_sequences``' token packing).

    Chunk i covers characters [1 + i*(chunk_size-overlap), ...
    +chunk_size); the final fragment is kept when it has at least
    ``min_chunk_chars`` characters that are NOT already covered by the
    previous chunk's overlap.  Pure narrow explode (no shuffle, no UDF),
    deterministic chunk ids, exactly reproducible in any SQL engine.

    Chunk texts slice a let-bound ``split('')`` char array (O(1) indexed)
    rather than calling per-chunk ``substr`` — substr seeks UTF-8 char
    positions from the string start, which would make a long document
    O(len^2 / chunk_size) (the repo's recorded O(n^2)-substr lesson); the
    slices also complete BEFORE the explode, so generated rows carry only
    their own chunk, never the whole document.

    Returns (id_col, chunk_id, chunk_start, chunk_text); empty/NULL texts
    yield no rows."""
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_size ({chunk_size})"
        )
    step = chunk_size - overlap
    n = f"length(`{text_col}`)"
    # keep starts whose fresh (non-overlap) span has >= min_chunk_chars
    # chars, i.e. pos + overlap <= len - min_chunk_chars + 1; chunk 0 is
    # always kept for nonempty text
    chunks = (
        f"transform(array(split(`{text_col}`, '')), cs -> "
        f"transform(filter(transform(sequence(0, ({n} - 1) DIV {step}), "
        f"i -> named_struct('cid', i, 'pos', 1 + i * {step})), "
        f"s -> s.cid = 0 OR s.pos + {overlap} + {min_chunk_chars} - 1 <= {n}), "
        f"s -> named_struct('cid', s.cid, 'pos', s.pos, "
        f"'txt', array_join(slice(cs, s.pos, {chunk_size}), ''))))[0]"
    )
    return (
        ensure_parallelism(df)
        .filter(F.expr(f"{n} > 0"))
        .select(F.col(id_col), F.explode(F.expr(chunks)).alias("__ch__"))
        .select(
            id_col,
            F.col("__ch__.cid").cast("bigint").alias("chunk_id"),
            F.col("__ch__.pos").cast("bigint").alias("chunk_start"),
            F.col("__ch__.txt").alias("chunk_text"),
        )
    )


# Tracking parameters every crawl normalizer strips: any utm_* plus the
# common click/campaign identifiers.
DEFAULT_TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "igshid", "ref", "ref_src",
    "mc_cid", "mc_eid", "spm", "yclid", "mkt_tok",
)


def normalize_urls(
    df: DataFrame,
    url_col: str,
    out_col: str = "norm_url",
    tracking_params=DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """URL canonicalization for crawl dedup/blocklists: lowercase scheme
    and host, strip default ports (:80 http / :443 https), drop the
    fragment, drop tracking query parameters (any ``utm_*`` plus
    ``tracking_params``, name-matched case-insensitively), sort the
    surviving parameters, and default an empty path to '/'.  Two URLs
    that differ only in case/port/fragment/tracking-noise/param order
    normalize identically — the usual pre-dedup key.

    Rows whose value does not start with http(s):// pass through
    unchanged.  Pure per-row Catalyst (regexp part extraction + one array
    filter/sort), no shuffle, engine-reproducible."""
    names = ", ".join(
        "'" + str(p).lower().replace("'", "") + "'" for p in tracking_params
    )
    scheme = f"lower(regexp_extract(`{url_col}`, '^(?i)(https?)://', 1))"
    hostport = (
        f"lower(regexp_extract(`{url_col}`, '^(?i)https?://([^/?#]+)', 1))"
    )
    host = (
        f"CASE WHEN ({scheme} = 'http' AND {hostport} LIKE '%:80') "
        f"THEN substring({hostport}, 1, length({hostport}) - 3) "
        f"WHEN ({scheme} = 'https' AND {hostport} LIKE '%:443') "
        f"THEN substring({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END"
    )
    path = f"regexp_extract(`{url_col}`, '^(?i)https?://[^/?#]+([^?#]*)', 1)"
    # anchored before the fragment AND at the FIRST '?': an unanchored
    # '\\?' matched a '?' inside the fragment ('/p#frag?b=1' resurrected
    # 'b=1' as a query), splitting canonical keys that differ only in
    # fragment content
    query = f"regexp_extract(`{url_col}`, '^[^#?]*\\\\?([^#]*)', 1)"
    keep = (
        f"array_sort(filter(split({query}, '&'), p -> p <> '' AND NOT ("
        f"lower(element_at(split(p, '='), 1)) LIKE 'utm@_%' ESCAPE '@' "
        f"OR lower(element_at(split(p, '='), 1)) IN ({names}))))"
    )
    norm = (
        f"concat({scheme}, '://', {host}, "
        f"CASE WHEN {path} = '' THEN '/' ELSE {path} END, "
        f"CASE WHEN size({keep}) > 0 "
        f"THEN concat('?', array_join({keep}, '&')) ELSE '' END)"
    )
    return ensure_parallelism(df).withColumn(
        out_col,
        F.expr(
            f"CASE WHEN `{url_col}` RLIKE '^(?i)https?://' THEN {norm} "
            f"ELSE `{url_col}` END"
        ),
    )


def tokenize_to_ids(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 32768,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-frequency vocabulary + text -> integer-id encoding: the
    tokenizer-artifact step before sequence packing (compose with
    :func:`feathub_spark.datapipe.sampling.pack_sequences`).  Token ids
    are 1..vocab_size assigned by (count DESC, token ASC) rank over the
    corpus's own distribution; everything else encodes to the OOV id 0.

    Scale shape: token counts are one map-side-combinable groupBy over a
    plain explode (no cache — the count pass never needs positions); the
    vocabulary cut is orderBy+limit (TakeOrderedAndProject — parallel
    partial top-k, no corpus-wide sort), the id-rank window runs over AT
    MOST vocab_size rows (corpus-size-independent by construction), and
    the finished vocab is collected to the driver — bounded by
    vocab_size, the same relation the previous implementation already
    broadcast as a hash join side (the BPE-vocab precedent).  Encoding
    is then ONE ``mapInArrow`` pass over (id, text): tokens match the
    engine-wide lower/trim/ASCII-\\s split rule (the fuzz-pinned recipe
    shared with the shingle emit — Python ``str.lower`` for the
    final-sigma rule, RE2 ``split_pattern_regex`` for the split), ids
    resolve through one hash-based ``pyarrow.compute.index_in`` per
    batch, and every document emits exactly one row — zero-token
    documents come back with empty arrays directly, so the corpus never
    pays the old positional-explode CACHE, the per-document regroup
    shuffle, or the final left self-join (its whole plan is two tokenize
    scans and one distinct-token-bounded aggregate).

    Duplicate ``id_col`` rows each encode their own text (the previous
    join-based form merged them into one repeated token stream; no
    caller tokenizes duplicate ids).  NULL ``id_col`` rows likewise
    encode their text normally and pass the NULL id through (the
    join-based form returned them with empty token_ids / zero counts
    because a NULL id never matched its final left join) — both corners
    pinned by test_tokenize_to_ids_null_and_duplicate_ids_encode_per_row.

    Returns (id_col, token_ids array<int>, n_tokens, n_oov)."""
    from pyspark.sql import types as T

    # LOAD-BEARING INVARIANT: this JVM tokenize (lower + trim + ASCII-\s
    # split) and the Python/RE2 tokenize inside gen() below MUST agree on
    # every codepoint — a divergence silently sends the affected token to
    # OOV with no error because the count pass builds the vocab one way
    # and the encode pass probes it the other.  The known-divergent hot
    # spots (final sigma, dotted-I, sharp-s — where pyarrow's utf8proc
    # lowering differs from JVM/Python) are why gen() uses Python
    # str.lower, and the 300-text fuzz in
    # test_tokenize_to_ids_arrow_matches_sql_join_model pins the pair;
    # edit BOTH recipes together or not at all.
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    counts = (
        ensure_parallelism(df)
        .select(F.explode(F.expr(toks)).alias("__tok__"))
        .groupBy("__tok__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") >= F.lit(int(min_count)))
    )
    cut = counts.orderBy(
        F.col("__c__").desc(), F.col("__tok__").asc()
    ).limit(vocab_size)
    w = Window.orderBy(F.col("__c__").desc(), F.col("__tok__").asc())
    vocab = cut.select(
        F.col("__tok__").alias("__vtok__"),
        F.row_number().over(w).cast("int").alias("__tid__"),
    )
    # bounded driver artifact: <= vocab_size (token, id) pairs — the rank
    # semantics stay in the window above, the driver only materializes it
    vocab_rows = vocab.collect()
    vtoks = [r[0] for r in vocab_rows]
    vtids = [r[1] for r in vocab_rows]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((vtoks, vtids))

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("token_ids", T.ArrayType(T.IntegerType())),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_oov", T.LongType()),
    ])

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        vt, vi = bc.value
        vocab_arr = pa.array(vt, type=pa.string())
        tid_np = np.asarray(vi, dtype=np.int32)
        for rb in batches:
            n_rows = rb.num_rows
            if n_rows == 0:
                continue
            ids = rb.column(0)
            raw = rb.column(1).to_pylist()
            # Python str.lower matches Spark's JVM lowering incl. the
            # context-sensitive final-sigma rule (pyarrow's utf8_lower
            # does not) — pinned by the shingle fuzz test alphabet
            lowered = pa.array(
                [t.lower().strip(" ") if t is not None else None
                 for t in raw],
                type=pa.string(),
            )
            toks_b = pc.split_pattern_regex(
                lowered, pattern="[ \t\n\x0b\f\r]+"
            )
            lens = pc.fill_null(
                pc.list_value_length(toks_b), 0
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = toks_b.flatten()
            doc_of_tok = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            keep = np.asarray(
                pc.not_equal(flat, "").to_numpy(zero_copy_only=False),
                dtype=bool,
            )
            kept = flat.filter(pa.array(keep))
            kdoc = doc_of_tok[keep]
            kl = np.bincount(kdoc, minlength=n_rows).astype(np.int64)
            # hash-based vocab probe, one call per batch; misses -> OOV 0
            if len(vt):
                idx = pc.index_in(kept, value_set=vocab_arr)
                idx_np = idx.to_numpy(zero_copy_only=False)
                miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (
                    np.asarray(pc.is_null(idx).to_numpy(
                        zero_copy_only=False), dtype=bool)
                )
                filled = np.where(miss, 0, idx_np).astype(np.int64)
                tids = np.where(miss, np.int32(0), tid_np[filled]).astype(
                    np.int32
                )
            else:
                tids = np.zeros(len(kept), dtype=np.int32)
            offsets = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(kl, out=offsets[1:])
            token_ids = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(tids, type=pa.int32()),
            )
            n_oov = np.bincount(
                kdoc[tids == 0], minlength=n_rows
            ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    token_ids,
                    pa.array(kl, type=pa.int64()),
                    pa.array(n_oov, type=pa.int64()),
                ],
                schema=pa.schema([
                    pa.field(id_col, ids.type),
                    pa.field("token_ids", pa.list_(pa.int32())),
                    pa.field("n_tokens", pa.int64()),
                    pa.field("n_oov", pa.int64()),
                ]),
            )

    return (
        ensure_parallelism(df)
        .select(F.col(id_col), F.col(text_col))
        .mapInArrow(gen, out_schema)
    )


def parse_json_features(
    df: DataFrame,
    json_col: str,
    field_schema: str,
    prefix: str = "",
) -> DataFrame:
    """Typed feature extraction from a JSON-string column — the parse-side
    complement of the DSL's JSON_STRING builtin: ``field_schema`` is a
    Spark DDL fragment ("k BIGINT, tag STRING, nested STRUCT<x: DOUBLE>")
    and each top-level field lands as its own typed column (optionally
    ``prefix``-ed).  Malformed JSON, missing fields, and type-mismatched
    values all yield NULL (PERMISSIVE from_json) — one corrupt payload
    never aborts a corpus-scale parse, mirroring the multimodal decoders'
    on_error='null' stance.

    Pure Catalyst (JVM JacksonParser, whole-stage codegen compatible): a
    single from_json per row, no UDF, no shuffle.  Input columns pass
    through."""
    from pyspark.sql.types import _parse_datatype_string

    struct = _parse_datatype_string(f"struct<{field_schema}>")
    names = [f.name for f in struct.fields]
    parsed = F.from_json(F.col(json_col), struct)
    return (
        df.withColumn("__j__", parsed)
        .select(
            "*",
            *[F.col(f"__j__.`{n}`").alias(f"{prefix}{n}") for n in names],
        )
        .drop("__j__")
    )


def token_pmi(
    df: DataFrame,
    text_col: str,
    top_k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: top-``top_k`` adjacent token pairs by pointwise
    mutual information,

        pmi(a, b) = log2( (c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni)) )

    over the corpus's own unigram/bigram counts — the standard
    phrase-discovery signal (high-PMI pairs are units like "new york";
    ``min_count`` suppresses the unstable singleton tail that dominates
    raw PMI).

    Plan shape: one tokenize pass feeds BOTH count tables
    (map-side-combinable groupBys over vocab-bounded keys, never corpus
    rows); the three corpus totals attach as 1-row broadcasts; the
    ranking is orderBy+limit (TakeOrderedAndProject) with a rank window
    over <= top_k rows.  PMI rounds to 6 dp; ties break on the gram.

    Returns (rank, gram, n_pair, pmi)."""
    toks = f"filter(split(trim(lower(`{text_col}`)), '\\\\s+'), t -> t <> '')"
    base = ensure_parallelism(df).select(F.expr(toks).alias("__tk__"))
    uni = (
        base.select(F.explode("__tk__").alias("__t__"))
        .groupBy("__t__")
        .agg(F.count(F.lit(1)).alias("__cu__"))
    )
    bi_expr = (
        "CASE WHEN size(__tk__) >= 2 THEN transform("
        "sequence(1, size(__tk__) - 1), "
        "i -> struct(element_at(__tk__, i) AS a, "
        "element_at(__tk__, i + 1) AS b)) "
        "ELSE array() END"
    )
    bi = (
        base.select(F.explode(F.expr(bi_expr)).alias("__p__"))
        .groupBy(F.col("__p__.a").alias("__a__"), F.col("__p__.b").alias("__b__"))
        .agg(F.count(F.lit(1)).alias("__cb__"))
        .filter(F.col("__cb__") >= F.lit(int(min_count)))
    )
    n_uni = uni.agg(F.sum("__cu__").alias("__nu__"))
    # bigram total over ALL pairs (pre-min_count) — the true denominator
    n_bi = (
        base.select(
            F.expr(
                "CASE WHEN size(__tk__) >= 2 "
                "THEN size(__tk__) - 1 ELSE 0 END"
            ).alias("__k__")
        ).agg(F.sum("__k__").alias("__nb__"))
    )
    ua = uni.select(F.col("__t__").alias("__a__"), F.col("__cu__").alias("__ca__"))
    ub = uni.select(F.col("__t__").alias("__b__"), F.col("__cu__").alias("__cbu__"))
    # unigram joins stay planner-chosen (web-scale vocab is NOT a safe
    # broadcast; AQE broadcasts them when they actually are small)
    scored = (
        bi.join(ua, on="__a__")
        .join(ub, on="__b__")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "__a__", "__b__").alias("gram"),
            F.col("__cb__").alias("n_pair"),
            F.round(
                F.expr(
                    "log2((CAST(__cb__ AS DOUBLE) / __nb__) / "
                    "((CAST(__ca__ AS DOUBLE) / __nu__) * "
                    "(CAST(__cbu__ AS DOUBLE) / __nu__)))"
                ),
                6,
            ).alias("pmi"),
        )
    )
    cut = scored.orderBy(F.col("pmi").desc(), F.col("gram").asc()).limit(top_k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("gram").asc())
    return cut.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).select("rank", "gram", "n_pair", "pmi")


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Regex-based HTML-to-text for crawl cleanup: drops <script>/<style>
    blocks and comments wholesale, replaces block-level closers and <br>
    with newlines (so paragraph structure survives for the downstream
    line/paragraph dedup passes), strips every remaining tag, decodes the
    common entities (&amp; &lt; &gt; &quot; &#39; &nbsp;), and collapses
    runs of spaces/tabs.  A regex pass, NOT a conforming HTML parser —
    the right tool for corpus-scale boilerplate removal, not for DOM
    fidelity (CDATA, nested comments, and malformed markup degrade
    soft).  Pure per-row Catalyst regexp_replace chain: zero shuffle,
    whole-stage codegen, &amp; decoded LAST so literal entity text can't
    re-introduce tags.

    Returns the input plus ``out_col``; NULL text stays NULL."""
    c = F.col(text_col)
    # case-insensitive (?i) and dotall (?s) apply per pattern
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr)\b[^>]*>", "\n"
    )
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    # trim() strips spaces only — strip newline runs at the edges too
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return ensure_parallelism(df).withColumn(out_col, c)
