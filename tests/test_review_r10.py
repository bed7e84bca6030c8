"""Regression pins for the round-10 session-2 review findings — each was
reproduced against Spark 4.1.2 (ANSI defaults) before the fix."""

from pyspark.sql import functions as F


def test_numeric_histogram_constant_column(spark):
    """A constant column (min == max, width 0) must yield one degenerate
    bin, not an ANSI DIVIDE_BY_ZERO job failure."""
    from feathub_spark.datapipe.profile import numeric_histogram

    df = spark.createDataFrame([(5.0,)] * 7, "v double")
    rows = numeric_histogram(df, "v", n_bins=4).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0 and rows[0]["n"] == 7
    assert rows[0]["bin_lo"] == 5.0 and rows[0]["bin_hi"] == 5.0


def test_hll_distinct_keeps_null_group(spark):
    """NULL group keys are real groups — the exact/sketch combine must
    join null-safely instead of dropping them."""
    from feathub_spark.datapipe.profile import hll_distinct

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), (None, "x"), (None, "z")],
        "g string, v string",
    )
    out = {r["g"]: r["n_exact"] for r in hll_distinct(df, "v", ["g"]).collect()}
    assert out == {"a": 2, None: 2}


def test_url_scheme_matches_case_insensitively(spark):
    """'HTTPS://BadSite.com' must reach the domain extractor, the PII
    redactor, and the blocklist — uppercasing the scheme is an evasion."""
    from feathub_spark.datapipe.text import (
        domain_blocklist_filter,
        pii_scrub,
        url_domains,
    )

    df = spark.createDataFrame(
        [(1, "see HTTPS://BadSite.com/x now")], "id long, text string"
    )
    doms = df.select(url_domains("text").alias("d")).first()["d"]
    assert doms == ["badsite.com"]
    scrub = pii_scrub(df, "text").first()
    assert "<URL>" in scrub["clean_text"] and scrub["n_url"] == 1
    # mixed-case BLOCKLIST entries must match the lowercased domains too
    flagged = domain_blocklist_filter(df, "text", ["BadSite.com"]).first()
    assert flagged["blocked"] is True
    bl_df = spark.createDataFrame([("BadSite.com",)], "d string")
    flagged2 = domain_blocklist_filter(df, "text", bl_df).first()
    assert flagged2["blocked"] is True


def test_resample_ffill_string_ids_and_negative_grid(spark):
    """Non-numeric event ids must tie-break on their native type (the
    long cast crashed under ANSI), and a pre-1970 first event must start
    the grid at the step-multiple AT/AFTER it (div truncates toward
    zero, so the usual ceiling formula overshot to 0)."""
    from feathub_spark.datapipe.resample import resample_ffill

    df = spark.createDataFrame(
        [("k", 10, "ev-1", 1.0), ("k", 10, "ev-2", 2.0)],
        "k string, ts long, event_id string, value double",
    )
    out = resample_ffill(df, "k", "ts", ["value"], step_us=10,
                         id_col="event_id").collect()
    assert [(r["grid_us"], r["value"]) for r in out] == [(10, 2.0)]

    neg = spark.createDataFrame(
        [("k", -15, 1, 1.0), ("k", 5, 2, 2.0)],
        "k string, ts long, event_id long, value double",
    )
    grid = resample_ffill(neg, "k", "ts", ["value"], step_us=10,
                          id_col="event_id")
    assert [r["grid_us"] for r in grid.collect()] == [-10, 0]


def test_ngram_topk_ignores_short_and_empty_docs(spark):
    """Corpus top-k stats use STRICT n-grams: short documents must not
    inject whole-text grams, nor empty documents an '' gram."""
    from feathub_spark.datapipe.text import ngram_topk

    df = spark.createDataFrame(
        [(1, "big cat"), (2, "big cat"), (3, ""), (4, ""), (5, ""), (6, "x")],
        "id long, text string",
    )
    rows = ngram_topk(df, "text", n=2, k=3).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in rows] == [("big cat", 2)]


def test_token_count_quantile_names_round(spark):
    """int(0.29*100) is 28 in binary floats — quantile column names must
    round, and sub-percent quantiles must not collide."""
    from feathub_spark.datapipe.text import token_count_quantiles

    df = spark.createDataFrame(
        [("en", "a b c")] * 10, "lang string, text string"
    )
    out = token_count_quantiles(df, "text", "lang", qs=(0.29, 0.99, 0.999))
    assert [c for c in out.columns if c.startswith("p")] == [
        "p29", "p99", "p99_9"
    ]


def test_approx_quantiles_surfaces_all_null_column(spark):
    """An all-NULL column must appear in the report as NULL values, not
    vanish (posexplode drops NULL arrays)."""
    from feathub_spark.datapipe.profile import approx_quantiles

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "a double, b double"
    )
    rows = approx_quantiles(df, ["a", "b"], [0.5, 0.99]).collect()
    by_col = {}
    for r in rows:
        by_col.setdefault(r["column"], []).append(r["value"])
    assert set(by_col) == {"a", "b"}
    assert by_col["b"] == [None, None]
    assert all(v is not None for v in by_col["a"])
