"""Regression tests for code-review findings."""

import os
from datetime import timedelta

from feathub_spark import (
    DerivedFeatureView,
    Feature,
    FileSystemSource,
    Int64,
    Schema,
    SlidingFeatureView,
    String,
)
from feathub_spark.feature_views.transforms import JoinTransform, SlidingWindowTransform


def _source(tmp_path, name, fmt, time_values):
    path = os.path.join(str(tmp_path), f"{name}.csv")
    with open(path, "w") as f:
        f.write("k,v,t\n")
        for i, tv in enumerate(time_values):
            f.write(f'k{i % 2},{i * 10},"{tv}"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    return FileSystemSource(
        name=name, path=path, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format=fmt,
    )


def test_iso_t_timestamp_format(client, tmp_path):
    """ISO8601 'T' separator: the quoted Java literal must survive SQL
    embedding (review finding: unescaped quote broke the expression)."""
    source = _source(
        tmp_path, "iso_t_src", "%Y-%m-%dT%H:%M:%S",
        ["2022-01-01T08:00:00", "2022-01-01T09:00:00", "2022-01-01T10:00:00"],
    )
    view = DerivedFeatureView(
        name="iso_t_view",
        source=source,
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    from datetime import datetime

    df = client.get_features(
        view, start_datetime=datetime(2022, 1, 1, 8, 30)
    ).to_pandas()
    assert df["v"].tolist() == [10, 20]


def test_fractional_seconds_format(client, tmp_path):
    """%f fractions (variable digits) parse via the native cast path."""
    source = _source(
        tmp_path, "frac_src", "%Y-%m-%d %H:%M:%S.%f",
        ["2022-01-01 08:00:00.001", "2022-01-01 08:00:00.123456",
         "2022-01-01 08:00:01.5"],
    )
    view = DerivedFeatureView(
        name="frac_view",
        source=source,
        features=[Feature("v2", transform="v * 2")],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    from datetime import datetime

    # all three rows must have parsed (none silently dropped to NULL)
    df = client.get_features(
        view, start_datetime=datetime(2022, 1, 1)
    ).to_pandas()
    assert len(df) == 3


def test_map_entry_join_two_keys(client, tmp_path):
    """Two features joining DIFFERENT entries of the same map column must
    not collide (review finding: fusion dict was keyed by right column)."""
    source = _source(
        tmp_path, "mm_src", "%Y-%m-%d %H:%M:%S",
        ["2022-01-01 08:00:00", "2022-01-01 09:00:00", "2022-01-01 10:00:00"],
    )
    right = DerivedFeatureView(
        name="mm_right",
        source=source,
        features=[
            Feature("m", transform="MAP('a', v, 'b', v * 10)", keys=["k"]),
        ],
        keep_source_fields=True,
    )
    left = DerivedFeatureView(
        name="mm_left",
        source=source,
        features=[
            Feature("va", transform=JoinTransform("mm_right", "m", map_key="a"), keys=["k"]),
            Feature("vb", transform=JoinTransform("mm_right", "m", map_key="b"), keys=["k"]),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, right])
    client.build_features([left])
    df = client.get_features(left).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    assert (df["vb"] == df["va"] * 10).all()


def test_sliding_pre_feature_as_input_only(client, tmp_path):
    """A per-row expression feature feeding a sliding agg compiles (it is a
    window input, not an output column)."""
    source = _source(
        tmp_path, "pre_src", "%Y-%m-%d %H:%M:%S",
        ["2022-01-01 08:00:00", "2022-01-01 09:00:00", "2022-01-02 08:00:00"],
    )
    view = SlidingFeatureView(
        name="pre_view",
        source=source,
        features=[
            Feature("v3", transform="v * 3"),
            Feature(
                "sum_v3",
                transform=SlidingWindowTransform(
                    "v3", "SUM", window_size=timedelta(days=1),
                    step_size=timedelta(days=1), group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_pandas()
    assert "v3" not in df.columns
    assert sorted(df["sum_v3"].tolist()) == [0, 30, 60]


def test_streaming_mixed_bounded_unbounded_over(client, tmp_path):
    """Unbounded + bounded over-windows sharing keys on a stream: the
    unbounded agg must not be corrupted by history pruning."""
    from feathub_spark.feature_views.transforms import OverWindowTransform

    d = os.path.join(str(tmp_path), "mix_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("k,v,t\n")
        f.write('x,1,"2022-01-01 00:00:00"\n')
        f.write('x,2,"2022-01-05 00:00:00"\n')
        f.write('x,4,"2022-01-09 00:00:00"\n')
        f.write('zed,0,"2022-02-01 00:00:00"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    source = FileSystemSource(
        name="mix_src", path=d, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = DerivedFeatureView(
        name="mix_view",
        source=source,
        features=[
            Feature("life_sum", transform=OverWindowTransform("v", "SUM", group_by_keys=["k"])),
            Feature(
                "sum_1d",
                transform=OverWindowTransform(
                    "v", "SUM", window_size=timedelta(days=1), group_by_keys=["k"]
                ),
            ),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.processor.get_stream_dataframe(view)
    q = (
        df.writeStream.outputMode("append").format("memory")
        .queryName("mix_out").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        r["t"]: (r.life_sum, r.sum_1d)
        for r in client.spark.sql("SELECT * FROM mix_out").collect()
        if r["k"] == "x"
    }
    # lifetime sums accumulate across rows far apart in time
    assert rows["2022-01-09 00:00:00"] == (7, 4)


def test_streaming_infinite_sliding(client, tmp_path):
    """window=step=0 on a stream routes to the stateful over-window
    operator instead of dividing by zero."""
    d = os.path.join(str(tmp_path), "inf_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("k,v,t\n")
        f.write('x,1,"2022-01-01 00:00:00"\n')
        f.write('x,2,"2022-01-01 01:00:00"\n')
        f.write('zed,0,"2022-02-01 00:00:00"\n')
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", String).build()
    )
    source = FileSystemSource(
        name="infs_src", path=d, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="%Y-%m-%d %H:%M:%S",
    )
    view = SlidingFeatureView(
        name="infs_view",
        source=source,
        features=[
            Feature(
                "total",
                transform=SlidingWindowTransform(
                    "v", "SUM", window_size=timedelta(0), step_size=timedelta(0),
                    group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=True,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    df = client.processor.get_stream_dataframe(view)
    q = (
        df.writeStream.outputMode("append").format("memory")
        .queryName("infs_out").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    totals = sorted(
        r.total for r in client.spark.sql("SELECT * FROM infs_out").collect()
        if r["k"] == "x"
    )
    assert totals == [1, 3]


def _vec_corpus(spark, ids):
    """Tiny embedding corpus with the given (string or int) ids: one-hot
    on (h % 4) plus h-dependent noise, so no two rows are proportional
    (cosine < ~0.998 for every distinct pair)."""
    rows = [
        (
            i,
            [
                1.0 if d == h % 4 else 0.01 * (h + 1)
                for d in range(4)
            ],
        )
        for h, i in enumerate(ids)
    ]
    id_t = "string" if isinstance(ids[0], str) else "long"
    return spark.createDataFrame(rows, f"id {id_t}, vec array<double>")


def test_ivf_and_semantic_dedup_accept_string_ids(spark):
    """Review finding: the cell-assignment folds hard-cast ids to BIGINT
    (NULL for non-numeric ids in non-ANSI mode -> silent no-op dedup /
    empty IVF results), and the arrow twin crashed on int(str_id).  Both
    paths must work for string ids and agree with each other."""
    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.similarity import ivf_topk, semantic_dedup

    ids = [f"doc-{c}" for c in "abcdefgh"]
    corpus = _vec_corpus(spark, ids)
    try:
        got_sql = ivf_topk(
            corpus, corpus, "vec", "id", k=2, n_centroids=4, nprobe=4,
            impl="sql",
        ).orderBy("query_id", "rank").collect()
        got_arrow = ivf_topk(
            corpus, corpus, "vec", "id", k=2, n_centroids=4, nprobe=4,
            impl="arrow",
        ).orderBy("query_id", "rank").collect()
        assert [tuple(r) for r in got_sql] == [tuple(r) for r in got_arrow]
        assert len(got_sql) > 0

        # semantic_dedup must actually find cells (not silently keep all)
        dup_ids = ids + ["doc-a-copy"]
        dup = _vec_corpus(spark, ids).unionByName(
            _vec_corpus(spark, ["doc-a-copy"])
        )
        out = semantic_dedup(dup, "vec", "id", threshold=0.999999)
        kept = {r["id"] for r in out.filter("kept").collect()}
        # doc-a and doc-a-copy share an identical vector: exactly one of
        # the pair survives
        assert len({"doc-a", "doc-a-copy"} & kept) == 1
        assert len(kept) == len(dup_ids) - 1
    finally:
        release_caches()


def test_brute_force_sql_excludes_zero_norm_vectors(spark):
    """Review finding: a zero-norm corpus vector scored NaN and Spark DESC
    ranked it FIRST for every query in the SQL path, while the arrow twin
    dropped it — both must exclude it."""
    from feathub_spark.datapipe.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "id long, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.05])], "id long, vec array<double>"
    )
    for impl in ("sql", "arrow"):
        got = brute_force_topk(
            corpus, queries, "vec", "id", k=3, impl=impl
        ).collect()
        assert all(r["neighbor_id"] != 3 for r in got), impl
        assert {r["neighbor_id"] for r in got} == {1, 2}, impl


def test_srp_signature_clamps_to_vector_width(spark):
    """Review finding: zip_with NULL-padding gave every dimension past
    `dims` one identical per-plane weight (wide vectors) or NULLed the
    whole projection (narrow vectors).  The clamped form projects onto
    the first min(dims, width) dims."""
    from feathub_spark.datapipe.similarity import _srp_signature
    from pyspark.sql import functions as F

    wide = spark.createDataFrame(
        [(1, [float(d % 5) - 2.0 for d in range(8)])],
        "id long, vec array<double>",
    )
    prefix = spark.createDataFrame(
        [(1, [float(d % 5) - 2.0 for d in range(4)])],
        "id long, vec array<double>",
    )
    sig = _srp_signature("vec", planes=8, dims=4, seed=3)
    got_wide = wide.select(F.expr(sig).alias("s")).first()["s"]
    got_prefix = prefix.select(F.expr(sig).alias("s")).first()["s"]
    assert got_wide == got_prefix  # only the first 4 dims participate
    # narrow vectors must not collapse to the all-zero signature
    assert any(b == 1 for b in got_prefix)


def test_gemm_chunked_scoring_matches_unchunked(spark):
    """Review finding: the GEMM score tensor grew with the salt group's
    corpus slice (OOM class).  Chunked scoring must be value-identical:
    top-(k+1) of per-chunk top-(k+1)s equals the global top-(k+1)."""
    from feathub_spark.datapipe.similarity import _gemm_scored_topk

    corpus = _vec_corpus(spark, list(range(40)))
    queries = _vec_corpus(spark, [100, 101])
    base = _gemm_scored_topk(
        corpus, queries, "vec", "id", 5, "id", integer=False, n_salts=2,
    ).orderBy("query_id", "rank").collect()
    tiny_chunks = _gemm_scored_topk(
        corpus, queries, "vec", "id", 5, "id", integer=False, n_salts=2,
        chunk_cells=4,  # forces chunk=1..2 rows per slice
    ).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in tiny_chunks]
    assert len(base) == 10


def test_bpe_token_count_excludes_whitespace_runs(spark):
    """Review finding: Spark's SQL literal unescaping ate the \\s in
    BPE_ISH_PATTERN, counting whitespace runs as punctuation tokens."""
    from feathub_spark.datapipe.text import bpe_like_token_count

    df = spark.createDataFrame(
        [(1, "a  b"), (2, "hello\n\nworld"), (3, "x, y!")],
        "id long, text string",
    )
    got = {r["id"]: r["n"] for r in df.select(
        "id", bpe_like_token_count("text").alias("n")).collect()}
    assert got == {1: 2, 2: 2, 3: 4}  # 'x', ',', ' y', '!'


def test_url_domains_strips_userinfo(spark):
    """Review finding: 'https://x@badsite.com/' extracted 'x@badsite.com'
    (and 'user:pass@host' extracted 'user'), evading domain blocklists."""
    from feathub_spark.datapipe.text import domain_blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "see https://x@badsite.com/page"),
            (2, "see https://alice:pw@badsite.com/page"),
            (3, "see https://goodsite.com/?next=a@b.com"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["blocked"] for r in
           domain_blocklist_filter(df, "text", ["badsite.com"]).collect()}
    assert got == {1: True, 2: True, 3: False}


def test_normalize_urls_drops_fragment_query(spark):
    """Review finding: an unanchored '\\?' matched inside the fragment,
    resurrecting '#frag?b=1' as a query string."""
    from feathub_spark.datapipe.text import normalize_urls

    df = spark.createDataFrame(
        [
            (1, "http://x.com/p#frag?b=1"),
            (2, "http://x.com/p"),
            (3, "http://x.com/p?a=1#frag?b=2"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r["norm_url"]
           for r in normalize_urls(df, "url").collect()}
    assert got[1] == "http://x.com/p"
    assert got[1] == got[2]
    assert got[3] == "http://x.com/p?a=1"


def test_simhash_pairs_band_width_covers_small_bits(spark):
    """Review finding: width was 64 // bands regardless of `bits`, so
    bits < 48 left the high bands all-zero — an n^2 bucket join.  Width
    now ceils bits/bands; recall stays exact (pigeonhole over all bits)."""
    from feathub_spark.datapipe.dedup import simhash_pairs

    df = spark.createDataFrame(
        [(i, f"common text body number {i}") for i in range(6)]
        + [(100, "common text body number 0")],
        "id long, text string",
    )
    out = simhash_pairs(
        df, "text", "id", max_hamming=3, bands=4, bits=32, hash_fn="poly"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 100) in pairs  # identical text: hamming 0, must be found
