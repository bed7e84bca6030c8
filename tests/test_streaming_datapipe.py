"""Streaming conformance for the STATELESS datapipe operators: the text
hygiene stages (normalize, PII scrub, quality/structure signals,
winnowing fingerprint extraction, compression ratio) are narrow per-row
transformations, so the same code must run unmodified on a Structured
Streaming DataFrame and produce byte-identical results to the batch path.
Streaming exact dedup (dropDuplicatesWithinWatermark) is covered in
test_streaming.py; the aggregating datapipe operators (corpus counts,
index joins) are batch-by-design."""

import pytest

from pyspark.sql import functions as F


def _stream_of(spark, batch_df, tmp_path, name):
    d = str(tmp_path / f"in_{name}")
    batch_df.write.parquet(d)
    return spark.readStream.schema(batch_df.schema).parquet(d)


def _to_memory(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stateless_datapipe_ops_stream_equals_batch(spark, tmp_path):
    from feathub_spark.datapipe.passages import winnow_fingerprints
    from feathub_spark.datapipe.quality import compression_ratio
    from feathub_spark.datapipe.text import (
        normalize_text,
        pii_scrub,
        structure_signals,
        url_domains,
    )

    rows = [
        (1, "Café  visit https://www.spam.org/x mail a@b.co\n# head\nbody"),
        (2, "plain ascii prose " * 5),
        (3, ""),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    def pipeline(df):
        out = normalize_text(df, "text", out_col="norm")
        out = pii_scrub(out, "text")
        out = winnow_fingerprints(out, "text", "doc_id", 8, 4)
        out = compression_ratio(out, "text", "doc_id")
        return out.select(
            "doc_id",
            "norm",
            "clean_text",
            F.col("__fps__").alias("fps"),
            "compression_ratio",
            url_domains("text").alias("domains"),
            structure_signals("text").alias("structure"),
        )

    expected = {r["doc_id"]: r for r in pipeline(batch).collect()}

    stream = _stream_of(spark, batch, tmp_path, "dp")
    _to_memory(pipeline(stream), tmp_path, "dp_out")
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM dp_out").collect()}

    assert set(got) == set(expected)
    for i in expected:
        e, g = expected[i], got[i]
        assert g["norm"] == e["norm"]
        assert g["clean_text"] == e["clean_text"]
        assert sorted(g["fps"]) == sorted(e["fps"])
        assert g["compression_ratio"] == e["compression_ratio"]
        assert g["domains"] == e["domains"]
        assert g["structure"] == e["structure"]
    # sanity: the pipeline actually did something on row 1
    assert "[EMAIL]" in got[1]["clean_text"] or "@" not in got[1]["clean_text"]
    assert got[1]["domains"] == ["spam.org"]

    # dedup_paragraphs is per-row stateless too: stream == batch
    from feathub_spark.datapipe.passages import dedup_paragraphs

    def para_pipeline(df):
        planted = df.select(
            "doc_id",
            F.expr(
                "concat(substr(text, 1, 10), '\\n\\n', text, '\\n\\n', "
                "substr(text, 1, 10))"
            ).alias("text"),
        )
        return dedup_paragraphs(planted, "text", "doc_id")

    p_expected = {r["doc_id"]: tuple(r) for r in para_pipeline(batch).collect()}
    p_stream = _stream_of(spark, batch, tmp_path, "para")
    _to_memory(para_pipeline(p_stream), tmp_path, "para_out")
    p_got = {
        r["doc_id"]: tuple(r)
        for r in spark.sql("SELECT * FROM para_out").collect()
    }
    assert p_got == p_expected
    # planted dup removed for non-empty docs (doc 3 is all-blank: kept)
    assert p_got[1][3] >= 1 and p_got[2][3] >= 1 and p_got[3][3] == 0


def test_match_against_index_streaming_foreachbatch(spark, tmp_path):
    """Incremental ingest dedup in streaming: NEW documents arrive as a
    stream and are checked per micro-batch against a STATIC historical
    fingerprint index via foreachBatch — the production shape for
    continuous corpus growth (the index is itself incrementally
    maintainable: winnow_index output is a plain (fp) table).  Results
    must equal the batch run over the same rows."""
    from feathub_spark.datapipe.passages import match_against_index, winnow_index

    hist = spark.createDataFrame(
        [(i, f"historical passage number {i} with shared boilerplate tail")
         for i in range(8)],
        "doc_id long, text string",
    )
    new_rows = (
        # doc 100 copies a historical passage, 101 is fresh
        [(100, "historical passage number 3 with shared boilerplate tail")]
        + [(101, "entirely novel content nothing indexed before here at all")]
        + [(102 + i, f"historical passage number {i} with shared boilerplate tail")
           for i in range(3)]
    )
    new_batch = spark.createDataFrame(new_rows, "doc_id long, text string")
    index = winnow_index(hist, "text", "doc_id", gram_len=8, window=4)

    kw = dict(gram_len=8, window=4)
    expected = {
        r["doc_id"]: r
        for r in match_against_index(new_batch, index, "text", "doc_id", **kw)
        .collect()
    }

    got = {}

    def handle(bdf, _bid):
        for r in match_against_index(bdf, index, "text", "doc_id", **kw).collect():
            got[r["doc_id"]] = r

    stream = _stream_of(spark, new_batch, tmp_path, "idx")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck_idx"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert set(got) == set(expected)
    for i in expected:
        assert got[i]["n_fingerprints"] == expected[i]["n_fingerprints"]
        assert got[i]["n_matched"] == expected[i]["n_matched"]
        assert got[i]["dup_fraction"] == expected[i]["dup_fraction"]
    # the duplicated docs really matched and the fresh one really did not
    assert expected[100]["dup_fraction"] == 1.0
    assert expected[101]["dup_fraction"] == 0.0


def test_boilerplate_lines_streaming_foreachbatch(spark, tmp_path):
    """Grouped-rebuild conformance for the corpus-aggregating line-removal
    operator: line frequencies are corpus-wide by definition, so the
    streaming shape is foreachBatch over a per-corpus batch (one ingest
    unit = one micro-batch); within it the operator must produce exactly
    the batch result."""
    from feathub_spark.datapipe.passages import remove_boilerplate_lines

    rows = [
        (i, "standard header\n" + f"unique body line {i}"
            + ("\nshared footer" if i % 2 == 0 else ""))
        for i in range(10)
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    expected = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(batch, "text", "doc_id", min_docs=2)
        .collect()
    }

    got = {}

    def handle(bdf, _bid):
        for r in remove_boilerplate_lines(bdf, "text", "doc_id", min_docs=2).collect():
            got[r["doc_id"]] = r

    stream = _stream_of(spark, batch, tmp_path, "bp")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck_bp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert set(got) == set(expected)
    for i in expected:
        assert got[i]["clean_text"] == expected[i]["clean_text"]
    # boilerplate really got cut, unique bodies really survived
    assert "standard header" not in got[1]["clean_text"]
    assert "unique body line 1" in got[1]["clean_text"]


def test_session_stats_matches_native_session_window(spark, tmp_path):
    """The gaps-and-islands sessionizer must carve exactly the sessions
    Spark's own session_window aggregation produces (same gap), in batch
    AND in a watermarked streaming aggregation — the native stateful path
    for streaming session summaries."""
    from feathub_spark.datapipe.sessions import session_stats

    rows = []
    # three users, sessions separated by > 10s gaps, events 1-4s apart
    t = 1_700_000_000_000_000
    for u in range(3):
        base = t + u * 977_000
        for s in range(3):
            start = base + s * 60_000_000  # 60s between sessions
            for i in range(u + s + 1):
                rows.append((len(rows), u, start + i * 3_100_000))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")

    mine = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in session_stats(
            df, "user_id", "ts_us", gap_us=10_000_000, id_col="event_id"
        ).collect()
    }

    withts = df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    native_batch = {
        (r["user_id"], r["start_us"]): r["n"]
        for r in withts.groupBy(
            "user_id", F.session_window("ts", "10 seconds").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.unix_micros("w.start").alias("start_us"), "n"
        )
        .collect()
    }
    assert mine == native_batch

    # streaming: same aggregation with a watermark, append after close
    d = str(tmp_path / "sess_in")
    withts.write.parquet(d)
    stream = spark.readStream.schema(withts.schema).parquet(d)
    q = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id", F.session_window("ts", "10 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.unix_micros("w.start").alias("start_us"), "n")
        .writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    native_stream = {
        (r["user_id"], r["start_us"]): r["n"]
        for r in spark.sql("SELECT * FROM native_sessions").collect()
    }
    assert native_stream == mine


def test_bloom_prune_stream_equals_batch(spark, tmp_path):
    """The realistic bloom deployment: bits built in batch from
    yesterday's keys, the membership test pruning today's STREAM at the
    scan — stateless per-row once the 1-row bits table exists, so stream
    output must equal batch output exactly (false positives included)."""
    from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune

    keys = spark.range(50).select((F.col("id") * 7).alias("k"))
    bloom = bloom_filter_bits(keys, "k", m_bits=1 << 10, k=3, seed=9)

    probe = spark.range(400).select(F.col("id").alias("k"))
    expected = sorted(
        r.k
        for r in bloom_prune(
            probe, "k", bloom, m_bits=1 << 10, k=3, seed=9
        ).collect()
    )

    stream = _stream_of(spark, probe, tmp_path, "bloom")
    _to_memory(
        bloom_prune(stream, "k", bloom, m_bits=1 << 10, k=3, seed=9),
        tmp_path,
        "bloom_out",
    )
    got = sorted(r.k for r in spark.sql("SELECT k FROM bloom_out").collect())
    assert got == expected
    assert {i * 7 for i in range(50)} <= set(got)


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel == batch funnel on shuffled out-of-order arrival:
    the greedy chain is an online algorithm, so with watermark buffering
    the final streaming emission per key must equal the batch fold."""
    import os
    import random
    import time as _time

    from feathub_spark.datapipe.sessions import funnel_steps
    from feathub_spark.streaming.stateful_funnel import stateful_funnel

    rnd = random.Random(11)
    rows = []
    for i in range(300):
        rows.append(
            (
                f"u{rnd.randrange(8)}",
                rnd.choice(["view", "click", "buy", "other"]),
                rnd.randrange(1, 2000),
            )
        )
    batch = spark.createDataFrame(rows, "k string, tp string, t long")

    # batch truth (millis as the time unit)
    expected = {
        r.k: (r.n_steps, list(r.step_ts))
        for r in funnel_steps(
            batch.withColumn("ms", F.col("t") * 1000),
            "k", "ms", "tp", ["view", "click", "buy"],
        ).collect()
    }

    # shuffled files, sentinel last to flush the watermark
    d = str(tmp_path / "funnel_in")
    os.makedirs(d)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    now = _time.time()

    def _stamp(sub, ts):
        # the file stream source orders by PART-FILE mtime, not directory
        for root, _, files in os.walk(os.path.join(d, sub)):
            for fn in files:
                os.utime(os.path.join(root, fn), (ts, ts))

    third = len(shuffled) // 3 + 1
    for i in range(3):
        spark.createDataFrame(
            shuffled[i * third : (i + 1) * third], "k string, tp string, t long"
        ).coalesce(1).write.parquet(os.path.join(d, f"f{i}"))
        _stamp(f"f{i}", now + 10 * i)
    # the sentinel must be a FUNNEL-TYPE event: the operator prunes other
    # types and Catalyst pushes that filter below the watermark node, so
    # only funnel-type events advance the watermark (documented liveness
    # contract)
    spark.createDataFrame(
        [("zz", "view", 1_000_000)], "k string, tp string, t long"
    ).coalesce(1).write.parquet(os.path.join(d, "f9"))
    _stamp("f9", now + 100)

    stream = (
        spark.readStream.schema("k string, tp string, t long")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "*"))
        .withColumn("__ts__", F.timestamp_seconds(F.col("t")))
        .withWatermark("__ts__", "2000 seconds")
    )
    out = stateful_funnel(stream, "k", "tp", ["view", "click", "buy"],
                          event_time_col="__ts__")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_stream")
        .option("checkpointLocation", str(tmp_path / "ck_funnel"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got_rows = [
        r for r in spark.sql("SELECT * FROM funnel_stream").collect()
        if r.k != "zz"
    ]
    got = {}
    for r in got_rows:
        cur = got.get(r.k)
        if cur is None or r.n_steps > cur[0]:
            got[r.k] = (r.n_steps, list(r.step_ts))
    # streaming step_ts are millis; batch used ms = t*1000 too
    assert got == expected
    # every advance emitted exactly once per step level
    per_key_levels = {}
    for r in got_rows:
        per_key_levels.setdefault(r.k, []).append(r.n_steps)
    for k, levels in per_key_levels.items():
        assert sorted(levels) == list(range(1, max(levels) + 1))


def test_match_minhash_index_streaming_foreachbatch(spark, tmp_path):
    """Document-level near-dup analog of the winnow-index streaming test:
    NEW documents stream in and are LSH-checked per micro-batch against a
    STATIC minhash index; results must equal the batch run."""
    from feathub_spark.datapipe.dedup import match_minhash_index, minhash_index

    hist = spark.createDataFrame(
        [(i, f"historical document number {i} sharing a long boilerplate body "
             f"of common words repeated across the corpus") for i in range(6)],
        "doc_id long, text string",
    )
    new_rows = [
        (100, "historical document number 3 sharing a long boilerplate body "
              "of common words repeated across the corpus"),  # exact replica
        (101, "entirely novel content nothing indexed before here at all "
              "with its own fresh words"),
    ]
    new_batch = spark.createDataFrame(new_rows, "doc_id long, text string")
    kw = dict(num_hashes=64, bands=16, shingle_k=2, seed=42)
    index = minhash_index(hist, "text", "doc_id", **kw)

    expected = {
        (r["new_id"], r["match_id"]): r["jaccard"]
        for r in match_minhash_index(
            new_batch, index, "text", "doc_id", threshold=0.5, **kw
        ).collect()
    }
    assert (100, 3) in expected and expected[(100, 3)] == 1.0
    assert not any(n == 101 for n, _ in expected)

    got = {}

    def handle(bdf, _bid):
        for r in match_minhash_index(
            bdf, index, "text", "doc_id", threshold=0.5, **kw
        ).collect():
            got[(r["new_id"], r["match_id"])] = r["jaccard"]

    stream = _stream_of(spark, new_batch, tmp_path, "mh_idx")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck_mh_idx"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got == expected


def test_stateful_scd2_matches_batch(spark, tmp_path):
    """Streaming SCD2 == batch SCD2 on shuffled out-of-order arrival: the
    stream's closed intervals must equal the batch builder's
    valid_to-IS-NOT-NULL rows over the same completed prefix (the open
    interval lives only in state; append mode cannot retract it)."""
    import os
    import random
    import time as _time

    from feathub_spark.datapipe.scd import scd2_intervals
    from feathub_spark.streaming.stateful_scd2 import stateful_scd2

    rnd = random.Random(23)
    rows = []
    used = set()
    for _ in range(400):
        k = f"u{rnd.randrange(8)}"
        t = rnd.randrange(1, 5000)
        while (k, t) in used:  # unique ts per key (documented contract)
            t = rnd.randrange(1, 5000)
        used.add((k, t))
        rows.append((k, t, rnd.choice(["A", "B", "C", None])))
    batch = spark.createDataFrame(rows, "k string, t long, v string")

    # batch truth in millis, closed intervals only
    expected = {
        (r.k, r.v, r.valid_from * 1000, r.valid_to * 1000)
        for r in scd2_intervals(batch, "k", "t", "v").collect()
        if r.valid_to is not None
    }

    # shuffled multi-file arrival + a far-future sentinel to flush
    d = str(tmp_path / "scd2_in")
    os.makedirs(d)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    now = _time.time()

    def _stamp(sub, ts):
        for root, _, files in os.walk(os.path.join(d, sub)):
            for fn in files:
                os.utime(os.path.join(root, fn), (ts, ts))

    third = len(shuffled) // 3 + 1
    for i in range(3):
        spark.createDataFrame(
            shuffled[i * third : (i + 1) * third], "k string, t long, v string"
        ).coalesce(1).write.parquet(os.path.join(d, f"f{i}"))
        _stamp(f"f{i}", now + 10 * i)
    spark.createDataFrame(
        [("zz", 10_000_000, "A")], "k string, t long, v string"
    ).coalesce(1).write.parquet(os.path.join(d, "f9"))
    _stamp("f9", now + 100)

    stream = (
        spark.readStream.schema("k string, t long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "*"))
        .withColumn("__ts__", F.timestamp_seconds(F.col("t")))
        .withWatermark("__ts__", "5000 seconds")
    )
    out = stateful_scd2(stream, "k", "v", event_time_col="__ts__")
    _to_memory(out, tmp_path, "scd2_stream")
    got = {
        (r.k, r.v, r.valid_from_ms, r.valid_to_ms)
        for r in spark.sql("SELECT * FROM scd2_stream").collect()
        if r.k != "zz"
    }
    assert got == expected


def test_state_json_round_trips_non_native_scalars():
    """Review finding: plain json.dumps crashed the stateful operators'
    state round-trip on Decimal/Timestamp/date/bytes values (and
    default=str would have silently corrupted replayed aggregates).  The
    typed codec must restore the exact Python types."""
    import datetime
    import decimal

    import pandas as pd

    from feathub_spark.streaming._state_json import dumps_state, loads_state

    history = [
        [1000, decimal.Decimal("10.25"), True],
        [2000, pd.Timestamp("2022-01-01T08:30:00.123456"), False],
        [3000, datetime.date(2022, 1, 2), True],
        [4000, b"\x00\xffbin", True],
        [5000, None, True],
        [6000, {"k": decimal.Decimal("-3.5"), "n": 7}, False],
    ]
    got = loads_state(dumps_state(history))
    assert got[0][1] == decimal.Decimal("10.25")
    assert isinstance(got[0][1], decimal.Decimal)
    assert got[1][1] == pd.Timestamp("2022-01-01T08:30:00.123456")
    assert got[2][1] == datetime.date(2022, 1, 2)
    assert not isinstance(got[2][1], datetime.datetime)
    assert got[3][1] == b"\x00\xffbin"
    assert got[4][1] is None
    assert got[5][1] == {"k": decimal.Decimal("-3.5"), "n": 7}
    # exact decimal SUM survives the round trip (the default=str failure
    # mode would make this a string concat / TypeError)
    assert got[0][1] + got[5][1]["k"] == decimal.Decimal("6.75")


def test_state_json_marker_lookalike_maps_round_trip():
    """Review finding: a genuine user map value that is exactly a
    single-key dict named like a codec marker (__fh_dec__ etc.) must NOT
    be mis-decoded into a Decimal/Timestamp — encode escapes it."""
    import decimal

    from feathub_spark.streaming._state_json import dumps_state, loads_state

    cases = [
        {"__fh_dec__": "10.25"},              # marker-shaped user map
        {"__fh_ts__": "2022-01-01T00:00:00"},
        {"__fh_raw__": {"__fh_dec__": "1"}},  # nested wrapper lookalike
        {"__fh_b64__": 123},
        {"__fh_dec__": decimal.Decimal("2.5")},  # value still typed inside
    ]
    got = loads_state(dumps_state(cases))
    assert got[0] == {"__fh_dec__": "10.25"}
    assert isinstance(got[0]["__fh_dec__"], str)
    assert got[1] == {"__fh_ts__": "2022-01-01T00:00:00"}
    assert got[2] == {"__fh_raw__": {"__fh_dec__": "1"}}
    assert got[3] == {"__fh_b64__": 123}
    assert got[4] == {"__fh_dec__": decimal.Decimal("2.5")}
    assert isinstance(got[4]["__fh_dec__"], decimal.Decimal)
    # two-key dicts with marker-ish keys are untouched by the escape
    two = {"__fh_dec__": "a", "other": 1}
    assert loads_state(dumps_state(two)) == two


def test_state_json_non_string_map_keys_do_not_crash():
    """Review finding: the marker-escape check must not call .startswith
    on non-string keys (map<int,...> user values)."""
    import json

    from feathub_spark.streaming._state_json import dumps_state, loads_state

    got = loads_state(dumps_state([{1: "a"}, {2: 3, 4: 5}]))
    # json stringifies non-string keys — pre-existing behavior, unchanged
    assert got == [{"1": "a"}, {"2": 3, "4": 5}]


def test_state_json_legacy_unescaped_raw_blob_tolerated():
    """Review finding: a PRE-escape checkpoint blob holding a genuine
    {'__fh_raw__': <non-dict>} user map must decode unchanged, not
    crash on .items()."""
    import json

    from feathub_spark.streaming._state_json import loads_state

    legacy = json.dumps([{"__fh_raw__": 5}])
    assert loads_state(legacy) == [{"__fh_raw__": 5}]
