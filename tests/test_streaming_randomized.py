"""Randomized stream<->batch conformance: the stateful streaming operators
(sliding, over-window, as-of join) must reproduce the batch evaluators on
random keyed data arriving OUT OF ORDER across micro-batches (late data
within the watermark bound), per reference
test_sliding_window_transform.py:2647-2843 (late-data merge cases).

Arrival order is decoupled from event time: rows are shuffled into several
files consumed one per trigger (maxFilesPerTrigger=1), with
max_out_of_orderness covering the full time span so no row is ever beyond
the watermark.  A far-future sentinel key in the last file drains every
real key's windows.
"""

import math
import os
import random
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
from feathub_spark.feature_views.transforms import (
    OverWindowTransform,
    SlidingWindowTransform,
)

KEYS = ["k1", "k2", "k3"]
N_ROWS = 60
SPAN_S = 50


def _gen_rows(rnd, allow_nulls=True, unique_ts=False):
    rows = []
    for i in range(N_ROWS):
        k = rnd.choice(KEYS)
        t = rnd.randrange(0, SPAN_S)
        if unique_ts:
            t = t * N_ROWS + i
        # +1: event time 0 collides with the INITIAL watermark (also 0) and
        # Spark's stateful late-row filter drops ts <= wm — standard
        # watermark semantics (Flink behaves the same), not an engine gap
        t += 1
        v = None if (allow_nulls and rnd.random() < 0.15) else rnd.randrange(-50, 100)
        rows.append((k, v, t))
    return rows


def _write_shuffled_files(tmp_path, name, rows, rnd, n_files=3, sentinel_t=None):
    """Rows shuffled across n_files (arrival order != time order).  The file
    stream source picks files up in modification-time order, so mtimes are
    set explicitly increasing — the sentinel (which advances the watermark
    past everything) must be consumed LAST."""
    import time as _time

    d = os.path.join(str(tmp_path), name)
    os.makedirs(d)
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    chunk = (len(shuffled) + n_files - 1) // n_files
    now = _time.time()
    for i in range(n_files):
        p = os.path.join(d, f"{i}_part.csv")
        with open(p, "w") as f:
            f.write("k,v,t\n")
            for k, v, t in shuffled[i * chunk : (i + 1) * chunk]:
                f.write(f"{k},{'' if v is None else v},{t}\n")
        os.utime(p, (now + 10 * i, now + 10 * i))
    if sentinel_t is not None:
        p = os.path.join(d, f"{n_files}_sentinel.csv")
        with open(p, "w") as f:
            f.write("k,v,t\n")
            f.write(f"zz,1,{sentinel_t}\n")
        os.utime(p, (now + 10 * n_files, now + 10 * n_files))
    return d


def _source(path, name, ooo_s, one_file_per_trigger=True):
    schema = (
        Schema.new_builder()
        .column("k", String).column("v", Int64).column("t", Int64).build()
    )
    props = {"maxFilesPerTrigger": "1"} if one_file_per_trigger else {}
    return FileSystemSource(
        name=name, path=path, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="epoch",
        max_out_of_orderness=timedelta(seconds=ooo_s),
        data_format_props=props,
    )


def _run_to_memory(spark, processor, view, name):
    df = processor.get_stream_dataframe(view)
    query = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _norm(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    if isinstance(x, dict):
        return tuple(sorted((int(k), int(v)) for k, v in x.items()))
    if isinstance(x, float):
        return round(x, 9)
    return x


def test_randomized_stateful_sliding_matches_batch(client, tmp_path):
    rnd = random.Random(97)
    rows = _gen_rows(rnd)
    window_s, step_s = 20, 10
    # sentinel far enough that every real key's drain window closes
    sentinel_t = SPAN_S + 60 + window_s + 5 * step_s + 60
    d = _write_shuffled_files(tmp_path, "rss_in", rows, rnd, sentinel_t=sentinel_t)
    src = _source(d, "rss_src", ooo_s=60)

    def make_view(name):
        return SlidingFeatureView(
            name=name,
            source=src,
            features=[
                Feature("s", transform=SlidingWindowTransform(
                    "v", "SUM", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"])),
                Feature("c", transform=SlidingWindowTransform(
                    "v", "COUNT", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"])),
                # rows here carry TIED timestamps, so only order-insensitive
                # aggs are well-defined (FIRST/LAST under ties are arrival-
                # order-dependent in the reference as well)
                Feature("mn", transform=SlidingWindowTransform(
                    "v", "MIN", window_size=timedelta(seconds=step_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"])),
                Feature("vc", transform=SlidingWindowTransform(
                    "v", "VALUE_COUNTS", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"])),
            ],
            enable_empty_window_output=True,
            skip_same_window_output=True,
        )

    stream_view = make_view("rss_stream")
    client.build_features([src, stream_view])
    out = _run_to_memory(client.spark, client.processor, stream_view, "rss_out")
    stream_rows = {
        (r["k"], r["window_time"]): (_norm(r["s"]), _norm(r["c"]), _norm(r["mn"]), _norm(r["vc"]))
        for r in out.collect() if r["k"] != "zz"
    }

    batch_view = make_view("rss_batch")
    client.build_features([batch_view])
    batch = client.get_features(batch_view).to_pandas()
    batch_rows = {
        (r["k"], r["window_time"]): (_norm(r["s"]), _norm(r["c"]), _norm(r["mn"]), _norm(r["vc"]))
        for _, r in batch.iterrows() if r["k"] != "zz"
    }
    assert len(stream_rows) > 10
    assert stream_rows == batch_rows


def test_randomized_stateful_over_matches_batch(client, tmp_path):
    rnd = random.Random(131)
    rows = _gen_rows(rnd, unique_ts=True)  # limit needs deterministic order
    span = SPAN_S * N_ROWS + N_ROWS       # max event time in the data
    sentinel_t = 2 * span + 100           # final wm = sentinel - span > span
    d = _write_shuffled_files(tmp_path, "rso_in", rows, rnd, sentinel_t=sentinel_t)
    src = _source(d, "rso_src", ooo_s=span)

    def make_view(name):
        return DerivedFeatureView(
            name=name,
            source=src,
            features=[
                Feature("s10", transform=OverWindowTransform(
                    "v", "SUM", window_size=timedelta(seconds=1000),
                    group_by_keys=["k"])),
                Feature("cnt", transform=OverWindowTransform(
                    "v", "COUNT", group_by_keys=["k"])),
                Feature("l3", transform=OverWindowTransform(
                    "v", "LAST_VALUE", group_by_keys=["k"], limit=3)),
            ],
            keep_source_fields=True,
        )

    stream_view = make_view("rso_stream")
    client.build_features([src, stream_view])
    out = _run_to_memory(client.spark, client.processor, stream_view, "rso_out")
    stream_rows = sorted(
        (r["k"], r["t"], _norm(r["s10"]), _norm(r["cnt"]), _norm(r["l3"]))
        for r in out.collect() if r["k"] != "zz"
    )

    batch_view = make_view("rso_batch")
    client.build_features([batch_view])
    batch = client.get_features(batch_view).to_pandas()
    batch_rows = sorted(
        (r["k"], int(r["t"]), _norm(r["s10"]), _norm(r["cnt"]), _norm(r["l3"]))
        for _, r in batch.iterrows() if r["k"] != "zz"
    )
    assert len(stream_rows) == N_ROWS
    assert stream_rows == batch_rows


def test_randomized_stateful_asof_matches_batch(client, tmp_path):
    rnd = random.Random(177)
    left_rows = _gen_rows(rnd, allow_nulls=False)
    right_rows = _gen_rows(rnd, allow_nulls=False, unique_ts=True)
    right_rows = [(k, v, t % (SPAN_S * 2)) for (k, v, t) in right_rows]
    span = SPAN_S * 2                     # max event time across both sides
    sentinel_t = 2 * span + 100           # final wm = sentinel - span > span
    ld = _write_shuffled_files(tmp_path, "rsa_l", left_rows, rnd, sentinel_t=sentinel_t)
    rd = _write_shuffled_files(tmp_path, "rsa_r", right_rows, rnd, sentinel_t=sentinel_t)
    lsrc = _source(ld, "rsa_left", ooo_s=span)
    rsrc = _source(rd, "rsa_right", ooo_s=span)

    rview = DerivedFeatureView(
        name="rsa_rv",
        source=rsrc,
        features=[Feature("rv", transform="v", keys=["k"])],
        keep_source_fields=True,
    )

    def make_view(name):
        return DerivedFeatureView(
            name=name,
            source=lsrc,
            features=["rsa_rv.rv"],
            keep_source_fields=True,
        )

    client.build_features([rsrc, rview])
    stream_view = make_view("rsa_stream")
    client.build_features([lsrc, stream_view])
    out = _run_to_memory(client.spark, client.processor, stream_view, "rsa_out")
    stream_rows = sorted(
        (r["k"], r["t"], r["v"], _norm(r["rv"]))
        for r in out.collect() if r["k"] != "zz"
    )

    batch_view = make_view("rsa_batch")
    client.build_features([batch_view])
    batch = client.get_features(batch_view).to_pandas()
    batch_rows = sorted(
        (r["k"], int(r["t"]), int(r["v"]), _norm(r["rv"]))
        for _, r in batch.iterrows() if r["k"] != "zz"
    )
    assert len(stream_rows) == N_ROWS
    assert stream_rows == batch_rows


def test_randomized_asof_map_payload_ties(client, tmp_path):
    """Map-typed joined feature + DUPLICATE (key, ts) right rows: maps are
    unorderable in Spark, so neither plan can rank tied payloads — batch
    keeps an arbitrary (partition-layout-dependent) winner, streaming
    keeps the LAST-ARRIVED of the tied rows (stateful_asof_join._tie_encode
    collapses every dict to the same key, so the stable sort preserves
    arrival order).  This is the one documented stream/batch divergence of
    the as-of tie rule (orderable payloads are deterministic on both
    sides, join_utils.py / stateful_asof_join.py).  The conformance
    contract verified here: every joined value — on BOTH sides — is the
    map of one of the TIED rows at the as-of timestamp, and left rows
    whose as-of match is unique agree exactly."""
    rnd = random.Random(311)

    def _mnorm(x):
        # _norm assumes int map keys (the VALUE_COUNTS shape); this join
        # feature carries string keys
        if x is None:
            return None
        return tuple(sorted((k, int(v)) for k, v in x.items()))

    left_rows = _gen_rows(rnd, allow_nulls=False)

    # right rows with explicit duplicate (k, t): ~1/3 of the grid points
    # carry 2-3 rows with distinct v
    right_rows = []
    vsrc = 0
    for k in KEYS:
        for t in sorted(rnd.sample(range(1, SPAN_S + 1), 12)):
            n = rnd.choice([1, 1, 2, 3])
            for _ in range(n):
                right_rows.append((k, vsrc, t))
                vsrc += 1

    span = SPAN_S * 2
    sentinel_t = 2 * span + 100
    ld = _write_shuffled_files(tmp_path, "mt_l", left_rows, rnd, sentinel_t=sentinel_t)
    rd = _write_shuffled_files(tmp_path, "mt_r", right_rows, rnd, sentinel_t=sentinel_t)
    lsrc = _source(ld, "mt_left", ooo_s=span)
    rsrc = _source(rd, "mt_right", ooo_s=span)

    rview = DerivedFeatureView(
        name="mt_rv",
        source=rsrc,
        features=[Feature("rv", transform="MAP('a', v)", keys=["k"])],
        keep_source_fields=True,
    )

    def make_view(name):
        return DerivedFeatureView(
            name=name,
            source=lsrc,
            features=["mt_rv.rv"],
            keep_source_fields=True,
        )

    client.build_features([rsrc, rview])
    stream_view = make_view("mt_stream")
    client.build_features([lsrc, stream_view])
    out = _run_to_memory(client.spark, client.processor, stream_view, "mt_out")
    stream_rows = {
        (r["k"], r["t"], r["v"]): _mnorm(r["rv"])
        for r in out.collect() if r["k"] != "zz"
    }

    batch_view = make_view("mt_batch")
    client.build_features([batch_view])
    batch = client.get_features(batch_view).to_pandas()
    batch_rows = {
        (r["k"], int(r["t"]), int(r["v"])): _mnorm(r["rv"])
        for _, r in batch.iterrows() if r["k"] != "zz"
    }
    assert len(stream_rows) == N_ROWS
    assert set(stream_rows) == set(batch_rows)

    # pure-Python as-of model: latest right t <= left t per key; the
    # allowed values are ALL tied rows at that timestamp
    by_key = {}
    for k, v, t in right_rows:
        by_key.setdefault(k, []).append((t, v))
    n_tied_hits = 0
    for (k, t, _v), got_stream in stream_rows.items():
        at_or_before = [(rt, rv) for rt, rv in by_key.get(k, []) if rt <= t]
        got_batch = batch_rows[(k, t, _v)]
        if not at_or_before:
            assert got_stream is None and got_batch is None
            continue
        best_t = max(rt for rt, _ in at_or_before)
        allowed = {
            _mnorm({"a": rv}) for rt, rv in at_or_before if rt == best_t
        }
        assert got_stream in allowed
        assert got_batch in allowed
        if len(allowed) == 1:
            # unique as-of match: the two plans MUST agree exactly
            assert got_stream == got_batch
        else:
            n_tied_hits += 1
    # the generated data must actually exercise the tie path
    assert n_tied_hits > 0
