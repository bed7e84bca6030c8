"""Randomized golden-model tests: engine results vs brute-force Python
implementations of the reference semantics (local-processor style), on
random keyed/timestamped data including timestamp ties and NULLs."""

import math
import os
import random

import pytest

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

N_ROWS = 80
KEYS = ["k1", "k2", "k3"]
MS_STEP = 1000  # second-aligned synthetic timestamps


def _gen_rows(rnd, allow_ties=True, allow_nulls=True):
    rows = []
    for i in range(N_ROWS):
        k = rnd.choice(KEYS)
        t = rnd.randrange(0, 50) * MS_STEP
        if not allow_ties:
            t = t * N_ROWS + i * MS_STEP  # make unique
        v = None if (allow_nulls and rnd.random() < 0.15) else rnd.randrange(-50, 100)
        rows.append((k, v, t // 1000))
    return rows


def _write_source(tmp_path, name, rows):
    path = os.path.join(str(tmp_path), f"{name}.csv")
    with open(path, "w") as f:
        f.write("k,v,t\n")
        for k, v, t in rows:
            f.write(f"{k},{'' if v is None else v},{t}\n")
    schema = (
        Schema.new_builder().column("k", String).column("v", Int64).column("t", Int64).build()
    )
    return FileSystemSource(
        name=name, path=path, data_format="csv", schema=schema,
        keys=["k"], timestamp_field="t", timestamp_format="epoch",
    )


def _brute_over(rows, window_s, limit, filter_pos):
    """Golden model of the over-window semantics (local_processor.py:525-603):
    rows in [t0 - w, t0] per key, optional filter v > 0, most recent `limit`."""
    out = []
    for idx, (k, v, t) in enumerate(rows):
        in_win = [
            (kk, vv, tt)
            for (kk, vv, tt) in rows
            if kk == k and tt <= t and (window_s is None or tt >= t - window_s)
        ]
        if filter_pos:
            in_win = [r for r in in_win if r[1] is not None and r[1] > 0]
        in_win.sort(key=lambda r: r[2])
        # limit slices ROWS (null-valued rows occupy slots); SUM/MAX then
        # skip null values while COUNT counts rows incl nulls (reference
        # aggregation_utils.py len(l))
        if limit is not None:
            in_win = in_win[-limit:]
        vals = [r[1] for r in in_win if r[1] is not None]
        s = sum(vals) if vals else 0
        c = len(in_win)
        mx = max(vals) if vals else None
        out.append((k, t, s, c, mx))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize(
    "window_s,limit,filter_pos",
    [(10, None, False), (None, 5, False), (10, 3, True), (None, None, True)],
)
def test_over_window_random(client, tmp_path, seed, window_s, limit, filter_pos):
    rnd = random.Random(seed * 100 + (window_s or 0) + (limit or 0))
    # `limit` (most-recent-N) is undefined under timestamp ties — both here
    # and in the reference — so tie generation is limited to range frames.
    rows = _gen_rows(rnd, allow_ties=limit is None)
    name = f"rnd_{seed}_{window_s}_{limit}_{filter_pos}"
    source = _write_source(tmp_path, name, rows)
    from datetime import timedelta

    kwargs = dict(group_by_keys=["k"])
    if window_s is not None:
        kwargs["window_size"] = timedelta(seconds=window_s)
    if limit is not None:
        kwargs["limit"] = limit
    if filter_pos:
        kwargs["filter_expr"] = "v > 0"
    view = DerivedFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature("s", transform=OverWindowTransform("v", "SUM", **kwargs)),
            Feature("c", transform=OverWindowTransform("v", "COUNT", **kwargs)),
            Feature("m", transform=OverWindowTransform("v", "MAX", **kwargs)),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()

    expected = _brute_over(rows, window_s, limit, filter_pos)
    # rows sharing (k, t, v) are indistinguishable; compare sorted multisets
    def norm(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else int(v)

    from collections import Counter

    got_set = Counter(
        (r["k"], int(r["t"]), norm(r["s"]), norm(r["c"]), norm(r["m"]))
        for _, r in got.iterrows()
    )
    exp_set = Counter((kk, tt, s, c, mx) for (kk, tt, s, c, mx) in expected)
    assert got_set == exp_set


def _brute_sliding(rows, window_s, step_s):
    """Golden model of non-empty sliding emissions (window [wend-w, wend))."""
    out = {}
    for k, v, t in rows:
        for m in range(window_s // step_s):
            wend = (t // step_s + 1 + m) * step_s
            out.setdefault((k, wend), []).append(v)
    result = {}
    for (k, wend), vals in out.items():
        nn = [v for v in vals if v is not None]
        # COUNT = rows incl null values; SUM skips nulls
        result[(k, wend * 1000 - 1)] = (sum(nn) if nn else 0, len(vals))
    return result


@pytest.mark.parametrize("seed", [7, 8])
def test_sliding_window_random(client, tmp_path, seed):
    rnd = random.Random(seed)
    rows = _gen_rows(rnd)
    window_s, step_s = 20, 10
    name = f"rnds_{seed}"
    source = _write_source(tmp_path, name, rows)
    from datetime import timedelta

    view = SlidingFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature(
                "s",
                transform=SlidingWindowTransform(
                    "v", "SUM", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"],
                ),
            ),
            Feature(
                "c",
                transform=SlidingWindowTransform(
                    "v", "COUNT", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()
    got_map = {
        (r["k"], int(r["window_time"])): (int(r["s"]), int(r["c"]))
        for _, r in got.iterrows()
    }
    assert got_map == _brute_sliding(rows, window_s, step_s)


def _brute_sliding_full(rows, window_s, step_s):
    """Golden model of the full emission semantics per key: step grid to the
    first empty window, SUM default 0, skip-same suppression."""
    by_key = {}
    for k, v, t in rows:
        by_key.setdefault(k, []).append((t, v))
    out = {}
    for k, kv in by_key.items():
        times = sorted(t for t, _ in kv)
        first_wend = (times[0] // step_s + 1) * step_s
        last_wend = (times[-1] // step_s + 1) * step_s + window_s
        prev = None
        wend = first_wend
        while wend <= last_wend:
            rows_in = [v for (t, v) in kv if wend - window_s <= t < wend]
            nn = [v for v in rows_in if v is not None]
            cur = (sum(nn) if nn else 0, len(rows_in))
            if prev is None or cur != prev:
                out[(k, wend * 1000 - 1)] = cur
                prev = cur
            wend += step_s
    return out


@pytest.mark.parametrize("seed", [31, 32])
def test_sliding_full_semantics_random(client, tmp_path, seed):
    rnd = random.Random(seed)
    rows = _gen_rows(rnd)
    window_s, step_s = 30, 10
    name = f"rndf_{seed}"
    source = _write_source(tmp_path, name, rows)
    from datetime import timedelta

    view = SlidingFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature(
                "s",
                transform=SlidingWindowTransform(
                    "v", "SUM", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"],
                ),
            ),
            Feature(
                "c",
                transform=SlidingWindowTransform(
                    "v", "COUNT", window_size=timedelta(seconds=window_s),
                    step_size=timedelta(seconds=step_s), group_by_keys=["k"],
                ),
            ),
        ],
        enable_empty_window_output=True,
        skip_same_window_output=True,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()
    got_map = {
        (r["k"], int(r["window_time"])): (int(r["s"]), int(r["c"]))
        for _, r in got.iterrows()
    }
    assert got_map == _brute_sliding_full(rows, window_s, step_s)


def _brute_sliding_vc(rows, window_s, step_s, filter_pos=False):
    """Golden model for sliding-window VALUE_COUNTS (no empty windows, no
    skip-same): counts of non-null values among rows in [wend-W, wend)."""
    by_key = {}
    for k, v, t in rows:
        by_key.setdefault(k, []).append((t, v))
    out = {}
    for k, kv in by_key.items():
        wends = sorted({(t // step_s + 1) * step_s + j * step_s
                        for t, _ in kv for j in range(window_s // step_s)})
        for wend in wends:
            counts = {}
            for t, v in kv:
                if wend - window_s <= t < wend and v is not None:
                    if filter_pos and not v > 0:
                        continue
                    counts[v] = counts.get(v, 0) + 1
            if any(wend - window_s <= t < wend for t, _ in kv):
                out[(k, wend * 1000 - 1)] = tuple(sorted(counts.items()))
    return out


@pytest.mark.parametrize("seed", [21, 22])
@pytest.mark.parametrize("filter_pos", [False, True])
def test_sliding_value_counts_random(client, tmp_path, seed, filter_pos):
    """The distributive per-step count-map plan for sliding VALUE_COUNTS
    (sliding_window_utils vc_distributive) vs brute force, with timestamp
    ties, NULL values, and an optional filter."""
    from datetime import timedelta

    rnd = random.Random(seed * 17 + filter_pos)
    rows = _gen_rows(rnd)
    window_s, step_s = 30, 10
    name = f"rndsvc_{seed}_{filter_pos}"
    source = _write_source(tmp_path, name, rows)
    kwargs = dict(
        window_size=timedelta(seconds=window_s),
        step_size=timedelta(seconds=step_s),
        group_by_keys=["k"],
    )
    if filter_pos:
        kwargs["filter_expr"] = "v > 0"
    view = SlidingFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature("vc", transform=SlidingWindowTransform("v", "VALUE_COUNTS", **kwargs)),
        ],
        enable_empty_window_output=False,
        skip_same_window_output=False,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()
    got_map = {
        (r["k"], int(r["window_time"])):
        tuple(sorted((int(kk), int(vv)) for kk, vv in (r["vc"] or {}).items()))
        if r["vc"] is not None else ()
        for _, r in got.iterrows()
    }
    assert got_map == _brute_sliding_vc(rows, window_s, step_s, filter_pos)


def _brute_bounded_vc(rows, window_s, filter_pos=False):
    """Golden model for bounded-frame VALUE_COUNTS: counts of non-null
    values among rows in [t - w, t] per key (ties at both ends included)."""
    out = []
    for k, v, t in rows:
        counts = {}
        for kk, vv, tt in rows:
            if kk != k or tt > t or tt < t - window_s or vv is None:
                continue
            if filter_pos and not vv > 0:
                continue
            counts[vv] = counts.get(vv, 0) + 1
        out.append((k, t, tuple(sorted(counts.items()))))
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("filter_pos", [False, True])
def test_over_bounded_value_counts_random(client, tmp_path, seed, filter_pos):
    """The distributive chunked-interval-join plan for [t-W, t] VALUE_COUNTS
    (over_window_utils._bounded_value_counts) vs brute force, with
    timestamp ties, NULL values, and an optional filter."""
    from collections import Counter
    from datetime import timedelta

    rnd = random.Random(seed * 31 + filter_pos)
    rows = _gen_rows(rnd)
    window_s = 10
    name = f"rndbvc_{seed}_{filter_pos}"
    source = _write_source(tmp_path, name, rows)
    kwargs = dict(
        group_by_keys=["k"], window_size=timedelta(seconds=window_s)
    )
    if filter_pos:
        kwargs["filter_expr"] = "v > 0"
    view = DerivedFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature("vc", transform=OverWindowTransform("v", "VALUE_COUNTS", **kwargs)),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()
    got_set = Counter(
        (
            r["k"], int(r["t"]),
            tuple(sorted((int(kk), int(vv)) for kk, vv in (r["vc"] or {}).items()))
            if r["vc"] is not None else (),
        )
        for _, r in got.iterrows()
    )
    want_set = Counter(_brute_bounded_vc(rows, window_s, filter_pos))
    assert got_set == want_set


def _brute_collect(rows, limit):
    out = []
    for k, v, t in rows:
        in_win = sorted(
            [(tt, vv) for (kk, vv, tt) in rows if kk == k and tt <= t],
            key=lambda r: r[0],
        )
        if limit is not None:
            in_win = in_win[-limit:]
        # COLLECT_LIST and FIRST/LAST are positional INCLUDING null values
        # (reference list(l), l[0], l[-1]); VALUE_COUNTS skips nulls
        vals = [vv for _, vv in in_win]
        counts = {}
        for vv in vals:
            if vv is not None:
                counts[vv] = counts.get(vv, 0) + 1
        first = vals[0] if in_win else None
        last = vals[-1] if in_win else None
        out.append((k, t, tuple(vals), tuple(sorted(counts.items())), first, last))
    return out


@pytest.mark.parametrize("seed", [41, 42])
@pytest.mark.parametrize("limit", [None, 4])
def test_over_collect_paths_random(client, tmp_path, seed, limit):
    rnd = random.Random(seed * 13 + (limit or 0))
    rows = _gen_rows(rnd, allow_ties=False)  # unique ts → deterministic order
    name = f"rndc_{seed}_{limit}"
    source = _write_source(tmp_path, name, rows)

    kwargs = dict(group_by_keys=["k"])
    if limit is not None:
        kwargs["limit"] = limit
    view = DerivedFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature("cl", transform=OverWindowTransform("v", "COLLECT_LIST", **kwargs)),
            Feature("vc", transform=OverWindowTransform("v", "VALUE_COUNTS", **kwargs)),
            Feature("fv", transform=OverWindowTransform("v", "FIRST_VALUE", **kwargs)),
            Feature("lv", transform=OverWindowTransform("v", "LAST_VALUE", **kwargs)),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    got = client.get_features(view).to_pandas()

    def _tup(x):
        if x is None or (isinstance(x, float) and math.isnan(x)):
            return ()
        return tuple(
            None if i is None or (isinstance(i, float) and math.isnan(i)) else int(i)
            for i in x
        )

    def _ival(x):
        return None if x is None or (isinstance(x, float) and math.isnan(x)) else int(x)

    from collections import Counter

    got_set = Counter(
        (
            r["k"], int(r["t"]), _tup(r["cl"]),
            tuple(sorted((int(kk), int(vv)) for kk, vv in (r["vc"] or {}).items()))
            if r["vc"] is not None else (),
            _ival(r["fv"]), _ival(r["lv"]),
        )
        for _, r in got.iterrows()
    )
    exp_set = Counter(
        (k, t, vals, counts, first, last)
        for (k, t, vals, counts, first, last) in _brute_collect(rows, limit)
    )
    assert got_set == exp_set


def _brute_asof(left_rows, right_rows):
    out = []
    for k, v, t in left_rows:
        candidates = [(tt, vv) for (kk, vv, tt) in right_rows if kk == k and tt <= t]
        out.append(max(candidates)[1] if candidates else None)
    return out


@pytest.mark.parametrize("seed", [11, 12])
def test_asof_join_random(client, tmp_path, seed):
    rnd = random.Random(seed)
    left_rows = _gen_rows(rnd, allow_nulls=False)
    right_rows = _gen_rows(rnd, allow_ties=False, allow_nulls=False)
    lsrc = _write_source(tmp_path, f"asof_l_{seed}", left_rows)
    rsrc = _write_source(tmp_path, f"asof_r_{seed}", right_rows)
    rview = DerivedFeatureView(
        name=f"asof_right_{seed}",
        source=rsrc,
        features=[Feature("rv", transform="v", keys=["k"])],
        keep_source_fields=True,
    )
    lview = DerivedFeatureView(
        name=f"asof_left_{seed}",
        source=lsrc,
        features=[f"asof_right_{seed}.rv"],
        keep_source_fields=True,
    )
    client.build_features([rsrc, rview])
    client.build_features([lsrc, lview])
    got = client.get_features(lview).to_pandas()

    expected = _brute_asof(left_rows, right_rows)
    # multiset comparison keyed on (k, t, v)
    def norm(x):
        return None if x is None or (isinstance(x, float) and math.isnan(x)) else int(x)

    got_set = sorted(
        (r["k"], int(r["t"]), int(r["v"]), norm(r["rv"])) for _, r in got.iterrows()
    )
    exp_set = sorted(
        (k, t, v, norm(rv)) for (k, v, t), rv in zip(left_rows, expected)
    )
    assert got_set == exp_set
