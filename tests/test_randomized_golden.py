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
        # limit slices ROWS (null-valued rows occupy slots); aggregation
        # then skips null values
        if limit is not None:
            in_win = in_win[-limit:]
        vals = [r[1] for r in in_win if r[1] is not None]
        s = sum(vals) if vals else 0
        c = len(vals)
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

    got_set = sorted(
        (r["k"], int(r["t"]), norm(r["s"]), norm(r["c"]), norm(r["m"]))
        for _, r in got.iterrows()
    )
    exp_map = {}
    for k, t, s, c, mx in expected:
        exp_map.setdefault((k, t), []).append((s, c, mx))
    exp_set = sorted(
        (k, t // 1000 if False else t, s, c, mx) for (k, v, t), (kk, tt, s, c, mx) in zip(rows, expected)
    )
    exp_set = sorted((kk, tt, s, c, mx) for (kk, tt, s, c, mx) in expected)
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
        vals = [v for v in vals if v is not None]
        result[(k, wend * 1000 - 1)] = (sum(vals) if vals else 0, len(vals))
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
