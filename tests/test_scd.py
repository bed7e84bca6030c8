"""SCD2 interval builder + point-in-time snapshot: golden semantics,
null-safe change detection, tie handling, and the single-exchange plan."""

import pytest
from pyspark.sql import functions as F

from feathub_spark.datapipe.scd import scd2_intervals, scd2_snapshot


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_intervals_golden(spark):
    df = spark.createDataFrame(
        [
            (1, 100, "A"), (1, 200, "A"), (1, 300, "B"),
            (1, 400, "B"), (1, 500, "A"),
            (3, 50, None), (3, 60, None), (3, 70, "Z"),
        ],
        "k long, ts long, v string",
    )
    iv = scd2_intervals(df, "k", "ts", "v")
    assert _rows(iv) == {
        (1, "A", 100, 300),
        (1, "A", 500, None),
        (1, "B", 300, 500),
        (3, None, 50, 70),
        (3, "Z", 70, None),
    }


def test_scd2_tie_rows_become_zero_length(spark):
    df = spark.createDataFrame(
        [(2, 100, 7, "X"), (2, 100, 8, "Y"), (2, 200, 9, "Y")],
        "k long, ts long, eid long, v string",
    )
    iv = scd2_intervals(df, "k", "ts", "v", tie_cols="eid")
    assert _rows(iv) == {(2, "X", 100, 100), (2, "Y", 100, None)}
    # the zero-length [100,100) interval is invisible to every snapshot
    assert _rows(scd2_snapshot(iv, 100).select("k", "v")) == {(2, "Y")}


def test_scd2_multi_key_multi_attr(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10, "x", 1.0), ("a", 1, 20, "x", 2.0),
            ("a", 1, 30, "x", 2.0), ("a", 2, 10, "y", 1.0),
        ],
        "k1 string, k2 long, ts long, v1 string, v2 double",
    )
    iv = scd2_intervals(df, ["k1", "k2"], "ts", ["v1", "v2"])
    assert _rows(iv) == {
        ("a", 1, "x", 1.0, 10, 20),
        ("a", 1, "x", 2.0, 20, None),
        ("a", 2, "y", 1.0, 10, None),
    }


def test_scd2_snapshot_boundaries(spark):
    iv = spark.createDataFrame(
        [(1, "A", 100, 300), (1, "B", 300, None)],
        "k long, v string, valid_from long, valid_to long",
    )
    assert _rows(scd2_snapshot(iv, 99)) == set()
    assert _rows(scd2_snapshot(iv, 100).select("v")) == {("A",)}
    assert _rows(scd2_snapshot(iv, 299).select("v")) == {("A",)}
    assert _rows(scd2_snapshot(iv, 300).select("v")) == {("B",)}


def test_scd2_single_exchange_plan(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 40).alias("k"),
        F.col("id").alias("ts"),
        (F.col("id") % 3).cast("string").alias("v"),
    )
    iv = scd2_intervals(df, "k", "ts", "v")
    plan = iv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert iv.count() > 0


def test_scd2_validation(spark):
    df = spark.createDataFrame([(1, 1, "a")], "k long, ts long, v string")
    with pytest.raises(ValueError):
        scd2_intervals(df, [], "ts", "v")
    with pytest.raises(ValueError):
        scd2_intervals(df, "k", "ts", [])


def test_scd2_merge_equals_full_rebuild(spark):
    import random

    from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge

    rnd = random.Random(5)
    rows, used = [], set()
    for _ in range(500):
        k, t = rnd.randrange(12), rnd.randrange(1, 3000)
        while (k, t) in used:
            t = rnd.randrange(1, 3000)
        used.add((k, t))
        rows.append((k, t, rnd.choice(["A", "B", "C", None])))
    cut = 1500
    pre = spark.createDataFrame(
        [r for r in rows if r[1] <= cut], "k long, ts long, v string"
    )
    dl = spark.createDataFrame(
        [r for r in rows if r[1] > cut], "k long, ts long, v string"
    )
    full = spark.createDataFrame(rows, "k long, ts long, v string")

    base = scd2_intervals(pre, "k", "ts", "v")
    got = {tuple(r) for r in scd2_merge(base, dl, "k", "ts", "v").collect()}
    want = {tuple(r) for r in scd2_intervals(full, "k", "ts", "v").collect()}
    assert got == want

    # late delta events (ts <= the open interval's start) are dropped
    late = spark.createDataFrame([(0, 1, "Z")], "k long, ts long, v string")
    fixed = scd2_intervals(full, "k", "ts", "v")
    again = {tuple(r) for r in scd2_merge(fixed, late, "k", "ts", "v").collect()}
    assert again == want

    # brand-new keys in the delta appear with their own intervals
    newk = spark.createDataFrame(
        [(99, 10, "A"), (99, 20, "B")], "k long, ts long, v string"
    )
    m = {tuple(r) for r in scd2_merge(fixed, newk, "k", "ts", "v").collect()}
    assert (99, "A", 10, 20) in m and (99, "B", 20, None) in m


def test_scd2_merge_equal_ts_delta_resolves_via_ties(spark):
    """A delta event AT the open interval's valid_from is kept when
    tie_cols are present and wins against the seed's NULL ties — matching
    a full rebuild under monotone event ids (the round-8 advisor's
    equal-ts identity gap).  Without tie_cols the equal-ts event is still
    dropped (order would be nondeterministic)."""
    from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge

    sch = "k long, ts long, eid long, v string"
    base_log = [(0, 50, 0, "Z"), (0, 100, 1, "A")]
    base = scd2_intervals(
        spark.createDataFrame(base_log, sch), "k", "ts", "v", tie_cols="eid"
    )
    delta = spark.createDataFrame([(0, 100, 2, "B")], sch)
    got = {
        tuple(r)
        for r in scd2_merge(
            base, delta, "k", "ts", "v", tie_cols="eid"
        ).collect()
    }
    want = {
        tuple(r)
        for r in scd2_intervals(
            spark.createDataFrame(base_log + [(0, 100, 2, "B")], sch),
            "k", "ts", "v", tie_cols="eid",
        ).collect()
    }
    assert got == want
    assert (0, "B", 100, None) in got          # delta wins at t
    assert (0, "A", 100, 100) in got           # seed state zero-length

    # no tie_cols -> equal-ts delta treated as late, base unchanged
    sch2 = "k long, ts long, v string"
    base2 = scd2_intervals(
        spark.createDataFrame([(0, 50, "Z"), (0, 100, "A")], sch2),
        "k", "ts", "v",
    )
    delta2 = spark.createDataFrame([(0, 100, "B")], sch2)
    got2 = {
        tuple(r) for r in scd2_merge(base2, delta2, "k", "ts", "v").collect()
    }
    assert got2 == {tuple(r) for r in base2.collect()}


def test_time_weighted_avg_golden(spark):
    """Hand-computed TWAP: window clipping, carry-forward at the window
    start, NULL observations closing mass without contributing, and
    events after the window excluded."""
    from feathub_spark.datapipe.resample import time_weighted_avg

    df = spark.createDataFrame(
        [
            (1, 100, 10.0), (1, 200, 20.0),   # 10 on [150,200), 20 on [200,300)
            (2, 50, 5.0),                     # holds the whole window
            (3, 120, None), (3, 180, 4.0),    # null -> no mass until 180
            (4, 400, 9.0),                    # after the window: excluded
        ],
        "k long, ts long, v double",
    )
    out = {r.k: r for r in time_weighted_avg(df, "k", "ts", "v", 150, 300).collect()}
    assert abs(out[1].twa - 2500 / 150) < 1e-6 and out[1].coverage_us == 150
    assert out[2].twa == 5.0 and out[2].coverage_us == 150
    assert out[3].twa == 4.0 and out[3].coverage_us == 120
    assert 4 not in out
    assert out[1].n_events == 2


def test_scd2_randomized_vs_python_model(spark):
    """Randomized logs (duplicate timestamps, NULL attrs, single-event
    keys) checked against a first-principles Python fold — the operator's
    window formulation never gets to grade itself."""
    import random

    from feathub_spark.datapipe.scd import scd2_intervals

    def model(rows):
        by_key = {}
        for k, ts, eid, v in rows:
            by_key.setdefault(k, []).append((ts, eid, v))
        out = set()
        for k, evs in by_key.items():
            evs.sort(key=lambda e: (e[0], e[1]))
            changes = []
            sentinel = object()
            prev = sentinel
            for ts, eid, v in evs:
                if prev is sentinel or v != prev:
                    changes.append((ts, v))
                prev = v
            for i, (ts, v) in enumerate(changes):
                to = changes[i + 1][0] if i + 1 < len(changes) else None
                out.add((k, v, ts, to))
        return out

    for seed in (1, 2, 3, 4, 5):
        rnd = random.Random(seed)
        rows = [
            (
                rnd.randrange(6),
                rnd.randrange(1, 40),   # duplicate ts are common
                i,                       # unique tie id
                rnd.choice(["A", "B", None]),
            )
            for i in range(rnd.randrange(30, 120))
        ]
        df = spark.createDataFrame(rows, "k long, ts long, eid long, v string")
        got = {
            tuple(r)
            for r in scd2_intervals(df, "k", "ts", "v", tie_cols="eid")
            .select("k", "v", "valid_from", "valid_to")
            .collect()
        }
        assert got == model(rows), f"seed={seed}"


def test_scd2_merge_randomized_rebuild_identity_with_ties(spark):
    """Randomized merge-vs-rebuild identity under monotone tie ids —
    including delta events planted AT exactly a key's append-only
    frontier (its last observed ts — the round-8 advisor's equal-ts
    gap).  The frontier may sit INSIDE the open interval when unchanged
    observations collapsed, which is precisely the case a
    valid_from-anchored fixture would miss.  Monotone eids make the
    rebuild's tie order match the merge's seed-loses-ties rule, so the
    two must be row-identical."""
    import random

    from feathub_spark.datapipe.scd import scd2_intervals, scd2_merge

    sch = "k long, ts long, eid long, v string"
    for seed in (21, 22, 23):
        rnd = random.Random(seed)
        rows, eid = [], 0
        for _ in range(rnd.randrange(60, 140)):
            rows.append(
                (rnd.randrange(8), rnd.randrange(1, 200), eid,
                 rnd.choice(["A", "B", "C", None]))
            )
            eid += 1
        rows.sort(key=lambda r: (r[1], r[2]))
        cut = rnd.randrange(60, 140)
        pre = [r for r in rows if r[1] <= cut]
        post = [r for r in rows if r[1] > cut]
        # re-number eids so every delta eid sorts after every base eid
        pre = [(k, t, i, v) for i, (k, t, _, v) in enumerate(pre)]
        post = [
            (k, t, len(pre) + i, v) for i, (k, t, _, v) in enumerate(post)
        ]
        base = scd2_intervals(
            spark.createDataFrame(pre, sch), "k", "ts", "v", tie_cols="eid"
        )
        # plant equal-ts deltas ON the append-only frontier per key (the
        # max observed ts, NOT valid_from: a delta inside a collapsed
        # open-interval span is outside the documented contract)
        frontier = {}
        for k, t, _, _ in pre:
            frontier[k] = max(frontier.get(k, t), t)
        extra = [
            (k, t, len(pre) + len(post) + j, "EQ")
            for j, (k, t) in enumerate(sorted(frontier.items())[:3])
        ]
        delta = post + extra
        got = {
            tuple(r)
            for r in scd2_merge(
                base,
                spark.createDataFrame(delta, sch),
                "k", "ts", "v", tie_cols="eid",
            ).collect()
        }
        want = {
            tuple(r)
            for r in scd2_intervals(
                spark.createDataFrame(pre + delta, sch),
                "k", "ts", "v", tie_cols="eid",
            ).collect()
        }
        assert got == want, f"seed={seed}"
