"""Randomized golden tests for the round-7 session operators whose
semantics have edge-case-rich definitions: each compares the Spark result
against an independent pure-Python replica on random keyed data."""

import math
import random

from pyspark.sql import functions as F


def test_randomized_resample_ffill_matches_python(spark):
    rnd = random.Random(41)
    rows = []
    for i in range(300):
        rows.append(
            (
                f"k{rnd.randrange(6)}",
                rnd.randrange(0, 500),
                i,
                None if rnd.random() < 0.2 else round(rnd.uniform(0, 9), 3),
            )
        )
    df = spark.createDataFrame(rows, "k string, tu long, eid long, v double")
    step = 50

    from feathub_spark.datapipe.resample import resample_ffill

    got = {
        (r.k, r.grid_us): (r.v, r.staleness_us)
        for r in resample_ffill(
            df, "k", "tu", ["v"], step_us=step, id_col="eid"
        ).collect()
    }

    by_key = {}
    for k, tu, eid, v in rows:
        by_key.setdefault(k, []).append((tu, eid, v))
    expected = {}
    for k, evs in by_key.items():
        evs.sort()
        lo = -(-min(t for t, _, _ in evs) // step) * step
        hi = max(t for t, _, _ in evs)
        g = lo
        while g <= hi:
            before = [e for e in evs if e[0] <= g]
            last_ev = max(before)  # (tu, eid) ordering = operator tiebreak
            nonnull = [e for e in before if e[2] is not None]
            val = max(nonnull)[2] if nonnull else None
            expected[(k, g)] = (val, g - last_ev[0])
            g += step
    assert got == expected


def test_randomized_funnel_matches_python(spark):
    rnd = random.Random(17)
    steps = ["a", "b", "c"]
    rows = [
        (
            f"u{rnd.randrange(10)}",
            rnd.randrange(1, 500),
            rnd.choice(["a", "b", "c", "x"]),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, tu long, tp string")

    from feathub_spark.datapipe.sessions import funnel_steps

    got = {
        r.k: (r.n_steps, list(r.step_ts))
        for r in funnel_steps(df, "k", "tu", "tp", steps).collect()
    }

    by_key = {}
    for k, tu, tp in rows:
        if tp in steps:
            by_key.setdefault(k, []).append((tu, tp))
    expected = {}
    for k, evs in by_key.items():
        evs.sort()  # (tu, tp) — the operator's array_sort order
        chain = []
        for tu, tp in evs:
            if len(chain) < 3 and tp == steps[len(chain)] and (
                not chain or tu > chain[-1]
            ):
                chain.append(tu)
        if chain:
            expected[k] = (len(chain), chain)
    assert got == expected


def test_randomized_robust_zscore_matches_python(spark):
    rnd = random.Random(23)
    rows = [
        (f"g{rnd.randrange(3)}", round(rnd.gauss(50, 10), 3))
        for _ in range(500)
    ] + [("g0", 500.0), ("g1", -400.0)]
    df = spark.createDataFrame(rows, "g string, v double")

    from feathub_spark.datapipe.quality import robust_zscore

    got = {
        (r.g, r.v): (r.v_rz, r.is_outlier)
        for r in robust_zscore(df, "v", group_col="g").collect()
    }

    def lower_median(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(round(v, 3))
    for g, vals in by_g.items():
        med = lower_median(vals)
        mad = lower_median([round(abs(v - med), 3) for v in vals])
        for v in set(vals):
            z = round((v - med) / (1.4826 * mad), 6) if mad > 0 else None
            flag = bool(z is not None and abs(z) > 3.5)
            assert got[(g, v)] == (z, flag), (g, v)
    # the planted extremes are flagged
    assert got[("g0", 500.0)][1] and got[("g1", -400.0)][1]
