"""Gap-based sessionization and CCNet-style quality bucketing."""

from pyspark.sql import functions as F


def test_sessionize_gaps_and_islands(spark):
    from feathub_spark.datapipe.sessions import sessionize, session_stats

    # user 1: three events in one session, gap, then two more; user 2: one
    rows = [
        (1, 1, 0), (2, 1, 50), (3, 1, 120),
        (4, 1, 1000), (5, 1, 1090),
        (6, 2, 40),
        # tie on timestamp: event_id breaks it deterministically
        (7, 2, 40),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    out = {
        r["event_id"]: (r["session_id"], r["session_seq"])
        for r in sessionize(df, "user_id", "ts_us", gap_us=100,
                            id_col="event_id").collect()
    }
    assert out[1] == ("1#0", 1) and out[2] == ("1#0", 2) and out[3] == ("1#0", 3)
    assert out[4] == ("1#1000", 1) and out[5] == ("1#1000", 2)
    assert out[6] == ("2#40", 1) and out[7] == ("2#40", 2)

    stats = {
        r["session_id"]: r
        for r in session_stats(
            df, "user_id", "ts_us", gap_us=100, id_col="event_id",
            agg_cols={"max_id": F.max("event_id")},
        ).collect()
    }
    assert stats["1#0"]["n_events"] == 3 and stats["1#0"]["duration_us"] == 120
    assert stats["1#1000"]["session_end_us"] == 1090
    assert stats["2#40"]["max_id"] == 7
    # exactly-gap spacing does NOT break the session (strict > gap)
    two = spark.createDataFrame(
        [(1, 9, 0), (2, 9, 100)], "event_id long, user_id long, ts_us long"
    )
    lab = sessionize(two, "user_id", "ts_us", gap_us=100, id_col="event_id")
    assert lab.select("session_id").distinct().count() == 1


def test_quality_buckets_exact_terciles(spark):
    from feathub_spark.datapipe.quality import quality_buckets

    # group 'a': 9 docs with values 1..9 -> thresholds at cum>=3 (v=3) and
    # cum>=6 (v=6); group 'b': 3 docs
    rows = [(i, "a", float(i)) for i in range(1, 10)] + [
        (10, "b", 5.0), (11, "b", 1.0), (12, "b", 9.0), (13, None, 2.0),
        (14, "a", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "v", group_col="lang").collect()
    }
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert out[11] == "head" and out[10] == "middle" and out[12] == "tail"
    # NULL group / NULL value rows are dropped
    assert 13 not in out and 14 not in out

    # ties at a threshold all land in the lower bucket
    tied = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 2, 2, 2, 9])],
        "doc_id long, v double",
    )
    tb = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(tied, "v").collect()
    }
    # threshold t1 = 2 (cum>=2), t2 = 2 (cum>=4): every 2 is "head"
    assert [tb[i] for i in range(6)] == ["head"] * 5 + ["tail"]

    # custom bucket count and labels
    q = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(
            df.filter(F.col("lang") == "a"), "v",
            n_buckets=2, labels=("lo", "hi"),
        ).collect()
    }
    assert sorted(q.values()).count("lo") == 5  # ceil(9/2)=5 -> v<=5


def test_time_decayed_sum_matches_python_model(spark):
    import math

    from feathub_spark.datapipe.decay import time_decayed_sum

    rows = [
        (1, 1, 0, 10.0), (2, 1, 50, 4.0), (3, 1, 200, 2.0),
        (4, 2, 0, 1.0),
        # timestamp tie inside one frame: id makes fold order total
        (5, 2, 100, 3.0), (6, 2, 100, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {
        r["event_id"]: (r["decayed_sum"], r["n_in_window"])
        for r in time_decayed_sum(
            df, "user_id", "ts_us", "value",
            half_life_us=100, window_us=150, id_col="event_id",
        ).collect()
    }

    def model(terms, t0):
        s = sum(
            int(round(v * math.pow(2.0, -(t0 - tj) / 100.0) * 1e6))
            for tj, v in terms
        )
        return round(s / 1e6, 6)

    assert out[1] == (model([(0, 10.0)], 0), 1)
    assert out[2] == (model([(0, 10.0), (50, 4.0)], 50), 2)
    # window 150: event at t=0 fell out of event 3's frame
    assert out[3] == (model([(50, 4.0), (200, 2.0)], 200), 2)
    assert out[5] == (model([(0, 1.0), (100, 3.0), (100, 7.0)], 100), 3)
    assert out[6] == out[5]
    # half-life semantics: weight at exactly one half-life is 0.5
    assert abs(out[2][0] - (10.0 * 0.5 ** 0.5 + 4.0)) < 1e-5


def test_funnel_steps_greedy_chain(spark):
    """Greedy earliest chain: strict-after ordering, partial completion,
    and keys with no step-1 event dropped."""
    from feathub_spark.datapipe.sessions import funnel_steps

    rows = [
        # user 1: full funnel, with a decoy click BEFORE the first view
        (1, 5, "click"), (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        # user 2: click at the SAME micro as view must not count
        (2, 10, "view"), (2, 10, "click"),
        # user 3: steps out of order only -> stuck at step 1
        (3, 50, "buy"), (3, 60, "view"),
        # user 4: no view at all -> excluded
        (4, 5, "click"), (4, 6, "buy"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_us", "event_type"])
    out = {
        r.user_id: (r.n_steps, list(r.step_ts))
        for r in funnel_steps(
            df, "user_id", "ts_us", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert out == {
        1: (3, [10, 20, 30]),
        2: (1, [10]),
        3: (1, [60]),
    }
    # min_steps filter
    full = funnel_steps(
        df, "user_id", "ts_us", "event_type", ["view", "click", "buy"],
        min_steps=3,
    ).collect()
    assert [r.user_id for r in full] == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_steps(df, "user_id", "ts_us", "event_type", [])


def test_resample_ffill_grid_and_staleness(spark):
    from feathub_spark.datapipe.resample import resample_ffill

    rows = [
        ("a", 15, 1, 1.0),
        ("a", 22, 2, 2.0),
        ("a", 22, 3, None),    # same ts, higher id, NULL value
        ("a", 40, 4, 3.0),
        ("b", 5, 5, 9.0),      # lone early event: no grid point <= last
    ]
    df = spark.createDataFrame(rows, ["k", "tu", "eid", "v"])
    out = {
        (r.k, r.grid_us): (r.v, r.staleness_us)
        for r in resample_ffill(
            df, "k", "tu", ["v"], step_us=10, id_col="eid"
        ).collect()
    }
    # grid 20: last event ts15 -> v=1.0, staleness 5
    # grid 30: last event is (22, id3, NULL); staleness from IT (8) but v
    #          forward-fills the latest NON-NULL observation (2.0)
    # grid 40: exact-tie event included
    assert out == {
        ("a", 20): (1.0, 5),
        ("a", 30): (2.0, 8),
        ("a", 40): (3.0, 0),
    }
    # explicit bounds extend the grid past the last event
    ext = {
        r.grid_us: (r.v, r.staleness_us)
        for r in resample_ffill(
            df.filter("k = 'b'"), "k", "tu", ["v"],
            step_us=10, start_us=0, end_us=30, id_col="eid",
        ).collect()
    }
    assert ext == {0: (None, None), 10: (9.0, 5), 20: (9.0, 15), 30: (9.0, 25)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resample_ffill(df, "k", "tu", ["v"], step_us=0)


def test_time_decayed_sum_skips_null_values_like_sql_sum(spark):
    """Review finding: a NULL value event used to null the whole fold for
    every window containing it.  SQL SUM/COUNT(*) semantics: NULL terms
    are skipped by the sum but counted; an all-NULL window is NULL."""
    from feathub_spark.datapipe.decay import time_decayed_sum

    rows = [
        (1, 1, 0, 1.0), (2, 1, 10, None), (3, 1, 20, 2.0),
        (4, 2, 0, None),  # all-NULL window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {
        r["event_id"]: (r["decayed_sum"], r["n_in_window"])
        for r in time_decayed_sum(
            df, "user_id", "ts_us", "value",
            half_life_us=1_000_000, window_us=100, id_col="event_id",
        ).collect()
    }
    assert out[1] == (1.0, 1)
    # NULL event inside the window: skipped by the sum, counted
    assert out[2][1] == 2 and abs(out[2][0] - 1.0) < 1e-4
    assert out[3][1] == 3 and abs(out[3][0] - 3.0) < 1e-3
    # all-NULL window folds to NULL like SUM over an all-NULL group
    assert out[4] == (None, 1)


def test_funnel_steps_backslash_step_names(spark):
    """Review finding: step-name literals were quote-doubled but not
    backslash-escaped, so 'a\\b' became 'a<backspace>' and never matched."""
    from feathub_spark.datapipe.sessions import funnel_steps

    rows = [(1, 10, "a\\b"), (1, 20, "buy"), (2, 5, "buy")]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, et string")
    out = {
        r["user_id"]: r["n_steps"]
        for r in funnel_steps(df, "user_id", "ts_us", "et",
                              ["a\\b", "buy"]).collect()
    }
    assert out == {1: 2}


def test_attribute_conversions_same_instant_touch(spark):
    """Review finding: the ROWS frame attributed a same-instant touch only
    when the tie order happened to place it first; the RANGE frame makes
    the documented <= convention unconditional."""
    from feathub_spark.datapipe.sessions import attribute_conversions

    rows = [
        (1, 100, "purchase", 1), (1, 100, "click", 2),   # tied instant
        (2, 50, "click", 3), (2, 90, "purchase", 4),
        (3, 70, "purchase", 5),                          # unattributed
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_type string, event_id long"
    )
    out = {
        r["user_id"]: (r["touch_ts_us"], r["lag_us"])
        for r in attribute_conversions(
            df, "user_id", "ts_us",
            "event_type = 'purchase'", "event_type = 'click'",
            tie_cols=["event_id"],
        ).collect()
    }
    assert out[1] == (100, 0)   # same-instant touch attributed
    assert out[2] == (50, 40)
    assert out[3] == (None, None)
