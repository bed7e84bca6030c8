"""Physical-plan regression tests: the properties that make these plans
viable at 100 TB must not silently disappear (SURVEY §4 row 8,
docs/SCALE.md)."""

import io
from contextlib import redirect_stdout

from feathub_spark import DerivedFeatureView, Feature


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(client, tmp_path):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["expr_filter"](client.spark, "/root/testdata/sf0.001")
    plan = _formatted_plan(df)
    # the l_quantity < 40 predicate must reach the parquet scan
    assert "PushedFilters" in plan and "LessThan(l_quantity,40.0)" in plan
    # the scan must not read unreferenced columns (11-column table)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_returnflag" not in read_schema and "l_shipdate" not in read_schema


def test_asof_join_single_shuffle(client, tmp_path):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["pit_join"](client.spark, "/root/testdata/sf0.001")
    plan = _formatted_plan(df)
    # union + last_value as-of strategy: exactly ONE exchange, and no
    # theta-join row explosion (no BroadcastNestedLoopJoin/CartesianProduct)
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_over_window_fusion_single_window_exec(client, tmp_path):
    """N aggs sharing one OverWindowDescriptor must compile to one Window
    operator."""
    from datetime import timedelta

    from feathub_spark.feature_views.transforms import OverWindowTransform
    from tests.fixtures import write_f1_source

    source = write_f1_source(tmp_path, name="hygiene_src")
    view = DerivedFeatureView(
        name="hygiene_fused",
        source=source,
        features=[
            Feature(
                f"agg_{i}",
                transform=OverWindowTransform(
                    "cost", fn, window_size=timedelta(days=2), group_by_keys=["name"]
                ),
            )
            for i, fn in enumerate(["AVG", "SUM", "MAX", "MIN", "COUNT"])
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.get_features(view).to_dataframe()
    plan = _formatted_plan(df)
    n_windows = sum(
        1 for line in plan.splitlines() if line.strip().startswith("(")
        and ") Window" in line
    )
    assert n_windows == 1, f"expected 1 WindowExec, plan has {n_windows}:\n{plan}"


def test_unbounded_value_counts_plan_is_join_safe(client, tmp_path):
    """The distributive VALUE_COUNTS plan joins pair/prefix tables on equi
    keys: no CartesianProduct / BroadcastNestedLoopJoin may appear, and the
    whole plan must stay window+hash-join shaped."""
    from feathub_spark.feature_views.transforms import OverWindowTransform
    from tests.fixtures import write_f1_source

    source = write_f1_source(tmp_path, "vc_plan_src")
    view = DerivedFeatureView(
        name="vc_plan_view",
        source=source,
        features=[
            Feature(
                "vc",
                transform=OverWindowTransform(
                    "cost", "VALUE_COUNTS", group_by_keys=["name"]
                ),
            ),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.processor.get_table(view).to_dataframe()
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bounded_value_counts_plan_is_join_safe(client, tmp_path):
    """The bounded-frame distributive VALUE_COUNTS plan (per-chunk value
    candidates + suffix/prefix as-of lookups) must stay equi-join shaped
    (no CartesianProduct / BroadcastNestedLoopJoin), and every Window it
    uses must be chunk-partitioned — a Window over whole keys would
    serialize a hot key into one task."""
    from datetime import timedelta

    from feathub_spark.feature_views.transforms import OverWindowTransform
    from tests.fixtures import write_f1_source

    source = write_f1_source(tmp_path, "bvc_plan_src")
    view = DerivedFeatureView(
        name="bvc_plan_view",
        source=source,
        features=[
            Feature(
                "vc",
                transform=OverWindowTransform(
                    "cost", "VALUE_COUNTS",
                    window_size=timedelta(days=2),
                    group_by_keys=["name"],
                ),
            ),
        ],
        keep_source_fields=True,
    )
    client.build_features([source, view])
    df = client.processor.get_table(view).to_dataframe()
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    window_specs = [
        line for line in plan.splitlines() if "windowspecdefinition" in line
    ]
    assert window_specs, "expected the as-of lookup windows in the plan"
    for spec in window_specs:
        assert "__vb_chunk__" in spec, (
            f"bounded VALUE_COUNTS window must be chunk-partitioned:\n{spec}"
        )


def test_ngram_jaccard_plan_has_no_index_self_join(client):
    """Candidate pairs expand in-array from posting lists: the plan must
    not contain a sort-merge self-join of the exploded inverted index (no
    nested-loop or cartesian shapes either)."""
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    docs = client.spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    plan = _formatted_plan(
        ngram_jaccard_pairs(docs, "text", "doc_id", n=2, max_doc_freq=16)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the "auto" cut attaches a broadcast ONE-ROW cutoff (shows up as a
    # build-side-1 BroadcastNestedLoopJoin — constant work); everything
    # else must still be equi-join shaped
    auto_plan = _formatted_plan(ngram_jaccard_pairs(docs, "text", "doc_id", n=2))
    assert "CartesianProduct" not in auto_plan


def test_join_field_with_reserved_keyword_name(client, tmp_path):
    """Reference test_join_transform.py:429: right-table feature named with
    a DSL reserved word ('end') must survive the as-of join via backticks."""
    import os

    from feathub_spark import FileSystemSource, Float64, Int64, Schema, String

    p = os.path.join(str(tmp_path), "rk_r.csv")
    with open(p, "w") as f:
        f.write("name,end,time\n")
        f.write("Alex,1.5,1\n")
        f.write("Alex,2.5,3\n")
    schema_r = (
        Schema.new_builder()
        .column("name", String).column("end", Float64).column("time", Int64).build()
    )
    rsrc = FileSystemSource(
        name="rk_right", path=p, data_format="csv", schema=schema_r,
        keys=["name"], timestamp_field="time", timestamp_format="epoch",
    )
    lp = os.path.join(str(tmp_path), "rk_l.csv")
    with open(lp, "w") as f:
        f.write("name,v,time\n")
        f.write("Alex,10,2\n")
        f.write("Alex,20,4\n")
    schema_l = (
        Schema.new_builder()
        .column("name", String).column("v", Int64).column("time", Int64).build()
    )
    lsrc = FileSystemSource(
        name="rk_left", path=lp, data_format="csv", schema=schema_l,
        keys=["name"], timestamp_field="time", timestamp_format="epoch",
    )
    rview = DerivedFeatureView(
        name="rk_rv", source=rsrc,
        features=[Feature("end", transform="`end`", keys=["name"])],
        keep_source_fields=True,
    )
    lview = DerivedFeatureView(
        name="rk_lv", source=lsrc,
        features=["rk_rv.end"],
        keep_source_fields=True,
    )
    client.build_features([rsrc, rview])
    client.build_features([lsrc, lview])
    out = client.get_features(lview).to_pandas().sort_values("time")
    assert out["end"].tolist() == [1.5, 2.5]


def test_token_surprisal_has_no_global_window(client):
    """The corpus token total must come from a broadcast 1-row aggregate,
    never an empty-partitionBy Window: web-scale whitespace vocab reaches
    billions of distinct tokens and a global window would serialize all of
    them through ONE task (round-6 verdict flag)."""
    from feathub_spark.common.caching import release_caches
    from feathub_spark.datapipe.quality import token_surprisal

    docs = client.spark.createDataFrame(
        [(1, "a b c"), (2, "a b d e")], "doc_id long, text string"
    )
    plan = _formatted_plan(token_surprisal(docs, "text", "doc_id"))
    release_caches()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            raise AssertionError(f"unexpected Window in plan:\n{line}")
    assert "CartesianProduct" not in plan


def test_tpch_q6_scan_pushdown_and_pruning(client):
    """Q6 is the pure-scan query: every predicate must reach the parquet
    reader and the scan must read only the 4 referenced columns."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["sql_view_tpch_q6"](
        client.spark, "/root/testdata/sf0.001"
    )
    plan = _formatted_plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1].splitlines()[0]
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_returnflag", "l_partkey", "l_tax"):
        assert col not in read_schema, read_schema


def test_tpch_q10_topk_is_take_ordered(client):
    """Q10's LIMIT 20 must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort of the aggregate."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["sql_view_tpch_q10"](
        client.spark, "/root/testdata/sf0.001"
    )
    plan = _formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_new_shapes_plan_properties(client):
    """The round-8 TPC-H additions must keep their claimed physical
    shapes: EXISTS plans as a semi join (never count-then-join), NOT
    EXISTS as an anti join, dims broadcast in the wide trees, and the
    correlated Q17 subquery decorrelates to an aggregate+join (no
    per-row re-scan)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"

    q4 = _formatted_plan(qs["sql_view_tpch_q4"](client.spark, sf))
    assert "LeftSemi" in q4 or "left_semi" in q4.lower(), q4

    q21 = _formatted_plan(qs["sql_view_tpch_q21"](client.spark, sf))
    assert "LeftSemi" in q21 or "ExistenceJoin" in q21, q21
    assert "LeftAnti" in q21 or "left_anti" in q21.lower(), q21

    q22 = _formatted_plan(qs["sql_view_tpch_q22"](client.spark, sf))
    assert "LeftAnti" in q22 or "left_anti" in q22.lower(), q22

    # the 8-relation market-share tree: nation/region dims broadcast
    q8 = _formatted_plan(qs["sql_view_tpch_q8"](client.spark, sf))
    assert "BroadcastHashJoin" in q8, q8
    assert "CartesianProduct" not in q8

    # Q17's correlated avg decorrelates: one aggregate over lineitem
    # joined back, not a nested-loop re-scan per row
    q17 = _formatted_plan(qs["sql_view_tpch_q17"](client.spark, sf))
    assert "CartesianProduct" not in q17
    assert "BroadcastNestedLoop" not in q17
    assert "HashAggregate" in q17


def test_scd2_and_twa_single_exchange_family(client):
    """scd2_intervals and time_weighted_avg claim the single-shuffle
    window family: the second window pass / the groupBy must reuse the
    key partitioning, never add a second hash exchange on the key."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"

    iv = _formatted_plan(qs["scd2_intervals"](client.spark, sf))
    # one exchange from ensure_parallelism + one hash exchange for the
    # key windows; the lead() pass must not re-shuffle
    assert iv.count("Exchange hashpartitioning(user_id") <= 1, iv

    twa = _formatted_plan(qs["time_weighted_avg"](client.spark, sf))
    assert twa.count("Exchange hashpartitioning(user_id") <= 2, twa
    assert "CartesianProduct" not in twa
