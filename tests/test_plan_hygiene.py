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
