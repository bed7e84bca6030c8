"""The hot-key-safe salted over-window must produce byte-identical results
to the standard single-partition-per-key plan, on random data with ties,
NULLs and a dominant hot key."""

import random

import pytest

from feathub_spark import DerivedFeatureView, Feature, SparkProcessor
from feathub_spark.feature_views.transforms import OverWindowTransform

from tests.test_randomized_golden import _write_source


def _rows(seed):
    rnd = random.Random(seed)
    rows = []
    for i in range(300):
        # 70% of rows land on one hot key
        k = "hot" if rnd.random() < 0.7 else rnd.choice(["a", "b", "c"])
        t = rnd.randrange(0, 500)
        v = None if rnd.random() < 0.1 else rnd.randrange(-20, 100)
        rows.append((k, v, t))
    return rows


@pytest.mark.parametrize("seed", [21, 22])
@pytest.mark.parametrize("filter_pos", [False, True])
def test_salted_equals_standard(spark, tmp_path, seed, filter_pos):
    rows = _rows(seed)
    name = f"salt_{seed}_{filter_pos}"
    source = _write_source(tmp_path, name, rows)

    kwargs = dict(group_by_keys=["k"])
    if filter_pos:
        kwargs["filter_expr"] = "v > 0"
    view = DerivedFeatureView(
        name=f"v_{name}",
        source=source,
        features=[
            Feature("s", transform=OverWindowTransform("v", "SUM", **kwargs)),
            Feature("c", transform=OverWindowTransform("v", "COUNT", **kwargs)),
            Feature("a", transform=OverWindowTransform("v", "AVG", **kwargs)),
            Feature("mx", transform=OverWindowTransform("v", "MAX", **kwargs)),
            Feature("mn", transform=OverWindowTransform("v", "MIN", **kwargs)),
        ],
        keep_source_fields=True,
    )

    standard = SparkProcessor(spark)
    standard.registry.build_features([source])
    built_std = standard.registry.build_features([view])[0]
    expected = standard.get_table(built_std).to_pandas()

    # chunk = 100s: the hot key splits into ~5 chunks
    salted = SparkProcessor(spark, over_window_salt_chunk_ms=100_000)
    salted.registry.build_features([source])
    built_salt = salted.registry.build_features([view])[0]
    got = salted.get_table(built_salt).to_pandas()

    cols = sorted(expected.columns)
    exp_sorted = expected[cols].sort_values(cols).reset_index(drop=True)
    got_sorted = got[cols].sort_values(cols).reset_index(drop=True)
    assert got_sorted.equals(exp_sorted)
