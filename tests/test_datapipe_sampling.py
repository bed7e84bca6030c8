"""Deterministic sampling/sharding/packing + IVF ANN + PII scrub +
n-gram top-k (beyond-reference training-data operators)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feathub_spark.datapipe.sampling import (
    assign_shards,
    hash_fraction,
    pack_sequences,
    sample_by_hash,
    stratified_sample,
)
from feathub_spark.datapipe.similarity import brute_force_topk, ivf_topk
from feathub_spark.datapipe.text import ngram_topk, pii_scrub


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_fraction_uniform_and_deterministic(spark, ids_df):
    fr = ids_df.select(hash_fraction("doc_id", seed=1).alias("f"))
    stats = fr.agg(
        F.min("f").alias("lo"), F.max("f").alias("hi"), F.avg("f").alias("mean")
    ).collect()[0]
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert abs(stats["mean"] - 0.5) < 0.05
    again = ids_df.select(hash_fraction("doc_id", seed=1).alias("f"))
    assert fr.collect() == again.collect()


def test_sample_by_hash_nested(spark, ids_df):
    small = {r["doc_id"] for r in sample_by_hash(ids_df, "doc_id", 0.2, seed=3).collect()}
    large = {r["doc_id"] for r in sample_by_hash(ids_df, "doc_id", 0.5, seed=3).collect()}
    assert small <= large  # nested samples: raising the rate only adds rows
    assert abs(len(small) / 2000 - 0.2) < 0.04
    assert abs(len(large) / 2000 - 0.5) < 0.04


def test_stratified_sample_rates(spark, ids_df):
    df = ids_df.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    )
    out = stratified_sample(
        df, "doc_id", "lang", {"en": 0.3, "de": 1.0}, default_fraction=0.0
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 1000  # rate 1.0 keeps everything
    assert abs(counts["en"] / 1000 - 0.3) < 0.06


def test_assign_shards_contiguous_positions(spark, ids_df):
    out = assign_shards(ids_df, "doc_id", n_shards=8, seed=0)
    pdf = out.toPandas()
    assert set(pdf["shard"].unique()) == set(range(8))
    for shard, grp in pdf.groupby("shard"):
        assert sorted(grp["shard_pos"]) == list(range(len(grp)))


def test_pack_sequences_matches_pandas_model(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 300 + 1).cast("bigint").alias("n_tok"),
    )
    out = pack_sequences(
        df, "doc_id", "n_tok", max_tokens=2048, n_shards=4, seed=5, eos_tokens=1
    ).toPandas()

    from feathub_spark.datapipe.sampling import HASH_SPACE  # noqa: F401
    import hashlib

    def h32(v, seed):
        return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:8], 16)

    model = pd.DataFrame(
        {"doc_id": range(500), "n_tok": [(i % 300) + 1 for i in range(500)]}
    )
    model["h"] = [h32(i, 5) for i in model["doc_id"]]
    model["shard"] = model["h"] % 4
    rows = []
    for shard, grp in model.sort_values(["h", "doc_id"]).groupby("shard"):
        offset = 0
        for _, r in grp.iterrows():
            rows.append((r["doc_id"], shard, offset, offset // 2048, offset % 2048))
            offset += r["n_tok"] + 1
    expect = pd.DataFrame(
        rows, columns=["doc_id", "shard", "start_offset", "pack_id", "pack_offset"]
    ).sort_values("doc_id").reset_index(drop=True)
    got = out[["doc_id", "shard", "start_offset", "pack_id", "pack_offset"]].sort_values(
        "doc_id"
    ).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, expect.astype("int64"))


def test_ivf_full_probe_equals_brute_force(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") < 5)
    # probing every cell makes IVF exhaustive -> must equal brute force
    ivf = ivf_topk(df, q, "embedding", "vec_id", k=4, n_centroids=4, nprobe=100)
    bf = brute_force_topk(df, q, "embedding", "vec_id", k=4)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, ivf.collect()), key=lambda x: (x[0], x[2])) == sorted(
        map(tuple, bf.collect()), key=lambda x: (x[0], x[2])
    )


def test_ivf_probe_subset_recall(spark):
    import random

    rng = random.Random(3)
    # clustered data: 4 well-separated centers
    centers = [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10]]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4)
    ivf = ivf_topk(df, q, "embedding", "vec_id", k=3, n_centroids=8, nprobe=3)
    bf = brute_force_topk(df, q, "embedding", "vec_id", k=3)
    ivf_pairs = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    bf_pairs = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    recall = len(ivf_pairs & bf_pairs) / len(bf_pairs)
    assert recall >= 0.9  # same-cluster neighbors live in probed cells


def test_ivf_codebook_size_is_corpus_independent(spark):
    # the 100 TB property: broadcast codebook size depends ONLY on
    # n_centroids, never on corpus row count — and selection is a parallel
    # partial top-k (TakeOrderedAndProject), not a global sort
    import random

    from feathub_spark.datapipe.similarity import ivf_codebook

    rng = random.Random(5)

    def corpus(n):
        rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    small = ivf_codebook(corpus(200), "embedding", "vec_id", n_centroids=16, seed=3)
    big = ivf_codebook(corpus(2000), "embedding", "vec_id", n_centroids=16, seed=3)
    assert small.count() == 16
    assert big.count() == 16
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # undersized corpus: codebook = whole corpus, no padding
    assert ivf_codebook(corpus(7), "embedding", "vec_id", n_centroids=16).count() == 7


def test_train_ivf_codebook(spark):
    import random

    from feathub_spark.datapipe.similarity import train_ivf_codebook

    rng = random.Random(3)
    centers = [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10]]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    cb = train_ivf_codebook(
        df, "embedding", "vec_id", n_centroids=8, iterations=2, seed=3
    )
    got = {r["__cid__"]: r["__cvec__"] for r in cb.collect()}
    # cells may shrink (empty cells disappear) but never grow
    assert 1 <= len(got) <= 8
    # deterministic: identical re-run
    got2 = {
        r["__cid__"]: r["__cvec__"]
        for r in train_ivf_codebook(
            df, "embedding", "vec_id", n_centroids=8, iterations=2, seed=3
        ).collect()
    }
    assert got == got2
    # every trained centroid is dominated by one cluster axis (Lloyd pulls
    # it to a cluster mean); the dominant component is ~10, others ~0
    for vec in got.values():
        top = max(vec)
        assert top > 7 and sum(1 for x in vec if x > 2) == 1

    # trained codebook slots into ivf_topk and keeps recall on clustered data
    q = df.filter(F.col("vec_id") < 4)
    ivf = ivf_topk(df, q, "embedding", "vec_id", k=3, nprobe=3, codebook=cb)
    bf = brute_force_topk(df, q, "embedding", "vec_id", k=3)
    ivf_pairs = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    bf_pairs = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    assert len(ivf_pairs & bf_pairs) / len(bf_pairs) >= 0.9


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@example.co.uk today"),
            (2, "server 10.0.255.3 and http://x.io/p?q=1 ok"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "clean text only"),
        ],
        "id bigint, text string",
    )
    out = {r["id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail me at <EMAIL> today"
    assert out[1]["n_email"] == 1
    assert out[2]["clean_text"] == "server <IPV4> and <URL> ok"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_url"] == 1
    assert out[3]["clean_text"] == "call <PHONE> now"
    assert out[3]["n_phone"] == 1
    assert out[4]["clean_text"] == "clean text only"
    assert all(out[4][f"n_{k}"] == 0 for k in ["url", "email", "ipv4", "phone"])


def test_ngram_topk(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat sat on the cat mat"),
            ("en", "the cat sat down"),
            ("de", "der hund der hund"),
        ],
        "lang string, text string",
    )
    out = ngram_topk(df, "text", n=2, k=2, group_col="lang").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["lang"], []).append((r["rank"], r["gram"], r["n_occurrences"]))
    assert sorted(by_group["en"]) == [(1, "the cat", 3), (2, "cat sat", 2)]
    assert sorted(by_group["de"]) == [(1, "der hund", 2), (2, "hund der", 1)]


def test_ngram_topk_global(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat sat on the cat mat"),
            ("en", "the cat sat down"),
            ("de", "der hund der hund"),
        ],
        "lang string, text string",
    )
    out = sorted(
        (r["rank"], r["gram"], r["n_occurrences"])
        for r in ngram_topk(df, "text", n=2, k=3).collect()
    )
    assert out == [(1, "the cat", 3), (2, "cat sat", 2), (3, "der hund", 2)]
    # the global path must not funnel all distinct grams through one
    # empty-partitionBy window task: TakeOrderedAndProject, no Window
    plan = ngram_topk(df, "text", n=2, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_temperature_sample_matches_python_model(spark):
    from feathub_spark.datapipe.sampling import temperature_sample
    import hashlib

    # skewed corpus: 400 'en', 80 'de', 20 'fr'
    rows = [(i, "en" if i < 400 else "de" if i < 480 else "fr") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def h32(v, seed):
        return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:8], 16)

    def model(target, alpha, seed):
        counts = {"en": 400, "de": 80, "fr": 20}
        tot = sum(n ** alpha for n in counts.values())
        rates = {
            g: round(min(1.0, target * (n ** alpha / tot) / n), 12)
            for g, n in counts.items()
        }
        return {
            i for i, g in rows if h32(i, seed) / 4294967296.0 < rates[g]
        }, rates

    exp, rates = model(200, 0.7, 3)
    got = {
        r["doc_id"]
        for r in temperature_sample(
            df, "doc_id", "lang", target_rows=200, alpha=0.7, seed=3
        ).collect()
    }
    assert got == exp
    # alpha < 1 up-weights small groups: fr keep rate > en keep rate
    assert rates["fr"] > rates["en"]

    # nested property: raising target strictly grows the sample
    bigger = {
        r["doc_id"]
        for r in temperature_sample(
            df, "doc_id", "lang", target_rows=400, alpha=0.7, seed=3
        ).collect()
    }
    assert got <= bigger

    # alpha=1 degenerates to uniform sampling at rate target/total
    exp1, rates1 = model(250, 1.0, 3)
    got1 = {
        r["doc_id"]
        for r in temperature_sample(
            df, "doc_id", "lang", target_rows=250, alpha=1.0, seed=3
        ).collect()
    }
    assert got1 == exp1
    assert len({round(r, 9) for r in rates1.values()}) == 1


def test_temperature_sample_caps_and_nulls(spark):
    from feathub_spark.datapipe.sampling import temperature_sample

    rows = [(i, "big") for i in range(300)] + [(1000 + i, "tiny") for i in range(3)]
    rows.append((9999, None))
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(
        df, "doc_id", "lang", target_rows=150, alpha=0.3, seed=0,
        keep_rate_col="rate",
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # strongly flattened mixture: the tiny group's rate caps at 1.0 -> all kept
    assert len(by_lang.get("tiny", [])) == 3
    assert all(r["rate"] == 1.0 for r in by_lang["tiny"])
    # null-group rows have no mixture weight and are dropped
    assert None not in by_lang


def test_normalize_text_matches_python_golden(spark):
    import re
    import unicodedata

    from feathub_spark.datapipe.text import normalize_text

    rows = [
        (1, "Café du   Monde"),          # decomposed e + combining acute
        (2, "Café du Monde"),              # precomposed -> same NFC output
        (3, "STRAßE"),                     # casefold: ss -> ss
        (4, "  leading and\ttrailing \n ws  "),
        (5, ""),
        (6, "already normal ascii text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def golden(s, form="NFC"):
        out = unicodedata.normalize(form, s).casefold()
        # ASCII whitespace class mirrors Java/RE2 \s (not Python's
        # unicode-aware \s)
        return re.sub(r"[ \t\n\r\f\v]+", " ", out).strip()

    got = {
        r["doc_id"]: r["norm_text"]
        for r in normalize_text(df, "text").collect()
    }
    assert got == {i: golden(t) for i, t in rows}
    # NFC unifies composed and decomposed forms
    assert got[1] == got[2] == "café du monde"
    assert got[3] == "straße".replace("ß", "ss")


def test_normalize_text_nfkc_and_flags(spark):
    import unicodedata

    from feathub_spark.datapipe.text import normalize_text

    rows = [(1, "ﬁle  WIDTHＤ")]  # fi ligature + fullwidth D
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = normalize_text(
        df, "text", form="NFKC", casefold=False, collapse_whitespace=False
    ).collect()[0]["norm_text"]
    assert got == unicodedata.normalize("NFKC", rows[0][1])
    assert got.startswith("file")  # ligature expanded, case preserved

    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_text(df, "text", form="NFX")


def test_cluster_balanced_sample(spark):
    import hashlib
    import math
    import random

    from feathub_spark.datapipe.similarity import cluster_balanced_sample

    rnd = random.Random(5)
    # two tight clusters of very different sizes around orthogonal axes
    rows = []
    for i in range(60):
        base = [1.0, 0.0, 0.0, 0.0] if i < 50 else [0.0, 1.0, 0.0, 0.0]
        rows.append((i, [b + rnd.uniform(-0.05, 0.05) for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_balanced_sample(
        df, "embedding", "vec_id", per_cell=5, n_centroids=4, seed=1,
        sample_seed=2,
    ).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    # the cap holds per cell and ranks are contiguous from 1
    for cell, rs in by_cell.items():
        assert len(rs) <= 5
        assert sorted(x["cell_rank"] for x in rs) == list(range(1, len(rs) + 1))
    # the dense cluster (50 rows) is capped to 5 -> flattened representation
    sizes = sorted(len(rs) for rs in by_cell.values())
    assert max(sizes) == 5 and len(out) <= 5 * len(by_cell)

    # deterministic: same inputs, same sample
    again = cluster_balanced_sample(
        df, "embedding", "vec_id", per_cell=5, n_centroids=4, seed=1,
        sample_seed=2,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    # per-cell membership follows the md5 hash rank (independent model)
    def h32(v, s):
        return int(hashlib.md5(f"{v}:{s}".encode()).hexdigest()[:8], 16)

    full = cluster_balanced_sample(
        df, "embedding", "vec_id", per_cell=1000, n_centroids=4, seed=1,
        sample_seed=2,
    ).collect()
    cells = {}
    for r in full:
        cells.setdefault(r["cell"], []).append(r["vec_id"])
    for cell, ids in cells.items():
        expect = sorted(ids, key=lambda i: (h32(i, 2), i))[:5]
        got = sorted(
            (r["vec_id"] for r in by_cell.get(cell, [])),
        )
        assert sorted(expect) == got


def test_url_domains_and_blocklist(spark):
    from feathub_spark.datapipe.text import domain_blocklist_filter, url_domains

    rows = [
        (1, "see https://www.spam-site.com/offers and http://ok.org/page"),
        (2, "mirror at https://cdn.spam-site.com:8080/x plus text"),
        (3, "no urls at all here"),
        (4, "https://sub.deep.example.net/a?q=1 and https://example.net/b"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    doms = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", url_domains("text").alias("d")).collect()
    }
    assert doms[1] == ["ok.org", "spam-site.com"]
    assert doms[2] == ["spam-site.com"]          # port + subdomain stripped
    assert doms[3] == [] and doms[5] == []
    assert doms[4] == ["example.net"]            # deep subdomain collapsed

    out = {
        r["doc_id"]: r["blocked"]
        for r in domain_blocklist_filter(
            df, "text", ["spam-site.com", "bad.io"]
        ).collect()
    }
    assert out == {1: True, 2: True, 3: False, 4: False, 5: False}

    kept = domain_blocklist_filter(
        df, "text", ["spam-site.com"], keep=False
    ).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [3, 4, 5]

    # DataFrame blocklist goes through the broadcast-join path
    bl = spark.createDataFrame([("example.net",)], ["domain"])
    out2 = {
        r["doc_id"]: r["blocked"]
        for r in domain_blocklist_filter(df, "text", bl).collect()
    }
    assert out2 == {1: False, 2: False, 3: False, 4: True, 5: False}


def test_script_ratios(spark):
    from feathub_spark.datapipe.text import script_ratios

    rows = [
        (1, "hello world"),                      # pure latin
        (2, "привет мир hello"),                 # cyrillic + latin
        (3, "你好世界"),                          # cjk
        (4, "12345 .,!?"),                        # no script letters
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: dict(r["r"])
        for r in df.select("doc_id", script_ratios("text").alias("r")).collect()
    }
    assert got[1] == {"latin": 1.0}
    assert set(got[2]) == {"cyrillic", "latin"}
    assert abs(got[2]["cyrillic"] - 9 / 14) < 1e-6  # приветмир = 9 letters
    assert got[3] == {"cjk": 1.0}
    assert got[4] == {} and got[5] == {}


def test_structure_signals(spark):
    from feathub_spark.datapipe.text import structure_signals

    code_doc = "# Title\n```python\nx = f(1)\n```\n- item one\n    indented"
    prose = "just a plain sentence without structure"
    df = spark.createDataFrame(
        [(1, code_doc), (2, prose), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in df.select("doc_id", structure_signals("text").alias("s")).collect()
    }
    s = got[1]
    assert s["heading_frac"] == round(1 / 6, 6)
    assert s["fence_frac"] == round(2 / 6, 6)
    assert s["bullet_frac"] == round(1 / 6, 6)
    assert s["indent_frac"] == round(1 / 6, 6)
    assert s["punct_density"] > 0
    p = got[2]
    assert p["heading_frac"] == 0.0 and p["fence_frac"] == 0.0
    assert p["punct_density"] == 0.0
    assert got[3]["heading_frac"] == 0.0  # single empty line, no crash


def test_temperature_sample_null_groups_do_not_dilute(spark):
    from feathub_spark.datapipe.sampling import temperature_sample

    rows = [(i, "en") for i in range(100)] + [(1000 + i, None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(
        df, "doc_id", "lang", target_rows=100, alpha=1.0, seed=0,
        keep_rate_col="rate",
    ).collect()
    # the single real group must get rate 1.0 (NULL rows carry no weight);
    # before the fix the NULL group halved the denominator -> rate 0.5
    assert len(out) == 100
    assert all(r["rate"] == 1.0 for r in out)


def test_domain_blocklist_df_path_keeps_duplicates_and_maps(spark):
    from feathub_spark.datapipe.text import domain_blocklist_filter, script_ratios

    rows = [
        (1, "https://bad.com/x"),
        (1, "https://bad.com/x"),     # duplicate row must survive
        (2, "https://fine.org/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "scripts", script_ratios("text")  # map column: ungroupable
    )
    bl = spark.createDataFrame([("bad.com",)], ["domain"])
    out = domain_blocklist_filter(df, "text", bl).collect()
    assert len(out) == 3
    assert sorted((r["doc_id"], r["blocked"]) for r in out) == [
        (1, True), (1, True), (2, False),
    ]
    # literal entries containing quotes must not break the expression
    q = domain_blocklist_filter(df, "text", ["o'brien.com"]).collect()
    assert all(not r["blocked"] for r in q)


def test_temperature_sample_renormalizes_clipped_mass(spark):
    """When small groups saturate, the water-filling renormalization
    redistributes their clipped probability mass so the EXPECTED sample
    size still equals min(target_rows, corpus size) — the plain rule
    systematically undershoots (round-6 advisor flag)."""
    from feathub_spark.datapipe.sampling import temperature_sample

    # 500 'en', 40 'de', 10 'fr', 4 'xx': alpha .5 + target 300 saturates
    # xx, fr AND de in cascade (three water-filling steps)
    rows = (
        [(i, "en") for i in range(500)]
        + [(1000 + i, "de") for i in range(40)]
        + [(2000 + i, "fr") for i in range(10)]
        + [(3000 + i, "xx") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    counts = {"en": 500, "de": 40, "fr": 10, "xx": 4}

    out = temperature_sample(
        df, "doc_id", "lang", target_rows=300, alpha=0.5, seed=1,
        keep_rate_col="rate",
    )
    rates = {r["lang"]: r["rate"] for r in out.select("lang", "rate").distinct().collect()}
    # every non-dominant group saturates; en absorbs the clipped mass
    assert rates["xx"] == 1.0 and rates["fr"] == 1.0 and rates["de"] == 1.0
    expected_total = sum(rates[g] * n for g, n in counts.items())
    assert abs(expected_total - 300) < 1e-6
    # en's rate exceeds what the plain (non-renormalized) rule would give
    plain = {r["lang"]: r["rate"] for r in temperature_sample(
        df, "doc_id", "lang", target_rows=300, alpha=0.5, seed=1,
        keep_rate_col="rate", renormalize=False,
    ).select("lang", "rate").distinct().collect()}
    assert rates["en"] > plain["en"]
    plain_total = sum(plain[g] * n for g, n in counts.items())
    assert plain_total < 300 - 10  # the undershoot the fix removes

    # target >= corpus size: every rate is 1 (no valid boundary)
    all_rates = {r["lang"]: r["rate"] for r in temperature_sample(
        df, "doc_id", "lang", target_rows=10_000, alpha=0.5, seed=1,
        keep_rate_col="rate",
    ).select("lang", "rate").distinct().collect()}
    assert set(all_rates.values()) == {1.0}

    # nested property survives renormalization: raising target grows the set
    small = {r["doc_id"] for r in temperature_sample(
        df, "doc_id", "lang", target_rows=150, alpha=0.5, seed=1).collect()}
    big = {r["doc_id"] for r in temperature_sample(
        df, "doc_id", "lang", target_rows=300, alpha=0.5, seed=1).collect()}
    assert small <= big


def test_url_domains_two_level_public_suffixes(spark):
    """Hosts under two-level public suffixes keep THREE labels — a
    blocklist entry like 'badsite.co.uk' must be matchable, and unrelated
    *.co.uk sites must not merge into one 'co.uk' domain (round-6 advisor
    flag)."""
    from feathub_spark.datapipe.text import (
        DEFAULT_TWO_LEVEL_SUFFIXES,
        domain_blocklist_filter,
        url_domains,
    )

    rows = [
        (1, "https://www.badsite.co.uk/x and https://news.bbc.co.uk/y"),
        (2, "https://shop.example.com.au/z"),
        (3, "https://co.uk/ and https://example.org/"),   # bare suffix host
        (4, "https://a.b.example.ac.jp/p"),
        (5, "plain http://normal.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    doms = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", url_domains("text").alias("d")).collect()
    }
    assert doms[1] == ["badsite.co.uk", "bbc.co.uk"]
    assert doms[2] == ["example.com.au"]
    # a host that IS the suffix has only 2 labels -> falls back to itself
    assert doms[3] == ["co.uk", "example.org"]
    assert doms[4] == ["example.ac.jp"]
    assert doms[5] == ["normal.com"]
    # blocklisting a co.uk registrable domain now works end to end
    out = {
        r["doc_id"]: r["blocked"]
        for r in domain_blocklist_filter(df, "text", ["badsite.co.uk"]).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}
    # opting out restores the plain 2-label rule
    plain = df.select(
        "doc_id", url_domains("text", extra_suffixes=()).alias("d")
    ).collect()
    assert {r["doc_id"]: r["d"] for r in plain}[1] == ["co.uk"]
    assert "co.uk" in DEFAULT_TWO_LEVEL_SUFFIXES


def test_chunk_documents(spark):
    import pytest

    from feathub_spark.datapipe.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, ""), (4, None), (5, "abcdefg")],
        "doc_id long, text string",
    )
    out = sorted(
        tuple(r)
        for r in chunk_documents(df, "text", "doc_id", chunk_size=4, overlap=1)
        .collect()
    )
    assert out == [
        (1, 0, 1, "abcd"), (1, 1, 4, "defg"), (1, 2, 7, "ghij"),
        (2, 0, 1, "abc"),
        (5, 0, 1, "abcd"), (5, 1, 4, "defg"),
    ]
    # every character is covered exactly when min_chunk_chars=1
    covered = set()
    for _, _, start, text in out:
        if _ == 1:
            covered.update(range(start, start + len(text)))
    # no overlap: plain partition
    flat = chunk_documents(
        df.filter("doc_id = 1"), "text", "doc_id", chunk_size=5
    ).collect()
    assert [r["chunk_text"] for r in sorted(flat, key=lambda r: r["chunk_id"])] \
        == ["abcde", "fghij"]
    # min_chunk_chars drops uninformative tails
    tail = chunk_documents(
        df.filter("doc_id = 1"), "text", "doc_id",
        chunk_size=4, overlap=2, min_chunk_chars=3,
    ).collect()
    assert all(len(r["chunk_text"]) >= 4 or r["chunk_id"] == 0 for r in tail)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_size=4, overlap=4)


def test_assign_splits_deterministic_and_leakage_safe(spark):
    import pytest

    from feathub_spark.datapipe.sampling import assign_splits

    df = spark.createDataFrame(
        [(i, i % 40) for i in range(2000)], "doc_id long, cluster long"
    )
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = assign_splits(df, "doc_id", w, seed=2)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert 0.7 < counts["train"] / 2000 < 0.9
    # deterministic: identical on rerun
    again = assign_splits(df, "doc_id", w, seed=2)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    # leakage-safe: a whole cluster always lands in one split
    g = assign_splits(df, "doc_id", w, seed=2, group_col="cluster")
    from pyspark.sql import functions as F
    spans = (
        g.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    # NULL group falls back to the row id
    withnull = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, cluster string"
    )
    assert assign_splits(withnull, "doc_id", w, group_col="cluster").count() == 2
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_numeric_histogram_and_profile(spark):
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.profile import numeric_histogram, profile_columns

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "v double"
    )
    h = {r["bin"]: r for r in numeric_histogram(df, "v", n_bins=10).collect()}
    assert len(h) == 10 and all(h[b]["n"] == 10 for b in h)
    assert h[0]["bin_lo"] == 0.0 and h[9]["bin_hi"] == 99.0
    # the max value lands in the LAST bin, not a phantom bin 10
    assert 10 not in h
    # explicit bounds: out-of-range values clamp to edge bins
    hb = {r["bin"]: r["n"] for r in numeric_histogram(
        df, "v", n_bins=4, lo=20.0, hi=60.0
    ).collect()}
    assert hb[0] == 30 and hb[3] == 50  # below-lo clamps low, >=50th clamps high

    prof = {r["column"]: r for r in profile_columns(
        df.withColumn("s", F.when(F.col("v") < 50, F.lit("x")))
    ).collect()}
    assert prof["v"]["n_rows"] == 101 and prof["v"]["n_nulls"] == 1
    assert prof["v"]["n_distinct"] == 100
    assert prof["v"]["min_value"] == "0.0" and prof["v"]["max_value"] == "99.0"
    assert prof["s"]["n_nulls"] == 51 and prof["s"]["n_distinct"] == 1


def test_normalize_urls_rules(spark):
    from feathub_spark.datapipe.text import normalize_urls

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Path/A?utm_source=x&b=2&a=1#frag"),
        (2, "http://Site.org:80"),                  # default port + empty path
        (3, "http://site.org:8080/x?gclid=9&z=1"),  # non-default port kept
        (4, "not a url"),                           # passes through
        (5, "https://a.b/?UTM_CAMPAIGN=z"),         # utm_* case-insensitive
        (6, "http://h/p?a=1&a=0&ref=t"),            # sort + ref dropped
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    got = {r["i"]: r["norm_url"] for r in normalize_urls(df, "u").collect()}
    assert got[1] == "https://www.example.com/Path/A?a=1&b=2"
    assert got[2] == "http://site.org/"
    assert got[3] == "http://site.org:8080/x?z=1"
    assert got[4] == "not a url"
    assert got[5] == "https://a.b/"
    assert got[6] == "http://h/p?a=0&a=1"


def test_ring_negative_samples_successor_semantics(spark):
    """Every slot must resolve to the exact ring successor (smallest item
    hash >= probe hash, wrapping to the global minimum) — verified
    against a Python replica of the md5 ring, including the wrap path
    and positive exclusion."""
    import hashlib

    from pyspark.sql import functions as F

    from feathub_spark.datapipe.sampling import ring_negative_samples

    def h32(x, seed):
        return int(
            hashlib.md5(f"{x}:{seed}".encode()).hexdigest()[:8], 16
        )

    items = [i * 3 for i in range(40)]
    corpus = spark.createDataFrame([(i,) for i in items], ["item"])
    queries = spark.createDataFrame([(7,), (9,)], ["q"])
    # tiny buckets force plenty of miss-path resolutions
    out = ring_negative_samples(
        corpus, queries, "item", "q", k=6, seed=5, bucket_bits=3
    ).collect()
    assert len(out) == 12
    ring = sorted((h32(i, 5), i) for i in items)
    for r in out:
        probe = h32(f"{r.q}#{r.slot}", 5)
        succ = next((e for e in ring if e[0] >= probe), ring[0])
        assert (r.neg_hash, r.neg_id) == succ
    # exclusion drops accidental positives
    excl = spark.createDataFrame(
        [(r.q, r.neg_id) for r in out[:3]], ["q", "item"]
    )
    kept = ring_negative_samples(
        corpus, queries, "item", "q", k=6, seed=5, bucket_bits=3,
        exclude=excl,
    ).collect()
    dropped = {(r.q, r.neg_id) for r in out[:3]}
    assert {(r.q, r.neg_id) for r in kept}.isdisjoint(dropped)


def test_weighted_sample_proportionality(spark):
    """Heavy rows dominate the sample, the keys replicate the A-ES
    formula exactly, and zero/NULL weights never qualify."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from feathub_spark.datapipe.sampling import weighted_sample

    rows = (
        [(i, 1000.0) for i in range(20)]            # heavy
        + [(i, 1.0) for i in range(100, 400)]       # light
        + [(998, 0.0), (999, None)]                 # never sampled
    )
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", k=25, seed=4).collect()
    assert len(out) == 25
    ids = [r.id for r in out]
    assert 998 not in ids and 999 not in ids
    # with 1000:1 weights, nearly every heavy row is drawn
    assert sum(1 for i in ids if i < 20) >= 15
    # keys replicate the formula — LOG-SPACE (review finding: rounding
    # -ln(u)/w itself to 9 dp collapsed all keys to ~0 at weights ~1e10,
    # degrading selection to smallest-id order; the log transform is
    # monotone so the ranking is unchanged and precision is relative)
    for r in out[:5]:
        u = (
            int(hashlib.md5(f"{r.id}:4".encode()).hexdigest()[:8], 16) + 1
        ) / 4294967296.0
        expect = round(math.log(max(-math.log(u), 1e-300)) - math.log(r.w), 9)
        assert abs(r.sample_key - expect) < 1e-9
    # ranks dense and ordered by key
    by_rank = sorted(out, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, 26))
    assert all(
        by_rank[i].sample_key <= by_rank[i + 1].sample_key
        for i in range(24)
    )


def test_weighted_sample_grouped_two_stage(spark):
    """Grouped mode takes k per group via the salted two-stage rank and
    equals the single-window formulation exactly."""
    import hashlib
    import math

    from feathub_spark.datapipe.sampling import weighted_sample

    rows = [(i, float(1 + i % 7), f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w double, g string")
    out = weighted_sample(df, "id", "w", k=5, seed=2, group_col="g").collect()
    assert len(out) == 15
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    # reference: full single-window ranking per group (log-space keys,
    # see test_weighted_sample_proportionality)
    def key(i, w):
        u = (int(hashlib.md5(f"{i}:2".encode()).hexdigest()[:8], 16) + 1) \
            / 4294967296.0
        return round(math.log(max(-math.log(u), 1e-300)) - math.log(w), 9)
    for g, rs in by_g.items():
        cands = sorted(
            ((key(i, w), i) for i, w, gg in rows if gg == g),
        )[:5]
        got = sorted((r.sample_key, r.id) for r in rs)
        assert got == cands
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4, 5]


def test_cluster_split_no_leakage(spark):
    """Composing dedup_clusters with assign_splits(group_col=cluster_id):
    every member of a near-dup cluster must land in the SAME split."""
    from feathub_spark.datapipe.dedup import dedup_clusters
    from feathub_spark.datapipe.sampling import assign_splits

    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9), (9, 10), (3, 4)], ["id_a", "id_b"]
    )
    labels = dedup_clusters(pairs).withColumnRenamed("id", "doc_id")
    docs = spark.range(12).select(F.col("id").alias("doc_id")).join(
        labels, "doc_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    out = assign_splits(
        docs, "doc_id", {"train": 0.6, "valid": 0.2, "test": 0.2},
        seed=7, group_col="cluster_id",
    ).collect()
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_cluster.values()), per_cluster
    assert len(out) == 12


def test_quantile_stratified_sample(spark):
    """Equal-frequency bins from the exact-at-accuracy GK thresholds; a
    pure-Python replica of the thresholds, binning, and md5 membership
    must agree row-for-row; per-bin fractions apply; nested-sample
    property holds."""
    import hashlib
    import math

    import pytest as _pytest

    from feathub_spark.datapipe.sampling import quantile_stratified_sample

    rows = [(i, float((i * 37) % 101)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)

    def h32(key, seed):
        return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16)

    def disc(data, p):
        s = sorted(data)
        return s[max(int(math.ceil(p * len(s))) - 1, 0)]

    vals = [v for _, v in rows]
    th = [disc(vals, i / 4) for i in range(1, 4)]
    fracs = [1.0, 0.5, 0.25, 0.1]

    exp = {}
    for i, v in rows:
        b = sum(1 for t in th if v > t)
        if h32(i, 9) / 4294967296.0 < fracs[b]:
            exp[i] = b
    got = {
        r["id"]: r["value_bin"]
        for r in quantile_stratified_sample(
            df, "id", "v", n_bins=4, fractions=fracs, accuracy=100000, seed=9
        ).collect()
    }
    assert got == exp
    assert 0 < len(got) < len(rows)

    # uniform-fraction mode is a subset-by-rate of the full table, and
    # raising the rate strictly grows the sample (nested property)
    small = {r["id"] for r in quantile_stratified_sample(
        df, "id", "v", n_bins=4, fraction=0.2, accuracy=100000, seed=9).collect()}
    big = {r["id"] for r in quantile_stratified_sample(
        df, "id", "v", n_bins=4, fraction=0.6, accuracy=100000, seed=9).collect()}
    assert small <= big

    with _pytest.raises(ValueError, match="n_bins"):
        quantile_stratified_sample(df, "id", "v", n_bins=4, fractions=[1.0])


def test_quantile_stratified_sample_all_null_value_col(spark):
    """Review finding: percentile_approx over an all-NULL column returns
    NULL thresholds; size(filter(NULL,...)) = -1 crashed element_at with
    INVALID_INDEX_OF_ZERO and put NULL rows in bin -1.  All rows must
    land in bin 0."""
    from feathub_spark.datapipe.sampling import quantile_stratified_sample

    df = spark.createDataFrame(
        [(i, None) for i in range(50)], "id long, v double"
    )
    out = quantile_stratified_sample(
        df, "id", "v", n_bins=4, fractions=[1.0, 0.0, 0.0, 0.0]
    ).collect()
    assert len(out) == 50
    assert all(r["value_bin"] == 0 for r in out)
