"""Uniform 1x -> 10x scale study for the five most expensive operator
families (r10 verdict item 4).

The driver ships no sf1 data and its generator is not reproducible here,
so this tool generates its OWN deterministic corpus at two scales with
identical schemas/distributions (scale=1 matches sf0.1's row counts,
scale=10 is the sf1-equivalent: 6M lineitem / 50k documents / 1M events
/ 20k embeddings) and times each family at both.  Because both scales
come from the SAME generator, the 10x/1x wall-time ratio is a clean
scaling exponent — free of the distribution mismatch a driver-data vs
synthetic comparison would have.  Families reuse the exact entry-query
code paths (`__spark_entry__.queries()`), so what is measured is what
the bench measures.

Usage:
    python tools/scale_study.py            # generate (if absent) + run
    python tools/scale_study.py --gen-only
Outputs one JSON line; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".localdata")
BASE_DOCS, BASE_EMB, BASE_EVENTS, BASE_ORDERS = 5_000, 2_000, 100_000, 150_000
BASE_USERS, BASE_CUST = 1_500, 15_000


def _vocab() -> list:
    import duckdb

    rows = duckdb.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def generate(scale: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42 + scale)
    vocab = np.array(_vocab())

    # documents: word-salad docs over the driver vocabulary; 5% of docs
    # are near-duplicates of an earlier doc (10% of tokens replaced) so
    # the dedup families have real positives at every scale
    n_docs = BASE_DOCS * scale
    lengths = rng.integers(8, 100, n_docs)
    texts = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            # object dtype: a fixed-width '<U' array would silently
            # truncate replacement words longer than the source doc's
            # longest token, corrupting the near-dup token distribution
            words = np.array(texts[rng.integers(0, i)].split(" "), dtype=object)
            mask = rng.random(len(words)) < 0.1
            words[mask] = rng.choice(vocab, int(mask.sum())).astype(object)
        else:
            words = rng.choice(vocab, lengths[i])
        texts.append(" ".join(words.tolist()))
    docs = pa.table(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "de", "fr", "es", "zh"], n_docs),
            "source": np.char.add("src_", rng.integers(0, 20, n_docs).astype(str)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # embeddings: 16 fixed cluster centers (scale-independent) + noise
    n_emb = BASE_EMB * scale
    centers = np.random.default_rng(7).normal(size=(16, 64)).astype(np.float32)
    assign = rng.integers(0, 16, n_emb)
    vecs = centers[assign] + rng.normal(scale=0.3, size=(n_emb, 64)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": assign.astype(np.int32) % 10,
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    # events: 30 days, exponential user popularity (hot keys at every
    # scale), 5 event types
    n_ev = BASE_EVENTS * scale
    n_users = BASE_USERS * scale
    pop = rng.exponential(size=n_users)
    user = rng.choice(n_users, n_ev, p=pop / pop.sum()).astype(np.int64)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ts0 + (rng.random(n_ev) * 30 * 86400 * 1e6).astype("timedelta64[us]")
    order = np.argsort(ts, kind="stable")
    events = pa.table(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts[order],
            "user_id": user[order],
            "event_type": rng.choice(
                ["view", "click", "buy", "scroll", "share"], n_ev
            ),
            "value": np.round(rng.lognormal(1.0, 1.0, n_ev), 4),
            "props": np.char.add(
                '{"p":', np.char.add(rng.integers(0, 100, n_ev).astype(str), "}")
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))

    # orders + lineitem: 4 lines/order, shipdate after orderdate
    n_ord = BASE_ORDERS * scale
    od = np.datetime64("2024-01-01", "us") + (
        rng.random(n_ord) * 300 * 86400 * 1e6
    ).astype("timedelta64[us]")
    orders = pa.table(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, BASE_CUST * scale, n_ord),
            "o_orderstatus": rng.choice(["O", "F", "P"], n_ord),
            "o_totalprice": np.round(rng.uniform(1e3, 5e5, n_ord), 2),
            "o_orderdate": od,
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                n_ord,
            ),
        }
    )
    pq.write_table(orders, os.path.join(out_dir, "orders.parquet"))

    n_li = 4 * n_ord
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), 4)
    ship = od[lkey] + (rng.random(n_li) * 120 * 86400 * 1e6).astype(
        "timedelta64[us]"
    )
    lineitem = pa.table(
        {
            "l_orderkey": lkey,
            "l_partkey": rng.integers(0, 20_000 * scale, n_li),
            "l_suppkey": rng.integers(0, 1_000 * scale, n_li),
            "l_linenumber": np.tile(np.arange(1, 5, dtype=np.int32), n_ord),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(1e3, 1e5, n_li), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
            "l_linestatus": rng.choice(["O", "F"], n_li),
            "l_shipdate": ship,
        }
    )
    pq.write_table(lineitem, os.path.join(out_dir, "lineitem.parquet"))


FAMILIES = [
    # (label, entry-query name) — entry queries read tables by name from
    # the given dir, so the generated dirs slot straight in
    ("ngram_jaccard (pair gen + verify)", "ngram_jaccard"),
    ("winnow passage pairs (capped)", "_passages_direct"),
    ("pagerank (pair graph + 3 rounds)", "pagerank"),
    ("ivf_ann (codebook + cell join)", "ivf_ann"),
    ("sliding_2d_1d (two-stage partials)", "sliding_2d_1d"),
    ("pit_join (union + last_value)", "pit_join"),
]


def _passages_direct(spark, sf_dir):
    from feathub_spark.datapipe.passages import dup_passage_pairs

    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # scale defaults: capped doc-freq (the exact-recall mode the oracle
    # query pins is deliberately NOT the 100 TB path)
    return dup_passage_pairs(df, "text", "doc_id")


def _stage_totals(spark) -> dict:
    """Cumulative spill/shuffle bytes across all completed stages, read
    from the UI REST API (requires SPARK_UI_ENABLED=true); zeros when the
    UI is off.  Per-query deltas come from diffing before/after."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {"spill": 0, "shuffle_write": 0}
    app = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
    except Exception:
        return {"spill": 0, "shuffle_write": 0}
    return {
        "spill": sum(
            d.get("memoryBytesSpilled", 0) + d.get("diskBytesSpilled", 0)
            for d in data
        ),
        "shuffle_write": sum(d.get("shuffleWriteBytes", 0) for d in data),
    }


def main() -> None:
    gen_only = "--gen-only" in sys.argv
    os.environ.setdefault("SPARK_UI_ENABLED", "true")
    dirs = {}
    for scale, name in ((1, "gen01"), (10, "gen1")):
        d = os.path.join(DATA, name)
        dirs[scale] = d
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            t0 = time.time()
            generate(scale, d)
            print(f"generated {name} in {time.time() - t0:.1f}s", file=sys.stderr)
    if gen_only:
        return

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["_passages_direct"] = _passages_direct
    spark = default_spark_session("scale_study", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    results = {}
    for label, qname in FAMILIES:
        fn = qs[qname]
        row = {}
        for scale in (1, 10):
            runs = []
            before = _stage_totals(spark)
            for _ in range(3):
                t0 = time.time()
                fn(spark, dirs[scale]).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
                release_caches()
                spark.catalog.clearCache()
            after = _stage_totals(spark)
            row[f"t{scale}x"] = round(statistics.median(runs), 3)
            row[f"spill{scale}x_mb"] = round(
                (after["spill"] - before["spill"]) / 3 / 1e6, 1
            )
            row[f"shuffle{scale}x_mb"] = round(
                (after["shuffle_write"] - before["shuffle_write"]) / 3 / 1e6, 1
            )
        row["ratio"] = round(row["t10x"] / row["t1x"], 2)
        results[label] = row
        print(f"{label}: {row}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
