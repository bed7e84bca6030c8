"""The incremental-processing story: how a nightly 100 TB pipeline does
delta-sized work instead of full recomputes.

    1. diff_snapshots      — what changed since yesterday (CDC)
    2. merge_aggregates    — fold the raw delta into the materialized
                             per-key aggregate table
    3. bloom_filter_bits / bloom_prune
                           — prune today's fact scan against the changed
                             key set before any join
    4. match_against_index — check only the NEW documents against the
                             persisted winnowing fingerprint index
    5. hll_distinct        — mergeable distinct-count registers (union
                             two snapshots' sketches = groupBy MAX)

Runs on the bundled test data:
    python examples/incremental_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feathub_spark import default_spark_session
from feathub_spark.common.caching import release_caches
from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune
from feathub_spark.datapipe.passages import match_against_index, winnow_index
from feathub_spark.datapipe.profile import hll_distinct
from feathub_spark.datapipe.snapshots import diff_snapshots, merge_aggregates


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = default_spark_session("incremental_pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    print("== 1. CDC: what changed between snapshots ==")
    old = orders.filter("o_orderkey % 7 != 0").select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter("o_orderkey % 5 != 0").select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1 "
            "ELSE o_totalprice END"
        ).alias("o_totalprice"),
    )
    delta = diff_snapshots(old, new, ["o_orderkey"], ["o_totalprice"])
    delta.groupBy("change_type").count().show()

    print("== 2. fold the raw event delta into yesterday's aggregates ==")
    ev = events.select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vcents"),
        "event_id",
    )
    hist = ev.filter("event_id % 4 != 0")
    prev = hist.groupBy("user_id").agg(
        F.count("vcents").alias("n_events"),
        F.sum("vcents").alias("total_cents"),
        F.max("vcents").alias("max_cents"),
    )
    merged = merge_aggregates(
        prev,
        ev.filter("event_id % 4 = 0"),
        ["user_id"],
        {
            "n_events": ("count", "vcents"),
            "total_cents": ("sum", "vcents"),
            "max_cents": ("max", "vcents"),
        },
    )
    print("merged per-user aggregates:", merged.count(), "keys")

    print("== 3. prune the fact scan against the changed keys ==")
    changed = delta.select(F.col("o_orderkey"))
    bits = bloom_filter_bits(changed, "o_orderkey", m_bits=1 << 17, k=3)
    touched = bloom_prune(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "l_orderkey", bits, m_bits=1 << 17, k=3,
    )
    print(
        "lineitem rows:", lineitem.count(),
        "-> rows touching changed orders:", touched.count(),
    )

    print("== 4. new docs vs the persisted fingerprint index ==")
    index = winnow_index(docs.filter("doc_id % 2 = 0"), "text", "doc_id")
    hits = match_against_index(
        docs.filter("doc_id % 2 = 1"), index, "text", "doc_id"
    )
    print("new docs with shared passages:", hits.count())
    release_caches()

    print("== 5. mergeable distinct sketches per snapshot ==")
    hll_distinct(events, "user_id", ["event_type"], p=8).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
