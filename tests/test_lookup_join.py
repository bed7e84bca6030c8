"""Processing-time lookup joins: batch broadcast snapshot and streaming
foreachBatch enrichment against the memory online store."""

import os

import pandas as pd
import pytest

from feathub_spark import MemoryOnlineStore
from feathub_spark.processors.spark.lookup_join import (
    MemoryLookup,
    lookup_join,
    streaming_lookup_enrich,
)


@pytest.fixture(autouse=True)
def fresh_store():
    MemoryOnlineStore.reset()
    store = MemoryOnlineStore.get_instance()
    store.put(
        "profiles",
        pd.DataFrame(
            {"user": ["u1", "u2"], "tier": ["gold", "silver"], "ts": [1, 2]}
        ),
        key_fields=["user"],
        timestamp_field="ts",
    )
    yield
    MemoryOnlineStore.reset()


def test_batch_lookup_join(spark):
    left = spark.createDataFrame(
        [("u1", 10.0), ("u2", 20.0), ("u3", 30.0)], ["user", "amount"]
    )
    out = lookup_join(left, MemoryLookup("profiles", ["tier"]), ["user"])
    rows = {r.user: r.tier for r in out.collect()}
    assert rows == {"u1": "gold", "u2": "silver", "u3": None}


def test_streaming_lookup_enrich(spark, tmp_path):
    d = os.path.join(str(tmp_path), "in")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as f:
        f.write("user,amount\nu1,10\nu3,5\n")
    stream = (
        spark.readStream.format("csv")
        .schema("user string, amount double")
        .option("header", "true")
        .load(d)
    )
    collected = []

    def sink_fn(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = streaming_lookup_enrich(
        stream, MemoryLookup("profiles", ["tier"]), ["user"], sink_fn
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.user: r.tier for r in collected}
    assert rows == {"u1": "gold", "u3": None}
