"""Streaming conformance for the STATELESS datapipe operators: the text
hygiene stages (normalize, PII scrub, quality/structure signals,
winnowing fingerprint extraction, compression ratio) are narrow per-row
transformations, so the same code must run unmodified on a Structured
Streaming DataFrame and produce byte-identical results to the batch path.
Streaming exact dedup (dropDuplicatesWithinWatermark) is covered in
test_streaming.py; the aggregating datapipe operators (corpus counts,
index joins) are batch-by-design."""

import pytest

from pyspark.sql import functions as F


def _stream_of(spark, batch_df, tmp_path, name):
    d = str(tmp_path / f"in_{name}")
    batch_df.write.parquet(d)
    return spark.readStream.schema(batch_df.schema).parquet(d)


def _to_memory(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stateless_datapipe_ops_stream_equals_batch(spark, tmp_path):
    from feathub_spark.datapipe.passages import winnow_fingerprints
    from feathub_spark.datapipe.quality import compression_ratio
    from feathub_spark.datapipe.text import (
        normalize_text,
        pii_scrub,
        structure_signals,
        url_domains,
    )

    rows = [
        (1, "Café  visit https://www.spam.org/x mail a@b.co\n# head\nbody"),
        (2, "plain ascii prose " * 5),
        (3, ""),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    def pipeline(df):
        out = normalize_text(df, "text", out_col="norm")
        out = pii_scrub(out, "text")
        out = winnow_fingerprints(out, "text", "doc_id", 8, 4)
        out = compression_ratio(out, "text", "doc_id")
        return out.select(
            "doc_id",
            "norm",
            "clean_text",
            F.col("__fps__").alias("fps"),
            "compression_ratio",
            url_domains("text").alias("domains"),
            structure_signals("text").alias("structure"),
        )

    expected = {r["doc_id"]: r for r in pipeline(batch).collect()}

    stream = _stream_of(spark, batch, tmp_path, "dp")
    _to_memory(pipeline(stream), tmp_path, "dp_out")
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM dp_out").collect()}

    assert set(got) == set(expected)
    for i in expected:
        e, g = expected[i], got[i]
        assert g["norm"] == e["norm"]
        assert g["clean_text"] == e["clean_text"]
        assert sorted(g["fps"]) == sorted(e["fps"])
        assert g["compression_ratio"] == e["compression_ratio"]
        assert g["domains"] == e["domains"]
        assert g["structure"] == e["structure"]
    # sanity: the pipeline actually did something on row 1
    assert "[EMAIL]" in got[1]["clean_text"] or "@" not in got[1]["clean_text"]
    assert got[1]["domains"] == ["spam.org"]
