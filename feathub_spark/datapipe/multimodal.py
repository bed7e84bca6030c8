"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, Arrow-batched mapInPandas, partition
sizing, UDF signatures — is real and tested.  The actual media decoding is
STUBBED: the container has no image/audio libraries, so ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder derives metadata from the bytes (stable across
runs, usable in tests and oracles).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _fake_decode(payload: bytes):
    """Deterministic fake: metadata derived from the md5 content digest —
    md5 (unlike sha1) exists in every SQL engine, so the whole fake
    pipeline is oracle-checkable end to end."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    channels = 1 + digest[2] % 3
    return width, height, channels, "fake", hashlib.md5(payload or b"").hexdigest()


def decode_image_metadata(
    df: DataFrame, binary_col: str, out_col: str = "image_meta", fake: bool = False
) -> DataFrame:
    """Decode image metadata for every row via Arrow-batched mapInPandas.

    Real decoding requires an image library not present in this container —
    pass fake=True for the deterministic stub, else NotImplementedError is
    raised per batch.  The plumbing (schema propagation, batch iteration,
    column passthrough) is identical either way.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, IMAGE_META_SCHEMA)]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = []
            for payload in batch[binary_col]:
                if not fake:
                    raise NotImplementedError(
                        "Image decoding requires an image library; "
                        "re-run with fake=True for the deterministic stub."
                    )
                w, h, c, fmt, sha = _fake_decode(
                    bytes(payload) if payload is not None else b""
                )
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "channels": c,
                        "format": fmt,
                        "content_md5": sha,
                    }
                )
            batch = batch.copy()
            batch[out_col] = metas
            yield batch

    return df.mapInPandas(decode_batches, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, binary_col: str, every_n_ms: int = 1000
) -> DataFrame:
    """Plan-only helper for video frame sampling: emits one row per sampled
    frame offset (duration read from metadata when a decoder is present;
    here derived from payload length deterministically)."""
    from pyspark.sql import functions as F

    duration_ms = F.pmod(F.xxhash64(F.col(binary_col)), F.lit(10_000)) + F.lit(1000)
    return (
        df.withColumn("__duration_ms__", duration_ms)
        .withColumn(
            "frame_offset_ms",
            F.explode(
                F.sequence(F.lit(0), F.col("__duration_ms__"), F.lit(every_n_ms))
            ),
        )
        .drop("__duration_ms__")
    )
