"""Spark read/write paths for the ``protobuf`` data format.

Replaces the reference's jar-backed protobuf format (format_config.py:23)
with the pure-Python wire codec in common/protowire.py, executed
executor-side over Arrow batches:

- read: ``binaryFile`` scan (one task per file — a delimited protobuf
  stream is not block-splittable, matching the jar readers' granularity)
  then ``mapInPandas`` decode into the declared schema.
- write: ``foreachPartition`` encodes one ``part-*.pb`` stream per
  partition into the target directory, so the write fans out like any
  file sink.
- Kafka: each record's ``value`` is one (undelimited) message; decoded by
  the same codec via ``mapInPandas``.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from feathub_spark.common import types as t
from feathub_spark.common.exceptions import FeathubError
from feathub_spark.common.protowire import (
    FieldSpec,
    build_field_specs,
    decode_delimited,
    decode_message,
    encode_delimited,
    parse_field_numbers_prop,
)
from feathub_spark.table.schema import Schema


def _specs_for(schema: Schema, data_format_props: dict) -> List[FieldSpec]:
    return build_field_specs(
        schema,
        parse_field_numbers_prop(
            (data_format_props or {}).get("protobuf.field_numbers")
        ),
    )


def _rows_to_pandas(rows: List[dict], schema: Schema):
    import pandas as pd

    data = {}
    for name, dtype in zip(schema.field_names, schema.field_types):
        col = [r.get(name) for r in rows]
        if getattr(dtype, "basic_dtype", None) == t.BasicDType.TIMESTAMP:
            col = pd.to_datetime(pd.Series(col, dtype="object"))
        data[name] = pd.Series(col, dtype="object") if not isinstance(
            col, pd.Series
        ) else col
    return pd.DataFrame(data, columns=schema.field_names)


def read_protobuf_files(spark: SparkSession, source) -> DataFrame:
    if source.schema is None:
        raise FeathubError("protobuf sources require an explicit schema.")
    schema = source.schema
    specs = _specs_for(schema, source.data_format_props)
    struct = schema.to_spark_struct()

    reader = spark.read.format("binaryFile")
    glob = source.data_format_props.get("pathGlobFilter")
    reader = reader.option("pathGlobFilter", glob or "*.pb")
    raw = reader.load(source.path).select("content")

    def decode(batches):
        for pdf in batches:
            rows: List[dict] = []
            for content in pdf["content"]:
                rows.extend(decode_delimited(bytes(content), specs))
            yield _rows_to_pandas(rows, schema)

    return raw.mapInPandas(decode, schema=struct)


def decode_protobuf_column(df: DataFrame, column: str, schema: Schema,
                           data_format_props: Optional[dict] = None) -> DataFrame:
    """Decode a binary column of single protobuf messages (e.g. Kafka value)
    into the declared schema."""
    specs = _specs_for(schema, data_format_props or {})
    struct = schema.to_spark_struct()

    def decode(batches):
        for pdf in batches:
            rows = [decode_message(bytes(v), specs) for v in pdf[column]]
            yield _rows_to_pandas(rows, schema)

    return df.select(column).mapInPandas(decode, schema=struct)


def _schema_from_dataframe(df: DataFrame) -> Schema:
    names, dtypes = [], []
    for field in df.schema.fields:
        names.append(field.name)
        dtypes.append(t.from_spark_type(field.dataType))
    return Schema(names, dtypes)


def write_protobuf_files(df: DataFrame, path: str,
                         data_format_props: Optional[dict] = None) -> None:
    import re

    from feathub_spark.common.exceptions import PlanError

    # This writer uses driver-side os.* for overwrite semantics and
    # executor-local open() for the part files — sound ONLY for a local
    # filesystem path on a local[*] master.  A URI-schemed path
    # (s3://...) would silently create a literal './s3:/...' directory,
    # and on a multi-node master each executor would write to ITS OWN
    # disk while the driver cleaned a different machine's directory.
    # Fail fast instead of losing data; distributed protobuf output can
    # go through kafka value_format='protobuf' or a binary-file sink.
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) and not path.startswith(
        "file://"
    ):
        raise PlanError(
            f"FileSystemSink(data_format='protobuf') writes through the "
            f"local filesystem and cannot target {path!r}."
        )
    master = df.sparkSession.conf.get("spark.master", "")
    if not master:
        # conf key unset/unretrievable (e.g. Spark Connect) — fall back to
        # the SparkContext's view before rejecting a genuinely local write
        try:
            master = df.sparkSession.sparkContext.master or ""
        except Exception:
            master = ""
    if not master.startswith("local"):
        raise PlanError(
            "FileSystemSink(data_format='protobuf') requires a local[*] "
            f"master (executor-local file writes); got {master!r}."
        )
    path = path[7:] if path.startswith("file://") else path
    schema = _schema_from_dataframe(df)
    specs = _specs_for(schema, data_format_props or {})
    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):  # overwrite semantics, like mode("overwrite")
        if stale.endswith(".pb"):
            os.remove(os.path.join(path, stale))
    columns = schema.field_names

    def write_partition(rows):
        import uuid

        buf_rows = []
        for row in rows:
            d = row.asDict(recursive=True)
            buf_rows.append({c: d.get(c) for c in columns})
        if not buf_rows:
            return
        payload = encode_delimited(buf_rows, specs)
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.pb")
        with open(fname, "wb") as f:
            f.write(payload)

    df.foreachPartition(write_partition)
