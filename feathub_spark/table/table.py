"""Table: processor-bound materialization handle
(reference table/table.py:26)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


class Table:
    def __init__(self, df: DataFrame, descriptor, processor) -> None:
        self._df = df
        self._descriptor = descriptor
        self._processor = processor

    def to_dataframe(self) -> DataFrame:
        return self._df

    def to_pandas(self) -> pd.DataFrame:
        return self._df.toPandas()

    def get_schema(self):
        return self._descriptor.get_output_schema()

    def execute_insert(self, sink) -> None:
        from feathub_spark.processors.spark.source_sink_utils import insert_into_sink

        df = self._df
        if (
            not sink.keep_timestamp_field
            and self._descriptor.timestamp_field is not None
        ):
            df = df.drop(self._descriptor.timestamp_field)
        insert_into_sink(df, sink, self._descriptor)
