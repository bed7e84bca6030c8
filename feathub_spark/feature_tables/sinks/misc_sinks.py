"""Debug / throughput / memory sinks.

PrintSink and BlackHoleSink mirror the reference debug sinks
(feature_tables/sinks/print_sink.py:20, black_hole_sink.py:20); BlackHoleSink
maps to Spark's ``noop`` format.  MemoryStoreSink upserts into the in-process
MemoryOnlineStore keeping the max-timestamp row per key
(online_stores/memory_online_store.py:51-124).
"""

from __future__ import annotations

from feathub_spark.feature_tables.feature_table import Sink


class PrintSink(Sink):
    def __init__(self, keep_timestamp_field: bool = True, num_rows: int = 20) -> None:
        super().__init__(keep_timestamp_field)
        self.num_rows = num_rows


class BlackHoleSink(Sink):
    pass


class MemoryStoreSink(Sink):
    def __init__(self, table_name: str) -> None:
        super().__init__(keep_timestamp_field=True)
        self.table_name = table_name
