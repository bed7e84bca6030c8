"""MemoryOnlineStore: in-process key → latest-feature-row store for serving.

Semantics per the reference (online_stores/memory_online_store.py:40-163):
``put`` upserts rows keeping the max-timestamp row per key; ``get`` returns
the latest row per requested key, optionally projected to selected features.
The store is a serving-side structure (pandas), not a Spark job.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence

import pandas as pd

from feathub_spark.common.exceptions import FeathubError


class MemoryOnlineStore:
    _instance: Optional["MemoryOnlineStore"] = None
    _lock = threading.Lock()

    def __init__(self) -> None:
        self._tables: Dict[str, pd.DataFrame] = {}
        self._keys: Dict[str, List[str]] = {}
        self._ts_fields: Dict[str, Optional[str]] = {}

    @classmethod
    def get_instance(cls) -> "MemoryOnlineStore":
        with cls._lock:
            if cls._instance is None:
                cls._instance = MemoryOnlineStore()
            return cls._instance

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._instance = None

    def put(
        self,
        table_name: str,
        data,
        key_fields: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
    ) -> None:
        if not isinstance(data, pd.DataFrame):
            data = data.toPandas()
        if key_fields is None:
            key_fields = self._keys.get(table_name)
        if not key_fields:
            # keyless table (e.g. global metric emissions): append-only store
            existing = self._tables.get(table_name)
            combined = (
                pd.concat([existing, data], ignore_index=True)
                if existing is not None
                else data.copy()
            )
            self._tables[table_name] = combined.reset_index(drop=True)
            self._keys[table_name] = []
            self._ts_fields[table_name] = timestamp_field
            return
        key_fields = list(key_fields)
        if timestamp_field is None:
            timestamp_field = self._ts_fields.get(table_name)

        existing = self._tables.get(table_name)
        combined = (
            pd.concat([existing, data], ignore_index=True)
            if existing is not None
            else data.copy()
        )
        if timestamp_field is not None and timestamp_field in combined.columns:
            # keep the max-timestamp row per key (last wins on ties, matching
            # upsert order semantics).  NaN/None timestamps sort FIRST: a
            # row with no event time must never beat a timestamped one
            # (pandas' default na_position="last" made exactly that happen)
            combined = combined.sort_values(
                timestamp_field, kind="stable", na_position="first"
            )
        combined = combined.drop_duplicates(subset=key_fields, keep="last")
        self._tables[table_name] = combined.reset_index(drop=True)
        self._keys[table_name] = key_fields
        self._ts_fields[table_name] = timestamp_field

    def get(
        self,
        table_name: str,
        input_data: pd.DataFrame,
        feature_names: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        table = self._tables.get(table_name)
        if table is None:
            raise KeyError(f"Table {table_name!r} not in the online store.")
        key_fields = self._keys[table_name]
        if not key_fields:
            raise FeathubError(
                f"Table {table_name!r} was stored without keys (append-only "
                "metric emissions) — keyed get() is undefined for it."
            )
        cols = list(table.columns)
        if feature_names is not None:
            cols = key_fields + [c for c in feature_names if c not in key_fields]
            table = table[cols]
        # the STORED value wins on name overlap (a request column or an
        # earlier lookup sharing a feature name) — matching the dict-
        # overwrite semantics of SqlOnlineStore/RedisOnlineStore.get; a
        # plain merge would suffix both sides to <c>_x/<c>_y and the
        # feature would silently vanish from the service projection
        clash = [
            c for c in cols if c not in key_fields and c in input_data.columns
        ]
        return input_data.drop(columns=clash).merge(
            table, on=key_fields, how="left"
        )

    def all_tables(self) -> List[str]:
        return sorted(self._tables)
