"""SQL-backed online store — the engine's analog of the reference MySQL
online-store client (online_stores/mysql_client.py): key → latest feature
row, persisted in one DBAPI table.

Same put/get semantics as MemoryOnlineStore (max-timestamp row wins per
key; get() left-joins onto the request keys).  Written against PEP-249 so
production MySQL and the sqlite3-backed tests run identical code.  This is
a SERVING-side structure: row-at-a-time upserts over small batches, not a
Spark job.
"""

from __future__ import annotations

import json
from typing import Callable, List, Optional, Sequence

import pandas as pd


class SqlOnlineStore:
    def __init__(
        self,
        connection_factory: Callable,
        table_name: str = "feathub_online",
        paramstyle: str = "qmark",
    ) -> None:
        self._factory = connection_factory
        self._table = table_name
        self._ph = "?" if paramstyle == "qmark" else "%s"
        conn = self._factory()
        cur = conn.cursor()
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self._table} ("
            "tbl VARCHAR(255) NOT NULL, "
            "k VARCHAR(1024) NOT NULL, "
            "ts_num DOUBLE PRECISION, "
            "row_json TEXT NOT NULL, "
            "PRIMARY KEY (tbl, k))"
        )
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self._table}_meta ("
            "tbl VARCHAR(255) PRIMARY KEY, "
            "key_fields TEXT NOT NULL, "
            "ts_field TEXT)"
        )
        conn.commit()

    @staticmethod
    def _ts_value(v) -> Optional[float]:
        if v is None:
            return None
        if hasattr(v, "timestamp"):
            return float(v.timestamp())
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    def put(
        self,
        table_name: str,
        data,
        key_fields: Optional[Sequence[str]] = None,
        timestamp_field: Optional[str] = None,
    ) -> None:
        if not isinstance(data, pd.DataFrame):
            data = data.toPandas()
        conn = self._factory()
        cur = conn.cursor()
        if key_fields is None or timestamp_field is None:
            cur.execute(
                f"SELECT key_fields, ts_field FROM {self._table}_meta "
                f"WHERE tbl = {self._ph}",
                (table_name,),
            )
            row = cur.fetchone()
            if row is not None:
                key_fields = key_fields or json.loads(row[0])
                timestamp_field = timestamp_field or row[1]
        if not key_fields:
            raise ValueError("SqlOnlineStore.put requires key_fields.")
        key_fields = list(key_fields)
        cur.execute(
            f"DELETE FROM {self._table}_meta WHERE tbl = {self._ph}", (table_name,)
        )
        cur.execute(
            f"INSERT INTO {self._table}_meta (tbl, key_fields, ts_field) "
            f"VALUES ({self._ph}, {self._ph}, {self._ph})",
            (table_name, json.dumps(key_fields), timestamp_field),
        )

        for _, r in data.iterrows():
            d = {c: r[c] for c in data.columns}
            key = json.dumps([str(d[k]) for k in key_fields])
            ts = (
                self._ts_value(d.get(timestamp_field))
                if timestamp_field is not None
                else None
            )
            cur.execute(
                f"SELECT ts_num FROM {self._table} "
                f"WHERE tbl = {self._ph} AND k = {self._ph}",
                (table_name, key),
            )
            existing = cur.fetchone()
            if existing is not None:
                # max-timestamp wins; ties/no-timestamp → last write wins
                if (
                    existing[0] is not None
                    and ts is not None
                    and ts < existing[0]
                ):
                    continue
                cur.execute(
                    f"DELETE FROM {self._table} "
                    f"WHERE tbl = {self._ph} AND k = {self._ph}",
                    (table_name, key),
                )
            cur.execute(
                f"INSERT INTO {self._table} (tbl, k, ts_num, row_json) "
                f"VALUES ({self._ph}, {self._ph}, {self._ph}, {self._ph})",
                (table_name, key, ts, json.dumps(d, default=str)),
            )
        conn.commit()

    def get(
        self,
        table_name: str,
        input_data: pd.DataFrame,
        feature_names: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        conn = self._factory()
        cur = conn.cursor()
        cur.execute(
            f"SELECT key_fields FROM {self._table}_meta WHERE tbl = {self._ph}",
            (table_name,),
        )
        row = cur.fetchone()
        if row is None:
            raise KeyError(f"Table {table_name!r} not in the online store.")
        key_fields: List[str] = json.loads(row[0])

        records = []
        for _, r in input_data.iterrows():
            key = json.dumps([str(r[k]) for k in key_fields])
            cur.execute(
                f"SELECT row_json FROM {self._table} "
                f"WHERE tbl = {self._ph} AND k = {self._ph}",
                (table_name, key),
            )
            hit = cur.fetchone()
            rec = dict(r)
            if hit is not None:
                stored = json.loads(hit[0])
                if feature_names is not None:
                    stored = {
                        c: v for c, v in stored.items()
                        if c in feature_names or c in key_fields
                    }
                for c, v in stored.items():
                    if c not in key_fields:
                        rec[c] = v
            records.append(rec)
        return pd.DataFrame(records)


class MySQLOnlineStore(SqlOnlineStore):
    """Reference-parity MySQL online store (online_stores/mysql_client.py).
    Requires ``mysql-connector-python`` (absent in this sandbox; the DBAPI
    layer is exercised through sqlite3 in tests)."""

    def __init__(
        self,
        host: str,
        database: str,
        username: str,
        password: str,
        port: int = 3306,
        table_name: str = "feathub_online",
    ) -> None:
        try:
            import mysql.connector
        except ImportError as e:
            raise ImportError(
                "MySQLOnlineStore requires 'mysql-connector-python', which "
                "is not installed."
            ) from e

        def factory():
            return mysql.connector.connect(
                host=host, port=port, database=database,
                user=username, password=password,
            )

        super().__init__(factory, table_name=table_name, paramstyle="format")
