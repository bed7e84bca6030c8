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

from feathub_spark.common.exceptions import FeathubError


def _py(v):
    """Python-native scalar: numpy ints/floats/bools unwrap via .item()
    (json.dumps(np.int64) raises, and default=str would silently turn a
    stored 5 into "5"); pandas Timestamps serialize as ISO strings."""
    if type(v).__module__ == "numpy":
        # ndarrays (array<T> features out of an Arrow toPandas frame) must
        # become lists: .item() raises on multi-element arrays and silently
        # unwraps a size-1 array to its scalar ('5' stored instead of '[5]').
        if getattr(v, "ndim", 0) > 0:
            return v.tolist()
        if hasattr(v, "item"):
            return v.item()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def _key_json(mapping, key_fields) -> str:
    """Canonical key string: values normalized to python natives FIRST so
    an int key renders '1' on both put and get (a row-level dtype
    coercion like iterrows' float upcast must never change the key)."""
    out = []
    for k in key_fields:
        v = _py(mapping[k])
        if isinstance(v, float) and v.is_integer():
            v = int(v)
        out.append(str(v))
    return json.dumps(out)


class SqlOnlineStore:
    def __init__(
        self,
        connection_factory: Callable,
        table_name: str = "feathub_online",
        paramstyle: str = "qmark",
    ) -> None:
        self._factory = connection_factory
        self._conn_cache = None
        self._table = table_name
        self._ph = "?" if paramstyle == "qmark" else "%s"
        conn = self._conn()
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

    def _conn(self):
        """ONE cached connection per store, opened lazily from the factory
        — a fresh factory connection per put/get leaked a live MySQL
        connection (plus a TCP+auth handshake) per serving request.

        NOT thread-safe: DBAPI connections/cursors are single-threaded;
        a multi-threaded serving tier needs one store instance per worker
        (or an external pool passed as the factory)."""
        if self._conn_cache is None:
            self._conn_cache = self._factory()
        return self._conn_cache

    def _cursor(self):
        """(conn, cursor) on the cached connection, revalidated with a
        cheap SELECT 1 probe: a server-side idle disconnect (MySQL
        wait_timeout) would otherwise fail EVERY subsequent put/get until
        process restart.  On a dead connection the cache is dropped and
        rebuilt from the factory once; a second failure propagates."""
        conn = self._conn()
        try:
            cur = conn.cursor()
            cur.execute("SELECT 1")
            cur.fetchone()
            return conn, cur
        except Exception:
            try:
                conn.close()
            except Exception:
                pass
            self._conn_cache = None
            conn = self._conn()
            return conn, conn.cursor()

    def close(self) -> None:
        if self._conn_cache is not None:
            try:
                self._conn_cache.close()
            finally:
                self._conn_cache = None

    @staticmethod
    def _ts_value(v) -> Optional[float]:
        if v is None:
            return None
        if hasattr(v, "timestamp"):
            return float(v.timestamp())
        try:
            f = float(v)
            # NaN (a pandas NULL timestamp) must mean "no timestamp", not
            # a value — every NaN comparison is False, so a NaN-ts row
            # would overwrite any timestamped row below
            return None if f != f else f
        except (TypeError, ValueError):
            pass
        # string timestamps ('2024-01-02 00:00:00'): returning None here
        # silently degraded max-timestamp-wins to last-write-wins,
        # diverging from MemoryOnlineStore's (ISO-correct) lexicographic
        # ordering for the same put sequence
        try:
            ts = pd.Timestamp(v)
            return None if pd.isna(ts) else float(ts.timestamp())
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
        conn, cur = self._cursor()
        try:
            self._put_impl(conn, cur, table_name, data, key_fields, timestamp_field)
        except Exception:
            # nothing committed yet — roll the half-applied batch back so
            # the NEXT operation's commit on this shared cached connection
            # cannot durably persist partial rows / changed meta
            try:
                conn.rollback()
            except Exception:
                pass
            raise

    def _put_impl(
        self, conn, cur, table_name, data, key_fields, timestamp_field
    ) -> None:
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
            # keyless table (global metric emissions): append-only rows
            # under unique synthetic keys — MemoryOnlineStore parity
            import uuid

            cur.execute(
                f"DELETE FROM {self._table}_meta WHERE tbl = {self._ph}",
                (table_name,),
            )
            cur.execute(
                f"INSERT INTO {self._table}_meta (tbl, key_fields, ts_field) "
                f"VALUES ({self._ph}, {self._ph}, {self._ph})",
                (table_name, json.dumps([]), timestamp_field),
            )
            for d in data.to_dict("records"):
                cur.execute(
                    f"INSERT INTO {self._table} (tbl, k, ts_num, row_json) "
                    f"VALUES ({self._ph}, {self._ph}, {self._ph}, {self._ph})",
                    (
                        table_name, f"__row_{uuid.uuid4().hex}", None,
                        json.dumps(
                            {c: _py(v) for c, v in d.items()}, default=str
                        ),
                    ),
                )
            conn.commit()
            return
        key_fields = list(key_fields)
        cur.execute(
            f"DELETE FROM {self._table}_meta WHERE tbl = {self._ph}", (table_name,)
        )
        cur.execute(
            f"INSERT INTO {self._table}_meta (tbl, key_fields, ts_field) "
            f"VALUES ({self._ph}, {self._ph}, {self._ph})",
            (table_name, json.dumps(key_fields), timestamp_field),
        )

        # to_dict("records") keeps per-COLUMN dtypes (iterrows upcasts a
        # whole row to the widest type, silently turning int keys into
        # floats and changing their key string)
        for d in data.to_dict("records"):
            key = _key_json(d, key_fields)
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
                # max-timestamp wins; ties / both-untimestamped → last
                # write wins.  A row WITHOUT a timestamp never replaces a
                # timestamped one (MemoryOnlineStore parity).
                if existing[0] is not None and (
                    ts is None or ts < existing[0]
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
                (
                    table_name, key, ts,
                    json.dumps({c: _py(v) for c, v in d.items()}, default=str),
                ),
            )
        conn.commit()

    def get(
        self,
        table_name: str,
        input_data: pd.DataFrame,
        feature_names: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        conn, cur = self._cursor()
        cur.execute(
            f"SELECT key_fields FROM {self._table}_meta WHERE tbl = {self._ph}",
            (table_name,),
        )
        row = cur.fetchone()
        if row is None:
            raise KeyError(f"Table {table_name!r} not in the online store.")
        key_fields: List[str] = json.loads(row[0])
        if not key_fields:
            raise FeathubError(
                f"Table {table_name!r} was stored without keys (append-only "
                "metric emissions) — keyed get() is undefined for it."
            )

        records = []
        for rec_in in input_data.to_dict("records"):
            key = _key_json(rec_in, key_fields)
            cur.execute(
                f"SELECT row_json FROM {self._table} "
                f"WHERE tbl = {self._ph} AND k = {self._ph}",
                (table_name, key),
            )
            hit = cur.fetchone()
            rec = dict(rec_in)
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
