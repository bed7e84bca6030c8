"""SQL-backed persistent registry — the engine's analog of the reference
MySQL registry (registries/mysql_registry.py:102: one table mapping
table name → descriptor JSON).

Written against PEP-249 (DBAPI) so any engine works: production uses
``MySQLRegistry`` (import-gated mysql-connector), tests run the identical
code over sqlite3.  Descriptors serialize through the same JSON codec as
the FileRegistry, so the three persistent registries are interchangeable.
"""

from __future__ import annotations

import json
from typing import Callable, List

from feathub_spark.common.exceptions import RegistryError
from feathub_spark.registries.registry import LocalRegistry


class SqlRegistry(LocalRegistry):
    """``connection_factory`` returns a new (or shared) DBAPI connection.

    ``paramstyle``: "qmark" (sqlite3) or "pyformat"/"format" (mysql).
    """

    def __init__(
        self,
        connection_factory: Callable,
        table_name: str = "feathub_registry",
        paramstyle: str = "qmark",
    ) -> None:
        super().__init__()
        self._factory = connection_factory
        self._conn_cache = None
        self._table = table_name
        self._ph = "?" if paramstyle == "qmark" else "%s"
        self._init_table()
        self._load_all()

    def _conn(self):
        # ONE cached connection per registry, opened lazily — a fresh
        # factory connection per operation leaked a live DB connection
        # for every build/delete in a long-lived process.  NOT
        # thread-safe (DBAPI connections are single-threaded); use one
        # registry instance per worker.
        if self._conn_cache is None:
            self._conn_cache = self._factory()
        return self._conn_cache

    def _cursor(self):
        # Revalidate the cached connection with a SELECT 1 probe; after a
        # server-side idle disconnect (MySQL wait_timeout) rebuild it from
        # the factory once instead of failing every later operation.
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

    def _init_table(self) -> None:
        conn, cur = self._cursor()
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self._table} ("
            "name VARCHAR(255) PRIMARY KEY, "
            "descriptor_json TEXT NOT NULL)"
        )
        conn.commit()

    def _load_all(self) -> None:
        from feathub_spark.registries.json_codec import descriptor_from_json

        conn, cur = self._cursor()
        cur.execute(f"SELECT name, descriptor_json FROM {self._table}")
        rows = cur.fetchall()
        pending = {name: json.loads(js) for name, js in rows}
        # Fixpoint resolution: a view's dependencies may sort after it, so
        # keep passing over the remainder until nothing more resolves.
        while pending:
            progressed = False
            for name in sorted(pending):
                try:
                    descriptor = descriptor_from_json(pending[name])
                    self._tables[name] = descriptor.build(self)
                except Exception:
                    continue
                del pending[name]
                progressed = True
            if not progressed:
                raise RegistryError(
                    f"Unresolvable registry entries (broken or cyclic "
                    f"references): {sorted(pending)}"
                )

    def build_features(self, descriptors) -> List:
        from feathub_spark.registries.json_codec import descriptor_to_json

        resolved = super().build_features(descriptors)
        conn, cur = self._cursor()
        for d in resolved:
            try:
                obj = descriptor_to_json(d)
            except Exception:
                continue  # non-serializable descriptors stay session-only
            js = json.dumps(obj)
            cur.execute(
                f"DELETE FROM {self._table} WHERE name = {self._ph}", (d.name,)
            )
            cur.execute(
                f"INSERT INTO {self._table} (name, descriptor_json) "
                f"VALUES ({self._ph}, {self._ph})",
                (d.name, js),
            )
        conn.commit()
        return resolved

    def delete_features(self, name: str) -> None:
        super().delete_features(name)
        conn, cur = self._cursor()
        cur.execute(f"DELETE FROM {self._table} WHERE name = {self._ph}", (name,))
        conn.commit()


class MySQLRegistry(SqlRegistry):
    """Reference-parity MySQL registry (mysql_registry.py).  Requires the
    ``mysql-connector-python`` package (absent in this sandbox — the DBAPI
    layer above is exercised through sqlite3 in tests)."""

    def __init__(
        self,
        host: str,
        database: str,
        username: str,
        password: str,
        port: int = 3306,
        table_name: str = "feathub_registry",
    ) -> None:
        try:
            import mysql.connector
        except ImportError as e:
            raise RegistryError(
                "MySQLRegistry requires 'mysql-connector-python', which is "
                "not installed."
            ) from e

        def factory():
            return mysql.connector.connect(
                host=host, port=port, database=database,
                user=username, password=password,
            )

        super().__init__(factory, table_name=table_name, paramstyle="format")
