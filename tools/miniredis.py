"""Minimal in-process Redis server speaking RESP2 over real TCP sockets.

Purpose: live integration coverage for the Redis connector family in a
sandbox with no dockerd and no redis server — the same closure pattern as
the embedded-Derby JDBC tests (tests/test_jdbc_derby_live.py).  The
production RedisSink / RedisSource / RedisOnlineStore code runs UNMODIFIED
against this server through the redis-py-compatible wire client in
tests/_shims/redis.py; both sides implement the PUBLIC Redis serialization
protocol (RESP2, redis.io/docs/latest/develop/reference/protocol-spec/),
so the bytes on the socket are what a real deployment would carry.

Implements the command subset the connectors use — PING, SELECT, HSET,
HGETALL, HGET, GET, SET, DEL, EXISTS, KEYS, SCAN, FLUSHDB, FLUSHALL,
DBSIZE, MULTI/EXEC/DISCARD — binary-safe, with per-db keyspaces and
WRONGTYPE errors.  Test/diagnostic use only: single process, no
persistence, no auth, no expiry.
"""

from __future__ import annotations

import fnmatch
import socketserver
import threading


class _Error(Exception):
    """Reply as a RESP error line (message already prefixed, e.g. 'ERR ...')."""


def _encode(obj) -> bytes:
    """RESP2 encoding for reply objects: ('+', s) simple string, _Error,
    int, bytes / None bulk, list array."""
    if isinstance(obj, tuple) and len(obj) == 2 and obj[0] == "+":
        return b"+" + obj[1].encode() + b"\r\n"
    if isinstance(obj, _Error):
        return b"-" + str(obj).encode() + b"\r\n"
    if isinstance(obj, bool):
        return b":1\r\n" if obj else b":0\r\n"
    if isinstance(obj, int):
        return b":%d\r\n" % obj
    if obj is None:
        return b"$-1\r\n"
    if isinstance(obj, (bytes, bytearray)):
        return b"$%d\r\n%s\r\n" % (len(obj), bytes(obj))
    if isinstance(obj, str):
        return _encode(obj.encode())
    if isinstance(obj, list):
        return b"*%d\r\n" % len(obj) + b"".join(_encode(x) for x in obj)
    raise TypeError(f"unencodable reply {obj!r}")


class MiniRedisServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._dbs: dict = {}  # db index -> {key bytes: bytes | dict}
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                db = 0
                multi = None  # None = immediate mode, list = queuing
                while True:
                    try:
                        args = self._read_command()
                    except (ConnectionError, ValueError, OSError):
                        return
                    if args is None:
                        return
                    cmd = bytes(args[0]).upper().decode("latin-1")
                    try:
                        if cmd == "MULTI":
                            if multi is not None:
                                raise _Error("ERR MULTI calls can not be nested")
                            multi = []
                            reply = ("+", "OK")
                        elif cmd == "DISCARD":
                            if multi is None:
                                raise _Error("ERR DISCARD without MULTI")
                            multi = None
                            reply = ("+", "OK")
                        elif cmd == "EXEC":
                            if multi is None:
                                raise _Error("ERR EXEC without MULTI")
                            queued, multi = multi, None
                            results = []
                            for qcmd, qargs in queued:
                                try:
                                    r, db = outer._dispatch(qcmd, qargs, db)
                                except _Error as e:
                                    r = e
                                results.append(r)
                            reply = results
                        elif multi is not None:
                            # validate the verb at queue time like Redis does
                            if cmd not in _COMMANDS and cmd != "SELECT":
                                multi = None
                                raise _Error(
                                    f"ERR unknown command '{cmd}'"
                                )
                            multi.append((cmd, args[1:]))
                            reply = ("+", "QUEUED")
                        else:
                            reply, db = outer._dispatch(cmd, args[1:], db)
                    except _Error as e:
                        reply = e
                    try:
                        self.wfile.write(_encode(reply))
                    except (ConnectionError, OSError):
                        return

            def _read_line(self) -> bytes:
                line = self.rfile.readline()
                if not line:
                    raise ConnectionError("client closed")
                if not line.endswith(b"\r\n"):
                    raise ValueError("protocol desync")
                return line[:-2]

            def _read_command(self):
                """Clients send commands as RESP arrays of bulk strings."""
                try:
                    head = self._read_line()
                except ConnectionError:
                    return None
                if not head.startswith(b"*"):
                    raise ValueError(f"expected array, got {head!r}")
                n = int(head[1:])
                args = []
                for _ in range(n):
                    h = self._read_line()
                    if not h.startswith(b"$"):
                        raise ValueError(f"expected bulk string, got {h!r}")
                    size = int(h[1:])
                    payload = self.rfile.read(size + 2)
                    if len(payload) != size + 2 or payload[-2:] != b"\r\n":
                        raise ValueError("truncated bulk string")
                    args.append(payload[:-2])
                if not args:
                    raise ValueError("empty command")
                return args

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "MiniRedisServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- command dispatch ---------------------------------------------------
    def _db(self, idx: int) -> dict:
        return self._dbs.setdefault(idx, {})

    def _dispatch(self, cmd: str, args: list, db: int):
        fn = _COMMANDS.get(cmd)
        if cmd == "SELECT":
            if len(args) != 1:
                raise _Error("ERR wrong number of arguments for 'select'")
            return ("+", "OK"), int(args[0])
        if fn is None:
            raise _Error(f"ERR unknown command '{cmd}'")
        with self._lock:
            return fn(self._db(db), [bytes(a) for a in args], self), db


def _as_hash(store: dict, key: bytes) -> dict:
    cur = store.get(key)
    if cur is None:
        cur = store[key] = {}
    elif not isinstance(cur, dict):
        raise _Error(
            "WRONGTYPE Operation against a key holding the wrong kind of value"
        )
    return cur


def _cmd_ping(store, args, srv):
    return ("+", "PONG") if not args else args[0]


def _cmd_hset(store, args, srv):
    if len(args) < 3 or len(args) % 2 == 0:
        raise _Error("ERR wrong number of arguments for 'hset'")
    h = _as_hash(store, args[0])
    added = 0
    for i in range(1, len(args), 2):
        added += args[i] not in h
        h[args[i]] = args[i + 1]
    return added


def _cmd_hget(store, args, srv):
    cur = store.get(args[0])
    if cur is None:
        return None
    if not isinstance(cur, dict):
        raise _Error(
            "WRONGTYPE Operation against a key holding the wrong kind of value"
        )
    return cur.get(args[1])


def _cmd_hgetall(store, args, srv):
    cur = store.get(args[0])
    if cur is None:
        return []
    if not isinstance(cur, dict):
        raise _Error(
            "WRONGTYPE Operation against a key holding the wrong kind of value"
        )
    out = []
    for f, v in cur.items():
        out.extend([f, v])
    return out


def _cmd_set(store, args, srv):
    store[args[0]] = args[1]
    return ("+", "OK")


def _cmd_get(store, args, srv):
    cur = store.get(args[0])
    if isinstance(cur, dict):
        raise _Error(
            "WRONGTYPE Operation against a key holding the wrong kind of value"
        )
    return cur


def _cmd_del(store, args, srv):
    n = 0
    for k in args:
        n += store.pop(k, None) is not None
    return n


def _cmd_exists(store, args, srv):
    return sum(k in store for k in args)


def _match(keys, pattern: bytes):
    pat = pattern.decode("latin-1")
    return [k for k in keys if fnmatch.fnmatchcase(k.decode("latin-1"), pat)]


def _cmd_keys(store, args, srv):
    return _match(list(store.keys()), args[0] if args else b"*")


def _cmd_scan(store, args, srv):
    # single-batch cursor: every SCAN returns cursor 0 with all matches —
    # legal per the SCAN contract (a full iteration may finish in one call)
    pattern = b"*"
    i = 1
    while i < len(args):
        opt = args[i].upper()
        if opt == b"MATCH" and i + 1 < len(args):
            pattern = args[i + 1]
            i += 2
        elif opt == b"COUNT" and i + 1 < len(args):
            i += 2
        else:
            raise _Error("ERR syntax error")
    if int(args[0]) != 0:
        return [b"0", []]
    return [b"0", _match(list(store.keys()), pattern)]


def _cmd_flushdb(store, args, srv):
    store.clear()
    return ("+", "OK")


def _cmd_flushall(store, args, srv):
    for d in srv._dbs.values():
        d.clear()
    return ("+", "OK")


def _cmd_dbsize(store, args, srv):
    return len(store)


_COMMANDS = {
    "PING": _cmd_ping,
    "HSET": _cmd_hset,
    "HGET": _cmd_hget,
    "HGETALL": _cmd_hgetall,
    "SET": _cmd_set,
    "GET": _cmd_get,
    "DEL": _cmd_del,
    "EXISTS": _cmd_exists,
    "KEYS": _cmd_keys,
    "SCAN": _cmd_scan,
    "FLUSHDB": _cmd_flushdb,
    "FLUSHALL": _cmd_flushall,
    "DBSIZE": _cmd_dbsize,
}
