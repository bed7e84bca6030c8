"""redis-py-compatible TEST SHIM speaking the real RESP2 wire protocol.

This is NOT the ``redis`` package.  It is a minimal client implementing
the exact API subset feathub_spark's Redis connectors call — ``Redis``,
``pipeline()`` (MULTI/EXEC, like redis-py's default transaction=True),
``hset(mapping=...)``, ``hgetall``, ``hget``, ``get``/``set``,
``delete``, ``ping``, ``scan_iter``, ``flushdb``, ``dbsize`` — over a
real TCP socket, so the production RedisSink / RedisSource /
RedisOnlineStore code paths run UNMODIFIED against the in-process RESP2
server in tools/miniredis.py (tests/test_redis_live.py injects this
module as ``redis`` driver-side and ships it to Spark executors with
addPyFile).  API shape follows the public redis-py documentation; the
wire format follows the public Redis serialization protocol spec
(redis.io/docs/latest/develop/reference/protocol-spec/).  Replies are
bytes (decode_responses is not implemented), matching what the
production codec expects from redis-py defaults.
"""

from __future__ import annotations

import socket


class RedisError(Exception):
    pass


class ResponseError(RedisError):
    pass


def _arg_bytes(a) -> bytes:
    if isinstance(a, (bytes, bytearray)):
        return bytes(a)
    if isinstance(a, bool):
        # redis-py rejects bools; keep the shim strict so misuse surfaces
        raise TypeError("boolean command argument")
    if isinstance(a, (int, float, str)):
        return str(a).encode("utf-8")
    raise TypeError(f"unsupported command argument {type(a).__name__}")


def _encode_command(args) -> bytes:
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = _arg_bytes(a)
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


class Redis:
    def __init__(
        self,
        host: str = "localhost",
        port: int = 6379,
        db: int = 0,
        socket_timeout: float | None = 10.0,
        **_ignored,
    ) -> None:
        self._addr = (host, port)
        self._db = db
        self._timeout = socket_timeout
        self._sock: socket.socket | None = None
        self._rfile = None

    # -- connection ---------------------------------------------------------
    def _connect(self) -> None:
        if self._sock is not None:
            return
        s = socket.create_connection(self._addr, timeout=self._timeout)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock = s
        self._rfile = s.makefile("rb")
        if self._db:
            # redis-py issues SELECT on connection init for a nonzero db
            self._send(_encode_command(["SELECT", self._db]))
            self._read_reply()

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._rfile.close()
                self._sock.close()
            finally:
                self._sock, self._rfile = None, None

    def _send(self, payload: bytes) -> None:
        self._sock.sendall(payload)

    def _read_line(self) -> bytes:
        line = self._rfile.readline()
        if not line.endswith(b"\r\n"):
            raise ConnectionError("server closed connection mid-reply")
        return line[:-2]

    def _read_reply(self):
        head = self._read_line()
        kind, rest = head[:1], head[1:]
        if kind == b"+":
            return rest
        if kind == b"-":
            return ResponseError(rest.decode("utf-8", "replace"))
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            payload = self._rfile.read(n + 2)
            if len(payload) != n + 2:
                raise ConnectionError("truncated bulk reply")
            return payload[:-2]
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise ResponseError(f"protocol error: {head!r}")

    def execute_command(self, *args):
        self._connect()
        self._send(_encode_command(list(args)))
        reply = self._read_reply()
        if isinstance(reply, ResponseError):
            raise reply
        return reply

    # -- commands used by feathub_spark --------------------------------------
    def ping(self) -> bool:
        return self.execute_command("PING") == b"PONG"

    def hset(self, name, key=None, value=None, mapping=None) -> int:
        args = ["HSET", name]
        if key is not None:
            args += [key, value]
        if mapping:
            for f, v in mapping.items():
                args += [f, v]
        if len(args) == 2:
            raise RedisError("hset without fields")
        return self.execute_command(*args)

    def hget(self, name, key):
        return self.execute_command("HGET", name, key)

    def hgetall(self, name) -> dict:
        flat = self.execute_command("HGETALL", name)
        return {flat[i]: flat[i + 1] for i in range(0, len(flat), 2)}

    def set(self, name, value) -> bool:
        return self.execute_command("SET", name, value) == b"OK"

    def get(self, name):
        return self.execute_command("GET", name)

    def delete(self, *names) -> int:
        return self.execute_command("DEL", *names)

    def exists(self, *names) -> int:
        return self.execute_command("EXISTS", *names)

    def keys(self, pattern="*"):
        return self.execute_command("KEYS", pattern)

    def dbsize(self) -> int:
        return self.execute_command("DBSIZE")

    def flushdb(self) -> bool:
        return self.execute_command("FLUSHDB") == b"OK"

    def scan(self, cursor=0, match=None, count=None):
        args = ["SCAN", cursor]
        if match is not None:
            args += ["MATCH", match]
        if count is not None:
            args += ["COUNT", count]
        cur, keys = self.execute_command(*args)
        return int(cur), keys

    def scan_iter(self, match=None, count=None):
        cursor = 0
        while True:
            cursor, keys = self.scan(cursor, match=match, count=count)
            yield from keys
            if cursor == 0:
                return

    def pipeline(self, transaction: bool = True) -> "Pipeline":
        return Pipeline(self, transaction)


class Pipeline:
    """Buffered commands flushed in one socket write on execute().  With
    transaction=True (redis-py's default) the batch is wrapped in
    MULTI/EXEC and the results come back as EXEC's array reply."""

    def __init__(self, client: Redis, transaction: bool) -> None:
        self._client = client
        self._transaction = transaction
        self._stack: list = []

    def hset(self, name, key=None, value=None, mapping=None) -> "Pipeline":
        args = ["HSET", name]
        if key is not None:
            args += [key, value]
        if mapping:
            for f, v in mapping.items():
                args += [f, v]
        self._stack.append(args)
        return self

    def set(self, name, value) -> "Pipeline":
        self._stack.append(["SET", name, value])
        return self

    def delete(self, *names) -> "Pipeline":
        self._stack.append(["DEL", *names])
        return self

    def execute(self):
        stack, self._stack = self._stack, []
        if not stack:
            return []
        c = self._client
        c._connect()
        if self._transaction:
            payload = [_encode_command(["MULTI"])]
            payload += [_encode_command(a) for a in stack]
            payload.append(_encode_command(["EXEC"]))
            c._send(b"".join(payload))
            ok = c._read_reply()  # +OK for MULTI
            if isinstance(ok, ResponseError):
                raise ok
            for _ in stack:  # one +QUEUED per command
                q = c._read_reply()
                if isinstance(q, ResponseError):
                    raise q
            results = c._read_reply()  # EXEC: array of replies
            if isinstance(results, ResponseError):
                raise results
        else:
            c._send(b"".join(_encode_command(a) for a in stack))
            results = [c._read_reply() for _ in stack]
        for r in results:
            if isinstance(r, ResponseError):
                raise r
        return results
