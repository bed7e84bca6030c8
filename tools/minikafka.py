"""Minimal in-process Kafka broker speaking the public wire protocol.

Purpose: live integration coverage for the Kafka connector family in a
sandbox with no dockerd, no Kafka broker, and no ``spark-sql-kafka`` jar —
the same closure pattern as the embedded-Derby JDBC tests and the miniredis
RESP2 server.  The production KafkaSource / KafkaSink planner paths run
UNMODIFIED against this broker through the engine's pure-Python protocol
fallback (feathub_spark/processors/spark/kafka_python_source.py); both
sides implement the PUBLIC Kafka protocol (kafka.apache.org/protocol), so
the bytes on the socket are what a real deployment would carry.

Implements the API subset the fallback uses, at its pinned versions:
ApiVersions v0, Metadata v0-v1, ListOffsets v0-v1, Fetch v4, Produce v3.
Message format v2 (RecordBatch) only.  Broker behaviors modeled with
fidelity because the reader depends on them:

- produced batches are stored VERBATIM and re-based on append (the v2 CRC
  excludes baseOffset precisely to allow this), so fetch returns the
  producer's own wire bytes;
- fetch positions inside a batch return the WHOLE containing batch — the
  consumer must skip records below its fetch offset, like a real client;
- fetch responses are cut at max_bytes between batches, except the first
  batch is always returned whole (real brokers do the same so a consumer
  can always make progress);
- CRC32C is verified on produce (CORRUPT_MESSAGE on mismatch), topics
  auto-create on first metadata/produce touch with a configurable
  partition count.

Test/diagnostic use only: single node, in-memory log, no replication, no
consumer groups, no compression, no auth.
"""

from __future__ import annotations

import socketserver
import struct
import threading
from typing import Dict, List, Optional, Tuple

from feathub_spark.common.kafkawire import (
    API_API_VERSIONS,
    API_FETCH,
    API_LIST_OFFSETS,
    API_METADATA,
    API_PRODUCE,
    EARLIEST_TIMESTAMP,
    ERR_CORRUPT_MESSAGE,
    ERR_NONE,
    ERR_OFFSET_OUT_OF_RANGE,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
    LATEST_TIMESTAMP,
    Reader,
    Writer,
    crc32c,
    decode_record_batches,
    rebase_batch,
)


class _PartitionLog:
    """One partition's in-memory log: a list of re-based v2 batches."""

    __slots__ = ("batches", "log_end_offset")

    def __init__(self) -> None:
        # (base_offset, last_offset_delta, max_timestamp, batch_bytes)
        self.batches: List[Tuple[int, int, int, bytes]] = []
        self.log_end_offset = 0

    def append(self, batch: bytes) -> Tuple[int, int]:
        """Validate + re-base one producer batch; returns
        (error_code, base_offset)."""
        if len(batch) < 61 or batch[16] != 2:
            return ERR_CORRUPT_MESSAGE, -1
        batch_len = struct.unpack(">i", batch[8:12])[0]
        if 12 + batch_len != len(batch):
            return ERR_CORRUPT_MESSAGE, -1
        crc_stored = struct.unpack(">I", batch[17:21])[0]
        if crc32c(batch[21:]) != crc_stored:
            return ERR_CORRUPT_MESSAGE, -1
        # header layout: attributes i16 @21, lastOffsetDelta i32 @23,
        # firstTimestamp i64 @27, maxTimestamp i64 @35
        last_offset_delta = struct.unpack(">i", batch[23:27])[0]
        max_ts = struct.unpack(">q", batch[35:43])[0]
        base = self.log_end_offset
        self.batches.append(
            (base, last_offset_delta, max_ts, rebase_batch(batch, base))
        )
        self.log_end_offset = base + last_offset_delta + 1
        return ERR_NONE, base

    def earliest_offset(self) -> int:
        return self.batches[0][0] if self.batches else 0

    def offset_for_timestamp(self, ts: int) -> int:
        """First offset whose record timestamp >= ts; -1 when none (the
        broker contract for an out-of-range timestamp lookup)."""
        for base, _, max_ts, data in self.batches:
            if max_ts < ts:
                continue
            for _, _, records in decode_record_batches(data, verify_crc=False):
                for rec in records:
                    if rec.timestamp >= ts:
                        return rec.offset
        return -1

    def read_from(self, offset: int, max_bytes: int) -> bytes:
        """Concatenated batches starting at the batch CONTAINING offset."""
        out = bytearray()
        for base, lod, _, data in self.batches:
            if base + lod < offset:
                continue
            if out and len(out) + len(data) > max_bytes:
                break
            out += data
            if len(out) >= max_bytes:
                break
        return bytes(out)


class MiniKafkaBroker:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        num_partitions: int = 1,
        node_id: int = 0,
    ) -> None:
        self._topics: Dict[str, List[_PartitionLog]] = {}
        self._default_partitions = num_partitions
        self._node_id = node_id
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                sock = self.request
                try:
                    while True:
                        head = _recv_exact(sock, 4)
                        if head is None:
                            return
                        size = struct.unpack(">i", head)[0]
                        body = _recv_exact(sock, size)
                        if body is None:
                            return
                        reply = outer._dispatch(body)
                        if reply is not None:
                            sock.sendall(struct.pack(">i", len(reply)) + reply)
                except (ConnectionError, OSError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "MiniKafkaBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "MiniKafkaBroker":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def create_topic(self, name: str, partitions: Optional[int] = None) -> None:
        with self._lock:
            self._get_topic(name, partitions)

    def _get_topic(
        self, name: str, partitions: Optional[int] = None
    ) -> List[_PartitionLog]:
        if name not in self._topics:
            n = partitions or self._default_partitions
            self._topics[name] = [_PartitionLog() for _ in range(n)]
        return self._topics[name]

    # -- request dispatch ---------------------------------------------------

    def _dispatch(self, body: bytes) -> Optional[bytes]:
        r = Reader(body)
        api_key = r.int16()
        api_version = r.int16()
        corr = r.int32()
        r.string()  # client_id
        w = Writer()
        w.int32(corr)
        if api_key == API_API_VERSIONS:
            self._api_versions(w)
        elif api_key == API_METADATA:
            self._metadata(r, w, api_version)
        elif api_key == API_LIST_OFFSETS:
            self._list_offsets(r, w, api_version)
        elif api_key == API_FETCH:
            self._fetch(r, w, api_version)
        elif api_key == API_PRODUCE:
            acks = self._produce(r, w, api_version)
            if acks == 0:
                return None  # fire-and-forget: no response frame at all
        else:
            # UNSUPPORTED_VERSION-style refusal: close by raising; clients
            # at the pinned versions never reach this.
            raise ValueError(f"minikafka: unsupported api_key {api_key}")
        return w.getvalue()

    def _api_versions(self, w: Writer) -> None:
        w.int16(ERR_NONE)
        supported = [
            (API_PRODUCE, 3, 3),
            (API_FETCH, 4, 4),
            (API_LIST_OFFSETS, 0, 1),
            (API_METADATA, 0, 1),
            (API_API_VERSIONS, 0, 0),
        ]
        w.int32(len(supported))
        for k, lo, hi in supported:
            w.int16(k).int16(lo).int16(hi)

    def _metadata(self, r: Reader, w: Writer, version: int) -> None:
        n = r.int32()
        names: Optional[List[str]] = None
        if n >= 0:
            names = [r.string() for _ in range(n)]
        with self._lock:
            if names is None:
                names = sorted(self._topics)
            else:
                for t in names:
                    self._get_topic(t)  # auto-create, like broker defaults
            topo = {t: len(self._topics[t]) for t in names}
        w.int32(1)  # brokers
        w.int32(self._node_id).string(self.host).int32(self.port)
        if version >= 1:
            w.string(None)  # rack
            w.int32(self._node_id)  # controller_id
        w.int32(len(topo))
        for t, nparts in topo.items():
            w.int16(ERR_NONE).string(t)
            if version >= 1:
                w.int8(0)  # is_internal
            w.int32(nparts)
            for pid in range(nparts):
                w.int16(ERR_NONE).int32(pid).int32(self._node_id)
                w.int32(1).int32(self._node_id)  # replicas
                w.int32(1).int32(self._node_id)  # isr

    def _list_offsets(self, r: Reader, w: Writer, version: int) -> None:
        r.int32()  # replica_id
        reqs: List[Tuple[str, List[Tuple[int, int, int]]]] = []
        for _ in range(r.int32()):
            t = r.string()
            plist = []
            for _ in range(r.int32()):
                p = r.int32()
                ts = r.int64()
                max_offsets = r.int32() if version == 0 else 1
                plist.append((p, ts, max_offsets))
            reqs.append((t, plist))
        w.int32(len(reqs))
        with self._lock:
            for t, plist in reqs:
                w.string(t).int32(len(plist))
                logs = self._topics.get(t)
                for p, ts, _max_offsets in plist:
                    w.int32(p)
                    if logs is None or p >= len(logs):
                        w.int16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                        if version >= 1:
                            w.int64(-1)
                        w.int64(-1) if version >= 1 else w.int32(0)
                        continue
                    log = logs[p]
                    if ts == LATEST_TIMESTAMP:
                        off = log.log_end_offset
                    elif ts == EARLIEST_TIMESTAMP:
                        off = log.earliest_offset()
                    else:
                        off = log.offset_for_timestamp(ts)
                    w.int16(ERR_NONE)
                    if version >= 1:
                        w.int64(ts).int64(off)
                    else:
                        w.int32(1).int64(off)  # v0: offset array

    def _fetch(self, r: Reader, w: Writer, version: int) -> None:
        r.int32()  # replica_id
        r.int32()  # max_wait_ms (in-memory log: no long-poll needed)
        r.int32()  # min_bytes
        max_bytes = r.int32()
        r.int8()  # isolation_level
        reqs: List[Tuple[str, List[Tuple[int, int, int]]]] = []
        for _ in range(r.int32()):
            t = r.string()
            plist = []
            for _ in range(r.int32()):
                plist.append((r.int32(), r.int64(), r.int32()))
            reqs.append((t, plist))
        w.int32(0)  # throttle_time_ms
        w.int32(len(reqs))
        with self._lock:
            for t, plist in reqs:
                w.string(t).int32(len(plist))
                logs = self._topics.get(t)
                for p, offset, part_max in plist:
                    w.int32(p)
                    if logs is None or p >= len(logs):
                        w.int16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                        w.int64(-1).int64(-1).int32(0)
                        w.bytes_(b"")
                        continue
                    log = logs[p]
                    if offset < 0 or offset > log.log_end_offset:
                        w.int16(ERR_OFFSET_OUT_OF_RANGE)
                        w.int64(log.log_end_offset).int64(log.log_end_offset)
                        w.int32(0)
                        w.bytes_(b"")
                        continue
                    data = log.read_from(offset, min(max_bytes, part_max))
                    w.int16(ERR_NONE)
                    w.int64(log.log_end_offset)  # high_watermark
                    w.int64(log.log_end_offset)  # last_stable_offset
                    w.int32(0)  # aborted_transactions
                    w.bytes_(data)

    def _produce(self, r: Reader, w: Writer, version: int) -> int:
        r.string()  # transactional_id
        acks = r.int16()
        r.int32()  # timeout_ms
        results: List[Tuple[str, List[Tuple[int, int, int]]]] = []
        with self._lock:
            for _ in range(r.int32()):
                t = r.string()
                plist = []
                for _ in range(r.int32()):
                    p = r.int32()
                    record_set = r.bytes_() or b""
                    logs = self._get_topic(t)
                    if p >= len(logs):
                        plist.append((p, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                        continue
                    err, base = ERR_NONE, -1
                    # a producer may send several concatenated batches
                    pos = 0
                    while pos + 12 <= len(record_set):
                        blen = struct.unpack(
                            ">i", record_set[pos + 8 : pos + 12]
                        )[0]
                        end = pos + 12 + blen
                        if end > len(record_set):
                            err = ERR_CORRUPT_MESSAGE
                            break
                        e, b = logs[p].append(record_set[pos:end])
                        if e != ERR_NONE:
                            err = e
                            break
                        if base < 0:
                            base = b
                        pos = end
                    plist.append((p, err, base))
                results.append((t, plist))
        if acks == 0:
            return 0
        w.int32(len(results))
        for t, plist in results:
            w.string(t).int32(len(plist))
            for p, err, base in plist:
                w.int32(p).int16(err).int64(base)
                w.int64(-1)  # log_append_time (CreateTime batches)
        w.int32(0)  # throttle_time_ms
        return acks


def _recv_exact(sock, n: int) -> Optional[bytes]:
    chunks = []
    got = 0
    while got < n:
        chunk = sock.recv(n - got)
        if not chunk:
            return None
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)
