"""Pure-Python protobuf wire-format codec for the filesystem/Kafka
``protobuf`` data format (reference feature_tables/format_config.py:23 and
the spark-protobuf-backed read path referenced there).

The reference delegates protobuf to an engine-side module (spark-protobuf /
Flink's protobuf format) driven by a compiled descriptor set.  No such jar
ships with this deployment and no protobuf runtime is installed, so this
module implements the (public, stable) protobuf wire format directly:

  https://protobuf.dev/programming-guides/encoding/

The schema is the descriptor: each feathub column maps to a protobuf field
number (``data_format_props["protobuf.field_numbers"]``, else positional
1..N) and its wire representation is derived from the declared dtype:

  Int32/Int64/Bool  -> varint (two's-complement 64-bit, like proto int64)
  Float32           -> fixed32 (IEEE-754 LE)
  Float64           -> fixed64 (IEEE-754 LE)
  String            -> length-delimited UTF-8
  Bytes             -> length-delimited
  Timestamp         -> varint epoch microseconds
  VectorType(num)   -> packed repeated (one length-delimited blob)
  VectorType(str/bytes) -> repeated length-delimited
  MapType(K, V)     -> repeated embedded message {1: key, 2: value}

Files are streams of length-delimited messages (varint message length then
the message bytes — the ``writeDelimitedTo``/``parseDelimitedFrom`` framing
of protobuf-java), so one file round-trips through any standard protobuf
tooling given an equivalent .proto.  Missing fields decode as NULL; unknown
field numbers are skipped by wire type (forward compatible).

Scale note: a protobuf stream is not block-splittable, so the parallel unit
is the file (same as the jar-based readers).  Decode/encode run
executor-side over Arrow batches via mapInPandas; the hot path for large
data remains parquet.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

from feathub_spark.common import types as t
from feathub_spark.common.exceptions import FeathubError

_WIRE_VARINT = 0
_WIRE_FIXED64 = 1
_WIRE_LEN = 2
_WIRE_FIXED32 = 5

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# varint primitives
# ---------------------------------------------------------------------------

def write_varint(out: bytearray, value: int) -> None:
    value &= _MASK64  # two's-complement for negatives, like proto int64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise FeathubError("protobuf: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise FeathubError("protobuf: varint longer than 64 bits")
    if result >= 1 << 63:  # interpret as signed 64-bit
        result -= 1 << 64
    return result, pos


# ---------------------------------------------------------------------------
# field specs
# ---------------------------------------------------------------------------

class FieldSpec:
    """One column's wire mapping: (field number, feathub dtype)."""

    __slots__ = ("name", "number", "dtype")

    def __init__(self, name: str, number: int, dtype: t.DType) -> None:
        self.name = name
        self.number = number
        self.dtype = dtype


def build_field_specs(
    schema, field_numbers: Optional[Dict[str, int]] = None
) -> List[FieldSpec]:
    specs = []
    numbers = field_numbers or {}
    for i, (name, dtype) in enumerate(zip(schema.field_names, schema.field_types)):
        number = int(numbers.get(name, i + 1))
        if number < 1:
            raise FeathubError(f"protobuf field number for {name!r} must be >= 1")
        specs.append(FieldSpec(name, number, dtype))
    seen = [s.number for s in specs]
    if len(set(seen)) != len(seen):
        raise FeathubError(f"protobuf field numbers must be unique, got {seen}")
    return specs


def parse_field_numbers_prop(prop: Optional[str]) -> Optional[Dict[str, int]]:
    """``"a:1,b:3"`` -> {"a": 1, "b": 3} (data_format_props are strings)."""
    if not prop:
        return None
    out: Dict[str, int] = {}
    for part in prop.split(","):
        name, _, num = part.strip().partition(":")
        if not num:
            raise FeathubError(
                f"bad protobuf.field_numbers entry {part!r}; expected name:number"
            )
        out[name.strip()] = int(num)
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_scalar(out: bytearray, number: int, dtype: t.DType, value) -> None:
    basic = dtype.basic_dtype
    if basic in (t.BasicDType.INT32, t.BasicDType.INT64):
        write_varint(out, (number << 3) | _WIRE_VARINT)
        write_varint(out, int(value))
    elif basic == t.BasicDType.BOOL:
        write_varint(out, (number << 3) | _WIRE_VARINT)
        write_varint(out, 1 if value else 0)
    elif basic == t.BasicDType.FLOAT32:
        write_varint(out, (number << 3) | _WIRE_FIXED32)
        out += struct.pack("<f", float(value))
    elif basic == t.BasicDType.FLOAT64:
        write_varint(out, (number << 3) | _WIRE_FIXED64)
        out += struct.pack("<d", float(value))
    elif basic == t.BasicDType.STRING:
        data = str(value).encode("utf-8")
        write_varint(out, (number << 3) | _WIRE_LEN)
        write_varint(out, len(data))
        out += data
    elif basic == t.BasicDType.BYTES:
        data = bytes(value)
        write_varint(out, (number << 3) | _WIRE_LEN)
        write_varint(out, len(data))
        out += data
    elif basic == t.BasicDType.TIMESTAMP:
        write_varint(out, (number << 3) | _WIRE_VARINT)
        write_varint(out, _timestamp_to_micros(value))
    else:
        raise FeathubError(f"protobuf: unsupported dtype {dtype}")


def _timestamp_to_micros(value) -> int:
    import datetime as dt

    if isinstance(value, (int, float)):
        return int(value)
    if hasattr(value, "to_pydatetime"):  # pandas Timestamp
        value = value.to_pydatetime()
    if isinstance(value, dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=dt.timezone.utc)
        # integer arithmetic: float .timestamp() loses sub-µs precision for
        # epochs beyond ~2^53 µs (observed: 2107-01-01 00:00:00.000129 -> 128)
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return (value - epoch) // dt.timedelta(microseconds=1)
    raise FeathubError(f"protobuf: cannot encode timestamp from {type(value)}")


def _is_packed_numeric(elem: t.DType) -> bool:
    return getattr(elem, "basic_dtype", None) in (
        t.BasicDType.INT32,
        t.BasicDType.INT64,
        t.BasicDType.BOOL,
        t.BasicDType.FLOAT32,
        t.BasicDType.FLOAT64,
        t.BasicDType.TIMESTAMP,
    )


def encode_row(values: dict, specs: Sequence[FieldSpec]) -> bytes:
    """Encode one row dict to protobuf message bytes (NULLs omitted)."""
    out = bytearray()
    for spec in specs:
        value = values.get(spec.name)
        if value is None:
            continue
        dtype = spec.dtype
        if isinstance(dtype, t.VectorType):
            if len(value) == 0:
                continue  # proto3: empty repeated field is absent on the wire
            elem = dtype.dtype
            if _is_packed_numeric(elem):
                payload = bytearray()
                for v in value:
                    if elem.basic_dtype == t.BasicDType.FLOAT32:
                        payload += struct.pack("<f", float(v))
                    elif elem.basic_dtype == t.BasicDType.FLOAT64:
                        payload += struct.pack("<d", float(v))
                    elif elem.basic_dtype == t.BasicDType.TIMESTAMP:
                        write_varint(payload, _timestamp_to_micros(v))
                    else:
                        write_varint(payload, int(v) if elem.basic_dtype != t.BasicDType.BOOL else (1 if v else 0))
                write_varint(out, (spec.number << 3) | _WIRE_LEN)
                write_varint(out, len(payload))
                out += payload
            else:
                for v in value:  # repeated length-delimited
                    _encode_scalar(out, spec.number, elem, v)
        elif isinstance(dtype, t.MapType):
            items = value.items() if isinstance(value, dict) else value
            for k, v in items:
                entry = bytearray()
                _encode_scalar(entry, 1, dtype.key_dtype, k)
                if v is not None:
                    _encode_scalar(entry, 2, dtype.value_dtype, v)
                write_varint(out, (spec.number << 3) | _WIRE_LEN)
                write_varint(out, len(entry))
                out += entry
        else:
            _encode_scalar(out, spec.number, dtype, value)
    return bytes(out)


def encode_delimited(rows, specs: Sequence[FieldSpec]) -> bytes:
    """Length-delimited stream of messages (writeDelimitedTo framing)."""
    out = bytearray()
    for row in rows:
        msg = encode_row(row, specs)
        write_varint(out, len(msg))
        out += msg
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = read_varint(buf, pos)
    elif wire == _WIRE_FIXED64:
        pos += 8
    elif wire == _WIRE_FIXED32:
        pos += 4
    elif wire == _WIRE_LEN:
        n, pos = read_varint(buf, pos)
        # a 10-byte varint can sign-decode negative: pos += n would move
        # BACKWARD and loop decode_message forever on crafted input
        if n < 0 or pos + n > len(buf):
            raise FeathubError("protobuf: bad length-delimited field length")
        pos += n
    else:
        raise FeathubError(f"protobuf: unsupported wire type {wire}")
    if pos > len(buf):
        raise FeathubError("protobuf: truncated field")
    return pos


_EXPECTED_WIRE = {
    t.BasicDType.INT32: 0, t.BasicDType.INT64: 0, t.BasicDType.BOOL: 0,
    t.BasicDType.TIMESTAMP: 0, t.BasicDType.FLOAT32: 5,
    t.BasicDType.FLOAT64: 1, t.BasicDType.STRING: 2, t.BasicDType.BYTES: 2,
}


def _proto_default(dtype: t.DType):
    """proto3 default for an absent field — standard encoders OMIT
    default-valued fields, so a map entry missing its key/value field
    means key 0 / "" / 0.0, never None (a None map key is unrepresentable
    in Spark)."""
    basic = dtype.basic_dtype
    if basic in (t.BasicDType.INT32, t.BasicDType.INT64):
        return 0
    if basic == t.BasicDType.BOOL:
        return False
    if basic in (t.BasicDType.FLOAT32, t.BasicDType.FLOAT64):
        return 0.0
    if basic == t.BasicDType.STRING:
        return ""
    if basic == t.BasicDType.BYTES:
        return b""
    if basic == t.BasicDType.TIMESTAMP:
        import datetime as dt

        return dt.datetime(1970, 1, 1)
    raise FeathubError(f"protobuf: unsupported dtype {dtype}")


def _decode_scalar(buf: bytes, pos: int, wire: int, dtype: t.DType):
    basic = dtype.basic_dtype
    expected = _EXPECTED_WIRE.get(basic)
    if expected is not None and wire != expected:
        # schema drift (field number reused with a different type):
        # decoding with the wrong reader desynchronizes the REST of the
        # message into garbage — fail loudly with the actual mismatch
        raise FeathubError(
            f"protobuf: wire type {wire} does not match declared dtype "
            f"{dtype} (expected wire type {expected}); the producer's "
            "schema has likely drifted from the declared one."
        )
    if basic in (t.BasicDType.INT32, t.BasicDType.INT64):
        v, pos = read_varint(buf, pos)
        return int(v), pos
    if basic == t.BasicDType.BOOL:
        v, pos = read_varint(buf, pos)
        return bool(v), pos
    if basic == t.BasicDType.FLOAT32:
        v = struct.unpack_from("<f", buf, pos)[0]
        return v, pos + 4
    if basic == t.BasicDType.FLOAT64:
        v = struct.unpack_from("<d", buf, pos)[0]
        return v, pos + 8
    if basic in (t.BasicDType.STRING, t.BasicDType.BYTES):
        n, pos = read_varint(buf, pos)
        data = buf[pos : pos + n]
        if len(data) != n:
            raise FeathubError("protobuf: truncated length-delimited field")
        return (
            data.decode("utf-8") if basic == t.BasicDType.STRING else bytes(data)
        ), pos + n
    if basic == t.BasicDType.TIMESTAMP:
        v, pos = read_varint(buf, pos)
        import datetime as dt

        # timedelta addition is exact integer µs — fromtimestamp(v / 1e6)
        # would round for epochs beyond ~2^53 µs
        return (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)), pos
    raise FeathubError(f"protobuf: unsupported dtype {dtype}")


def _decode_packed(data: bytes, elem: t.DType) -> list:
    out = []
    pos = 0
    basic = elem.basic_dtype
    while pos < len(data):
        if basic == t.BasicDType.FLOAT32:
            out.append(struct.unpack_from("<f", data, pos)[0])
            pos += 4
        elif basic == t.BasicDType.FLOAT64:
            out.append(struct.unpack_from("<d", data, pos)[0])
            pos += 8
        elif basic == t.BasicDType.TIMESTAMP:
            # symmetric with encode_row and the unpacked _decode_scalar
            # path: packed timestamps are varint epoch micros
            v, pos = read_varint(data, pos)
            import datetime as dt

            out.append(dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v))
        else:
            v, pos = read_varint(data, pos)
            out.append(bool(v) if basic == t.BasicDType.BOOL else int(v))
    return out


def decode_message(buf: bytes, specs: Sequence[FieldSpec]) -> dict:
    by_number = {s.number: s for s in specs}
    row: dict = {s.name: None for s in specs}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        number, wire = tag >> 3, tag & 0x7
        spec = by_number.get(number)
        if spec is None:
            pos = _skip_field(buf, pos, wire)
            continue
        dtype = spec.dtype
        if isinstance(dtype, t.VectorType):
            elem = dtype.dtype
            if wire == _WIRE_LEN and _is_packed_numeric(elem):
                n, pos = read_varint(buf, pos)
                if n < 0 or pos + n > len(buf):
                    raise FeathubError(
                        "protobuf: truncated packed repeated field"
                    )
                vals = _decode_packed(buf[pos : pos + n], elem)
                pos += n
                row[spec.name] = (row[spec.name] or []) + vals
            else:  # unpacked repeated element
                v, pos = _decode_scalar(buf, pos, wire, elem)
                row[spec.name] = (row[spec.name] or []) + [v]
        elif isinstance(dtype, t.MapType):
            n, pos = read_varint(buf, pos)
            if n < 0 or pos + n > len(buf):
                raise FeathubError("protobuf: truncated map entry")
            entry = buf[pos : pos + n]
            pos += n
            k = v = None
            epos = 0
            while epos < len(entry):
                etag, epos = read_varint(entry, epos)
                enum, ewire = etag >> 3, etag & 0x7
                if enum == 1:
                    k, epos = _decode_scalar(entry, epos, ewire, dtype.key_dtype)
                elif enum == 2:
                    v, epos = _decode_scalar(entry, epos, ewire, dtype.value_dtype)
                else:
                    epos = _skip_field(entry, epos, ewire)
            if row[spec.name] is None:
                row[spec.name] = {}
            if k is None:
                k = _proto_default(dtype.key_dtype)
            if v is None:
                v = _proto_default(dtype.value_dtype)
            row[spec.name][k] = v
        else:
            row[spec.name], pos = _decode_scalar(buf, pos, wire, dtype)
    return row


def decode_delimited(buf: bytes, specs: Sequence[FieldSpec]):
    """Yield row dicts from a length-delimited message stream."""
    pos = 0
    while pos < len(buf):
        n, pos = read_varint(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise FeathubError("protobuf: truncated delimited message")
        yield decode_message(buf[pos : pos + n], specs)
        pos += n
