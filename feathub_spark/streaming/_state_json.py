"""Typed JSON round-trip for applyInPandasWithState state blobs.

The stateful operators keep row history as JSON strings inside the state
struct.  Plain ``json.dumps`` crashes on the non-JSON-native scalars a
Spark source can deliver through Arrow (decimal.Decimal for DECIMAL
columns, pandas.Timestamp/datetime for timestamps, date, bytes), and
``default=str`` would silently corrupt replayed values (a SUM over
stringified decimals).  This codec wraps such scalars in one-key marker
objects and restores the exact Python type on load, so aggregation
semantics survive the micro-batch boundary.

Marker collision: history rows can carry raw user column values, and a
map-typed column could hold a genuine single-key dict named like a
marker.  Encode therefore ESCAPES any single-key dict whose key starts
with the ``__fh_`` prefix by wrapping it in ``{"__fh_raw__": ...}``, so
decode is unambiguous for arbitrary map values (the wrapper key itself
is covered by the same rule, so nesting round-trips).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
from typing import Any

_DEC = "__fh_dec__"
_TS = "__fh_ts__"
_DATE = "__fh_date__"
_BYTES = "__fh_b64__"
_RAW = "__fh_raw__"
_PREFIX = "__fh_"


def _encode(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return {_DEC: str(v)}
    if isinstance(v, datetime.datetime):
        # pandas.Timestamp subclasses datetime; isoformat round-trips
        # micros and (if present) the tz offset
        return {_TS: v.isoformat()}
    if isinstance(v, datetime.date):
        return {_DATE: v.isoformat()}
    if isinstance(v, (bytes, bytearray)):
        return {_BYTES: base64.b64encode(bytes(v)).decode("ascii")}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    if isinstance(v, tuple):
        return [_encode(x) for x in v]
    if isinstance(v, dict):
        enc = {k: _encode(x) for k, x in v.items()}
        if len(enc) == 1:
            k0 = next(iter(enc))
            # a genuine user map that LOOKS like a marker — escape it
            # (non-string keys, e.g. map<int,...> values, can't collide)
            if isinstance(k0, str) and k0.startswith(_PREFIX):
                return {_RAW: enc}
        return enc
    return v


def _decode(v: Any) -> Any:
    if isinstance(v, list):
        return [_decode(x) for x in v]
    if isinstance(v, dict):
        if len(v) == 1:
            ((k, x),) = v.items()
            if k == _DEC:
                return decimal.Decimal(x)
            if k == _TS:
                import pandas as pd

                return pd.Timestamp(datetime.datetime.fromisoformat(x))
            if k == _DATE:
                return datetime.date.fromisoformat(x)
            if k == _BYTES:
                return base64.b64decode(x)
            if k == _RAW and isinstance(x, dict):
                # non-dict payload = a LEGACY blob's genuine user map
                # {"__fh_raw__": scalar}, written before the escape
                # existed — fall through and return it unchanged
                return {k2: _decode(x2) for k2, x2 in x.items()}
        return {k: _decode(x) for k, x in v.items()}
    return v


def dumps_state(obj: Any) -> str:
    """json.dumps with exact round-trip for Decimal/Timestamp/date/bytes."""
    return json.dumps(_encode(obj))


def loads_state(s: str) -> Any:
    """Inverse of :func:`dumps_state`."""
    return _decode(json.loads(s))
