"""Redis online-store client — reference parity for
online_stores/redis_client.py + the key scheme of
feature_tables/sources/redis_source.py:23-110.

Key construction is a pure function shared with the RedisSink writer so
what the sink writes is exactly what the client reads back.  The reference
allows a ``key_expr`` template over the reserved names ``__NAMESPACE__``,
``__KEYS__`` and ``__FEATURE_NAME__`` (redis_source.py:58-87); this
implementation supports the same names by direct substitution (the common
CONCAT-style expressions reduce to this form).

The network client itself is import-gated on the ``redis`` package (absent
in this sandbox); key construction and the hash field codec are covered by
unit tests.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import pandas as pd

from feathub_spark.online_stores.sql_online_store import _py


def _key_part(v) -> str:
    """Canonical key rendering: numpy scalars unwrap and integral floats
    render as ints, so a pandas row-dtype upcast (iterrows turning key 1
    into 1.0) can never produce a different Redis key than the Spark-side
    RedisSink wrote for the same logical key."""
    v = _py(v)
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    return str(v)


def build_redis_key(
    namespace: str,
    key_values: Sequence,
    key_expr: Optional[str] = None,
    feature_name: Optional[str] = None,
) -> str:
    """Default scheme: ``namespace:key1:key2:...`` (what RedisSink writes).
    With ``key_expr``, substitute the reference's reserved names."""
    joined = ":".join(_key_part(v) for v in key_values)
    if key_expr is None:
        return f"{namespace}:{joined}"
    out = key_expr.replace("__NAMESPACE__", namespace).replace("__KEYS__", joined)
    if feature_name is not None:
        out = out.replace("__FEATURE_NAME__", feature_name)
    return out


def encode_field(value) -> str:
    """Hash-field codec used by RedisSink (maps become JSON objects).
    Values normalize through _py first: json.dumps(np.int64) raises, and
    the default=str fallback would silently store 5 as "5" (and
    np.bool_ as "True") — get() would then return strings where the
    sink-written path returns numbers."""
    return json.dumps(_py(value), default=str)


def decode_field(raw) -> object:
    if isinstance(raw, (bytes, bytearray)):
        raw = raw.decode("utf-8")
    return json.loads(raw)


class RedisOnlineStore:
    """get(): latest feature row per request key, reading the hashes that
    RedisSink wrote.  put(): pipelined hset upserts (same codec)."""

    def __init__(
        self,
        host: str,
        port: int = 6379,
        db_num: int = 0,
        namespace: str = "default",
        key_expr: Optional[str] = None,
    ) -> None:
        try:
            import redis
        except ImportError as e:
            raise ImportError(
                "RedisOnlineStore requires the 'redis' package, which is "
                "not installed."
            ) from e
        self._client = redis.Redis(host=host, port=port, db=db_num)
        self._namespace = namespace
        self._key_expr = key_expr

    def put(
        self,
        data: pd.DataFrame,
        key_fields: Sequence[str],
    ) -> None:
        pipe = self._client.pipeline()
        # to_dict("records") keeps per-COLUMN dtypes (iterrows upcasts the
        # whole row to the widest type, silently floating int keys)
        for r in data.to_dict("records"):
            key = build_redis_key(
                self._namespace, [r[k] for k in key_fields], self._key_expr
            )
            pipe.hset(
                key,
                mapping={c: encode_field(r[c]) for c in data.columns},
            )
        pipe.execute()

    def get(
        self,
        input_data: pd.DataFrame,
        key_fields: Sequence[str],
        feature_names: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        records: List[Dict] = []
        for r in input_data.to_dict("records"):
            key = build_redis_key(
                self._namespace, [r[k] for k in key_fields], self._key_expr
            )
            raw = self._client.hgetall(key)
            rec = dict(r)
            for c, v in raw.items():
                name = c.decode("utf-8") if isinstance(c, (bytes, bytearray)) else c
                if name in key_fields:
                    continue
                if feature_names is not None and name not in feature_names:
                    continue
                rec[name] = decode_field(v)
            records.append(rec)
        return pd.DataFrame(records)
