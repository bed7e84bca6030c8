"""Timestamp parsing helpers.

The reference accepts ``timestamp_format`` in {"epoch" (seconds),
"epoch_millis", strftime pattern} (see
/root/reference/python/feathub/table/table_descriptor.py:37-51 and the
strftime→Java mapping in /root/reference/python/feathub/common/utils.py:32-51).
We generate Spark SQL expressions producing a TimestampType event-time column.
"""

from __future__ import annotations

import re
from datetime import timedelta
from typing import Optional

from feathub_spark.common.exceptions import FeathubError

EPOCH = "epoch"
EPOCH_MILLIS = "epoch_millis"
NATIVE = "timestamp"  # column is already a Spark TIMESTAMP (e.g. parquet)

# strftime directive → java.time.format.DateTimeFormatter pattern.
_STRFTIME_TO_JAVA = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "M": "mm",
    "S": "ss",
    # SSSSSS parses 1-6 fraction digits (probed on Spark 4.1.2), exactly
    # strftime %f's contract — the old SSS silently NULLed 6-digit
    # microsecond data under non-ANSI parsing
    "f": "SSSSSS",
    "z": "X",
    "j": "DDD",
}


def to_java_date_format(python_format: str) -> str:
    """Convert a strftime pattern into a Spark/Java datetime pattern.

    Literal text between directives is passed through; any run of
    alphabetic literal characters is single-quoted so Java does not treat
    it as pattern letters (handles e.g. ``%Y-%m-%dT%H:%M:%S``).
    """
    out = []
    i = 0
    n = len(python_format)
    while i < n:
        ch = python_format[i]
        if ch == "%":
            if i + 1 >= n:
                raise FeathubError(f"Dangling '%' in timestamp format {python_format!r}")
            d = python_format[i + 1]
            if d == "%":
                out.append("%")
            else:
                try:
                    out.append(_STRFTIME_TO_JAVA[d])
                except KeyError:
                    raise FeathubError(
                        f"Unsupported strftime directive %{d} in {python_format!r}"
                    )
            i += 2
        elif ch.isalpha():
            j = i
            while j < n and python_format[j].isalpha():
                j += 1
            out.append("'" + python_format[i:j] + "'")
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# Formats Spark's native timestamp cast parses directly — used for patterns
# with fractional seconds, where Java's strict S-count cannot accept the
# 1-6 variable digits strftime %f allows.
_NATIVE_PARSEABLE = {
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S.%f",
}


def sql_string_literal(value: str) -> str:
    """Escape a string for embedding in a single-quoted Spark SQL literal."""
    return value.replace("\\", "\\\\").replace("'", "\\'")


def event_time_sql(timestamp_field: str, timestamp_format: str) -> str:
    """Spark SQL expression producing the TIMESTAMP event time for a row."""
    col = f"`{timestamp_field}`"
    if timestamp_format == NATIVE:
        return f"CAST({col} AS TIMESTAMP)"
    if timestamp_format == EPOCH:
        return f"timestamp_seconds(CAST({col} AS BIGINT))"
    if timestamp_format == EPOCH_MILLIS:
        return f"timestamp_millis(CAST({col} AS BIGINT))"
    if timestamp_format in _NATIVE_PARSEABLE:
        # ISO-shaped with fractional seconds: the native parser accepts any
        # fraction length, unlike a fixed SSS/SSSSSS Java pattern.
        return f"to_timestamp(CAST({col} AS STRING))"
    java_fmt = sql_string_literal(to_java_date_format(timestamp_format))
    return f"to_timestamp(CAST({col} AS STRING), '{java_fmt}')"


_TIMEDELTA_RE = re.compile(r"^\s*(\d+)\s*(ms|s|sec|second|seconds|m|min|minute|minutes|h|hour|hours|d|day|days)\s*$")

_UNIT_MS = {
    "ms": 1,
    "s": 1000, "sec": 1000, "second": 1000, "seconds": 1000,
    "m": 60_000, "min": 60_000, "minute": 60_000, "minutes": 60_000,
    "h": 3_600_000, "hour": 3_600_000, "hours": 3_600_000,
    "d": 86_400_000, "day": 86_400_000, "days": 86_400_000,
}


def timedelta_ms(value) -> int:
    """Milliseconds of a timedelta or a '2h'-style duration string."""
    if isinstance(value, timedelta):
        # exact integer math — total_seconds()*1000 goes through float
        # and truncates (timedelta(milliseconds=1001) -> 1000), silently
        # shrinking window sizes / disorder bounds by 1 ms
        return (
            value.days * 86_400_000
            + value.seconds * 1000
            + value.microseconds // 1000
        )
    if isinstance(value, (int, float)):
        return int(value)
    if isinstance(value, str):
        m = _TIMEDELTA_RE.match(value)
        if not m:
            raise FeathubError(f"Cannot parse duration {value!r}")
        return int(m.group(1)) * _UNIT_MS[m.group(2)]
    raise FeathubError(f"Cannot parse duration {value!r}")


def interval_sql(ms: int) -> str:
    """Spark SQL INTERVAL literal for a millisecond duration."""
    return f"INTERVAL {ms} MILLISECOND"


def optional_timedelta_ms(value) -> Optional[int]:
    return None if value is None else timedelta_ms(value)
