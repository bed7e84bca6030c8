"""Plan-time hot-key probe for auto-salted over-window / as-of plans.

AQE mitigates skew for *joins* at runtime, but window functions and the
as-of union-fill plan serialize each key into one task no matter how hot
it is (SPARK window exchange is HashPartitioning on the full key).  The
engine ships salted/chunked variants of both
(over_window_utils.evaluate_salted_over_window, join_utils._chunked_asof_fill)
that were previously opt-in via an explicit ``salt_chunk_ms`` int.  With
``salt_chunk_ms="auto"`` the planner decides per descriptor, using this
probe:

- one aggregation over ONLY the key and event-time columns (parquet
  column pruning makes this a narrow scan; pass ``probe_fraction`` to
  sample instead of scanning everything at extreme scale);
- skew_factor = max per-key rows / mean per-key rows;
- salt only when ``skew_factor >= threshold`` AND the hot key holds at
  least ``min_hot_rows`` rows (a skewed-but-tiny table gains nothing
  from two extra shuffles);
- the chunk size splits the observed time span into ``target_chunks``
  pieces, clamped so a bounded window still fits inside one chunk
  (the salted bounded plan requires window_ms <= chunk_ms).

The probe is an eager plan-time job; callers memoize per (table, keys)
so repeated descriptors over the same input pay once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F

AUTO = "auto"


@dataclass(frozen=True)
class AutoSalt:
    """Tunable probe policy for ``salt_chunk_ms="auto"``.

    Pass an instance instead of the string to override the thresholds
    (tests use tiny ``min_hot_rows``; a 100 TB job would set
    ``probe_fraction`` so the probe samples instead of full-scanning).
    """

    threshold: float = 4.0
    min_hot_rows: int = 10_000
    target_chunks: int = 32
    probe_fraction: Optional[float] = None


# What the processor/builder accept for a salt_chunk_ms parameter:
# None (plain plan), int (explicit chunk), "auto" / AutoSalt (probe).
SaltSpec = Union[None, int, str, AutoSalt]


def resolve_salt_chunk_ms(
    spec: SaltSpec,
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    window_ms: Optional[int] = None,
    cache: Optional[dict] = None,
) -> Optional[int]:
    """Turn a SaltSpec into a concrete chunk_ms (or None for plain plan).

    Explicit ints pass through untouched; "auto"/AutoSalt run the probe.
    ``cache`` (if given) memoizes probe verdicts per
    (plan semanticHash, keys, window_ms) so repeated descriptors over the
    same input pay for one probe job only.
    """
    if spec is None or (isinstance(spec, int) and not isinstance(spec, bool)):
        return spec
    policy = AutoSalt() if spec == AUTO else spec
    if not isinstance(policy, AutoSalt):
        raise ValueError(f"Bad salt_chunk_ms spec: {spec!r}")
    key = None
    if cache is not None:
        try:
            # the POLICY and time column are part of the verdict: two
            # descriptors sharing a cache with different thresholds must
            # not read each other's salt decisions
            key = (
                df.semanticHash(), tuple(keys), window_ms, time_col,
                policy.threshold, policy.min_hot_rows,
                policy.target_chunks, policy.probe_fraction,
            )
        except Exception:
            key = None
        if key is not None and key in cache:
            return cache[key]
    chunk = decide_salt_chunk_ms(
        df,
        keys,
        time_col,
        window_ms=window_ms,
        threshold=policy.threshold,
        min_hot_rows=policy.min_hot_rows,
        target_chunks=policy.target_chunks,
        probe_fraction=policy.probe_fraction,
    )
    if cache is not None and key is not None:
        cache[key] = chunk
    return chunk


def decide_salt_chunk_ms(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    *,
    window_ms: Optional[int] = None,
    threshold: float = 4.0,
    min_hot_rows: int = 10_000,
    target_chunks: int = 32,
    probe_fraction: Optional[float] = None,
) -> Optional[int]:
    """Return the chunk_ms for the salted plan, or None for the plain plan.

    ``window_ms``: the over-window size (None = unbounded/as-of); when set,
    the returned chunk is >= window_ms so the two-phase bounded plan's
    "window spans at most its own and the previous chunk" invariant holds.
    """
    probe = df.select(
        *[F.col(k) for k in keys], F.col(time_col).alias("__ts__")
    )
    if probe_fraction is not None and probe_fraction < 1.0:
        probe = probe.sample(fraction=probe_fraction, seed=13)
    per_key = probe.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min("__ts__").alias("__lo__"),
        F.max("__ts__").alias("__hi__"),
    )
    row = per_key.agg(
        F.sum("__n__").alias("rows"),
        F.count(F.lit(1)).alias("keys"),
        F.max("__n__").alias("max_n"),
        F.min(F.unix_millis(F.col("__lo__"))).alias("lo_ms"),
        F.max(F.unix_millis(F.col("__hi__"))).alias("hi_ms"),
    ).first()
    if row is None or not row["rows"]:
        return None
    if row["hi_ms"] is None or row["lo_ms"] is None:
        # all probed timestamps were NULL (min/max skip NULLs while
        # count() counts the rows) — no time span to chunk; fall back to
        # the plain plan instead of int(None) aborting the compile
        return None
    scale = 1.0 / probe_fraction if probe_fraction else 1.0
    max_n = row["max_n"] * scale
    mean_n = (row["rows"] / row["keys"]) * scale
    if mean_n <= 0 or max_n / mean_n < threshold or max_n < min_hot_rows:
        return None
    span_ms = max(int(row["hi_ms"]) - int(row["lo_ms"]), 1)
    chunk_ms = max(math.ceil(span_ms / target_chunks), 1)
    if window_ms is not None:
        chunk_ms = max(chunk_ms, int(window_ms))
    return chunk_ms
