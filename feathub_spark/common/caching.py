"""Caller-controlled persistence contract for operator intermediates.

Several datapipe operators persist a shared intermediate (a tokenized /
exploded projection) because two downstream aggregates consume it and
Catalyst does not dedupe repeated subplans.  The operators return LAZY
DataFrames, so they cannot unpersist after "the action" themselves — the
action belongs to the caller.  This module is the contract that keeps
executor storage flat across a long composed pipeline:

- operators persist ONLY through :func:`register_cache`, which tracks the
  handle in a process-wide registry;
- callers invoke :func:`release_caches` once they have consumed the
  operator's output (after the final action on it) — every tracked
  intermediate is unpersisted and the registry emptied.

``bench.py`` and the test suite call :func:`release_caches` after every
query action; a long-lived session composing many operators should do the
same between pipeline stages.  Without a release call the behavior is the
pre-contract one (caches linger until eviction or ``clearCache``), so the
contract is strictly an improvement, never a correctness requirement:
unpersisting a DataFrame never changes its results, only whether the
shared subplan is recomputed.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_ACTIVE: List[DataFrame] = []


def register_cache(
    df: DataFrame,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and track it for a later :func:`release_caches`.

    MEMORY_AND_DISK (Spark's DataFrame default) keeps hot intermediates in
    memory and spills corpus-scale ones to disk; with the release contract
    in place, accumulation — not spill policy — was the actual 100 TB
    hazard, so the default stays."""
    df.persist(storage_level)
    _ACTIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered intermediate (non-blocking) and empty the
    registry.  Returns how many handles were released.  Safe to call at any
    time — never affects results, only storage."""
    n = 0
    while _ACTIVE:
        _ACTIVE.pop().unpersist()
        n += 1
    return n
