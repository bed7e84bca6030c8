"""Caller-controlled persistence contract for operator intermediates.

Several datapipe operators persist a shared intermediate (a tokenized /
exploded projection) because two downstream aggregates consume it and
Catalyst does not dedupe repeated subplans.  The operators return LAZY
DataFrames, so they cannot unpersist after "the action" themselves — the
action belongs to the caller.  This module is the contract that keeps
executor storage flat across a long composed pipeline:

- operators persist ONLY through :func:`register_cache`, which tracks the
  handle in a process-wide registry (STRONG references on purpose: the
  cached subplan is consumed through the JVM plan, not through the Python
  handle, so a GC-driven release would unpersist intermediates before the
  caller's action ever runs);
- callers invoke :func:`release_caches` once they have consumed the
  operator's output (after the final action on it) — every tracked
  intermediate is unpersisted and the registry emptied;
- as a backstop for callers that never release (a foreachBatch handler
  building fresh operators every micro-batch, a long notebook session),
  the registry is BOUNDED: beyond ``MAX_ACTIVE`` entries the oldest is
  unpersisted FIFO.  Unpersisting never changes results — a still-needed
  intermediate is merely recomputed — so the bound trades worst-case
  recompute for a hard storage ceiling.

``bench.py`` and the test suite call :func:`release_caches` after every
query action; put the same call at the end of a foreachBatch handler.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MAX_ACTIVE = 64

_ACTIVE: List[DataFrame] = []
# weak references: a checkpointed frame the caller dropped without
# releasing is reclaimed by Python GC + the JVM ContextCleaner (the
# pre-tracking backstop); a strong ref here would pin it forever for
# callers that never release
_CHECKPOINTED: List = []


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
    while len(_ACTIVE) > MAX_ACTIVE:
        _ACTIVE.pop(0).unpersist()
    return df


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Track an already-materialized ``localCheckpoint`` frame so
    :func:`release_caches` frees its blocks too.

    Two deliberate differences from :func:`register_cache`: the frame is
    NOT re-persisted (persist() on a checkpointed frame would try to
    change its storage level), and it is NOT subject to the MAX_ACTIVE
    FIFO eviction — a checkpointed frame has no lineage to recompute
    from, so a silent mid-pipeline eviction would break correctness, not
    just speed.  The release contract is therefore stricter for these:
    after ``release_caches()`` a further action on the returned plan
    raises (missing checkpoint blocks) rather than recomputing — callers
    must release only after the final action, which is already the
    documented contract.  Tracking is by WEAK reference: frames the
    caller simply drops are reclaimed by GC + the ContextCleaner as
    before."""
    import weakref

    _CHECKPOINTED.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every registered intermediate (non-blocking) and empty the
    registry.  Returns how many handles were released.  Safe to call at any
    time for :func:`register_cache` entries (recompute, never wrong);
    :func:`track_checkpoint` entries must not be consumed again after."""
    n = 0
    while _ACTIVE:
        _ACTIVE.pop().unpersist()
        n += 1
    while _CHECKPOINTED:
        df = _CHECKPOINTED.pop()()
        if df is not None:
            df.unpersist()
            n += 1
    return n
