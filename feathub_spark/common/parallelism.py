"""Parallelism guard for CPU-dense narrow transforms.

Narrow per-row operators (shingling, fingerprinting, signature math)
inherit the scan's partitioning.  A corpus packed into few files — or few
parquet row groups, which Spark cannot split below — then runs nearly
single-threaded no matter how many cores the cluster has.  One round-robin
repartition up to the session's default parallelism costs a single shuffle
of the (narrow) projection and is amortized across the heavy per-row work
that follows.  At 100 TB inputs arrive in thousands of splits and this is
a no-op.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


_SHUFFLE_NODES = ("Join", "Aggregate", "Window", "Repartition", "Sort",
                  "Deduplicate")


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` round-robin up to the session default parallelism
    (or ``min_partitions``) when the current plan has fewer partitions; a
    no-op otherwise.

    The partition-count probe (``.rdd.getNumPartitions()``) forces a full
    plan-to-RDD translation — measured ~1 s of driver time on composed
    plans (an operator fed by another operator's output).  A plan that
    already contains a shuffle-inducing node re-partitions itself at that
    exchange (AQE right-sizes it at runtime), so the guard only probes
    scan-shaped plans, where the translation is cheap and the
    single-partition hazard actually lives.  The node scan is over the
    ANALYZED plan string (no optimization, no physical planning); a column
    name that happens to contain a node word only skips the probe — the
    safe direction."""
    if df.isStreaming:
        # probing .rdd on a stream raises; micro-batch partitioning is
        # governed by the source options (maxFilesPerTrigger etc.), so the
        # guard is a pass-through there
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(node in plan for node in _SHUFFLE_NODES):
            return df
    except Exception:
        pass  # private-API drift: fall back to the probe
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
