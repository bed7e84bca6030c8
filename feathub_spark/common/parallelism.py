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


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` round-robin up to the session default parallelism
    (or ``min_partitions``) when the current plan has fewer partitions; a
    no-op otherwise."""
    if df.isStreaming:
        # probing .rdd on a stream raises; micro-batch partitioning is
        # governed by the source options (maxFilesPerTrigger etc.), so the
        # guard is a pass-through there
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
