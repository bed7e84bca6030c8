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

import re
from typing import Optional

from pyspark.sql import DataFrame


_NODE_LEAD_RE = re.compile(r"^[\s+:!-]*")


# Node shapes that plan a hash exchange sized by
# spark.sql.shuffle.partitions (AQE right-sizes it at runtime).  Join is
# deliberately absent (a broadcast join adds NO exchange — its output
# partitioning is the streamed side's, possibly 1), as is Sort
# (sortWithinPartitions is narrow; a global sort's range exchange is
# data-sized but the node string doesn't distinguish them cheaply).
# SHAPE matters, not just the node name: a GLOBAL aggregate/window (empty
# grouping / empty partitionBy) plans a SinglePartition exchange, and an
# explicit-count RepartitionByExpression may target fewer partitions than
# the default parallelism — those must still probe.  Matching is anchored
# to line-leading node names so a column named e.g. `WindowStart` inside
# a Project cannot false-match.

def _top_level_bracket_groups(node: str) -> int:
    """Count [...] groups at bracket depth 0 of a plan-node header.  A
    '], [' substring test misreads nested array literals — e.g. a global
    aggregate printing percentile_approx(v, [0.25,0.5], ...) contains
    '], [' inside its single top-level group — so grouping must be
    decided by depth, not by substring.

    Returns 0 (ambiguous → caller falls through to the row-count probe)
    when the header's brackets don't balance: a stray '[' inside a
    string literal (split(t, [)) would otherwise shift every following
    group's depth and could misclassify a global aggregate as grouped,
    silently skipping the single-partition probe."""
    depth = 0
    groups = 0
    for ch in node:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
    return groups if depth == 0 else 0


def _plan_has_full_exchange(plan_str: str) -> bool:
    for line in plan_str.splitlines():
        node = _NODE_LEAD_RE.sub("", line)
        if node.startswith("Aggregate ["):
            # grouped aggregates print 'Aggregate [grp], [out]'; a GLOBAL
            # aggregate has one bracket group and exchanges to ONE task
            if _top_level_bracket_groups(node) >= 2:
                return True
        elif node.startswith("Window ["):
            # 'Window [exprs], [partitionSpec], [orderSpec]' — a global
            # window (no partitionBy) prints only [exprs], [orderSpec]
            if _top_level_bracket_groups(node) >= 3:
                return True
        elif node.startswith("Deduplicate ["):
            return True
        elif node.startswith("RepartitionByExpression ["):
            # an explicit count ('..., N') may be below the default
            # parallelism — only the count-less form is sized by the
            # session shuffle parallelism
            if not re.search(r"\],\s*\d+\s*$", node):
                return True
    return False


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` round-robin up to the session default parallelism
    (or ``min_partitions``) when the current plan has fewer partitions; a
    no-op otherwise.

    The partition-count probe (``.rdd.getNumPartitions()``) forces a full
    plan-to-RDD translation — measured ~1 s of driver time on composed
    plans (an operator fed by another operator's output).  When no
    explicit ``min_partitions`` is given and the ANALYZED plan (no
    optimization, no physical planning) already contains an
    always-exchanging node, the exchange re-partitions to the session
    shuffle parallelism anyway — same outcome the probe would reach — so
    the probe is skipped.  Scan-shaped plans (where the single-row-group
    hazard actually lives) still probe; the translation is cheap there.
    An explicit ``min_partitions`` always probes: the caller may be
    sizing above the shuffle parallelism."""
    if df.isStreaming:
        # probing .rdd on a stream raises; micro-batch partitioning is
        # governed by the source options (maxFilesPerTrigger etc.), so the
        # guard is a pass-through there
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if min_partitions is None:
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
            if _plan_has_full_exchange(plan):
                return df
        except Exception:
            pass  # private-API drift: fall back to the probe
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
