"""Z-order (Morton-curve) write layout for multi-column data skipping.

Parquet/Delta/Iceberg readers prune files and row groups with per-column
min/max statistics; a table sorted by ONE column skips well on that column
only.  Interleaving the bits of several rank-scaled columns (the Z-order /
Morton curve — the technique behind Delta Lake's OPTIMIZE ZORDER BY and
Iceberg's sort-order z-ordering) keeps rows that are close in EVERY
dimension close in the file order, so min/max pruning works for predicates
on any of the participating columns at once.

Plan shape:
- per-column min/max is ONE 1-row aggregate broadcast back (the same
  broadcast-scalar pattern as bm25/temperature_sample — never a window);
- the rank scaling + bit interleave are pure arithmetic on that row
  (FLOOR/%/* only, so ONE generated SQL string evaluates identically in
  Spark and any ANSI engine — the oracle runs the same expression);
- the layout itself is repartitionByRange on the key + an intra-partition
  sort: a single range-exchange, exactly what a sort-based write requires
  anyway, and the range boundaries are sampled so skew in the z-key space
  spreads evenly.

At 100 TB this runs once per written partition of the table; the z-key is
never stored (recomputed at rewrite), so it adds zero bytes on disk.
No reference counterpart: feathub delegates file layout to the engines;
this is beyond-reference capability for the lakehouse write path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from feathub_spark.common.parallelism import ensure_parallelism


def zorder_bit_interleave_sql(scaled_cols: Sequence[str], bits: int) -> str:
    """Unrolled Morton interleave of ``len(scaled_cols)`` non-negative
    integer expressions, ``bits`` bits each, as pure +/*/FLOOR/% arithmetic
    (no shift operators — Spark spells them shiftleft() while DuckDB uses
    <<; arithmetic is the portable common ground, and every intermediate
    stays exact below 2^53 for bits*cols <= 42)."""
    n = len(scaled_cols)
    if n * bits > 42:
        raise ValueError(
            f"bits * cols = {n * bits} exceeds the 42-bit exact-double "
            f"budget; lower bits (got {bits} x {n} cols)"
        )
    terms = []
    for j in range(bits):
        for i, c in enumerate(scaled_cols):
            # bit j of column i, placed at interleaved position n*j + i
            terms.append(
                f"(CAST(FLOOR(({c}) / {1 << j}) AS BIGINT) % 2) "
                f"* {1 << (n * j + i)}"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_scale_sql(col: str, lo: str, hi: str, bits: int) -> str:
    """Rank-scale ``col`` into [0, 2^bits): (v - min) / (max - min) over
    the corpus, floored to a bucket, NULLs and degenerate (min == max)
    columns landing in bucket 0.  Exact-double arithmetic, identical in
    any ANSI engine."""
    top = (1 << bits) - 1
    return (
        f"COALESCE(CAST(FLOOR((CAST({col} AS DOUBLE) - {lo}) * {top} "
        f"/ NULLIF(CAST({hi} AS DOUBLE) - {lo}, 0.0)) AS BIGINT), 0)"
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: Optional[int] = None,
    out_col: str = "zorder_key",
) -> DataFrame:
    """Append ``out_col``: the Z-order key over ``cols`` (numeric), each
    rank-scaled to ``bits`` bits against the corpus min/max.  One 1-row
    min/max aggregate broadcast back; everything else is narrow
    arithmetic.  ``bits`` defaults to min(16, 42 // n_cols) so the
    advertised 3-4 column layouts work without hand-tuning while staying
    inside the 42-bit exact-double budget."""
    cols = list(cols)
    if bits is None:
        bits = min(16, 42 // max(len(cols), 1))
    aggs = []
    for i, c in enumerate(cols):
        # NaN-excluding bounds: NaN sorts LARGEST, so one NaN row made
        # max() = NaN, hi - lo = NaN, and every row's bucket for this
        # column collapsed to 0 via FLOOR(NaN)->NULL->COALESCE — the
        # whole dimension silently stopped clustering.  NaN VALUES still
        # land in bucket 0 like NULLs (documented degenerate bucket).
        v = F.col(c).cast("double")
        vn = F.when(~F.isnan(v), v)
        aggs.append(F.min(vn).alias(f"__lo{i}__"))
        aggs.append(F.max(vn).alias(f"__hi{i}__"))
    stats = df.agg(*aggs)
    out = ensure_parallelism(df).crossJoin(F.broadcast(stats))
    scaled = [
        zorder_scale_sql(f"`{c}`", f"__lo{i}__", f"__hi{i}__", bits)
        for i, c in enumerate(cols)
    ]
    out = out.withColumn(
        out_col, F.expr(zorder_bit_interleave_sql(scaled, bits))
    )
    drop = [f"__lo{i}__" for i in range(len(cols))] + [
        f"__hi{i}__" for i in range(len(cols))
    ]
    return out.drop(*drop)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: Optional[int] = None,
    bits: Optional[int] = None,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Z-order key over
    ``cols`` and sort within partitions, then drop the key.  Each output
    file then covers a compact hyper-rectangle of the key space, so
    parquet min/max skipping prunes on ANY of ``cols``.  One range
    exchange (sampled boundaries absorb z-key skew) + local sort."""
    keyed = zorder_key(df, cols, bits=bits, out_col="__z__")
    parted = (
        keyed.repartitionByRange(num_partitions, "__z__")
        if num_partitions
        else keyed.repartitionByRange("__z__")
    )
    return parted.sortWithinPartitions("__z__").drop("__z__")


def compact_files(
    spark,
    path: str,
    data_format: str = "parquet",
    target_mb: int = 256,
    sort_by=None,
) -> dict:
    """Compact a directory of small files into ~``target_mb`` files —
    the standing operational fix for the small-files problem (a 100 TB
    table accreted by streaming micro-batches or fine-grained partitions
    easily holds millions of KB-sized files, and at that point LISTING
    the table costs more than scanning it).

    Strategy: measure the current on-disk bytes, read, repartition to
    ``ceil(bytes / target)`` (``sort_by`` uses repartitionByRange so the
    rewrite doubles as a cluster-by for data skipping), write to a
    sibling temp directory, then swap atomically-ish (rename old out of
    the way, rename new in, delete old).  The swap is metadata-only on a
    local/HDFS filesystem; on object stores run it off-peak.

    Returns {files_before, files_after, bytes}.  Local-filesystem paths
    only (same constraint as the protobuf writer — the swap uses
    os.rename).
    """
    import math
    import os
    import re
    import shutil
    import uuid

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) and not path.startswith(
        "file://"
    ):
        raise ValueError(
            f"compact_files swaps directories via os.rename and cannot "
            f"target {path!r}; copy the pattern with your store's rename."
        )
    path = path[7:] if path.startswith("file://") else path

    def _data_files(d):
        out = []
        for root, _dirs, files in os.walk(d):
            for f in files:
                if not f.startswith(("_", ".")):
                    out.append(os.path.join(root, f))
        return out

    def _partition_cols(d):
        # Hive layout detection: the key=value directory segments on the
        # path from the table root to the first data file, in order.
        for root, _dirs, files in os.walk(d):
            if any(not f.startswith(("_", ".")) for f in files):
                rel = os.path.relpath(root, d)
                segs = [] if rel == "." else rel.split(os.sep)
                return [s.split("=", 1)[0] for s in segs if "=" in s]
        return []

    before = _data_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    from pyspark.sql import functions as F

    part_cols = _partition_cols(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    if part_cols:
        # Hive-partitioned table: a flat rewrite would silently destroy
        # the directory structure downstream readers prune on, and
        # partition-value INFERENCE would coerce on-disk strings
        # (col=01 -> int 1, so the rewrite renames the directory to
        # col=1).  Read with inference off so values stay the literal
        # directory strings, co-locate each partition value in one task,
        # and write the same layout back with partitionBy.
        inference_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = spark.conf.get(inference_key, "true")
        spark.conf.set(inference_key, "false")
        try:
            df = spark.read.format(data_format).option("basePath", path).load(path)
            df = df.repartition(n_out, *[F.col(c) for c in part_cols])
            if sort_by:
                cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
                df = df.sortWithinPartitions(*[F.col(c) for c in cols])
            df.write.format(data_format).mode("overwrite").partitionBy(
                *part_cols
            ).save(tmp)
        finally:
            spark.conf.set(inference_key, prev)
    else:
        df = spark.read.format(data_format).load(path)
        if sort_by:
            cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            df = df.repartitionByRange(n_out, *[F.col(c) for c in cols])
        else:
            df = df.repartition(n_out)
        df.write.format(data_format).mode("overwrite").save(tmp)

    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except Exception:
        os.rename(old, path)  # roll back: the original table stays live
        raise
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total_bytes,
        "partition_columns": part_cols,
    }
