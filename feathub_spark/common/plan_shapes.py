"""Shared plan-shape utilities: small DataFrame rewrites whose POINT is
the physical plan they produce, kept in one place so the rationale lives
once."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetrize_pairs(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_a: str,
    out_b: str,
) -> DataFrame:
    """Emit each (a, b) row twice — once as (a, b), once as (b, a) — with
    an IN-PLACE explode, NOT a two-branch union.

    A DataFrame union re-evaluates its parent lineage once per branch, so
    symmetrizing a live candidate-generation subplan (posting-list
    expansion + jaccard verify, for example) through a union silently
    runs the expensive upstream twice just to build an undirected edge
    list.  ``explode(array(struct(a,b), struct(b,a)))`` duplicates each
    row narrowly in one scan; the output stays pipelined into whatever
    shuffle follows.  Only the two named columns survive."""
    return df.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(col_a).alias(out_a), F.col(col_b).alias(out_b)
                ),
                F.struct(
                    F.col(col_b).alias(out_a), F.col(col_a).alias(out_b)
                ),
            )
        ).alias("__sym__")
    ).select(f"__sym__.{out_a}", f"__sym__.{out_b}")
