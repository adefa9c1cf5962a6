"""Mergeable distinct-count sketches (HyperLogLog) for rollup tables.

The scale story: an exact ``countDistinct`` over 100 TB must shuffle every
distinct key once per query window; a sketch rollup computes a few-KB HLL
per (bucket, day) partition ONCE, and every later question — distincts per
day, per week, over any ad-hoc bucket union — is a merge of sketches, never
a rescan. Spark ships the Apache DataSketches HLL as built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``); these
wrappers just fix the shapes so rollup tables stay mergeable.

Relative error ≈ 1.04/√(2^lgk): lgK=12 (default, 4 KB) ⇒ ~1.6%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame, key_col: str, by: list[str], lgk: int = 12
) -> DataFrame:
    """Sketch table: one binary HLL of ``key_col`` per ``by`` group.

    Persist this as the rollup; it is mergeable across any further
    grouping (days → weeks, buckets → totals) via ``hll_merge`` without
    touching the base table again. One partial-agg shuffle — sketches
    combine map-side, so shuffle bytes are O(groups × 2^lgk), independent
    of row count.
    """
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll")
    )


def hll_merge(rollup: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge sketches up to a coarser grouping (``by=[]``/None = grand
    total): returns the re-grouped sketch plus its distinct estimate."""
    by = by or []
    grouped = rollup.groupBy(*by) if by else rollup.groupBy()
    return grouped.agg(F.hll_union_agg("hll").alias("hll")).select(
        *by,
        "hll",
        F.hll_sketch_estimate("hll").alias("distinct_est"),
    )


def hll_estimate(rollup: DataFrame) -> DataFrame:
    """Per-group distinct estimates straight off a sketch table."""
    return rollup.select(
        *[c for c in rollup.columns if c != "hll"],
        F.hll_sketch_estimate("hll").alias("distinct_est"),
    )
