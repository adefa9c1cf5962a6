"""Skew-aware join helpers.

AQE's skew-join handles most runtime skew (engine.py enables it), but two
cases still need an explicit plan: hot keys KNOWN in advance (a handful of
entities owning a large share of a 100-TB fact) and streaming joins where
AQE cannot re-plan. The classic fix is to route hot keys through a
broadcast join (no shuffle of the hot partition at all) and the long tail
through the normal shuffle join — equivalent results, no 2-GB-partition
stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_share: float = 0.01) -> list:
    """Keys holding at least ``min_share`` of the rows (one partial-agg
    scan). Meant to run on a sample or the build side — at 100 TB feed it
    ``df.sample(0.01)``; heavy hitters by definition survive sampling."""
    total = df.count()
    rows = (
        df.groupBy(key)
        .count()
        .filter(F.col("count") >= max(1, int(total * min_share)))
        .collect()
    )
    return [r[key] for r in rows]


def skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot: list | None = None,
    min_share: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Join with hot keys routed through a broadcast of the small side's hot
    rows; the tail joins normally. Result-equivalent to ``big.join(small,
    key, how)`` for inner/left joins.

    ``hot``: the heavy-hitter key values; auto-detected from ``big`` when
    omitted (costs one aggregate scan — pass the list in production).
    The hot slice of ``small`` must fit in a broadcast: it is |hot| keys'
    worth of the SMALL side, which is exactly the situation where the
    shuffle join would have melted a partition.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if hot is None:
        hot = hot_keys(big, key, min_share)
    if not hot:
        return big.join(small, key, how)
    is_hot = F.col(key).isin(hot)
    hot_part = big.filter(is_hot).join(
        F.broadcast(small.filter(is_hot)), key, how
    )
    tail = big.filter(~is_hot | F.col(key).isNull()).join(
        small.filter(~is_hot), key, how
    )
    return hot_part.unionByName(tail)
