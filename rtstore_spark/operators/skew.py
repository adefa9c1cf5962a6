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


def hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    sample_fraction: float | None = 0.01,
    seed: int = 7,
) -> list:
    """Keys holding at least ``min_share`` of the rows.

    Detection runs on a seeded ``sample_fraction`` sample BY DEFAULT — a
    key owning ≥1% of a 100-TB fact owns ≥1% of any sample, so heavy
    hitters survive sampling while the detection cost drops from two full
    scans to two scans of the sample. The sample is only trusted when a
    true hot key would be expected ≥5 times in it (total × min_share ≥ 5);
    below that the sampled threshold collapses to 1 row and every sampled
    key would look "hot", so detection falls back to exact full-scan
    counts — small inputs are exactly where the full scan is cheap.
    Pass ``sample_fraction=None`` to force exact counts."""
    src = df.sample(sample_fraction, seed=seed) if sample_fraction else df
    total = src.count()
    if sample_fraction and total * min_share < 5:
        src, total = df, df.count()
    if not total:
        return []
    rows = (
        src.groupBy(key)
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

    ``hot``: the heavy-hitter key values; auto-detected from a 1% sample of
    ``big`` when omitted (heavy hitters survive sampling; pass the list in
    production to skip even that).
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
