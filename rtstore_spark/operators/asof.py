"""As-of join — the canonical time-series operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` (direction='backward') within the same key.

Implementation is the union-tag-window trick, NOT a range join:

    union(right tagged 0, left tagged 1)
      → window partitionBy(key) orderBy(ts, tag) with last(right cols,
        ignorenulls) over rows unbounded-preceding..current
      → keep left rows

One hash shuffle on the key, linear scan within partitions — no
inequality-join explosion (a naive ``l.ts >= r.ts`` join is O(n·m) per key
and is the classic scale killer). Skewed keys are handled by AQE skew-join
splitting since the window input is a standard exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join.

    ``value_cols``: right columns to attach (default: all non-key,
    non-timestamp columns). ``tolerance``: optional max staleness in the
    timestamp's own unit (rows further back are nulled), like pandas
    ``merge_asof(tolerance=...)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    lhs = left.withColumn("_tag", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_tag", F.lit(0)).withColumn("_ts", F.col("_rts"))

    # align schemas for the union
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(dict(rhs.dtypes)[c]))
    unioned = lhs.select(*rhs.columns).unionByName(rhs)

    # right rows sort before left rows at equal ts (tag 0 < 1) so an exact
    # timestamp tie counts as "already happened" — ASOF semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_f_rts"),
    )
    out = filled.filter(F.col("_tag") == 1)
    if tolerance is not None:
        fresh = F.col("_ts") - F.col("_f_rts") <= tolerance
        out = out.select(
            *left.columns,
            *[
                F.when(fresh, F.col(f"_f_{c}")).otherwise(F.lit(None)).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(
            *left.columns,
            *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    return out
