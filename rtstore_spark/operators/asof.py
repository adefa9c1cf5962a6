"""Time-join operators Spark lacks natively: as-of join and range join.

``asof_join``: for each left row, attach the most recent right row with
``right.ts <= left.ts`` (direction='backward') within the same key.
``range_join``: attach every enclosing interval (point-in-range), as a
bucketed equi-join — see its docstring.

The as-of implementation is the union-tag-window trick, NOT an
inequality join:

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


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join: each event row joins every interval
    row with ``start <= ts < end`` (half-open), optionally also matching
    equi-keys ``on``. The companion to ``asof_join``: as-of attaches the
    latest *point*, this attaches enclosing *intervals* (maintenance
    windows, campaign periods, validity ranges).

    A naive inequality join is the classic scale killer: Spark can only
    plan ``l.ts >= r.start AND l.ts < r.end`` as a broadcast nested loop
    (fine only while intervals fit in one executor) or a cartesian
    product. This operator makes it an EQUI-join: pick a bucket width,
    explode each interval onto the buckets it covers (``sequence`` — a
    map-local projection), give each event its single bucket, hash-join
    on (keys…, bucket), and keep the exact predicate as the join residual.
    No duplicates are possible: an event lives in exactly one bucket, and
    an interval appears at most once per bucket.

    Cost model: shuffle bytes grow by the interval fan-out
    (≈ 1 + length/width per interval). ``bucket_width=None`` picks the
    95th-percentile interval length from one tiny aggregate — long-tail
    outlier intervals then fan out instead of dictating a huge bucket
    that would lump everything together. Timestamps work via their
    internal numeric form (``unix_micros``); plain numerics work as-is.

    ``how='left'`` keeps unmatched events with null interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on or [])

    def numeric(df, col):
        """df-qualified numeric form of a column (unambiguous in the
        self-referencing join condition below). Timestamps become their
        µs count; strings coerce to double (leaving them raw would make
        the residual predicate LEXICOGRAPHIC — '9' < '12' is false); every
        true numeric passes through UNCAST — a long cast here would
        truncate fractional (double/float) columns in both the bucket key
        and the exact residual predicate (event t=1.9 would spuriously
        match an interval starting at 1.95)."""
        dt = dict(df.dtypes)[col]
        c = df[col]
        if dt.startswith("timestamp"):
            return F.unix_micros(c)
        if dt in ("string", "varchar"):
            return c.cast("double")
        return c

    if bucket_width is None:
        row = (
            intervals.select(
                (numeric(intervals, end_col) - numeric(intervals, start_col))
                .alias("len")
            )
            .agg(F.expr("percentile_approx(len, 0.95)").alias("p"))
            .collect()[0]
        )
        bucket_width = max(int(row["p"] or 1), 1)

    ev = events.withColumn("_b", F.floor(numeric(events, ts_col) / bucket_width))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(numeric(intervals, start_col) / bucket_width),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket. ceil(end/W)−1
                # is that last covered bucket for integer AND fractional
                # ends (the integer-only form floor((end−1)/W) would skip
                # the final bucket of e.g. end=2.5, W=1).
                F.ceil(numeric(intervals, end_col) / bucket_width) - 1,
            )
        ),
    )
    cond = [ev["_b"] == iv["_b"]] + [ev[k] == iv[k] for k in keys]
    pred = (numeric(ev, ts_col) >= numeric(iv, start_col)) & (
        numeric(ev, ts_col) < numeric(iv, end_col)
    )
    out_cols = [ev[c] for c in events.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    return ev.join(iv, cond + [pred], how).select(*out_cols)
