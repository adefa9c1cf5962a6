"""Continuous-aggregate tests: streaming rollup == batch recompute on
finalized windows; late data handling; bounded state via watermark."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.streaming.rollups import ContinuousAggregate, hourly_agg

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def rows(spark, specs):
    data = [(T0 + dt.timedelta(minutes=m), k, float(v)) for m, k, v in specs]
    return spark.createDataFrame(data, schema=SCHEMA)


@pytest.fixture()
def ca(spark, tmp_path):
    src = str(tmp_path / "src")
    return ContinuousAggregate(
        spark, src, SCHEMA, str(tmp_path / "rollup"), str(tmp_path / "chk"),
        watermark="2 hours",
    )


def append(spark, ca, specs):
    rows(spark, specs).coalesce(1).write.mode("append").parquet(ca.source_dir)


def test_streaming_matches_batch_on_finalized_windows(spark, ca):
    # hours 0 and 1
    append(spark, ca, [(5, "click", 1), (10, "click", 2), (70, "view", 5)])
    ca.run_once()
    # advance event time far enough to finalize hours 0-1 (watermark 2h)
    append(spark, ca, [(300, "click", 9)])  # hour 5
    ca.run_once()

    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ca.table().collect()
    }
    assert got[(T0, "click")] == (2, 3.0)
    assert got[(T0 + dt.timedelta(hours=1), "view")] == (1, 5.0)
    # hour-5 window not finalized yet (watermark hasn't passed it)
    assert (T0 + dt.timedelta(hours=5), "click") not in got

    # batch recompute agrees on the finalized windows
    batch = hourly_agg(spark.read.schema(SCHEMA).parquet(ca.source_dir))
    bmap = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert bmap[k] == v


def test_late_data_within_watermark_counts(spark, ca):
    append(spark, ca, [(5, "click", 1)])
    ca.run_once()
    # late row for hour 0 arrives while watermark (max 00:05 - 2h) still
    # allows it, plus a row advancing time past finalization
    append(spark, ca, [(15, "click", 10), (300, "view", 1)])
    ca.run_once()
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ca.table().collect()
    }
    assert got[(T0, "click")] == (2, 11.0)  # late row included


def test_data_older_than_watermark_dropped(spark, ca):
    append(spark, ca, [(5, "click", 1), (600, "view", 1)])  # hour 0 + hour 10
    ca.run_once()
    # hour-0 already finalized-eligible; this very-late row is beyond the
    # 2h watermark (max is 10:00) and must be dropped, not double-counted
    append(spark, ca, [(20, "click", 99), (900, "view", 1)])
    ca.run_once()
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ca.table().collect()
    }
    assert got[(T0, "click")] == (1, 1.0)


def test_distinct_sketch_rollup_and_offline_merge(spark, tmp_path):
    """With distinct_col the finalized rollup carries an HLL sketch per
    (window, key); per-window estimates are exact at test cardinalities
    and hll_merge over the ROLLUP (not raw events) gives cross-window
    distincts — re-counting users seen in both hours once."""
    schema = T.StructType(
        SCHEMA.fields + [T.StructField("user", T.StringType(), False)]
    )
    ca = ContinuousAggregate(
        spark, str(tmp_path / "src"), schema, str(tmp_path / "rollup"),
        str(tmp_path / "chk"), watermark="2 hours", distinct_col="user",
    )
    data = [
        # hour 0: users u1, u2 (u1 twice) — 2 distinct
        (5, "click", 1, "u1"), (10, "click", 1, "u1"), (20, "click", 1, "u2"),
        # hour 1: users u2, u3 — 2 distinct; union with hour 0 = 3
        (70, "click", 1, "u2"), (80, "click", 1, "u3"),
    ]
    spark.createDataFrame(
        [(T0 + dt.timedelta(minutes=m), k, float(v), u) for m, k, v, u in data],
        schema=schema,
    ).coalesce(1).write.mode("append").parquet(ca.source_dir)
    ca.run_once()
    spark.createDataFrame(
        [(T0 + dt.timedelta(minutes=300), "click", 1.0, "u9")], schema=schema
    ).coalesce(1).write.mode("append").parquet(ca.source_dir)
    ca.run_once()

    roll = ca.table()
    got = {r["bucket_start"]: r["distinct_est"] for r in roll.collect()}
    assert round(got[T0]) == 2
    assert round(got[T0 + dt.timedelta(hours=1)]) == 2

    from rtstore_spark.operators.sketches import hll_merge

    total = hll_merge(roll.select("hll"), []).collect()[0]["distinct_est"]
    assert round(total) == 3  # u2 spans both hours, counted once

    # empty-table schema advertises the sketch columns before first write
    ca2 = ContinuousAggregate(
        spark, str(tmp_path / "none"), schema, str(tmp_path / "none_out"),
        str(tmp_path / "none_chk"), distinct_col="user",
    )
    assert {"hll", "distinct_est"} <= set(ca2.table().columns)


def test_distinct_est_placeholder_dtype_matches_written_table(spark, tmp_path):
    """hll_sketch_estimate returns LongType: the empty-table placeholder
    must advertise bigint or downstream unions/seeding flip dtypes after
    the first write."""
    schema = T.StructType(
        SCHEMA.fields + [T.StructField("user", T.StringType(), False)]
    )
    ca = ContinuousAggregate(
        spark, str(tmp_path / "src"), schema, str(tmp_path / "out"),
        str(tmp_path / "chk"), distinct_col="user",
    )
    placeholder = dict(ca.table().dtypes)
    batch = dict(
        hourly_agg(
            spark.createDataFrame([], schema=schema), distinct_col="user"
        ).dtypes
    )
    for c in ("n_events", "total_value", "hll", "distinct_est"):
        assert placeholder[c] == batch[c], (c, placeholder[c], batch[c])
