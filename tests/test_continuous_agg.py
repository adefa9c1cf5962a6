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
