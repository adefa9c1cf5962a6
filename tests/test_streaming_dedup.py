"""Streaming exact dedup: first arrival survives, duplicates within the
watermark horizon are dropped — including across run_once calls (state
lives in the checkpoint) — and the batch plan agrees with the stream."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from rtstore_spark.streaming.dedup_stream import (
    StreamingDedup,
    dedup_within_watermark,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def sd(spark, tmp_path):
    return StreamingDedup(
        spark,
        str(tmp_path / "staging"),
        SCHEMA,
        str(tmp_path / "kept"),
        str(tmp_path / "chk"),
        horizon="1 hour",
    )


def append(spark, sd, specs):
    data = [(i, T0 + dt.timedelta(minutes=m), t) for i, m, t in specs]
    spark.createDataFrame(data, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(sd.source_dir)


def test_duplicates_dropped_across_micro_batches(spark, sd):
    append(spark, sd, [(1, 0, "alpha doc"), (2, 1, "beta doc")])
    sd.run_once()
    # dup of doc 1 (same content, later arrival, inside the horizon) plus
    # a fresh doc; the dup must be dropped even though it arrives in a
    # LATER run — the fingerprint state persisted in the checkpoint
    append(spark, sd, [(3, 10, "alpha doc"), (4, 11, "gamma doc")])
    sd.run_once()
    kept = {r["doc_id"] for r in sd.table().collect()}
    assert kept == {1, 2, 4}


def test_normalization_catches_whitespace_case_variants(spark, sd):
    append(spark, sd, [(1, 0, "Hello  World")])
    sd.run_once()
    append(spark, sd, [(2, 5, "  hello world ")])
    sd.run_once()
    assert {r["doc_id"] for r in sd.table().collect()} == {1}


def test_duplicate_after_horizon_passes_through(spark, sd):
    """State for a fingerprint is dropped once the watermark clears it; a
    dup arriving after that is kept — the documented lambda-architecture
    miss the periodic batch pass catches."""
    append(spark, sd, [(1, 0, "alpha doc")])
    sd.run_once()
    # advance the watermark far past the 1h horizon, then replay the text
    append(spark, sd, [(2, 600, "filler doc")])
    sd.run_once()
    append(spark, sd, [(3, 610, "alpha doc")])
    sd.run_once()
    assert {r["doc_id"] for r in sd.table().collect()} == {1, 2, 3}


def test_batch_plan_agrees(spark):
    """The shared plan on a batch frame keeps exactly the FIRST arrival
    per fingerprint — the batch≡stream contract."""
    data = [
        (2, T0 + dt.timedelta(minutes=1), "ALPHA   doc"),
        (1, T0, "alpha doc"),
        (3, T0 + dt.timedelta(minutes=2), "beta doc"),
    ]
    df = spark.createDataFrame(data, schema=SCHEMA)
    out = dedup_within_watermark(df, horizon="1 hour")
    assert {r["doc_id"] for r in out.collect()} == {1, 3}
