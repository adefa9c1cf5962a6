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


# ---------------------------------------------------------------------------
# Bloom-state streaming dedup — full history, fixed-size state
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from rtstore_spark.streaming.dedup_stream import StreamingBloomDedup  # noqa: E402


@pytest.fixture()
def bd(spark, tmp_path):
    return StreamingBloomDedup(
        spark,
        str(tmp_path / "staging"),
        SCHEMA,
        str(tmp_path / "kept"),
        str(tmp_path / "filter"),
        str(tmp_path / "chk"),
        nbits=1 << 14,
        k=5,
    )


class TestStreamingBloomDedup:
    def test_within_batch_first_arrival_wins(self, spark, bd):
        append(spark, bd, [(2, 1, "alpha doc"), (1, 0, "alpha doc"), (3, 2, "beta doc")])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 3}

    def test_duplicates_dropped_across_runs(self, spark, bd):
        append(spark, bd, [(1, 0, "alpha doc"), (2, 1, "beta doc")])
        bd.run_once()
        append(spark, bd, [(3, 10, "alpha doc"), (4, 11, "gamma doc")])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2, 4}

    def test_no_horizon_forgetting(self, spark, bd):
        """The property StreamingDedup cannot offer: a duplicate arriving
        arbitrarily later (far past any watermark horizon) is still
        dropped — the filter never forgets."""
        append(spark, bd, [(1, 0, "alpha doc")])
        bd.run_once()
        append(spark, bd, [(2, 600, "filler doc")])
        bd.run_once()
        append(spark, bd, [(3, 100000, "alpha doc")])  # ~70 days later
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2}

    def test_state_survives_checkpoint_loss(self, spark, bd, tmp_path):
        """Deleting the checkpoint loses only source progress, not dedup
        state — the filter lives with the data (the external-state
        contract shared with StreamingNearDedup)."""
        import shutil

        append(spark, bd, [(1, 0, "alpha doc")])
        bd.run_once()
        shutil.rmtree(bd.checkpoint)
        fresh = StreamingBloomDedup(
            spark, bd.source_dir, SCHEMA, bd.dest_dir, bd.filter_dir,
            str(tmp_path / "chk2"), nbits=bd.nbits, k=bd.k,
        )
        # the new checkpoint replays the staging dir from scratch: batch 0
        # re-runs (idempotent overwrite of its own partition), and the new
        # duplicate in batch 1 is dropped against batch 0's filter
        append(spark, fresh, [(9, 50, "alpha doc"), (10, 51, "delta doc")])
        fresh.run_once()
        assert {r["doc_id"] for r in fresh.table().collect()} == {1, 10}

    def test_replayed_batch_is_idempotent(self, spark, bd):
        append(spark, bd, [(1, 0, "alpha doc"), (2, 1, "alpha doc")])
        bd.run_once()
        before = sorted(map(tuple, bd.table().drop("batch").collect()))
        # simulate foreachBatch at-least-once: re-apply the same batch id
        src = spark.read.parquet(bd.source_dir)
        bd._apply(src, 0)
        after = sorted(map(tuple, bd.table().drop("batch").collect()))
        assert before == after == [t for t in before]
        # and the filter partition was rewritten, not duplicated
        filt = spark.read.parquet(bd.filter_dir)
        assert filt.groupBy("batch", "word").count().filter("count > 1").count() == 0

    def test_mixed_filter_config_fails_loudly(self, spark, bd, tmp_path):
        append(spark, bd, [(1, 0, "alpha doc")])
        bd.run_once()
        wrong = StreamingBloomDedup(
            spark, bd.source_dir, SCHEMA, bd.dest_dir, bd.filter_dir,
            str(tmp_path / "chk3"), nbits=1 << 10, k=3,
        )
        append(spark, wrong, [(5, 60, "epsilon doc")])
        with pytest.raises(Exception, match="only valid at one config"):
            wrong.run_once()

    def test_empty_table_before_first_run(self, spark, bd):
        assert bd.table().count() == 0
        assert "fp" in bd.table().columns
