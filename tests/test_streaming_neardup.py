"""Streaming near-dup dedup: micro-batches dedup within themselves (full
minhash verify) and against the rolling signature table of everything kept
so far (signatures only — no historical text), and the result matches
running all batches as one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.streaming.neardup_stream import StreamingNearDedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the rain falls softly on the roof tonight"
)
OTHER = (
    "completely different prose about distributed query engines and the "
    "joy of columnar storage formats with vectorized execution pipelines"
)
FRESH = (
    "novel unrelated content concerning mountain hiking trails and the "
    "various birds one might encounter on an early morning walk uphill"
)


def make(spark, tmp_path, name="nd"):
    return StreamingNearDedup(
        spark,
        str(tmp_path / f"{name}_staging"),
        SCHEMA,
        str(tmp_path / f"{name}_kept"),
        str(tmp_path / f"{name}_sigs"),
        str(tmp_path / f"{name}_chk"),
        threshold=0.7,
    )


def stage(spark, nd, rows):
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(nd.source_dir)


def kept_ids(nd):
    return sorted(r["doc_id"] for r in nd.table().collect())


class TestStreamingNearDedup:
    def test_within_and_cross_batch_neardup(self, spark, tmp_path):
        nd = make(spark, tmp_path)
        # batch 1: an original, its near-dup, and an unrelated doc
        stage(spark, nd, [(1, BASE), (2, BASE.replace("rain", "snow")), (3, OTHER)])
        nd.run_once()
        assert kept_ids(nd) == [1, 3]  # within-batch near-dup dropped

        # batch 2: a fresh doc plus near-dups of BOTH earlier batches —
        # caught via stored signatures alone (their text is not re-staged)
        stage(
            spark, nd,
            [
                (10, BASE.replace("dog", "wolf")),
                (11, OTHER + " indeed"),  # j≈0.9: well above the 6/8 cut
                (12, FRESH),
            ],
        )
        nd.run_once()
        assert kept_ids(nd) == [1, 3, 12]

        # the signature table now carries exactly the kept docs
        sigs = spark.read.parquet(nd.sig_dir)
        assert sorted(r["id"] for r in sigs.select("id").collect()) == [1, 3, 12]

    def test_matches_single_batch_run(self, spark, tmp_path):
        """Batching must not change the outcome: all documents staged at
        once produce the same kept set as the two-batch run above."""
        nd = make(spark, tmp_path, "one")
        stage(
            spark, nd,
            [
                (1, BASE), (2, BASE.replace("rain", "snow")), (3, OTHER),
                (10, BASE.replace("dog", "wolf")),
                (11, OTHER + " indeed"),
                (12, FRESH),
            ],
        )
        nd.run_once()
        assert kept_ids(nd) == [1, 3, 12]

    def test_empty_table_before_first_run(self, spark, tmp_path):
        nd = make(spark, tmp_path, "empty")
        assert nd.table().count() == 0
        assert "batch" in nd.table().columns


class TestReplayAndSchema:
    def test_replayed_batch_does_not_self_match(self, spark, tmp_path):
        """foreachBatch is at-least-once: re-running a batch whose outputs
        already landed must rewrite them identically — NOT match every doc
        against its own stored signature and overwrite with empty data."""
        nd = make(spark, tmp_path, "replay")
        batch = spark.createDataFrame([(1, BASE), (3, OTHER)], schema=SCHEMA)
        nd._apply(batch, 0)
        first = kept_ids(nd)
        assert first == [1, 3]
        nd._apply(batch, 0)  # replay of the same micro-batch id
        assert kept_ids(nd) == first
        sigs = spark.read.parquet(nd.sig_dir)
        assert sorted(r["id"] for r in sigs.select("id").collect()) == [1, 3]

    def test_table_schema_stable_across_first_run(self, spark, tmp_path):
        """The empty-case schema must match post-run partition inference —
        a dtype flip on `batch` breaks unions built before the first run."""
        nd = make(spark, tmp_path, "schema")
        before = dict(nd.table().dtypes)
        stage(spark, nd, [(1, BASE)])
        nd.run_once()
        after = dict(nd.table().dtypes)
        assert before == after
