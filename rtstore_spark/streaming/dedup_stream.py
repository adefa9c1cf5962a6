"""Streaming exact dedup — drop duplicate documents as they arrive.

The batch ``operators.dedup.exact_dedup`` answers "which of these N docs are
copies"; a crawl pipeline needs the streaming form: documents arrive
continuously, and each must be emitted or dropped NOW, not after a corpus
rescan. Structured Streaming's ``dropDuplicatesWithinWatermark`` is exactly
that operator: it keeps per-key state (here: a normalized content
fingerprint) and drops any later arrival with the same key until the
event-time watermark clears the state — bounded state, which is the property
that lets this run forever. A duplicate arriving *after* the horizon is a
miss by design; catch those in the periodic batch dedup pass (the standard
lambda-architecture split).

Keys state on the 16-byte md5, never the document text: state size is
O(docs-in-horizon × 16 B) regardless of document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def content_fingerprint(text_col: str) -> F.Column:
    """Normalized md5 over whitespace-collapsed, lowercased text — the same
    normalization as ``operators.text.fingerprint`` so streaming and batch
    dedup agree on what counts as "the same document"."""
    return F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))))


def dedup_within_watermark(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """The shared plan: fingerprint → watermark → state-backed drop.

    Works on a streaming OR batch DataFrame. Spark refuses
    ``dropDuplicatesWithinWatermark`` outside a stream, so the batch form
    is the equivalent whole-input dedup — first arrival per fingerprint by
    event time (a window over fp, never a global sort) — which is what the
    streaming operator converges to when every duplicate fits one horizon:
    the batch≡stream contract test pins that. Keeps the caller's columns
    plus ``fp``.
    """
    fp = stream.withColumn("fp", content_fingerprint(text_col))
    if not stream.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy("fp").orderBy(F.col(ts_col).asc())
        return (
            fp.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    return fp.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(["fp"])


class StreamingDedup:
    """File-source incarnation: tail a staging directory of parquet docs,
    append first-seen documents to ``dest_dir``. Same run_once shape as
    ``ContinuousAggregate`` (availableNow trigger, checkpointed state) —
    each call drains the staging input; dedup state persists in the
    checkpoint ACROSS calls, so a duplicate of a doc kept three runs ago is
    still dropped if the watermark hasn't cleared it.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema: T.StructType,
        dest_dir: str,
        checkpoint: str,
        text_col: str = "text",
        ts_col: str = "ts",
        horizon: str = "1 hour",
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.checkpoint = checkpoint
        self.text_col = text_col
        self.ts_col = ts_col
        self.horizon = horizon

    def run_once(self) -> None:
        src = self.spark.readStream.schema(self.source_schema).parquet(
            self.source_dir
        )
        kept = dedup_within_watermark(
            src, self.text_col, self.ts_col, self.horizon
        )
        q = (
            kept.writeStream.outputMode("append")
            .option("checkpointLocation", self.checkpoint)
            .option("path", self.dest_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table(self) -> DataFrame:
        from rtstore_spark.store.fs import read_parquet_or_empty

        out = T.StructType(
            list(self.source_schema.fields)
            + [T.StructField("fp", T.StringType(), True)]
        )
        return read_parquet_or_empty(self.spark, self.dest_dir, out)
