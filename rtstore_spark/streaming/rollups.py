"""Continuous aggregates — incrementally-maintained time-bucket rollups.

The TSDB pattern (TimescaleDB continuous aggregates, Influx tasks): a
streaming query tails the raw event table and maintains a materialized
hourly/daily rollup, finalizing each bucket once the event-time watermark
passes it. Late data within the watermark updates the right bucket; data
later than the watermark is dropped (bounded state — the property that makes
this run forever at scale).

Batch and streaming share the same aggregation expression, so the rollup
table is provably the batch answer restricted to finalized windows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hourly_agg(df: DataFrame, ts_col: str = "ts", key_col: str = "event_type",
               value_col: str = "value", window: str = "1 hour",
               distinct_col: str | None = None) -> DataFrame:
    """The shared aggregation: one row per (window, key).

    With ``distinct_col``, each row also carries an ``hll`` sketch of the
    column (plus its ``distinct_est``) — the per-window distinct count a
    plain streaming agg cannot provide exactly with bounded state. The
    sketch, not just the estimate, is persisted so the finalized rollup
    stays MERGEABLE offline: daily/weekly distincts come from
    ``operators.sketches.hll_merge`` over the rollup table, never from
    re-scanning raw events.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("total_value"),
    ]
    cols = ["n_events", "total_value"]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(F.col(distinct_col)).alias("hll"))
        cols += ["hll"]
    out = (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            key_col, *cols,
        )
    )
    if distinct_col is not None:
        out = out.withColumn("distinct_est", F.hll_sketch_estimate("hll"))
    return out


class ContinuousAggregate:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema: T.StructType,
        dest_dir: str,
        checkpoint: str,
        ts_col: str = "ts",
        key_col: str = "event_type",
        value_col: str = "value",
        window: str = "1 hour",
        watermark: str = "2 hours",
        distinct_col: str | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.checkpoint = checkpoint
        self.ts_col = ts_col
        self.key_col = key_col
        self.value_col = value_col
        self.window = window
        self.watermark = watermark
        self.distinct_col = distinct_col

    def run_once(self) -> None:
        """Process all available input; finalized windows append to the
        rollup table. (Append mode emits a window only after the watermark
        passes its end — a window fed in run N lands in the table at run
        N+1's trigger, exactly the visibility lag the watermark defines.)"""
        src = (
            self.spark.readStream.schema(self.source_schema)
            .parquet(self.source_dir)
            .withWatermark(self.ts_col, self.watermark)
        )
        agg = hourly_agg(
            src, self.ts_col, self.key_col, self.value_col, self.window,
            self.distinct_col,
        )
        q = (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", self.checkpoint)
            .option("path", self.dest_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table(self) -> DataFrame:
        from rtstore_spark.store.fs import fs_for

        fs = fs_for(self.dest_dir, self.spark)
        if not fs.exists(self.dest_dir) or not any(
            f.endswith(".parquet") for f in fs.listdir(self.dest_dir)
        ):
            schema = ("bucket_start timestamp, bucket_end timestamp, "
                      f"{self.key_col} string, n_events bigint, total_value double")
            if self.distinct_col is not None:
                # bigint: hll_sketch_estimate returns LongType — the
                # placeholder must match what the first write will produce
                schema += ", hll binary, distinct_est bigint"
            return self.spark.createDataFrame([], schema=schema)
        return self.spark.read.parquet(self.dest_dir)
