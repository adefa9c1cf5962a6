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


def compact_bloom_partitions(spark, filter_dir: str) -> None:
    """Rewrite a per-batch Bloom filter table as ONE merged sentinel
    partition. Lossless: the OR-merge is byte-identical to a union build,
    so every membership answer is unchanged; what changes is the probe
    cost — one partition instead of one per micro-batch ever run.

    Crash-safe via the generation-pointer protocol
    (``streaming/state_table.py``): the merged state lands in a fresh
    ``batch=-<gen>`` sentinel, the ``_compacted`` pointer flips
    atomically, stale partitions are swept last. A torn sentinel write
    can no longer lose Bloom words (the failure mode that forced the old
    "crash ⇒ full rebuild" contract): readers only see the generation
    the pointer names.

    Operational contract: run between clean ``run_once`` calls (no stream
    in flight). After compacting, a CHECKPOINT RESET demands clearing the
    state and dest directories too (full rebuild): a reset replays all
    history as batch 0, which can no longer self-exclude fingerprints
    that were folded into the merged partition, and would wrongly drop
    its own documents.
    """
    from rtstore_spark.operators.sketches import bloom_merge
    from rtstore_spark.streaming.state_table import compact_state_partitions

    compact_state_partitions(
        spark, filter_dir, lambda live: bloom_merge(live, by=[])
    )


def prior_bloom_filter(
    spark, filter_dir: str, batch_id: int, nbits: int, k: int
) -> DataFrame | None:
    """Filter partitions of every PRIOR batch (self-exclusion: a replayed
    batch must not probe its own previously-written fingerprints — cf.
    ``neardup_stream.prior_signatures``). Shared by ``StreamingBloomDedup``
    and ``corpus_stream.StreamingCorpusPrep``.

    Config validation runs over ALL partitions — own batch included:
    self-exclusion there would blind a freshly-checkpointed stream (whose
    first replayed batch id collides with an old partition) to a config
    mismatch, and ``bloom_contains`` with explicit nbits/k skips its own
    metadata check. Probing wrong positions would break the
    no-false-negative guarantee silently; raising is the only safe answer.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from rtstore_spark.store.fs import fs_for

    if not fs_for(filter_dir, spark).exists(filter_dir):
        return None
    try:
        ref = spark.read.parquet(filter_dir)
    except AnalysisException:
        return None
    stored = ref.select("nbits", "k").distinct().collect()
    bad = [
        (int(r["nbits"]), int(r["k"]))
        for r in stored
        if (int(r["nbits"]), int(r["k"])) != (nbits, k)
    ]
    if bad:
        raise ValueError(
            f"filter table at {filter_dir} was built with (nbits, k) "
            f"{bad}; this stream is configured ({nbits}, {k}) — Bloom "
            "state is only valid at one config"
        )
    from rtstore_spark.streaming.state_table import (
        live_sentinel_gen,
        live_state_filter,
    )

    gen = live_sentinel_gen(spark, filter_dir)
    return ref.filter(live_state_filter(gen, exclude_batch=batch_id)).drop(
        "batch"
    )


class StreamingBloomDedup:
    """Full-history streaming exact dedup with FIXED-SIZE state: the
    carry-forward "seen before?" gate is a Bloom filter
    (``operators.sketches.bloom_rollup``), not a per-key state store.

    ``StreamingDedup`` above is exact but horizon-bounded: its state
    grows with docs-in-horizon and forgets older history by design. This
    surface makes the opposite trade — the filter covers EVERY document
    ever kept, at nbits/8 bytes total forever, and in exchange a
    ≈(1−e^(−k·n/nbits))^k fraction of genuinely-new documents is falsely
    dropped (never the reverse: a Bloom has no false negatives, so a true
    duplicate can never sneak through the gate). Size nbits ≈ 10 bits per
    expected corpus document for ~1% false-drop — 10 billion docs is a
    12.5 GB filter, stored as parquet word rows and read band-pruned by
    the probe join, while the equivalent exact state (16-byte md5 per
    doc) is 160 GB of *state-store* the streaming engine must snapshot
    per batch. The standard crawl-pipeline compromise: losing 1% of
    uniques is invisible next to crawl noise; re-keeping boilerplate
    copies forever is not.

    Mechanics mirror ``StreamingNearDedup``: ``foreachBatch`` + an
    external per-batch-partitioned state table. Each micro-batch is
    exact-deduped within itself (first arrival by event time, id
    tie-break — deterministic under replay), probed against the OR-merge
    of every PRIOR batch's filter partition (self-exclusion makes
    replayed batches idempotent), and its kept fingerprints are written
    as a new ``batch=<id>`` filter partition with overwrite. The
    streaming checkpoint tracks only source progress; deleting it and
    re-attaching loses nothing — the filter is the state and lives with
    the data. A stream restarted with a different (nbits, k) fails
    loudly at the first probe (mixed-config guard in ``bloom_contains``).

    Filter reads scan batches × ≤nbits/64 word rows; a long-lived stream
    can periodically compact with ``sketches.bloom_merge`` (rewrite the
    partitions as one) without changing any answer — the merge is
    byte-identical to a union build.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema: T.StructType,
        dest_dir: str,
        filter_dir: str,
        checkpoint: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        ts_col: str = "ts",
        nbits: int = 1 << 20,
        k: int = 5,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.filter_dir = filter_dir
        self.checkpoint = checkpoint
        self.text_col = text_col
        self.id_col = id_col
        self.ts_col = ts_col
        self.nbits = nbits
        self.k = k

    # ------------------------------------------------------------------

    def _prior_filter(self, batch_id: int) -> DataFrame | None:
        return prior_bloom_filter(
            self.spark, self.filter_dir, batch_id, self.nbits, self.k
        )

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        from rtstore_spark.operators.sketches import bloom_contains, bloom_rollup

        if batch.isEmpty():
            return
        fp = batch.withColumn("fp", content_fingerprint(self.text_col))
        # within-batch: first arrival per fingerprint, deterministic under
        # replay ((ts, id) order — dropDuplicates' arbitrary pick is not)
        w = Window.partitionBy("fp").orderBy(
            F.col(self.ts_col).asc(), F.col(self.id_col).asc()
        )
        kept = (
            fp.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        # against all history: Bloom probe on the fingerprint
        # (_prior_filter also validates the stored (nbits, k) — including
        # the own-batch partition a replay would otherwise hide)
        ref = self._prior_filter(batch_id)
        if ref is not None:
            seen = bloom_contains(
                ref, kept.select("fp"), "fp", nbits=self.nbits, k=self.k
            ).filter(F.col("might_contain"))
            kept = kept.join(
                seen.select(F.col("item").alias("fp")), "fp", "left_anti"
            )
        # stable column order regardless of which joins ran: the replayed
        # form of a batch must be byte-identical to the original write
        kept = kept.select(*batch.columns, "fp")

        from pyspark import StorageLevel

        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            kept.write.mode("overwrite").parquet(
                f"{self.dest_dir}/batch={batch_id}"
            )
            bloom_rollup(
                kept, "fp", by=[], nbits=self.nbits, k=self.k
            ).write.mode("overwrite").parquet(
                f"{self.filter_dir}/batch={batch_id}"
            )
        finally:
            kept.unpersist()

    # ------------------------------------------------------------------

    def run_once(self) -> None:
        src = self.spark.readStream.schema(self.source_schema).parquet(
            self.source_dir
        )
        q = (
            src.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def compact_state(self) -> None:
        """Collapse the filter's per-batch partitions into one — answers
        are unchanged (``bloom_merge`` OR is byte-identical to a union
        build), but a stream that has run thousands of micro-batches
        stops re-reading thousands of small partitions per probe.
        Delegates to ``compact_bloom_partitions``; see it for the
        operational contract (run between clean ``run_once`` calls; a
        checkpoint reset after compacting requires clearing state + dest
        — a full rebuild — because a replayed batch can no longer
        self-exclude fingerprints folded into the merged partition)."""
        compact_bloom_partitions(self.spark, self.filter_dir)

    def table(self) -> DataFrame:
        """Everything kept so far (``batch`` = micro-batch id rides along)."""
        from rtstore_spark.store.fs import read_parquet_or_empty

        schema = T.StructType(
            list(self.source_schema)
            + [
                T.StructField("fp", T.StringType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        return read_parquet_or_empty(self.spark, self.dest_dir, schema)
