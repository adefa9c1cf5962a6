"""Streaming NEAR-duplicate dedup — a rolling crawl's dedup stage as a
Structured Streaming sink.

``streaming.dedup_stream`` drops exact copies with watermark-bounded state;
near-duplicates (the same article re-crawled with a new footer) need minhash,
and minhash state cannot live in the streaming state store: the reference set
a crawl dedups against is the WHOLE kept corpus, forever, not a time horizon.
The production shape is therefore ``foreachBatch`` + an external signature
table: each micro-batch is near-deduped within itself (full minhash + verify
+ connected components — the text is present), then against the signature
table of everything kept so far (band-pruned equi-join on stored signatures
only — ``dedup.incremental_neardup``; the historical text is long gone), and
the survivors' signatures are appended so the next batch sees them.

State at 100 TB: the signature table is k longs per kept doc (~64 B at k=8)
— ten billion documents ≈ 640 GB of parquet, read band-pruned per batch,
versus the corpus itself which never needs to exist in one place. The
streaming checkpoint tracks ONLY source progress; the signature table is the
dedup state and lives with the data.

Idempotent replay: both outputs are written per-batch into
``batch=<batch_id>/`` partition directories with overwrite — a replayed
micro-batch (foreachBatch is at-least-once) rewrites its own partitions
byte-identically instead of duplicating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compact_signature_partitions(spark, sig_dir: str) -> None:
    """Coalesce a per-batch signature table into ONE sentinel partition.
    Row content is unchanged — this is purely a small-files compaction
    for streams that have run thousands of micro-batches.

    Crash-safe via the generation-pointer protocol
    (``streaming/state_table.py``): fresh ``batch=-<gen>`` sentinel →
    atomic ``_compacted`` pointer flip → stale sweep. A torn sentinel
    write can no longer truncate the signature table (silently missed
    near-dups); a crash after the flip only double-includes folded rows,
    whose duplicate candidate pairs the left-anti/distinct consumers
    already collapse. Same operational contract as
    ``dedup_stream.compact_bloom_partitions``: run between clean runs;
    a checkpoint reset afterwards requires a full state + dest rebuild
    (a replayed batch can no longer self-exclude rows folded into the
    merged partition)."""
    from rtstore_spark.streaming.state_table import compact_state_partitions

    compact_state_partitions(spark, sig_dir, lambda live: live)


def prior_signatures(spark, sig_dir: str, batch_id: int) -> DataFrame | None:
    """Signatures of every PRIOR batch. Excluding the current batch id is
    a correctness requirement, not an optimization: a replayed micro-batch
    (at-least-once foreachBatch, or a checkpoint reset) would otherwise
    find its own previously-stored signatures, match every kept doc
    against itself at est_jaccard = 1.0, drop them all, and overwrite the
    partition with empty data. Existence is probed with a read-and-catch
    instead of a recursive listing — the signature table grows for the
    stream's whole life, and a full LIST per micro-batch would grow with
    it. Shared by ``StreamingNearDedup`` and
    ``corpus_stream.StreamingCorpusPrep``."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from rtstore_spark.store.fs import fs_for

    if not fs_for(sig_dir, spark).exists(sig_dir):
        return None
    try:
        ref = spark.read.parquet(sig_dir)
    except AnalysisException:  # exists but holds no readable parquet yet
        return None
    from rtstore_spark.streaming.state_table import (
        live_sentinel_gen,
        live_state_filter,
    )

    gen = live_sentinel_gen(spark, sig_dir)
    return ref.filter(live_state_filter(gen, exclude_batch=batch_id))


class StreamingNearDedup:
    """Tail a staging directory of documents; append near-dup-free docs to
    ``dest_dir`` and their minhash signatures to ``sig_dir``. Same run_once
    shape as the other streaming surfaces (availableNow trigger, source
    progress in the checkpoint); dedup state is the external signature
    table, so it survives checkpoint resets and is shareable with the
    batch ``incremental_neardup`` path."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema: T.StructType,
        dest_dir: str,
        sig_dir: str,
        checkpoint: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.8,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.sig_dir = sig_dir
        self.checkpoint = checkpoint
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n

    # ------------------------------------------------------------------

    def _ref_signatures(self, batch_id: int) -> DataFrame | None:
        return prior_signatures(self.spark, self.sig_dir, batch_id)

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        from rtstore_spark.operators import dedup as D

        if batch.isEmpty():
            return
        # 1. within-batch near-dup (text available → full verify + exact
        # components; an exact copy is a near-dup at j=1.0, so no separate
        # exact pass is needed)
        drop = D.minhash_dedup(
            batch, self.text_col, self.id_col,
            threshold=self.threshold, num_hashes=self.num_hashes,
            bands=self.bands, shingle_n=self.shingle_n,
        ).select(F.col("drop_id").alias(self.id_col))
        kept = batch.join(drop, self.id_col, "left_anti")

        # 2. against everything kept so far — stored signatures only
        ref = self._ref_signatures(batch_id)
        if ref is not None:
            pairs = D.incremental_neardup(
                kept, ref, self.text_col, self.id_col,
                threshold=self.threshold, num_hashes=self.num_hashes,
                bands=self.bands, shingle_n=self.shingle_n,
            )
            kept = kept.join(
                pairs.select(F.col("new_id").alias(self.id_col)).distinct(),
                self.id_col,
                "left_anti",
            )

        # survivors feed two writes — pin one computation of the dedup plan
        from pyspark import StorageLevel

        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            kept.write.mode("overwrite").parquet(
                f"{self.dest_dir}/batch={batch_id}"
            )
            D.minhash_signatures_wide(
                kept, self.text_col, self.id_col,
                self.num_hashes, self.shingle_n,
            ).write.mode("overwrite").parquet(f"{self.sig_dir}/batch={batch_id}")
        finally:
            kept.unpersist()

    # ------------------------------------------------------------------

    def compact_state(self) -> None:
        """Collapse per-batch signature partitions into one — see
        ``compact_signature_partitions`` for the contract."""
        compact_signature_partitions(self.spark, self.sig_dir)

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

    def table(self) -> DataFrame:
        """Everything kept so far (the ``batch`` partition column rides
        along — it is the micro-batch id, useful for replay audits)."""
        from rtstore_spark.store.fs import read_parquet_or_empty

        # IntegerType matches what partition inference yields for batch=N
        # once data exists — the empty case must not flip the dtype
        schema = T.StructType(
            list(self.source_schema) + [T.StructField("batch", T.IntegerType())]
        )
        return read_parquet_or_empty(self.spark, self.dest_dir, schema)
