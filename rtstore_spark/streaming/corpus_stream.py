"""Streaming corpus preparation — the full prep pipeline as a rolling
crawl sink.

``operators.pipeline.prepare_corpus`` is the batch form: one corpus in, one
prepared corpus out. A real crawl never stops arriving, and re-running the
batch prep over all history per delivery is O(corpus) per day. This surface
is the incremental form: each micro-batch of raw documents flows through

1. the STATELESS gates — optional NFC normalization, quality features,
   language allowlist, optional blocklist — exactly the stage -1/0/1/2/2b
   kernels of ``prepare_corpus`` (shared code, so the gates cannot drift
   between the batch and streaming forms);
2. within-batch exact dedup — first arrival by (event time, id) per
   normalized content fingerprint, deterministic under replay;
3. the cross-history EXACT gate — a Bloom probe against the filter
   partitions of every prior batch (``dedup_stream.prior_bloom_filter``):
   fixed-size state forever, no false negatives, ≈fpp false drops;
4. the cross-history NEAR-DUP gate — within-batch minhash dedup, then a
   band-pruned join against the rolling signature table of everything kept
   (``dedup.incremental_neardup`` via ``neardup_stream.prior_signatures``):
   state is k longs per kept doc, never historical text;
5. idempotent writes — kept docs, the batch's Bloom partition and its
   signature partition each land in ``batch=<id>/`` directories with
   overwrite, so an at-least-once replay rewrites byte-identically instead
   of duplicating.

State at 100 TB: the streaming checkpoint tracks ONLY source progress; the
dedup state (filter + signatures) lives with the data and survives
checkpoint resets. Ten billion kept docs ≈ a 12.5 GB filter (at 10
bits/doc) + ~640 GB of signatures — both read pruned per batch, neither
resembling the corpus. The gates are projections and hit only the arriving
batch. This is the composition a crawl pipeline actually runs; the heavy
once-per-corpus passes that need global context (substring dedup,
DSIR selection, shard export) stay batch jobs over ``table()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.operators.pipeline import CorpusPrepConfig
from rtstore_spark.streaming.dedup_stream import (
    content_fingerprint,
    prior_bloom_filter,
)
from rtstore_spark.streaming.neardup_stream import prior_signatures


class StreamingCorpusPrep:
    """Tail a staging directory of raw documents; append gated,
    exact-deduped and near-deduped docs (plus their ``lang``) to
    ``dest_dir``, maintaining the Bloom seen-filter and the minhash
    signature table under ``state_dir``. Gate knobs come from the same
    ``CorpusPrepConfig`` as the batch ``prepare_corpus`` (only the
    stateless fields apply: ``normalize``, ``min_tokens``/``max_tokens``/
    ``max_digit_ratio``, ``langs``, ``blocklist``, and
    ``decontaminate_against`` — the eval set is a fixed broadcast side,
    so span removal is a per-batch gate. Dedup knobs are this class's own
    parameters because their state lives here; ``domain_cap``,
    ``seen_filter`` and ``substring_dedup_tokens`` are ignored — the cap
    and substring winners need global context, and the seen gate IS this
    stream's Bloom state)."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema: T.StructType,
        dest_dir: str,
        state_dir: str,
        checkpoint: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        ts_col: str = "ts",
        cfg: CorpusPrepConfig | None = None,
        nbits: int = 1 << 20,
        k: int = 5,
        near_threshold: float = 0.8,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
        audit: bool = True,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.filter_dir = f"{state_dir}/seen_bloom"
        self.sig_dir = f"{state_dir}/signatures"
        self.checkpoint = checkpoint
        self.text_col = text_col
        self.id_col = id_col
        self.ts_col = ts_col
        self.cfg = cfg or CorpusPrepConfig()
        self.nbits = nbits
        self.k = k
        self.near_threshold = near_threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.audit = audit
        self.audit_dir = f"{state_dir}/audit"
        self._bench_hv_cache: dict = {}

    # ------------------------------------------------------------------

    def _gate(self, batch: DataFrame) -> DataFrame:
        """Stages -1/0/1/2/2b on one micro-batch — the same kernels the
        batch ``prepare_corpus`` calls, minus its persist (a micro-batch
        is small; foreachBatch already pins the input)."""
        from rtstore_spark.operators import text

        cfg, text_col, id_col = self.cfg, self.text_col, self.id_col
        df = batch
        if cfg.normalize:
            df = text.normalize_text(df, text_col)
        q = text.quality_features(df, text_col, id_col)
        ok_q = q.filter(
            (F.col("n_tokens") >= cfg.min_tokens)
            & (F.col("n_tokens") <= cfg.max_tokens)
            & (F.col("digit_ratio") <= cfg.max_digit_ratio)
        ).select("id")
        lang = text.lang_id(df, text_col, id_col).select(
            "id", F.col("pred_lang").alias("lang")
        )
        ok_l = lang.filter(F.col("lang").isin(cfg.langs))
        if "lang" in df.columns:  # pipeline contract: our prediction wins
            df = df.drop("lang")
        kept = df.join(
            ok_q.withColumnRenamed("id", id_col), id_col, "leftsemi"
        ).join(ok_l.withColumnRenamed("id", id_col), id_col)
        if cfg.blocklist:
            bad = (
                text._term_hit_stream(df, text_col, id_col, cfg.blocklist)
                .select("id")
                .distinct()
            )
            kept = kept.join(
                bad.withColumnRenamed("id", id_col), id_col, "left_anti"
            )
        # eval-set decontamination is stateless w.r.t. the stream (the
        # benchmark is a fixed broadcast side), so it runs as a gate here
        # — BEFORE the dedup stages, so a contaminated doc can never
        # become the canonical its clean near-dups are dropped for
        if cfg.decontaminate_against is not None:
            from rtstore_spark.operators import dedup as D
            from rtstore_spark.operators.pipeline import _strip_span_stats

            kept = _strip_span_stats(
                kept,
                lambda d: D.decontaminate(
                    d,
                    cfg.decontaminate_against,
                    text_col,
                    id_col,
                    bench_text_col=cfg.decontaminate_text_col,
                    span_tokens=cfg.decontaminate_tokens,
                    bench_hashes=self._bench_hashes(),
                ),
            )
            kept = kept.filter(F.length(F.trim(F.col(text_col))) > 0)
        return kept

    def _bench_hashes(self):
        """The benchmark's span-hash set, computed ONCE per stream instance
        and persisted — without this every micro-batch re-shingles,
        re-hashes and re-distincts the whole eval set forever (thousands
        of redundant jobs over a long crawl). Keyed by the benchmark
        DataFrame's identity + span size so a cfg swap invalidates it."""
        from pyspark import StorageLevel

        from rtstore_spark.operators.dedup import benchmark_span_hashes

        cfg = self.cfg
        # the cache entry holds a STRONG reference to the benchmark frame
        # ("bench") precisely so CPython cannot free + reuse its address
        # while the id() is a live cache key; text_col is part of the key
        # because the same frame gated through a different column is a
        # different hash set
        key = (
            id(cfg.decontaminate_against),
            cfg.decontaminate_tokens,
            cfg.decontaminate_text_col or self.text_col,
        )
        if self._bench_hv_cache.get("key") != key:
            old = self._bench_hv_cache.get("df")
            if old is not None:
                old.unpersist()
            hv = benchmark_span_hashes(
                cfg.decontaminate_against,
                cfg.decontaminate_text_col or self.text_col,
                cfg.decontaminate_tokens,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            self._bench_hv_cache = {
                "key": key,
                "df": hv,
                "bench": cfg.decontaminate_against,
            }
        return self._bench_hv_cache["df"]

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from pyspark import StorageLevel

        in_cols = batch.columns
        observations = {}
        if self.audit:
            # stage taps ride the actions the batch runs anyway
            # (PrepAudit's Observation pattern — pipeline.py:119): the
            # input/gated counts fire when the persisted gated set first
            # materializes, costing zero extra scans of the raw batch
            from pyspark.sql import Observation

            obs = Observation(f"csp_input_{batch_id}_{id(self)}")
            observations["input"] = obs
            batch = batch.observe(obs, F.count(F.lit(1)).alias("rows"))
        # pin the gated batch: the fingerprint window, the Bloom probe,
        # the within-batch minhash and the signature join all branch off
        # it — un-persisted, each action re-runs the quality/lang/
        # blocklist/decontaminate subtree (the same multi-branch re-scan
        # prepare_corpus persists against)
        gated = self._gate(batch)
        if self.audit:
            from pyspark.sql import Observation

            obs = Observation(f"csp_gated_{batch_id}_{id(self)}")
            observations["gated"] = obs
            gated = gated.observe(obs, F.count(F.lit(1)).alias("rows"))
        gated = gated.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            stage_counts = self._dedup_and_write(
                gated, in_cols, batch_id, observations
            )
            if self.audit:
                self._write_audit(batch_id, stage_counts)
        finally:
            gated.unpersist()

    def _write_audit(self, batch_id: int, stage_counts: dict) -> None:
        """One tiny idempotent append per micro-batch: the stage-yield
        rows of THIS batch land in ``audit/batch=<id>`` with overwrite
        (a replayed batch rewrites its own rows, like every other
        per-batch write here). This is the operational report a rolling
        crawl reads — per-batch gate/dedup yields without re-scanning
        anything: counts came from Observations and already-persisted
        frames."""
        rows = [
            # batch_id rides as a DATA column too: the partition column is
            # the idempotent-overwrite key, but compaction folds partitions
            # into a sentinel — the data column keeps the provenance
            {"stage": k, "rows": int(v), "batch_id": batch_id}
            for k, v in stage_counts.items()
        ]
        self.spark.createDataFrame(
            rows, schema="stage string, rows long, batch_id int"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{self.audit_dir}/batch={batch_id}"
        )

    def audit_table(self) -> DataFrame:
        """Per-micro-batch stage yields: ``(stage, rows, batch)``. Stages
        in pipeline order: ``input`` (raw arrivals), ``gated`` (post
        quality/lang/blocklist/decontaminate), ``exact_dedup`` (post
        within-batch + cross-history exact), ``final`` (written
        survivors, post near-dup). Empty until an audited batch runs.
        ``batch`` comes from the embedded ``batch_id`` data column, so
        the report survives ``compact_state`` folding the partition
        directories into a sentinel. Reads through ``live_state_filter``
        like every other state reader: an orphan sentinel (compaction
        crashed before its pointer flip) or an unswept folded partition
        (crashed after) must not double-count rows — the Bloom/signature
        "double-include is harmless" reasoning does not extend to an
        identity-folded report."""
        from rtstore_spark.store.fs import read_parquet_or_empty
        from rtstore_spark.streaming.state_table import (
            live_sentinel_gen,
            live_state_filter,
        )

        schema = T.StructType(
            [
                T.StructField("stage", T.StringType()),
                T.StructField("rows", T.LongType()),
                T.StructField("batch_id", T.IntegerType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        df = read_parquet_or_empty(self.spark, self.audit_dir, schema)
        gen = live_sentinel_gen(self.spark, self.audit_dir)
        # a batch partition superseded by the live sentinel is dropped by
        # batch_id dedup below even if the crash left both: sentinel rows
        # win (they are the committed fold)
        df = df.filter(live_state_filter(gen))
        # crash-after-flip window: a folded batch=N dir may still be on
        # disk AND inside the sentinel. The copies are byte-identical
        # (identity fold), so exact dedup on the logical key restores the
        # report — tiny frame, trivial shuffle
        df = df.dropDuplicates(["stage", "batch_id"])
        return df.select("stage", "rows", F.col("batch_id").alias("batch"))

    def _dedup_and_write(
        self,
        kept: DataFrame,
        batch_cols: list,
        batch_id: int,
        observations: dict | None = None,
    ) -> dict | None:
        from pyspark.sql import Window

        from rtstore_spark.operators import dedup as D
        from rtstore_spark.operators.sketches import bloom_contains, bloom_rollup

        out_cols = [*batch_cols, "lang"]
        if "lang" in batch_cols:
            out_cols = [*[c for c in batch_cols if c != "lang"], "lang"]

        # within-batch exact: first arrival by (ts, id) per fingerprint —
        # deterministic under replay (dropDuplicates' pick is not)
        fp = kept.withColumn("fp", content_fingerprint(self.text_col))
        w = Window.partitionBy("fp").orderBy(
            F.col(self.ts_col).asc(), F.col(self.id_col).asc()
        )
        kept = (
            fp.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

        # cross-history exact: Bloom probe (no false negatives)
        ref = prior_bloom_filter(
            self.spark, self.filter_dir, batch_id, self.nbits, self.k
        )
        if ref is not None:
            seen = bloom_contains(
                ref, kept.select("fp"), "fp", nbits=self.nbits, k=self.k
            ).filter(F.col("might_contain"))
            kept = kept.join(
                seen.select(F.col("item").alias("fp")), "fp", "left_anti"
            )

        n_exact = None
        if self.audit:
            # ONE eager count after the exact stage — the same move (and
            # the same reasoning) as batch PrepAudit's exact-dedup count:
            # it fires the input/gated Observations via the gated set's
            # cache materialization BEFORE the near-dup stage's internal
            # localCheckpoint actions can traverse the taps, and its own
            # cost is one window+probe pass over the CACHED gated rows,
            # never a second scan of the raw batch
            n_exact = kept.count()

        # within-batch near-dup (full verify — text is present)
        drop = D.minhash_dedup(
            kept, self.text_col, self.id_col,
            threshold=self.near_threshold, num_hashes=self.num_hashes,
            bands=self.bands, shingle_n=self.shingle_n,
        ).select(F.col("drop_id").alias(self.id_col))
        kept = kept.join(drop, self.id_col, "left_anti")

        # cross-history near-dup: stored signatures only
        sigs = prior_signatures(self.spark, self.sig_dir, batch_id)
        if sigs is not None:
            pairs = D.incremental_neardup(
                kept, sigs, self.text_col, self.id_col,
                threshold=self.near_threshold, num_hashes=self.num_hashes,
                bands=self.bands, shingle_n=self.shingle_n,
            )
            kept = kept.join(
                pairs.select(F.col("new_id").alias(self.id_col)).distinct(),
                self.id_col,
                "left_anti",
            )

        # stable column order: a replayed batch must rewrite byte-identically
        kept = kept.select(*out_cols, "fp")

        from pyspark import StorageLevel

        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        try:  # noqa: SIM105 — three writes off one pinned survivor set
            kept.drop("fp").write.mode("overwrite").parquet(
                f"{self.dest_dir}/batch={batch_id}"
            )
            bloom_rollup(
                kept, "fp", by=[], nbits=self.nbits, k=self.k
            ).write.mode("overwrite").parquet(
                f"{self.filter_dir}/batch={batch_id}"
            )
            D.minhash_signatures_wide(
                kept, self.text_col, self.id_col,
                self.num_hashes, self.shingle_n,
            ).write.mode("overwrite").parquet(
                f"{self.sig_dir}/batch={batch_id}"
            )
            if self.audit:
                # survivors are cached by now (the writes materialized the
                # persist) — this count is a cache scan, and the input /
                # gated Observations fired during the eager exact count
                return {
                    "input": observations["input"].get["rows"],
                    "gated": observations["gated"].get["rows"],
                    "exact_dedup": n_exact,
                    "final": kept.count(),
                }
            return None
        finally:
            kept.unpersist()

    # ------------------------------------------------------------------

    def compact_state(self) -> None:
        """Collapse the filter and signature tables' per-batch partitions
        into one each — probe cost stops growing with micro-batches ever
        run; answers unchanged. Run between clean ``run_once`` calls; a
        checkpoint reset afterwards requires a full state + dest rebuild
        (see ``dedup_stream.compact_bloom_partitions``)."""
        from rtstore_spark.streaming.dedup_stream import (
            compact_bloom_partitions,
        )
        from rtstore_spark.streaming.neardup_stream import (
            compact_signature_partitions,
        )

        compact_bloom_partitions(self.spark, self.filter_dir)
        compact_signature_partitions(self.spark, self.sig_dir)
        # the audit report compacts too (it grows one tiny directory per
        # micro-batch forever otherwise); rows are identity-folded and
        # keep their embedded batch_id provenance
        from rtstore_spark.streaming.state_table import (
            compact_state_partitions,
        )

        compact_state_partitions(self.spark, self.audit_dir, lambda live: live)

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
        """The prepared corpus so far: source columns + ``lang`` +
        ``batch`` (micro-batch id, for replay audits)."""
        from rtstore_spark.store.fs import read_parquet_or_empty

        cols = [f for f in self.source_schema if f.name != "lang"]
        schema = T.StructType(
            cols
            + [
                T.StructField("lang", T.StringType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        return read_parquet_or_empty(self.spark, self.dest_dir, schema)
