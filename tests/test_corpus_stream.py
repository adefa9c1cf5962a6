"""Streaming corpus prep: the composed crawl sink — stateless gates +
within-batch exact dedup + cross-history Bloom gate + cross-history
near-dup — matches the batch prepare_corpus semantics batch-by-batch and
replays idempotently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.operators.pipeline import CorpusPrepConfig
from rtstore_spark.streaming.corpus_stream import StreamingCorpusPrep

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and the cat is in the "
    "house that it was built near to the river in the morning light"
)
GOOD_EN2 = (
    "careful measurement beats clever guessing when the system is too "
    "large to hold in one head and the plan must survive the next scale"
)
FRESH = (
    "novel unrelated content concerning mountain hiking trails and the "
    "various birds one might encounter on an early morning walk uphill"
)
DIGITS = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20"


def make(spark, tmp_path, name="cp", **kw):
    return StreamingCorpusPrep(
        spark,
        str(tmp_path / f"{name}_staging"),
        SCHEMA,
        str(tmp_path / f"{name}_kept"),
        str(tmp_path / f"{name}_state"),
        str(tmp_path / f"{name}_chk"),
        cfg=CorpusPrepConfig(min_tokens=10, near_dup_threshold=0.7),
        near_threshold=0.7,
        **kw,
    )


def stage(spark, cp, rows, ts="2026-01-01 00:00:00"):
    import datetime

    t0 = datetime.datetime.fromisoformat(ts)
    spark.createDataFrame(
        [(i, txt, t0) for i, txt in rows], schema=SCHEMA
    ).coalesce(1).write.mode("append").parquet(cp.source_dir)


def kept_ids(cp):
    return sorted(r["doc_id"] for r in cp.table().collect())


class TestStreamingCorpusPrep:
    def test_gates_dedup_and_history(self, spark, tmp_path):
        cp = make(spark, tmp_path)
        # batch 1: keeper, its exact copy, a near-dup, a too-short doc,
        # a digit-spam doc
        stage(
            spark, cp,
            [
                (1, GOOD_EN),
                (2, GOOD_EN),                        # exact dup of 1
                (3, GOOD_EN + " tonight again"),     # near dup of 1
                (4, "short text"),                   # fails min_tokens
                (5, DIGITS),                         # fails digit gate
            ],
        )
        cp.run_once()
        assert kept_ids(cp) == [1]
        out = {r["doc_id"]: r["lang"] for r in cp.table().collect()}
        assert out[1] == "en"  # lang annotation rides along

        # batch 2: exact repeat of history (Bloom gate — text long gone),
        # near-dup of history (signature gate), and a genuinely new doc
        stage(
            spark, cp,
            [
                (10, GOOD_EN),                       # historical exact
                (11, GOOD_EN.replace("cat", "dog")),  # historical near
                (12, FRESH),
            ],
        )
        cp.run_once()
        assert kept_ids(cp) == [1, 12]

        # state tables carry exactly the kept docs
        sigs = spark.read.parquet(cp.sig_dir)
        assert sorted(r["id"] for r in sigs.select("id").collect()) == [1, 12]
        filt = spark.read.parquet(cp.filter_dir)
        assert set(r["batch"] for r in filt.select("batch").collect()) == {0, 1}

    def test_matches_batch_prepare_corpus(self, spark, tmp_path):
        """One delivery through the stream ≡ prepare_corpus on the same
        rows (same kernels, same knobs): identical kept ids and langs."""
        from rtstore_spark.operators.pipeline import prepare_corpus

        rows = [
            (1, GOOD_EN),
            (2, GOOD_EN),
            (3, GOOD_EN + " tonight again"),
            (4, "short text"),
            (5, DIGITS),
            (6, GOOD_EN2),
        ]
        cp = make(spark, tmp_path, name="eq")
        stage(spark, cp, rows)
        cp.run_once()
        streamed = {
            (r["doc_id"], r["lang"]) for r in cp.table().collect()
        }
        batch_df = spark.createDataFrame(
            [(i, t) for i, t in rows], "doc_id long, text string"
        )
        cfg = CorpusPrepConfig(min_tokens=10, near_dup_threshold=0.7)
        batched = {
            (r["doc_id"], r["lang"])
            for r in prepare_corpus(batch_df, "text", "doc_id", cfg).collect()
        }
        assert streamed == batched and streamed

    def test_replay_is_idempotent(self, spark, tmp_path):
        """Deleting the checkpoint and re-running (at-least-once replay of
        every batch) rewrites the same partitions byte-identically —
        nothing duplicates, nothing self-cancels."""
        import shutil

        cp = make(spark, tmp_path, name="rp")
        stage(spark, cp, [(1, GOOD_EN), (2, FRESH)])
        cp.run_once()
        stage(spark, cp, [(3, GOOD_EN2), (4, GOOD_EN)])  # 4 = history dup
        cp.run_once()
        before = kept_ids(cp)
        assert before == [1, 2, 3]
        shutil.rmtree(cp.checkpoint)
        cp.run_once()  # replays everything as one batch-0
        assert kept_ids(cp) == before

    def test_blocklist_gate(self, spark, tmp_path):
        cp = make(spark, tmp_path, name="bl")
        cp.cfg = CorpusPrepConfig(
            min_tokens=10, blocklist=["lazy dog"]
        )
        stage(spark, cp, [(1, GOOD_EN), (2, GOOD_EN2)])
        cp.run_once()
        assert kept_ids(cp) == [2]  # "lazy dog" drops doc 1

    def test_empty_table_before_first_run(self, spark, tmp_path):
        cp = make(spark, tmp_path, name="mt")
        assert cp.table().count() == 0
        assert cp.table().schema["lang"].dataType == T.StringType()


class TestStreamingDecontaminateGate:
    def test_eval_spans_cut_per_batch(self, spark, tmp_path):
        evalq = " ".join(f"evalq{i}" for i in range(16))
        bench = spark.createDataFrame([(evalq,)], "text string")
        cp = make(spark, tmp_path, name="dc")
        cp.cfg = CorpusPrepConfig(
            min_tokens=10, decontaminate_against=bench,
            decontaminate_tokens=8,
        )
        stage(
            spark, cp,
            [
                (1, GOOD_EN + " " + evalq),   # contaminated tail
                (2, GOOD_EN2),                # clean
                (3, evalq + " " + evalq),     # wholly contaminated → empty
            ],
        )
        cp.run_once()
        out = {r["doc_id"]: r["text"] for r in cp.table().collect()}
        assert set(out) == {1, 2}            # doc 3 emptied and dropped
        assert "evalq0" not in out[1]
        assert out[1].startswith("the quick brown fox")


class TestCompactState:
    def test_answers_unchanged_after_compaction(self, spark, tmp_path):
        """Compaction collapses the filter + signature tables to one
        partition each; history gating afterwards is identical — and a
        second compaction (reading its own batch=-1) also works."""
        import glob

        cp = make(spark, tmp_path, name="cs")
        stage(spark, cp, [(1, GOOD_EN), (2, FRESH)])
        cp.run_once()
        stage(spark, cp, [(3, GOOD_EN2)])
        cp.run_once()
        cp.compact_state()
        # one sentinel partition each, named by the _compacted pointer
        # (generations start at 2 — batch=-1 is reserved for the legacy
        # pointer-less layout)
        from rtstore_spark.streaming.state_table import live_sentinel_gen

        gen_f = live_sentinel_gen(spark, cp.filter_dir)
        gen_s = live_sentinel_gen(spark, cp.sig_dir)
        assert gen_f == 2 and gen_s == 2
        assert glob.glob(f"{cp.filter_dir}/batch=*") == [
            f"{cp.filter_dir}/batch=-{gen_f}"
        ]
        assert glob.glob(f"{cp.sig_dir}/batch=*") == [
            f"{cp.sig_dir}/batch=-{gen_s}"
        ]
        cp.compact_state()  # second pass: only the live sentinel → no-op
        assert live_sentinel_gen(spark, cp.filter_dir) == 2
        # history still gates: exact + near repeats of pre-compaction docs
        stage(
            spark, cp,
            [
                (10, GOOD_EN),                         # exact historical
                (11, GOOD_EN2.replace("head", "mind")),  # near historical
                (12, "entirely new prose is arriving here about the sea and"
                     " the long voyage that the old captain quietly planned"),
            ],
        )
        cp.run_once()
        assert kept_ids(cp) == [1, 2, 3, 12]

    def test_signature_rows_preserved(self, spark, tmp_path):
        from rtstore_spark.streaming.neardup_stream import (
            compact_signature_partitions,
        )

        cp = make(spark, tmp_path, name="sp")
        stage(spark, cp, [(1, GOOD_EN), (2, FRESH)])
        cp.run_once()
        before = sorted(
            tuple(r) for r in spark.read.parquet(cp.sig_dir).drop("batch").collect()
        )
        compact_signature_partitions(spark, cp.sig_dir)
        after = sorted(
            tuple(r) for r in spark.read.parquet(cp.sig_dir).drop("batch").collect()
        )
        assert before == after


class TestPerBatchAudit:
    def test_stage_yields_per_micro_batch(self, spark, tmp_path):
        """Every audited micro-batch appends its stage-yield rows —
        input → gated → exact_dedup → final — to the audit state table,
        with counts that reconcile against the known data. The counts
        ride Observations + already-persisted frames (the PrepAudit
        pattern), so the report costs no extra scan of the raw batch."""
        cp = make(spark, tmp_path, name="aud")
        # batch 0: 1 keeper, 1 exact dup, 1 short reject
        stage(spark, cp, [(1, GOOD_EN), (2, GOOD_EN), (3, "short text")])
        cp.run_once()
        # batch 1: 1 historical exact (Bloom), 1 near dup of history,
        # 1 fresh keeper, 1 digit reject
        stage(
            spark, cp,
            [
                (10, GOOD_EN),
                (11, GOOD_EN.replace("cat", "dog")),
                (12, FRESH),
                (13, DIGITS),
            ],
        )
        cp.run_once()

        audit = {
            (int(r["batch"]), r["stage"]): int(r["rows"])
            for r in cp.audit_table().collect()
        }
        assert audit[(0, "input")] == 3
        assert audit[(0, "gated")] == 2        # short doc rejected
        assert audit[(0, "exact_dedup")] == 1  # within-batch dup dropped
        assert audit[(0, "final")] == 1
        assert audit[(1, "input")] == 4
        assert audit[(1, "gated")] == 3        # digit spam rejected
        assert audit[(1, "exact_dedup")] == 2  # Bloom drops historical
        assert audit[(1, "final")] == 1        # near-dup drops doc 11
        assert kept_ids(cp) == [1, 12]

        # the audit report compacts with the rest of the state (one
        # sentinel partition) and keeps its per-batch provenance
        import glob

        cp.compact_state()
        assert len(glob.glob(f"{cp.audit_dir}/batch=*")) == 1
        after = {
            (int(r["batch"]), r["stage"]): int(r["rows"])
            for r in cp.audit_table().collect()
        }
        assert after == audit

    def test_audit_off_writes_nothing(self, spark, tmp_path):
        cp = make(spark, tmp_path, name="noaud", audit=False)
        stage(spark, cp, [(1, GOOD_EN)])
        cp.run_once()
        assert cp.audit_table().count() == 0
        assert kept_ids(cp) == [1]
