"""Crash safety of the streaming-state compaction protocol
(``streaming/state_table.py``): a compaction that dies at ANY point must
leave every dedup answer unchanged — the round-5 layout's "crash during
compaction ⇒ full state rebuild" contract is retired. Same kill pattern
as ``test_pq.py::TestRebuildCrashSafety``."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import types as T

from rtstore_spark.store.fs import LocalFS
from rtstore_spark.streaming.dedup_stream import StreamingBloomDedup
from rtstore_spark.streaming.neardup_stream import StreamingNearDedup
from rtstore_spark.streaming.state_table import (
    SENTINEL_POINTER,
    live_sentinel_gen,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

ALPHA = "alpha doc about the quick brown fox jumping over the lazy dog"
BETA = "beta doc regarding an entirely different matter of maritime law"
GAMMA = "gamma doc on the cultivation of heirloom tomatoes in clay soil"


def append(spark, s, specs):
    data = [(i, T0 + dt.timedelta(minutes=m), t) for i, m, t in specs]
    spark.createDataFrame(data, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(s.source_dir)


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


class TestBloomCompactionCrashSafety:
    def test_crash_before_pointer_flip_keeps_answers(
        self, spark, bd, monkeypatch
    ):
        """A compaction killed before its pointer flip leaves an orphan
        sentinel that readers never see: the per-batch partitions are
        still live and history still gates exactly."""
        append(spark, bd, [(1, 0, ALPHA), (2, 1, BETA)])
        bd.run_once()

        def boom(self, p, text):
            raise RuntimeError("simulated crash before pointer flip")

        monkeypatch.setattr(LocalFS, "write_text_atomic", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bd.compact_state()
        monkeypatch.undo()

        # orphan sentinel on disk, but not live: no pointer committed
        assert glob.glob(f"{bd.filter_dir}/batch=-2")
        assert live_sentinel_gen(spark, bd.filter_dir) == 0

        # answers unchanged: historical dup dropped, fresh doc kept
        append(spark, bd, [(3, 10, ALPHA), (4, 11, GAMMA)])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2, 4}

        # retry converges: pointer committed, stale partitions swept,
        # and history STILL gates
        bd.compact_state()
        gen = live_sentinel_gen(spark, bd.filter_dir)
        assert gen == 2
        assert glob.glob(f"{bd.filter_dir}/batch=*") == [
            f"{bd.filter_dir}/batch=-{gen}"
        ]
        append(spark, bd, [(5, 20, BETA), (6, 21, "wholly novel text here")])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2, 4, 6}

    def test_crash_between_flip_and_sweep_keeps_answers(
        self, spark, bd, monkeypatch
    ):
        """A compaction killed after the flip but before the stale sweep
        double-includes folded rows — harmless for a Bloom OR; the next
        compaction retries the sweep."""
        append(spark, bd, [(1, 0, ALPHA), (2, 1, BETA)])
        bd.run_once()

        def boom(self, p, recursive=False):
            raise RuntimeError("simulated crash before sweep")

        monkeypatch.setattr(LocalFS, "delete", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bd.compact_state()
        monkeypatch.undo()

        # pointer committed; stale batch partitions still on disk
        assert live_sentinel_gen(spark, bd.filter_dir) == 2
        assert glob.glob(f"{bd.filter_dir}/batch=0")

        append(spark, bd, [(3, 10, ALPHA), (4, 11, GAMMA)])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2, 4}

        # retry folds the leftovers and sweeps
        bd.compact_state()
        gen = live_sentinel_gen(spark, bd.filter_dir)
        assert gen == 3
        assert glob.glob(f"{bd.filter_dir}/batch=*") == [
            f"{bd.filter_dir}/batch=-{gen}"
        ]

    def test_legacy_pointerless_sentinel_stays_live(self, spark, bd):
        """A round-5 ``batch=-1`` sentinel with no pointer file is a
        COMMITTED compaction (new-style generations start at 2, so the
        name is unambiguous) — its fingerprints must keep gating."""
        append(spark, bd, [(1, 0, ALPHA), (2, 1, BETA)])
        bd.run_once()
        bd.compact_state()
        # rewrite the committed state as the legacy layout: rename the
        # sentinel partition to batch=-1 and drop the pointer file
        import os
        import shutil

        gen = live_sentinel_gen(spark, bd.filter_dir)
        shutil.move(
            f"{bd.filter_dir}/batch=-{gen}", f"{bd.filter_dir}/batch=-1"
        )
        os.remove(f"{bd.filter_dir}/{SENTINEL_POINTER}")
        assert live_sentinel_gen(spark, bd.filter_dir) == 1

        append(spark, bd, [(3, 10, ALPHA), (4, 11, GAMMA)])
        bd.run_once()
        assert {r["doc_id"] for r in bd.table().collect()} == {1, 2, 4}

        # compacting a legacy layout upgrades it to the pointer protocol
        bd.compact_state()
        assert live_sentinel_gen(spark, bd.filter_dir) == 2


class TestSignatureCompactionCrashSafety:
    def test_crash_before_flip_keeps_neardup_gating(
        self, spark, tmp_path, monkeypatch
    ):
        nd = StreamingNearDedup(
            spark,
            str(tmp_path / "staging"),
            SCHEMA,
            str(tmp_path / "kept"),
            str(tmp_path / "sigs"),
            str(tmp_path / "chk"),
            threshold=0.7,
            num_hashes=8,
            bands=4,
            shingle_n=3,
        )
        append(spark, nd, [(1, 0, ALPHA), (2, 1, BETA)])
        nd.run_once()
        # live rows before any compaction attempt (batch>=0 dirs only)
        before = sorted(
            tuple(r)
            for r in spark.read.parquet(nd.sig_dir).drop("batch").collect()
        )

        def boom(self, p, text):
            raise RuntimeError("simulated crash before pointer flip")

        monkeypatch.setattr(LocalFS, "write_text_atomic", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            nd.compact_state()
        monkeypatch.undo()
        assert live_sentinel_gen(spark, nd.sig_dir) == 0

        # near-dup of historical doc 1 still dropped; fresh doc kept
        append(
            spark, nd,
            [(3, 10, ALPHA + " indeed"), (4, 11, GAMMA)],
        )
        nd.run_once()
        assert {r["doc_id"] for r in nd.table().collect()} == {1, 2, 4}

        # retry converges: the orphan is overwritten, the live partitions
        # (original batches + this run's batch) fold in exactly once
        nd.compact_state()
        assert live_sentinel_gen(spark, nd.sig_dir) == 2
        after = sorted(
            tuple(r)
            for r in spark.read.parquet(nd.sig_dir).drop("batch").collect()
        )
        # the pre-crash rows survive verbatim, plus this run's survivors
        # (docs 3 dropped, 4 kept) — and no row appears twice
        assert [t for t in after if t[0] in (1, 2)] == before
        assert {t[0] for t in after} == {1, 2, 4}
        assert len(after) == len(set(after))
