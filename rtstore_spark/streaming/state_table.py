"""Generation-pointered compaction for per-batch streaming state tables.

The streaming dedup surfaces (``dedup_stream``, ``neardup_stream``,
``corpus_stream``) keep their cross-batch state — Bloom filter words,
minhash signature rows — as a parquet table partitioned by micro-batch id
(``batch=<id>/``). Long-lived streams compact those partitions into one;
round 5 did that with a plain ``overwrite`` of a ``batch=-1`` sentinel,
which carried a "crash during compaction ⇒ full state rebuild" contract:
a torn sentinel overwrite silently loses Bloom words (false negatives —
the one failure mode a dedup gate must never have) because the previous
sentinel's content exists nowhere else.

This module upgrades the sentinel to the same manifest-pointer protocol
every other cross-run state mutation in the engine already uses
(``store/fs.py`` generation dirs, ``write_pq_index``,
``save_seen_filter``): each compaction writes a FRESH sentinel partition
``batch=-<gen>`` and then atomically overwrites the tiny
``_compacted`` pointer file (underscore-prefixed, so Spark's partition
discovery ignores it). Readers take live rows as

    (batch == -live_gen) OR (batch >= 0 [AND batch != replaying_batch])

so an orphan sentinel a crashed compaction left behind is invisible (the
pointer still names the old generation, whose partition is untouched),
and a crash after the flip but before the stale-directory sweep only
double-includes rows that were just folded — harmless for a Bloom OR and
for signature candidates (consumers collapse duplicates) — until the
next compaction retries the sweep. Answers are unchanged in every crash
window; no rebuild contract remains.

Legacy layout (a ``batch=-1`` sentinel with no pointer file, written by
a round-5 compaction) reads as generation 1; new-style generations start
at 2 so that name stays unambiguous — a pointer-less ``batch=-1`` is
always a committed legacy sentinel, never a torn new-style write.

The checkpoint-reset caveat is protocol-independent and stays: after any
compaction, resetting the STREAMING checkpoint demands clearing state +
dest (a replayed batch 0 can no longer self-exclude fingerprints folded
into a sentinel, and would wrongly drop its own documents).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SENTINEL_POINTER = "_compacted"


def live_sentinel_gen(spark, state_dir: str) -> int:
    """Generation number of the live compacted sentinel (its partition is
    ``batch=-gen``); 0 when never compacted. A pre-pointer ``batch=-1``
    directory reads as generation 1."""
    from rtstore_spark.store.fs import fs_for

    fs = fs_for(state_dir, spark)
    txt = fs.read_text(f"{state_dir}/{SENTINEL_POINTER}")
    if txt is not None:
        return int(txt.strip())
    return 1 if fs.exists(f"{state_dir}/batch=-1") else 0


def live_state_filter(gen: int, exclude_batch: int | None = None) -> Column:
    """Partition predicate selecting the LIVE state rows: the committed
    sentinel generation plus every per-batch partition (micro-batch ids
    are never negative), minus the optionally self-excluded replaying
    batch. Orphan sentinels from crashed compactions never match."""
    live = F.col("batch") >= 0
    if exclude_batch is not None:
        live = live & (F.col("batch") != exclude_batch)
    if gen > 0:
        live = live | (F.col("batch") == -gen)
    return live


def compact_state_partitions(
    spark,
    state_dir: str,
    merge_fn: Callable[[DataFrame], DataFrame],
) -> None:
    """The shared compaction protocol: fold the live state rows through
    ``merge_fn`` (Bloom OR-merge, or identity for signature rows) into a
    fresh sentinel generation, flip the pointer, sweep stale partitions.
    No-op when only the live sentinel exists. Single writer, like every
    pointer mutation in the engine; run between clean ``run_once`` calls.
    """
    from rtstore_spark.store.fs import fs_for

    fs = fs_for(state_dir, spark)
    if not fs.exists(state_dir):
        return
    gen = live_sentinel_gen(spark, state_dir)
    stale = [
        p
        for p in fs.listdir(state_dir)
        if p.startswith("batch=") and p != f"batch=-{gen}"
    ]
    if not stale and gen > 0:
        return  # nothing but the committed sentinel: already compact
    if not stale and gen == 0:
        return  # empty state dir
    live = (
        spark.read.parquet(state_dir)
        .filter(live_state_filter(gen))
        .drop("batch")
    )
    # localCheckpoint materializes the fold BEFORE any write: the plan
    # reads the current sentinel partition, and a lazy plan must not race
    # the sweep of the directories it reads from
    merged = merge_fn(live).coalesce(1).localCheckpoint()
    # generations START AT 2: ``batch=-1`` is reserved for the legacy
    # (pointer-less) layout, so a pointer-less ``batch=-1`` on disk always
    # means a COMMITTED round-5 compaction — never a torn new-style first
    # compaction that crashed before its pointer flip
    new_gen = max(gen + 1, 2)
    merged.write.mode("overwrite").parquet(f"{state_dir}/batch=-{new_gen}")
    fs.write_text_atomic(f"{state_dir}/{SENTINEL_POINTER}", str(new_gen))
    # sweep everything the new sentinel supersedes — the old sentinel and
    # every folded batch partition. Crash mid-sweep: leftovers are
    # double-included (harmless) until the next compaction retries.
    for p in fs.listdir(state_dir):
        if p.startswith("batch=") and p != f"batch=-{new_gen}":
            fs.delete(f"{state_dir}/{p}", recursive=True)
