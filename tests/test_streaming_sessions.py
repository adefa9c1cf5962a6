"""Stateful streaming sessionization (applyInPandasWithState): sessions
close exactly when unextendable — by an over-gap successor event or by the
watermark passing end + gap — and the closed set matches the batch
lag-window sessionization on the same events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.streaming.sessions import StreamingSessionizer

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def sz(spark, tmp_path):
    return StreamingSessionizer(
        spark,
        str(tmp_path / "staging"),
        SCHEMA,
        str(tmp_path / "sessions"),
        str(tmp_path / "chk"),
        gap_minutes=30,
        watermark="1 hour",
    )


def append(spark, sz, specs):
    data = [(u, T0 + dt.timedelta(minutes=m)) for u, m in specs]
    spark.createDataFrame(data, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(sz.source_dir)


def batch_sessions(spark, sz, gap_minutes=30):
    """The q_user_sessions lag formulation over everything staged so far."""
    ev = spark.read.schema(SCHEMA).parquet(sz.source_dir).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    g = ev.withColumn("prev_us", F.lag("ts_us").over(w))
    new_sess = F.when(
        F.col("prev_us").isNull()
        | (F.col("ts_us") - F.col("prev_us") > gap_minutes * 60_000_000),
        1,
    ).otherwise(0)
    return {
        r["user_id"]: r["n"]
        for r in g.groupBy("user_id")
        .agg(F.sum(new_sess).alias("n"))
        .collect()
    }


def collect(sz):
    return [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sz.table().collect()
    ]


def test_gap_closes_session_midstream(spark, sz):
    # user 1: events at 0,10 then a 90-min silence then 100 — two sessions;
    # the second stays open (watermark hasn't passed its end + gap)
    append(spark, sz, [(1, 0), (1, 10), (1, 100), (1, 105)])
    sz.run_once()
    got = collect(sz)
    assert got == [(1, T0, T0 + dt.timedelta(minutes=10), 2)]


def test_timeout_flushes_quiet_user(spark, sz):
    append(spark, sz, [(1, 0), (1, 5)])
    sz.run_once()
    assert collect(sz) == []  # still open: nothing has advanced time
    # another user's event advances the watermark (max 600 - 60 = 540min)
    # far past user 1's end + gap → the timeout fires next trigger
    append(spark, sz, [(2, 600)])
    sz.run_once()
    got = collect(sz)
    assert (1, T0, T0 + dt.timedelta(minutes=5), 2) in got
    assert len(got) == 1  # user 2's own session still open


def test_cross_batch_extension_then_close(spark, sz):
    append(spark, sz, [(1, 0)])
    sz.run_once()
    append(spark, sz, [(1, 20)])  # within gap: extends, does not close
    sz.run_once()
    assert collect(sz) == []
    append(spark, sz, [(1, 300)])  # 280-min silence: closes first session
    sz.run_once()
    got = collect(sz)
    assert got == [(1, T0, T0 + dt.timedelta(minutes=20), 2)]


def test_session_counts_match_batch_formulation(spark, sz):
    """After the watermark passes everything, closed-session counts per
    user equal the batch lag-window sessionization."""
    specs = [
        (1, 0), (1, 10), (1, 50), (1, 200), (1, 210),
        (2, 5), (2, 100),
        (3, 0),
    ]
    append(spark, sz, specs)
    sz.run_once()
    # flush: a sentinel user far in the future closes everything
    append(spark, sz, [(99, 2000)])
    sz.run_once()
    sz.run_once()  # one more trigger so registered timeouts fire
    want = batch_sessions(spark, sz)
    got: dict[int, int] = {}
    n_events: dict[int, int] = {}
    for u, _s, _e, n in collect(sz):
        got[u] = got.get(u, 0) + 1
        n_events[u] = n_events.get(u, 0) + n
    for u in (1, 2, 3):
        assert got[u] == want[u], (u, got, want)
    # every event landed in exactly one closed session
    assert n_events[1] == 5 and n_events[2] == 2 and n_events[3] == 1


def test_late_event_beyond_gap_forms_own_session(spark, sz):
    """A late-but-in-watermark event more than a gap BEFORE the open
    session's start is its own earlier session — merging it across the
    silence (the old single-branch behavior) invents a session the batch
    formulation never produces."""
    append(spark, sz, [(1, 200), (1, 210)])
    sz.run_once()
    # watermark is now 210 - 60 = 150; a 160-min event is late but admissible,
    # and 40 min before the open start (> 30-min gap) → own session, final now
    append(spark, sz, [(1, 160)])
    sz.run_once()
    m160 = T0 + dt.timedelta(minutes=160)
    assert (1, m160, m160, 1) in collect(sz)
    # flush the open session and check the full picture matches batch
    append(spark, sz, [(99, 2000)])
    sz.run_once()
    sz.run_once()
    got = [g for g in collect(sz) if g[0] == 1]
    assert (1, T0 + dt.timedelta(minutes=200), T0 + dt.timedelta(minutes=210), 2) in got
    assert len(got) == 2
    assert batch_sessions(spark, sz)[1] == 2


def test_late_event_within_gap_bridges_backwards(spark, sz):
    """A late event within the gap of the open start extends it backwards
    (and its count) — the complementary case to the split above."""
    append(spark, sz, [(1, 200), (1, 210)])
    sz.run_once()
    append(spark, sz, [(1, 180)])  # 20 min before start: bridges
    sz.run_once()
    append(spark, sz, [(99, 2000)])
    sz.run_once()
    sz.run_once()
    got = [g for g in collect(sz) if g[0] == 1]
    assert got == [
        (1, T0 + dt.timedelta(minutes=180), T0 + dt.timedelta(minutes=210), 3)
    ]
