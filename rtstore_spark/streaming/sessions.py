"""Streaming gap-based sessionization — a custom stateful operator on
``applyInPandasWithState``.

The batch inventory computes 30-minute-gap sessions with a lag window
(``q_user_sessions``); a live product-analytics plane needs the streaming
form: events arrive continuously, and a user's session must be EMITTED once
it is provably over — i.e. when the event-time watermark passes the
session's end + gap, so no in-flight event can extend it. That
close-on-quiescence semantics is not expressible with windowed aggregation
(session windows have data-driven, per-key extents), which is exactly the
case Structured Streaming's arbitrary-stateful API exists for.

Per-user state is one open session (start, end, count — 24 bytes); each
micro-batch folds the user's new events into it, emitting every session
that closes along the way, and an event-time timeout flushes the final open
session when the watermark passes ``end + gap``. State is bounded by the
number of concurrently-active users, not by history.

Late events beyond the watermark are dropped by the runtime before they
reach the operator (standard watermark contract). Late events *within* the
watermark that precede the open session's start extend it backwards when
they fall within the gap; further back than the gap they form their own
earlier session(s), matching the batch lag formulation. One bounded
deviation: such an earlier session is emitted as soon as it is seen
(single-session state), so an even-later arrival that would have joined
it starts a fresh session instead.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _make_handler(gap_us: int):
    def handle(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed end + gap: the open session is final
            if state.exists:
                closed.append(tuple(state.get))
            state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend(
                    int(v) for v in (pdf["ts"].astype("int64") // 1000)
                )  # ns → µs
            ts_sorted = sorted(ts_all)

            # Late-but-in-watermark events BEFORE the open session's start
            # get their own gap fold first: within gap of the open start
            # they bridge into it (extend backwards); separated by more
            # than gap they are their own earlier session — the previous
            # single-branch form merged them across the silence, producing
            # a session the batch formulation never emits. An early
            # session closed here is final; a still-later arrival that
            # would have joined it starts fresh (single-session state —
            # the watermark bounds this deviation).
            if cur is not None:
                early = [t for t in ts_sorted if t < cur[0]]
                ts_sorted = [t for t in ts_sorted if t >= cur[0]]
                ecur = None
                for t in early:
                    if ecur is None:
                        ecur = (t, t, 1)
                    elif t - ecur[1] > gap_us:
                        closed.append(ecur)
                        ecur = (t, t, 1)
                    else:
                        ecur = (ecur[0], t, ecur[2] + 1)
                if ecur is not None:
                    if cur[0] - ecur[1] <= gap_us:
                        cur = (ecur[0], cur[1], cur[2] + ecur[2])
                    else:
                        closed.append(ecur)

            for t in ts_sorted:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                # close when the watermark passes end + gap (ms API). If it
                # already has — other keys advanced the watermark past this
                # quiet user's horizon — the session is final NOW; Spark
                # rejects a timeout at/below the watermark, so emit instead
                # of registering one.
                to_ms = (cur[1] + gap_us) // 1000 + 1
                if to_ms <= state.getCurrentWatermarkMs():
                    closed.append(cur)
                    if state.exists:
                        state.remove()
                else:
                    state.update(cur)
                    state.setTimeoutTimestamp(to_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return handle


def sessionize_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Closed sessions per user: (user_id, session_start, session_end,
    n_events), emitted once unextendable. Input is a streaming DataFrame
    with an event-time column; the watermark bounds both lateness and
    state lifetime.

    Scale shape: the only exchange is the groupBy(user) hash partition the
    stateful operator requires — state and computation then stay
    partition-local forever (state store files live with the partition),
    which is how this holds up with hundreds of millions of users: no
    global ordering, no driver involvement, per-key state is O(1).
    """
    wm = stream.withWatermark(ts_col, watermark)
    # select off the watermarked frame (columns taken from the pre-watermark
    # one would silently drop the watermark tag)
    src = wm.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_handler(gap_minutes * 60_000_000),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class StreamingSessionizer:
    """File-source incarnation (same run_once shape as the other streaming
    surfaces): tail a staging directory of events, append closed sessions
    to ``dest_dir``. Open-session state persists in the checkpoint across
    calls."""

    def __init__(
        self,
        spark,
        source_dir: str,
        source_schema,
        dest_dir: str,
        checkpoint: str,
        ts_col: str = "ts",
        user_col: str = "user_id",
        gap_minutes: int = 30,
        watermark: str = "2 hours",
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.dest_dir = dest_dir
        self.checkpoint = checkpoint
        self.ts_col = ts_col
        self.user_col = user_col
        self.gap_minutes = gap_minutes
        self.watermark = watermark

    def run_once(self) -> None:
        src = self.spark.readStream.schema(self.source_schema).parquet(
            self.source_dir
        )
        out = sessionize_stream(
            src, self.ts_col, self.user_col, self.gap_minutes, self.watermark
        )
        q = (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", self.checkpoint)
            .option("path", self.dest_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table(self) -> DataFrame:
        from rtstore_spark.store.fs import read_parquet_or_empty

        return read_parquet_or_empty(self.spark, self.dest_dir, _OUT_SCHEMA)
