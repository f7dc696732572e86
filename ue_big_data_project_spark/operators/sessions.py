"""Sessionization: gap-based session assignment, batch and streaming.

Batch form is pure window expressions (lag → gap flag → running sum —
the standard sessionize idiom, one shuffle on the user key). Streaming
form is a custom stateful operator via ``applyInPandasWithState``:
per-key state carries (last event time, session counter) across
micro-batches — the engine's example of the "operator Spark lacks"
escape hatch (SURVEY §7: compose built-ins first, Pandas-state UDF when
semantics genuinely need it). Both produce identical sessions for the
same bounded input (equivalence-tested).

Scale: state is one tuple per active user; with a watermark-driven
timeout, idle keys are evicted. The batch window shuffles once on
user_id and never materializes gaps driver-side.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)


def sessionize_batch(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    A new session starts at a user's first event or after a silence of
    more than ``gap_seconds``. ``session_idx`` is 1-based per user.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col))
    gap = F.unix_micros(ts_col) - F.unix_micros(F.lag(ts_col).over(w))
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    tagged = df.withColumn(
        "_sidx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    return (
        tagged.groupBy(user_col, "_sidx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min(ts_col)).alias("start_us"),
            F.unix_micros(F.max(ts_col)).alias("end_us"),
        )
        .select(
            F.col(user_col).alias("user_id"),
            F.col("_sidx").alias("session_idx"),
            "n_events",
            "start_us",
            "end_us",
        )
    )


_EMPTY_STATE = (None, 0, 0, None, None)


def _fold_sessions(user, ts_iter, state, gap_us):
    """The session-transition kernel shared by BOTH streaming APIs
    (``applyInPandasWithState`` and ``transformWithStateInPandas``):
    fold sorted event times into (closed session rows, new state).
    One implementation → the two operators cannot drift apart; the
    executing old-API equivalence tests pin this kernel end-to-end.
    """
    last_us, sidx, n, start_us, end_us = state
    closed = []
    for ts_us in ts_iter:
        ts_us = int(ts_us)
        if last_us is None or ts_us - last_us > gap_us:
            if sidx > 0:
                closed.append((user, sidx, n, start_us, end_us))
            sidx += 1
            n, start_us = 0, ts_us
        n += 1
        end_us = ts_us
        last_us = ts_us
    return closed, (last_us, sidx, n, start_us, end_us)


def sessionize_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming sessionization with explicit per-key state.

    ``applyInPandasWithState`` keyed by user: state = (last event epoch,
    current session index, open-session aggregates). Sessions CLOSE and
    emit when a later event arrives past the gap; the still-open session
    also emits each batch (complete-ish semantics) so a drained bounded
    replay reproduces the batch result exactly.

    State eviction: pass ``watermark`` (e.g. ``"1 hour"``) to enable
    event-time timeout eviction — REQUIRED on unbounded input, where
    NoTimeout state grows with every user ever seen. Once the watermark
    passes a key's ``last event + gap``, no in-watermark event can
    extend its open session, so the session is final: the timeout
    callback re-emits it (idempotent for the downstream final-emission
    reduce) and removes the key's state. Output on a drained bounded
    replay is identical with or without eviction.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    evict = watermark is not None
    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us"]

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if evict and state.hasTimedOut:
            rows = []
            if state.exists:
                last_us, sidx, n, start_us, end_us = state.get
                if sidx > 0:
                    rows = [(user, sidx, n, start_us, end_us)]
            state.remove()
            yield pd.DataFrame(rows, columns=cols)
            return
        cur = state.get if state.exists else _EMPTY_STATE
        ts_all = [pdf["_ts_us"] for pdf in pdfs]
        closed, cur = _fold_sessions(
            user,
            pd.concat(ts_all).sort_values() if ts_all else [],
            cur,
            gap_us,
        )
        last_us, sidx, n, start_us, end_us = cur
        state.update(cur)
        if evict and last_us is not None:
            # Fire once the watermark passes the point where the open
            # session could still be extended (ms, event-time clock).
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        open_row = [(user, sidx, n, start_us, end_us)] if sidx > 0 else []
        yield pd.DataFrame(closed + open_row, columns=cols)

    state_schema = (
        "last_us long, sidx int, n long, start_us long, end_us long"
    )
    if evict:
        df = df.withWatermark(ts_col, watermark)
    # The raw timestamp column only needs to reach the Python worker
    # when event-time timeouts are on; without eviction, shipping it
    # through Arrow per row would be pure transfer overhead.
    prepared = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        *([F.col(ts_col).alias("_event_ts")] if evict else []),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_stream_tws(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str | None = None,
) -> DataFrame:
    """The Spark-4 ``transformWithStateInPandas`` twin of
    :func:`sessionize_stream` — same session semantics, expressed in the
    newer arbitrary-state API: typed ``ValueState`` instead of a packed
    state tuple schema, explicit per-key TIMERS instead of
    ``GroupStateTimeout``, and a ``StatefulProcessor`` object whose
    ``handleExpiredTimer`` is the eviction path. Output on a drained
    bounded replay is identical to both the old API and the batch window
    form (equivalence-tested in tests/test_sessions.py).

    Scale shape is the same as the old-API form: one state entry per
    active user, timer-driven eviction once the watermark passes
    ``last event + gap``; transformWithState additionally gives each
    key independent state variables and timer multiplexing for free.

    Both APIs fold events through the SAME :func:`_fold_sessions`
    kernel, so the executing old-API equivalence tests pin this twin's
    semantics too. Runtime note: transformWithState's Python runner
    needs ``protobuf``, absent in this sandbox — the execution tests
    skip without it (environment-bound, like the Kafka connector), the
    kernel and wiring are tested regardless.
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_seconds * 1_000_000
    evict = watermark is not None
    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us"]

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # Unlike GroupState.setTimeoutTimestamp (which REPLACES the
            # key's timeout), transformWithState timers are ADDITIVE —
            # the state carries the live timer's expiry so each batch
            # can delete the superseded one, and the expiry callback can
            # ignore a stale fire that raced the delete.
            self._sess = handle.getValueState(
                "sess",
                "last_us long, sidx int, n long, start_us long, "
                "end_us long, timer_ms long",
            )

        def handleInputRows(
            self, key, rows, timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            (user,) = key
            if self._sess.exists():
                *cur, old_timer_ms = tuple(self._sess.get())
                cur = tuple(cur)
            else:
                cur, old_timer_ms = _EMPTY_STATE, None
            parts = [pdf["_ts_us"] for pdf in rows]
            closed, cur = _fold_sessions(
                user,
                pd.concat(parts).sort_values() if parts else [],
                cur,
                gap_us,
            )
            last_us, sidx, n, start_us, end_us = cur
            timer_ms = old_timer_ms
            if evict and last_us is not None:
                timer_ms = last_us // 1000 + gap_seconds * 1000
                if old_timer_ms is not None and old_timer_ms != timer_ms:
                    self._handle.deleteTimer(old_timer_ms)
                if old_timer_ms != timer_ms:
                    self._handle.registerTimer(timer_ms)
            self._sess.update(cur + (timer_ms,))
            open_row = [(user, sidx, n, start_us, end_us)] if sidx > 0 else []
            yield pd.DataFrame(closed + open_row, columns=cols)

        def handleExpiredTimer(
            self,
            key,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ) -> Iterator[pd.DataFrame]:
            (user,) = key
            out = []
            if self._sess.exists():
                last_us, sidx, n, start_us, end_us, timer_ms = (
                    self._sess.get()
                )
                if (
                    timer_ms is not None
                    and expiredTimerInfo.getExpiryTimeInMs() < timer_ms
                ):
                    # Stale timer from a superseded registration — the
                    # session was extended; the live timer is still
                    # pending. Emit nothing, keep state.
                    yield pd.DataFrame([], columns=cols)
                    return
                if sidx > 0:
                    out = [(user, sidx, n, start_us, end_us)]
                self._sess.clear()
            yield pd.DataFrame(out, columns=cols)

        def close(self) -> None:
            pass

    if evict:
        df = df.withWatermark(ts_col, watermark)
    prepared = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        *([F.col(ts_col).alias("_event_ts")] if evict else []),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="update",
        timeMode="eventTime" if evict else "none",
    )
