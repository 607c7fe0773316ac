"""Custom stateful streaming operator: gap sessionization via
applyInPandasWithState.

The batch formulation (plans/events.ev_sessions_per_user) is a lag-window;
on an unbounded stream the same semantics need per-key state that survives
micro-batches. This is the engine's template for custom stateful operators
(SURVEY.md ST4 extension): grouped Arrow batches in, Arrow batches out,
explicit state schema, explicit timeout handling — no driver-side state, no
row-at-a-time Python.

Ordering contract: per-key event-time order across micro-batches (the
per-shard/per-partition ordering Kinesis and Kafka provide, which is the
reference's transport; within a batch we sort). Out-of-order streams would
instead buffer in state until the watermark passes — same plumbing, bigger
state.

Scale notes: state is 3 longs per open session per active user (flat
struct, not a row buffer); the shuffle is the groupBy(user_id) exchange
that any per-user operator needs; emission is append-mode (closed sessions
are immutable facts). Timeout closes idle sessions so state size tracks
*active* users, not all users ever seen.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..plans.events import SESSION_GAP_SECONDS  # one gap for batch & stream

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

# open session carried between micro-batches: (start, last_seen, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_fn(gap_seconds: int, idle_timeout: bool = False):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # idle user: close and emit the open session, drop the state
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            open_sess = state.get if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True)
            # datetime64[s] first: resolution-safe (raw int64 of a
            # datetime64 column is unit-dependent — us vs ns would silently
            # scale every gap by 1000)
            ts = rows["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            ts.sort()
            for t in ts:
                t = int(t)
                if open_sess is None:
                    open_sess = (t, t, 1)
                elif t - open_sess[1] > gap_seconds:
                    closed.append(open_sess)
                    open_sess = (t, t, 1)
                else:
                    open_sess = (open_sess[0], t, open_sess[2] + 1)
            if open_sess is not None:
                state.update(open_sess)
                if idle_timeout:
                    state.setTimeoutDuration(gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    idle_timeout: bool = False,
) -> DataFrame:
    """events (user_id, ts, ...) → closed sessions (append-mode).

    `idle_timeout=True` arms a processing-time timeout that force-closes a
    user's open session after `gap_seconds` of wall-clock silence — the
    production liveness mode, where state size tracks active users. Two
    caveats: (a) wall-clock closure is a liveness mechanism, not event-time
    semantics — under consumer lag or backfill a session whose *event-time*
    gap is small can be split because the *arrival* gap exceeded the
    timeout (an EventTimeTimeout keyed to the watermark preserves event-time
    exactly, at the cost of state lingering until the watermark advances);
    (b) it is off by default because with timeouts armed every empty
    micro-batch can fire more timeouts, so `processAllAvailable()` (tests,
    batch-drain usage) need not quiesce.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds, idle_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


# ------------------------------------------------- streak (run) detection
# Second custom stateful operator: maximal consecutive-click runs per user
# (the batch twin is plans/events.click_streaks, the gaps-and-islands gated
# query). A run survives micro-batch boundaries in state and closes when a
# non-click event arrives; closed runs of length >= min_run emit. Same
# ordering contract and state discipline as sessionization: per-key
# event-time order across batches (within a batch we sort by (ts,
# event_id)), flat 3-long state per user, append-mode emission.

STREAK_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("run_start", LongType()),  # epoch seconds
        StructField("run_end", LongType()),
        StructField("n_clicks", LongType()),
    ]
)

STREAK_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _streak_fn(min_run: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        run = state.get if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts = rows["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        is_click = (rows["event_type"] == "click").to_numpy()
        for t, c in zip(ts, is_click):
            t = int(t)
            if c:
                run = (t, t, 1) if run is None else (run[0], t, run[2] + 1)
            else:
                if run is not None and run[2] >= min_run:
                    closed.append(run)
                run = None
        if run is not None:
            state.update(run)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "run_start": [c[0] for c in closed],
                    "run_end": [c[1] for c in closed],
                    "n_clicks": [c[2] for c in closed],
                }
            )

    return fn


def streak_stream(events: DataFrame, min_run: int | None = None) -> DataFrame:
    """events (user_id, event_id, ts, event_type) → closed click runs of
    length >= min_run (append-mode). Runs still open at end of stream
    stay in state (an unbroken run is not yet a fact); pytest proves
    closed-run equality with the batch gaps-and-islands query when every
    user's stream ends with a non-click."""
    from ..plans.events import STREAK_MIN_RUN

    return events.groupBy("user_id").applyInPandasWithState(
        _streak_fn(min_run or STREAK_MIN_RUN),
        outputStructType=STREAK_SCHEMA,
        stateStructType=STREAK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --------------------------------------------- per-user drift monitoring
# Third custom stateful operator, and the template for Spark 4's NEW
# typed-state API (transformWithStateInPandas / StatefulProcessor): the
# streaming twin of plans/events.ev_user_value_drift. State per user is a
# single typed ValueState of three BIGINTs (n, s, q) — the prior-only
# running count / sum / sum-of-squares in integer cents; each incoming
# event is tested against the PRIOR state with the division-free squared
# sigma identity, then folded in. Versus applyInPandasWithState, the
# StatefulProcessor surface gives named typed state variables (RocksDB
# column families at scale), optional TTL, and timers — this operator
# uses the minimal profile (one ValueState, no timers, timeMode "none"),
# establishing the plumbing the richer modes share.
#
# Ordering contract: same as sessionize/streak — per-key event-time order
# across micro-batches; within a batch we sort by (ts, event_id).
# Batch == stream over arbitrary micro-batch splits is pytest-proved
# (test_drift_stream_equals_batch).

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

DRIFT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value_cents", LongType()),
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("q", LongType()),
    ]
)


class DriftProcessor(StatefulProcessor):
    """Flag events > DRIFT_SIGMAS from the user's own running history."""

    def __init__(self, min_prior: int, sigmas: int):
        self._min_prior = min_prior
        self._k2 = sigmas * sigmas

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", "n BIGINT, s BIGINT, q BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        st = self._stats.get()
        n, s, q = (int(st[0]), int(st[1]), int(st[2])) if st is not None else (0, 0, 0)
        df = pd.concat(list(rows), ignore_index=True).sort_values(["ts", "event_id"])
        out: list[tuple[int, int, int, int, int, int]] = []
        for eid, v in zip(df["event_id"], df["v"]):
            eid, v = int(eid), int(v)
            if n >= self._min_prior and (n * v - s) ** 2 > self._k2 * (n * q - s * s):
                out.append((eid, user_id, v, n, s, q))
            n, s, q = n + 1, s + v, q + v * v
        self._stats.update((n, s, q))
        if out:
            yield pd.DataFrame(
                {
                    "event_id": [o[0] for o in out],
                    "user_id": [o[1] for o in out],
                    "value_cents": [o[2] for o in out],
                    "n": [o[3] for o in out],
                    "s": [o[4] for o in out],
                    "q": [o[5] for o in out],
                }
            )

    def close(self) -> None:
        pass


def drift_stream(events: DataFrame) -> DataFrame:
    """events (user_id, event_id, ts, value) → flagged drift events
    (append-mode), via the Spark 4 typed-state operator. The value→cents
    cast is the same expression as the batch query's."""
    from ..plans.events import DRIFT_MIN_PRIOR, DRIFT_SIGMAS

    prepared = events.select(
        "user_id", "event_id", "ts", F.expr("CAST(value * 100 AS BIGINT)").alias("v")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DriftProcessor(DRIFT_MIN_PRIOR, DRIFT_SIGMAS),
        outputStructType=DRIFT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ------------------------------------------------ SCD2 interval tracking
# Fourth custom stateful operator: the streaming twin of
# plans/events.ev_scd2_band_history. State per user is the OPEN validity
# interval (band, valid_from, n_events); a band change closes it (emit:
# closed intervals are immutable facts — append mode) and opens the next.
# Open intervals stay in state — the stream cannot know valid_to yet —
# exactly the NULL-valid_to rows of the batch query. Same ordering
# contract as the other stateful ops.

SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("band", StringType()),
        StructField("valid_from", LongType()),  # epoch seconds
        StructField("valid_to", LongType()),
        StructField("n_events", LongType()),
    ]
)

SCD2_STATE_SCHEMA = StructType(
    [
        StructField("band", StringType()),
        StructField("valid_from", LongType()),
        StructField("n", LongType()),
    ]
)


def _scd2_fn():
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        open_iv = state.get if state.exists else None  # (band, from, n)
        closed: list[tuple[str, int, int, int]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts = rows["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        for t, band in zip(ts, rows["band"]):
            t, band = int(t), str(band)
            if open_iv is None:
                open_iv = (band, t, 1)
            elif band == open_iv[0]:
                open_iv = (open_iv[0], open_iv[1], open_iv[2] + 1)
            else:
                closed.append((open_iv[0], open_iv[1], t, open_iv[2]))
                open_iv = (band, t, 1)
        if open_iv is not None:
            state.update(open_iv)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "band": [c[0] for c in closed],
                    "valid_from": [c[1] for c in closed],
                    "valid_to": [c[2] for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def scd2_stream(events: DataFrame) -> DataFrame:
    """events (user_id, event_id, ts, value) → CLOSED SCD2 validity
    intervals of the value band (append-mode). The band expression is the
    batch query's, verbatim; pytest proves closed-interval equality with
    ev_scd2_band_history's valid_to IS NOT NULL rows over micro-batch
    splits that land inside runs."""
    banded = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("value") < 20, "low")
        .when(F.col("value") < 55, "mid")
        .otherwise("high")
        .alias("band"),
    )
    return banded.groupBy("user_id").applyInPandasWithState(
        _scd2_fn(),
        outputStructType=SCD2_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
