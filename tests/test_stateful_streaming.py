"""applyInPandasWithState sessionization: streamed closed sessions must
agree with the batch lag-window formulation over the same events."""

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pinterest_data_pipeline218_spark.data import load_table
from pinterest_data_pipeline218_spark.streaming.stateful import (
    SESSION_GAP_SECONDS,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"

EV_BLOB_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", StringType()),
        StructField("event_id", LongType()),
    ]
)


@pytest.fixture(scope="module")
def streamed_sessions(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("ev_blobs")
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"), "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    # three time-sliced files => in-order micro-batches. The file source
    # orders by MODIFICATION TIME, not name — files written within the same
    # clock tick can reorder batches (observed as a rare flake: late events
    # dropped at the watermark). Pin strictly increasing mtimes.
    import os
    import time

    third = (len(rows) + 2) // 3
    base = time.time() - 100
    for i in range(3):
        path = src / f"{i:03d}.jsonl"
        with open(path, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(json.dumps({"user_id": r.user_id, "ts": r.ts, "event_id": r.event_id}))
                f.write("\n")
        os.utime(path, (base + 10 * i, base + 10 * i))
    stream = (
        spark.readStream.format("json")
        .schema(EV_BLOB_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql("SELECT * FROM sessions").cache()


def _batch_closed_sessions(spark):
    """Oracle: lag-window sessionization; the final (still-open) session of
    each user is excluded — the stream hasn't timed it out."""
    ev = load_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_id"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(
                F.col("t") - F.lag("t").over(w) > SESSION_GAP_SECONDS, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last = sess.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    return sess.join(last, "user_id").filter(F.col("sess_id") != F.col("last_id"))


def test_streamed_sessions_match_batch(spark, streamed_sessions):
    batch = _batch_closed_sessions(spark)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in streamed_sessions.collect()
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch.collect()
    )
    assert got == want
    assert len(got) > 0


def test_sessions_respect_gap(streamed_sessions):
    rows = streamed_sessions.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r.session_start)
        for a, b in zip(sessions, sessions[1:]):
            assert b.session_start - a.session_end > SESSION_GAP_SECONDS


def test_streak_stream_equals_batch_on_closed_runs(spark, tmp_path):
    """The stateful streak detector must agree with the batch
    gaps-and-islands query on CLOSED runs — including a run that SPANS a
    micro-batch boundary (clicks in batch 0 continue in batch 1 before a
    non-click closes it: per-batch detection would see two short runs or
    none). Every user's stream ends with a non-click so all runs close."""
    import datetime
    import json
    import os
    import time

    from pinterest_data_pipeline218_spark.plans.events import click_streaks
    from pinterest_data_pipeline218_spark.streaming.stateful import streak_stream

    def t(minute):
        return datetime.datetime(2026, 3, 3, 10, minute)

    # (user, event_id, minute, type)
    evs = [
        # user 1: 2 clicks in batch0 + 2 clicks in batch1, closed by a view
        (1, 1, 0, "click"), (1, 2, 1, "click"),
        (1, 3, 2, "click"), (1, 4, 3, "click"), (1, 5, 4, "view"),
        # user 2: run of 2 only (below min_run=3), closed
        (2, 6, 0, "click"), (2, 7, 1, "click"), (2, 8, 2, "scroll"),
        # user 3: two separate runs of 3, both closed
        (3, 9, 0, "click"), (3, 10, 1, "click"), (3, 11, 2, "click"),
        (3, 12, 3, "view"),
        (3, 13, 4, "click"), (3, 14, 5, "click"), (3, 15, 6, "click"),
        (3, 16, 7, "view"),
    ]
    batches = [evs[:2] + evs[5:7] + evs[8:11], evs[2:5] + evs[7:8] + evs[11:]]
    src = tmp_path / "blobs"
    src.mkdir()
    base = time.time() - 100
    for i, rows in enumerate(batches):
        path = src / f"{i:03d}.jsonl"
        with open(path, "w") as f:
            for u, eid, m, ty in rows:
                f.write(json.dumps({
                    "user_id": u, "event_id": eid,
                    "ts": t(m).strftime("%Y-%m-%d %H:%M:%S"), "event_type": ty,
                }) + "\n")
        os.utime(path, (base + 10 * i, base + 10 * i))

    schema = ("user_id long, event_id long, ts string, event_type string")
    stream = (
        spark.readStream.format("json").schema(schema)
        .option("maxFilesPerTrigger", "1").load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        streak_stream(stream)
        .writeStream.format("memory").queryName("streaks")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.run_start, r.run_end, r.n_clicks)
        for r in spark.sql("SELECT * FROM streaks").collect()
    }

    batch_df = spark.createDataFrame(
        [(u, eid, t(m), ty) for u, eid, m, ty in evs],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    want = {
        (r.user_id, int(r.run_start.timestamp()), int(r.run_end.timestamp()),
         r.n_clicks)
        for r in click_streaks(batch_df).collect()
    }
    assert got == want
    # hand-pinned: user 1's single 4-click run spans the batch boundary
    assert (1, int(t(0).timestamp()), int(t(3).timestamp()), 4) in got
    assert not any(u == 2 for u, *_ in got)
    assert sum(1 for u, *_ in got if u == 3) == 2


def test_drift_stream_equals_batch(spark, tmp_path):
    """transformWithStateInPandas drift monitor (the Spark 4 typed-state
    API) must flag EXACTLY the events the batch prior-window query flags
    — including identical (n, s, q) running stats at flag time — when the
    same per-user-ordered events arrive split across three micro-batches.
    This pins both the operator semantics and the ValueState carry across
    batch boundaries.

    ENV GATE: Spark's transformWithState state-server protocol speaks
    protobuf from the Python side (pyspark/sql/streaming/proto/), and the
    `protobuf` wheel is not installed in this no-network container — the
    same artifact-blocked boundary as the Delta sink (COVERAGE.md §2.1).
    The operator's decision kernel and state carry are proven protocol-free
    in test_drift_processor_kernel_matches_batch below; this end-to-end
    wiring test runs wherever protobuf exists."""
    pytest.importorskip("google.protobuf")
    import os
    import time

    from pinterest_data_pipeline218_spark.plans.events import drift_flags
    from pinterest_data_pipeline218_spark.streaming.stateful import drift_stream

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", StringType()),
            StructField("event_id", LongType()),
            StructField("value", StringType()),
        ]
    )
    rows = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_id",
            F.col("value").cast("string").alias("value"),
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    src = tmp_path / "drift_blobs"
    src.mkdir()
    third = (len(rows) + 2) // 3
    base = time.time() - 100
    for i in range(3):
        path = src / f"{i:03d}.jsonl"
        with open(path, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(json.dumps(
                    {"user_id": r.user_id, "ts": r.ts,
                     "event_id": r.event_id, "value": r.value}) + "\n")
        os.utime(path, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("value", F.col("value").cast("double"))
    )
    q = (
        drift_stream(stream)
        .writeStream.format("memory")
        .queryName("drift_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.event_id, r.user_id, r.value_cents, r.n, r.s, r.q)
        for r in spark.sql("SELECT * FROM drift_out").collect()
    }
    want_src = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "ts",
                F.col("value").cast("string").cast("double").alias("value"))
    )
    want = {
        (r.event_id, r.user_id, r.value_cents, r.n, r.s, r.q)
        for r in drift_flags(want_src).collect()
    }
    assert len(want) > 0  # the dataset actually exercises the flag path
    assert got == want


def test_drift_processor_kernel_matches_batch(spark):
    """Protocol-free proof of the StatefulProcessor drift kernel: drive
    DriftProcessor.handleInputRows directly with pandas micro-batches and
    a fake ValueState (the same get/update surface the real handle
    serves), splitting each user's ordered events across three batches —
    the flags and their (n, s, q) running stats must equal the batch
    prior-window query exactly. This is everything the env-gated wiring
    test checks except the JVM<->Python state transport itself."""
    import pandas as pd

    from pinterest_data_pipeline218_spark.plans.events import drift_flags
    from pinterest_data_pipeline218_spark.streaming.stateful import DriftProcessor
    from pinterest_data_pipeline218_spark.plans.events import (
        DRIFT_MIN_PRIOR,
        DRIFT_SIGMAS,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "ts",
                F.expr("CAST(value * 100 AS BIGINT)").alias("v"))
        .orderBy("user_id", "ts", "event_id")
        .toPandas()
    )
    got = set()
    for user_id, grp in ev.groupby("user_id"):
        proc = DriftProcessor(DRIFT_MIN_PRIOR, DRIFT_SIGMAS)
        proc._stats = FakeValueState()
        third = (len(grp) + 2) // 3
        for i in range(3):
            batch = grp.iloc[i * third : (i + 1) * third]
            if len(batch) == 0:
                continue
            for out in proc.handleInputRows((user_id,), iter([batch]), None):
                got.update(
                    (int(r.event_id), int(r.user_id), int(r.value_cents),
                     int(r.n), int(r.s), int(r.q))
                    for r in out.itertuples()
                )
    want = {
        (r.event_id, r.user_id, r.value_cents, r.n, r.s, r.q)
        for r in drift_flags(load_table(spark, SF, "events")).collect()
    }
    assert len(want) > 0
    assert got == want


def test_scd2_stream_equals_batch_closed_intervals(spark, tmp_path):
    """The streaming SCD2 tracker must emit EXACTLY the batch query's
    CLOSED validity intervals (valid_to IS NOT NULL) — including runs that
    span micro-batch boundaries — when the same per-user-ordered events
    arrive in three time-sliced files. Open intervals stay in state, which
    is the streaming rendering of the batch query's NULL valid_to rows."""
    import os
    import time

    from pinterest_data_pipeline218_spark.plans.events import ev_scd2_band_history
    from pinterest_data_pipeline218_spark.streaming.stateful import scd2_stream

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", StringType()),
            StructField("event_id", LongType()),
            StructField("value", StringType()),
        ]
    )
    rows = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_id",
            F.col("value").cast("string").alias("value"),
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    src = tmp_path / "scd2_blobs"
    src.mkdir()
    third = (len(rows) + 2) // 3
    base = time.time() - 100
    for i in range(3):
        path = src / f"{i:03d}.jsonl"
        with open(path, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(json.dumps(
                    {"user_id": r.user_id, "ts": r.ts,
                     "event_id": r.event_id, "value": r.value}) + "\n")
        os.utime(path, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("value", F.col("value").cast("double"))
    )
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.user_id, r.band, r.valid_from, r.valid_to, r.n_events)
        for r in spark.sql("SELECT * FROM scd2_out").collect()
    }
    batch = ev_scd2_band_history(spark, SF)
    want = {
        (r.user_id, r.band, int(r.valid_from.timestamp()),
         int(r.valid_to.timestamp()), r.n_events)
        for r in batch.collect()
        if r.valid_to is not None
    }
    assert len(want) > 0
    assert got == want
