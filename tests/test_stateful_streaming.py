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
