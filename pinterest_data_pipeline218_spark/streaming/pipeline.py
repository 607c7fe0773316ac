"""Structured Streaming: the reference's streaming ETL, Spark-first.

Reference path (Kinesis_Processing.ipynb): Kinesis stream → cast(data as
string) → from_json(explicit StructType) → flatten → the same cleaning
functions as batch → Delta append sink with checkpointing.

Local stand-in: the Kinesis connector is Databricks-proprietary, so the
unbounded source is a file stream with the identical downstream contract —
a `data: string` column holding one JSON record (Kinesis_Processing
.ipynb:712); everything after the source is the same code that would run
against Kafka/Kinesis (`spark.readStream.format("kafka")` swaps in with two
lines).

Deliberate fixes over the reference (SURVEY.md §7):
- one checkpoint directory **per query** (the reference reuses
  /tmp/kinesis/_checkpoints/ for all three streams — :1613-1617);
- cleaning is literally the batch combinator library
  (functions/cleaning.py), so batch/stream equivalence holds by
  construction *and* is asserted by test;
- watermarked event-time windowed aggregation is exposed (ST4) — the
  reference never aggregates on the stream.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.cleaning import clean_geo, clean_pin, clean_user
from ..schemas import GEO_RAW, PIN_RAW, USER_RAW

BLOB_SCHEMA = StructType([StructField("data", StringType())])

RAW_BY_TABLE = {"pin": PIN_RAW, "geo": GEO_RAW, "user": USER_RAW}
CLEANERS = {"pin": clean_pin, "geo": clean_geo, "user": clean_user}


def blob_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded source stand-in (S3): JSON-lines files, each line
    `{"data": "<json record>"}` — the Kinesis record-blob contract."""
    reader = spark.readStream.format("json").schema(BLOB_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


# The Kafka source's fixed wire schema (Spark docs, Structured Streaming +
# Kafka integration): every record arrives with these seven columns
# regardless of topic. Downstream code consumes only `value`.
KAFKA_WIRE_COLUMNS = (
    ("key", "binary"),
    ("value", "binary"),
    ("topic", "string"),
    ("partition", "int"),
    ("offset", "bigint"),
    ("timestamp", "timestamp"),
    ("timestampType", "int"),
)


def kafka_records_to_blob(records: DataFrame) -> DataFrame:
    """Kafka wire records → the `data: string` blob contract shared with the
    file stand-in (S7): cast the value bytes to string. Works identically on
    batch and streaming DataFrames, so the contract is testable without a
    broker."""
    return records.select(F.col("value").cast("string").alias("data"))


def kafka_blob_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The two-line Kafka swap for `blob_file_stream` (S7): same downstream
    contract (`data: string`), earliest-offset unbounded read (ST1).
    Requires the spark-sql-kafka connector package on the classpath."""
    records = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_records_to_blob(records)


def decode_blob(stream: DataFrame, schema: StructType) -> DataFrame:
    """cast → from_json(explicit schema) → flatten (S4,
    Kinesis_Processing.ipynb:702-713)."""
    return stream.select(
        F.from_json(F.col("data").cast("string"), schema).alias("our_data")
    ).select("our_data.*")


def decode_blob_with_quarantine(
    stream: DataFrame, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """decode_blob plus a corrupt-record quarantine — the production shape:
    under PERMISSIVE parsing `from_json` turns an unparseable blob into a
    struct of all-null fields, which a plain decode silently flattens into
    a row indistinguishable from valid-but-null data. Here the parse runs
    with `columnNameOfCorruptRecord` (the documented corrupt-record
    channel: the raw text lands in that field iff parsing failed) and the
    split is explicit:

    - good: rows whose blob parsed, flattened to the schema;
    - quarantine: rows whose blob failed to parse (reason
      ``malformed_json``, raw payload preserved) AND rows whose blob is
      NULL (reason ``null_payload``) — nothing is silently lost; route to
      a dead-letter sink and replay after a producer fix instead of
      polluting the table.

    Works identically on batch and streaming DataFrames (stateless
    filters), so the quarantine contract is testable batch-side and holds
    per micro-batch."""
    from pyspark.sql.types import StringType, StructField

    corrupt_col = "__corrupt_record"
    parse_schema = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    raw = F.col("data").cast("string")
    parsed = stream.select(
        raw.alias("__raw"),
        F.from_json(
            raw, parse_schema, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("our_data"),
    )
    bad_marker = F.col(f"our_data.{corrupt_col}")
    good = (
        parsed.filter(F.col("__raw").isNotNull() & bad_marker.isNull())
        .select("our_data.*")
        .drop(corrupt_col)
    )
    quarantine = parsed.filter(
        F.col("__raw").isNull() | bad_marker.isNotNull()
    ).select(
        F.col("__raw").alias("raw_payload"),
        F.when(F.col("__raw").isNull(), F.lit("null_payload"))
        .otherwise(F.lit("malformed_json"))
        .alias("reason"),
    )
    return good, quarantine


def cleaned_stream(spark: SparkSession, src_dir: str, table: str) -> DataFrame:
    """source → decode → the shared batch cleaning pipeline (ST2)."""
    raw = decode_blob(blob_file_stream(spark, src_dir), RAW_BY_TABLE[table])
    return CLEANERS[table](raw)


def write_append_stream(
    df: DataFrame,
    out_path: str,
    checkpoint_root: str,
    query_name: str,
    fmt: str = "parquet",
    available_now: bool = False,
) -> StreamingQuery:
    """Append-mode sink with a per-query checkpoint dir (S5/ST3, fixing the
    reference's shared-checkpoint bug).

    ``available_now=True`` uses Trigger.AvailableNow — process everything
    available then STOP, resuming from the checkpoint next invocation.
    This is how the reference's daily-Airflow cadence (dag/pipeline_dag.py)
    should drive a streaming pipeline: each scheduled run drains the
    backlog incrementally with streaming exactly-once semantics instead of
    re-reading the source or running a 24/7 cluster."""
    checkpoint = os.path.join(checkpoint_root, query_name)
    writer = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_table_etl(
    spark: SparkSession,
    src_dir: str,
    table: str,
    out_root: str,
) -> StreamingQuery:
    """End-to-end streaming ETL for one table: blob files → clean → parquet
    append. Mirrors Kinesis_Processing.ipynb cells 8→32."""
    df = cleaned_stream(spark, src_dir, table)
    return write_append_stream(
        df,
        out_path=os.path.join(out_root, f"{table}_table"),
        checkpoint_root=os.path.join(out_root, "_checkpoints"),
        query_name=f"{table}_etl",
    )


def dedup_stream(
    df: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop records whose `subset` key was already
    seen within the watermark horizon — the unbounded form of
    dedup_exact/dedup_compact_corpus. `dropDuplicatesWithinWatermark` keeps
    per-key state only until the watermark passes, so state size is bounded
    by the horizon's key cardinality, not the stream's lifetime (a plain
    dropDuplicates on a stream grows state forever)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(subset)


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming-aggregation
    extension (ST4). Works identically on batch DataFrames (the batch
    formulation is plans/events.ev_counts_hourly)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (sliding) windowed counts: each event lands in
    window/slide windows (4 here), the moving-average shape tumbling
    windows can't express. State per key is bounded by watermark/slide
    open windows; at scale the slide ratio is the state-size knob."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
