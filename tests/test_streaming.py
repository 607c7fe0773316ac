"""Streaming equivalence (SURVEY.md §5 plan item 3): the same records
through the blob file-stream → cleaning → append sink must materialize the
batch-cleaned tables exactly. Also exercises watermarked windowed counts."""

import pyspark.sql.functions as F
import pytest

from pinterest_data_pipeline218_spark.functions.cleaning import clean_geo, clean_pin, clean_user
from pinterest_data_pipeline218_spark.schemas import CLEAN_SCHEMAS
from pinterest_data_pipeline218_spark.sources.generator import (
    to_dataframes,
    write_blob_stream_files,
)
from pinterest_data_pipeline218_spark.streaming import pipeline as SP

from conftest import rows_set

N = 120
SEED = 77


@pytest.fixture(scope="module")
def stream_out(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("blob_src")
    out = tmp_path_factory.mktemp("stream_out")
    paths = write_blob_stream_files(str(src), n=N, seed=SEED)
    queries = [SP.run_table_etl(spark, paths[t], t, str(out)) for t in ("pin", "geo", "user")]
    for q in queries:
        q.processAllAvailable()
        q.stop()
    return out


def test_stream_equals_batch(spark, stream_out):
    pin_raw, geo_raw, user_raw = to_dataframes(spark, n=N, seed=SEED)
    batch = {
        "pin": clean_pin(pin_raw),
        "geo": clean_geo(geo_raw),
        "user": clean_user(user_raw),
    }
    for table, batch_df in batch.items():
        streamed = spark.read.schema(CLEAN_SCHEMAS[table]).parquet(
            str(stream_out / f"{table}_table")
        )
        assert streamed.columns == batch_df.columns, table
        assert rows_set(streamed) == rows_set(batch_df), table


def test_checkpoints_are_per_query(stream_out):
    cps = sorted(p.name for p in (stream_out / "_checkpoints").iterdir())
    assert cps == ["geo_etl", "pin_etl", "user_etl"]


def test_dedup_stream_drops_repeats_within_watermark(spark, tmp_path):
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = tmp_path / "dup_blobs"
    src.mkdir()
    # 3 micro-batches; content c1 repeats in every batch, c2 in two
    batches = [
        [(1, "c1", "2024-01-01 10:00:00"), (2, "c2", "2024-01-01 10:01:00")],
        [(3, "c1", "2024-01-01 10:05:00"), (4, "c3", "2024-01-01 10:06:00")],
        [(5, "c1", "2024-01-01 10:10:00"), (6, "c2", "2024-01-01 10:11:00")],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for rid, content, ts in rows:
                f.write(json.dumps({"rec_id": rid, "content": content, "ts": ts}) + "\n")
    schema = StructType(
        [
            StructField("rec_id", LongType()),
            StructField("content", StringType()),
            StructField("ts", StringType()),
        ]
    )
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        SP.dedup_stream(stream, ["content"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT content FROM dedup_out").collect()
    assert sorted(r.content for r in got) == ["c1", "c2", "c3"]


def test_windowed_counts_on_stream(spark, tmp_path):
    src = tmp_path / "blob"
    paths = write_blob_stream_files(str(src), n=60, seed=5)
    stream = SP.decode_blob(
        SP.blob_file_stream(spark, paths["geo"]), SP.RAW_BY_TABLE["geo"]
    ).withColumn("ts", F.to_timestamp("timestamp"))
    counts = SP.windowed_counts(stream, "ts", "country", window="30 days")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM win_counts")
    assert got.columns == ["window_start", "country", "n_events"]
    assert got.count() > 0
    # batch formulation over the same records must agree on totals
    # 60 base records + 3 injected edge rows with timestamps (the all-null
    # pollution row contributes no window)
    batch_total = got.agg(F.sum("n_events")).collect()[0][0]
    assert batch_total == 63
