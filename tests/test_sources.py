"""Source-robustness coverage: malformed-record tolerance on the JSON scan
(a long-running ingest WILL see corrupt lines — one bad record must not
kill the job) and parquet schema evolution across batches (a column added
mid-stream must merge, with NULLs for older files)."""

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pinterest_data_pipeline218_spark.sources.batch import read_json_dir


def test_json_scan_tolerates_corrupt_records(spark, tmp_path):
    src = tmp_path / "json"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"ind": 1, "name": "ok"}\n'
        "{broken json!!\n"
        '{"ind": 2, "name": "also ok"}\n'
    )
    schema = StructType(
        [
            StructField("ind", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_json_dir(spark, str(src), schema=schema).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert {r.ind for r in good.collect()} == {1, 2}
        assert bad.count() == 1  # quarantined, not fatal
        assert "{broken" in bad.first()._corrupt_record
    finally:
        df.unpersist()


def test_parquet_schema_evolution_merges(spark, tmp_path):
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(out + "/b1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(out + "/b2")
    merged = (
        spark.read.option("mergeSchema", "true").parquet(out + "/b1", out + "/b2")
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}  # old files surface NULL for the new column
