"""Explicit StructType contracts for the pin / geo / user tables.

The reference declares schemas only on its streaming path
(Kinesis_Processing.ipynb:676-699: struct_pin 12 fields, struct_user 5,
struct_geo 5) and lets batch JSON inference guess (BatchProcessingFinal
.ipynb:700-701). We fix the drift deliberately (SURVEY.md §7 hard parts):

- `age` is StringType in the reference's stream schema but numeric under
  batch inference → raw schema keeps string (superset), cleaning casts int.
- lat/long were FloatType → DoubleType internally (JSON inference produces
  double anyway; avoids float/double mismatch between paths).
- `index` (pin) vs `ind` (geo/user) naming drift is preserved raw and
  normalized by cleaning (BatchProcessingFinal.ipynb:1285).

Explicit schemas also kill per-run JSON inference cost — at 100 TB a
schema-inference pass is a full extra read of the dataset.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---- raw (pre-cleaning) schemas; field sets per README.md:13-52 ----

PIN_RAW = StructType(
    [
        StructField("index", IntegerType()),
        StructField("unique_id", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("poster_name", StringType()),
        StructField("follower_count", StringType()),  # "25k", "1M", sentinels
        StructField("tag_list", StringType()),
        StructField("is_image_or_video", StringType()),
        StructField("image_src", StringType()),
        StructField("downloaded", IntegerType()),
        StructField("save_location", StringType()),
        StructField("category", StringType()),
    ]
)

GEO_RAW = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("timestamp", StringType()),  # "yyyy-MM-dd HH:mm:ss"
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("country", StringType()),
    ]
)

USER_RAW = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("age", StringType()),  # string on stream path, numeric in batch
        StructField("date_joined", StringType()),
    ]
)

# ---- cleaned contracts (column order mandated by the reference's final
#      selects: BatchProcessingFinal.ipynb:1286,1400,1489) ----

PIN_CLEAN = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("unique_id", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("follower_count", IntegerType()),
        StructField("poster_name", StringType()),
        StructField("tag_list", StringType()),
        StructField("is_image_or_video", StringType()),
        StructField("image_src", StringType()),
        StructField("save_location", StringType()),
        StructField("category", StringType()),
    ]
)

GEO_CLEAN = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("country", StringType()),
        StructField("coordinates", ArrayType(DoubleType())),
        StructField("timestamp", TimestampType()),
    ]
)

USER_CLEAN = StructType(
    [
        StructField("ind", IntegerType()),
        StructField("user_name", StringType()),
        StructField("age", IntegerType()),
        StructField("date_joined", TimestampType()),
    ]
)

RAW_SCHEMAS = {"pin": PIN_RAW, "geo": GEO_RAW, "user": USER_RAW}
CLEAN_SCHEMAS = {"pin": PIN_CLEAN, "geo": GEO_CLEAN, "user": USER_CLEAN}
