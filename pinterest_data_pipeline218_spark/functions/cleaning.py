"""Cleaning combinator library — pure DataFrame→DataFrame functions.

Re-expresses the reference's cleaning pipeline (Tasks 1-3) as a library of
combinators shared verbatim by the batch and streaming paths — the
reference's own key design point (Kinesis_Processing.ipynb cells 19-26 apply
the batch notebook's functions to streaming DataFrames unchanged).

Reference parity map (SURVEY.md §2.2):
- null_out_like           ← clean_column        (BatchProcessingFinal.ipynb:1003-1017, P7)
- replace_regex           ← clean_column_regex  (BatchProcessingFinal.ipynb:1130-1148, P8)
- empty_to_null           ← the intended cell-51 sweep, implemented correctly (P14)
- expand_count_suffixes   ← k/M regexp_replace + int cast (:1219-1222, P8+P9),
                            numeric by default ("1.5k"→1500; the reference's
                            string replace corrupts decimals), compat flag
                            reproduces the reference byte-for-byte
- drop_all_null_rows      ← dropna(how='all', subset) (Kinesis_Processing.ipynb:848-849, P13)
- age_group               ← CASE WHEN buckets (:5947-5956, P15)
- clean_pin/geo/user      ← Tasks 1/2/3 end-to-end (cells 18-27)

Everything is built-in-function composition — zero Python UDFs — so each
combinator stays inside whole-stage codegen and pipelines into the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Sentinel garbage patterns discovered by the reference's profiling
# (applications at BatchProcessingFinal.ipynb:1031-1039).
PIN_NULL_PATTERNS: dict[str, str] = {
    "description": "No description available%",
    "follower_count": "User Info Error%",
    "image_src": "Image src error%",
    "poster_name": "User Info Error%",
    "tag_list": "N,o, ,T,a,g,s,%",
    "title": "No Title Data%",
}

SAVE_LOCATION_PREFIX = "Local save in "


def null_out_like(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """Overwrite values matching a LIKE pattern with NULL (P7)."""
    c = F.col(column)
    return df.withColumn(column, F.when(c.like(pattern), F.lit(None)).otherwise(c))


def null_out_all_sentinels(df: DataFrame, patterns: dict[str, str] | None = None) -> DataFrame:
    for column, pattern in (patterns or PIN_NULL_PATTERNS).items():
        df = null_out_like(df, column, pattern)
    return df


def replace_regex(df: DataFrame, column: str, regex: str, replacement: str) -> DataFrame:
    """regexp_replace a column in place (P8)."""
    return df.withColumn(column, F.regexp_replace(F.col(column), regex, replacement))


def empty_to_null(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """'' → NULL sweep over string columns — the reference's cell-51 intent,
    implemented with the `.otherwise` the reference forgot (P14)."""
    targets = columns or [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    for column in targets:
        c = F.col(column)
        df = df.withColumn(column, F.when(c == "", F.lit(None)).otherwise(c))
    return df


def expand_count_suffixes(df: DataFrame, column: str, compat: bool = False) -> DataFrame:
    """Expand k/M suffixes in a count column and cast to int (P8+P9).

    compat=False (default): numeric — "1.5k" → 1500, "25k" → 25000, "1M" →
    1000000; non-numeric leftovers become NULL via the cast.
    compat=True: the reference's literal string replacement
    (regexp_replace '[kK]'→'000', '[mM]'→'000000',
    BatchProcessingFinal.ipynb:1219-1221), which corrupts decimal values —
    kept only to reproduce reference outputs bit-for-bit.
    """
    c = F.col(column)
    if compat:
        expanded = F.regexp_replace(F.regexp_replace(c, "[kK]", "000"), "[mM]", "000000")
        # lenient cast (Spark-3-era semantics the reference ran under):
        # malformed → NULL, not an ANSI error
        return df.withColumn(column, expanded.try_cast("int"))
    num = F.regexp_extract(c, r"^([0-9]+\.?[0-9]*)", 1)
    suffix = F.upper(F.regexp_extract(c, r"([kKmM])$", 1))
    multiplier = (
        F.when(suffix == "K", F.lit(1_000.0))
        .when(suffix == "M", F.lit(1_000_000.0))
        .otherwise(F.lit(1.0))
    )
    # try_cast: int overflow ("2148M") and any residual malformation become
    # NULL instead of an ANSI runtime error — one bad record must not kill a
    # 100 TB job (hypothesis-found edge case, tests/test_properties.py)
    value = F.when(num == "", F.lit(None)).otherwise(
        (num.cast("double") * multiplier).try_cast("int")
    )
    return df.withColumn(column, value)


def strip_prefix(df: DataFrame, column: str, prefix: str) -> DataFrame:
    """Remove a literal prefix (save_location 'Local save in ' pollution,
    BatchProcessingFinal.ipynb:1219)."""
    escaped = "".join("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch for ch in prefix)
    return replace_regex(df, column, f"^{escaped}", "")


def cast_column(df: DataFrame, column: str, dtype: str) -> DataFrame:
    """Lenient cast: malformed values → NULL (the reference ran pre-ANSI
    Spark 3; under Spark 4 ANSI a plain cast would throw instead)."""
    return df.withColumn(column, F.col(column).try_cast(dtype))


def to_timestamp_column(df: DataFrame, column: str) -> DataFrame:
    """String "yyyy-MM-dd HH:mm:ss" → TimestampType (P10). try_to_timestamp:
    an unparseable timestamp becomes NULL instead of throwing — on the
    streaming path a single malformed record must not terminate the query."""
    return df.withColumn(column, F.try_to_timestamp(F.col(column)))


def drop_all_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Drop rows where *all* of subset are null — the Kinesis cross-stream
    pollution filter (P13)."""
    return df.na.drop(how="all", subset=list(subset))


def age_group(col: Column) -> Column:
    """The reference's age buckets (BatchProcessingFinal.ipynb:5947-5956):
    18-24 / 25-35 / 36-50 / +50, anything else (incl. <18) NULL."""
    return (
        F.when(col.between(18, 24), "18-24")
        .when(col.between(25, 35), "25-35")
        .when(col.between(36, 50), "36-50")
        .when(col > 50, "+50")
        .otherwise(F.lit(None))
    )


AGE_GROUP_SQL = (
    "CASE WHEN age BETWEEN 18 AND 24 THEN '18-24' "
    "WHEN age BETWEEN 25 AND 35 THEN '25-35' "
    "WHEN age BETWEEN 36 AND 50 THEN '36-50' "
    "WHEN age > 50 THEN '+50' ELSE NULL END"
)


# ---- the three declared table pipelines (Tasks 1-3) ----


def clean_pin(df: DataFrame, compat_suffixes: bool = False) -> DataFrame:
    """Task 1 (BatchProcessingFinal.ipynb cells 18-22): sentinel null-out,
    suffix expansion, save_location prefix strip, index→ind rename, column
    contract projection."""
    df = drop_all_null_rows(df, [c for c in df.columns if c != "index"])
    df = empty_to_null(df)
    df = null_out_all_sentinels(df)
    df = expand_count_suffixes(df, "follower_count", compat=compat_suffixes)
    df = strip_prefix(df, "save_location", SAVE_LOCATION_PREFIX)
    df = df.withColumnRenamed("index", "ind")
    return df.select(
        "ind",
        "unique_id",
        "title",
        "description",
        "follower_count",
        "poster_name",
        "tag_list",
        "is_image_or_video",
        "image_src",
        "save_location",
        "category",
    )


def clean_geo(df: DataFrame) -> DataFrame:
    """Task 2 (cell 25): coordinates array, timestamp parse, contract."""
    df = drop_all_null_rows(df, [c for c in df.columns if c != "ind"])
    df = to_timestamp_column(df, "timestamp")
    return df.select(
        "ind",
        "country",
        F.array(F.col("latitude").cast("double"), F.col("longitude").cast("double")).alias(
            "coordinates"
        ),
        "timestamp",
    )


def clean_user(df: DataFrame) -> DataFrame:
    """Task 3 (cell 27): user_name concat, drop name parts, age int
    (normalizing the stream-path string age), timestamp parse, contract."""
    df = drop_all_null_rows(df, [c for c in df.columns if c != "ind"])
    df = df.withColumn(
        "user_name", F.concat(F.col("first_name"), F.lit(" "), F.col("last_name"))
    ).drop("first_name", "last_name")
    df = cast_column(df, "age", "int")
    df = to_timestamp_column(df, "date_joined")
    return df.select("ind", "user_name", "age", "date_joined")
