"""The reference's OWN cleaning pipelines (Tasks 1-3), under the oracle gate.

The driver's correctness gate can only read the testdata tables, so to put
`clean_pin` / `clean_geo` / `clean_user` (functions/cleaning.py — the
re-expression of BatchProcessingFinal.ipynb cells 18-27) under that gate we
*derive* raw pin/geo/user tables deterministically from `customer`/`nation`
with SQL-expressible transforms, dirty values included (k/M/decimal-k
follower counts, "User Info Error", "No Title Data Available",
"N,o, ,T,a,g,s,", "Local save in /" prefixes, empty strings, string ages —
FIXTURES.md §1), then run the real combinator pipeline on the Spark side and
a symbolic replay of it on the DuckDB side.

Every cleaning operator from SURVEY.md §2.2 is exercised and value-checked
cross-engine: P7 (LIKE null-out), P8 (regex replace / suffix expansion), P9
(int cast), P10 (to_timestamp), P11 (concat), P12 (array ctor), P13
(all-null drop), P14 (empty→NULL), P1-P3 (select/drop/rename).

Cross-engine determinism notes:
- suffix expansion truncates the double product toward zero on both sides
  (Spark double→int cast truncates; the oracle wraps TRUNC() around
  DuckDB's round-to-nearest cast);
- `||` (not concat()) on the DuckDB side so NULL propagates like F.concat;
- date strings are derived from integer day offsets and cast date→string,
  identical "yyyy-MM-dd" text in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table
from ..functions.cleaning import clean_geo, clean_pin, clean_user

# ---- deterministic dirty-table derivations (customer → raw pin/geo/user) ----


def _raw_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    m = k % 10
    s = lambda col: col.cast("string")  # noqa: E731
    return c.select(
        k.cast("int").alias("index"),
        F.md5(F.concat(F.lit("u"), s(k))).alias("unique_id"),
        F.when(m == 0, "No Title Data Available")
        .when(m == 1, "")
        .otherwise(F.concat(F.lit("Title "), F.col("c_name")))
        .alias("title"),
        F.when(m == 2, "No description available Story format")
        .otherwise(F.concat(F.lit("Desc "), F.col("c_mktsegment")))
        .alias("description"),
        F.when(m == 7, "User Info Error").otherwise(F.col("c_name")).alias("poster_name"),
        F.when(m == 3, "User Info Error")
        .when(m == 4, F.concat(s(k % 90), F.lit("k")))
        .when(m == 5, F.concat(s(k % 900), F.lit(".5k")))
        .when(m == 6, F.concat(s(k % 9), F.lit("M")))
        .otherwise(s(k % 10000))
        .alias("follower_count"),
        F.when(m == 8, "N,o, ,T,a,g,s,")
        .otherwise(F.concat(F.lit("tag0,tag"), s(k % 5)))
        .alias("tag_list"),
        F.when(k % 3 == 0, "image")
        .when(k % 3 == 1, "video")
        .otherwise("multi-video(story page format)")
        .alias("is_image_or_video"),
        F.when(m == 9, "Image src error.")
        .otherwise(F.concat(F.lit("https://i.example.com/"), F.md5(s(k)), F.lit(".jpg")))
        .alias("image_src"),
        (k % 2).cast("int").alias("downloaded"),
        F.concat(F.lit("Local save in /data/"), F.col("c_mktsegment")).alias("save_location"),
        F.when(k % 13 == 0, "").otherwise(F.col("c_mktsegment")).alias("category"),
    )


# NB the oracle replay is coupled to this fixture's construction: only
# title/category can be '' (so the swept CTE replays empty_to_null for just
# those two), no derived row is all-null (drop_all_null_rows is a no-op and
# is not replayed), and `downloaded` (Spark-side only, for the PIN_RAW shape)
# is projected away by clean_pin's contract before comparison. Extending
# _raw_pin with new empty-able/nullable columns requires extending the SQL
# replay to match.
_RAW_PIN_SQL = """
  SELECT CAST(c_custkey AS INT) AS ind_raw,
         md5('u' || CAST(c_custkey AS VARCHAR)) AS unique_id,
         CASE WHEN c_custkey % 10 = 0 THEN 'No Title Data Available'
              WHEN c_custkey % 10 = 1 THEN ''
              ELSE 'Title ' || c_name END AS title,
         CASE WHEN c_custkey % 10 = 2 THEN 'No description available Story format'
              ELSE 'Desc ' || c_mktsegment END AS description,
         CASE WHEN c_custkey % 10 = 7 THEN 'User Info Error' ELSE c_name END AS poster_name,
         CASE WHEN c_custkey % 10 = 3 THEN 'User Info Error'
              WHEN c_custkey % 10 = 4 THEN CAST(c_custkey % 90 AS VARCHAR) || 'k'
              WHEN c_custkey % 10 = 5 THEN CAST(c_custkey % 900 AS VARCHAR) || '.5k'
              WHEN c_custkey % 10 = 6 THEN CAST(c_custkey % 9 AS VARCHAR) || 'M'
              ELSE CAST(c_custkey % 10000 AS VARCHAR) END AS follower_count,
         CASE WHEN c_custkey % 10 = 8 THEN 'N,o, ,T,a,g,s,'
              ELSE 'tag0,tag' || CAST(c_custkey % 5 AS VARCHAR) END AS tag_list,
         CASE WHEN c_custkey % 3 = 0 THEN 'image'
              WHEN c_custkey % 3 = 1 THEN 'video'
              ELSE 'multi-video(story page format)' END AS is_image_or_video,
         CASE WHEN c_custkey % 10 = 9 THEN 'Image src error.'
              ELSE 'https://i.example.com/' || md5(CAST(c_custkey AS VARCHAR)) || '.jpg'
              END AS image_src,
         'Local save in /data/' || c_mktsegment AS save_location,
         CASE WHEN c_custkey % 13 = 0 THEN '' ELSE c_mktsegment END AS category
  FROM customer
"""


def pin_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Task 1 end-to-end on the derived dirty pin table (cells 18-22)."""
    return clean_pin(_raw_pin(spark, sf_dir)).orderBy("ind")


PIN_CLEAN_SQL = f"""
WITH raw AS ({_RAW_PIN_SQL}),
swept AS (
  SELECT ind_raw, unique_id,
         CASE WHEN title = '' THEN NULL ELSE title END AS title,
         description, poster_name, follower_count, tag_list, is_image_or_video,
         image_src, save_location,
         CASE WHEN category = '' THEN NULL ELSE category END AS category
  FROM raw
),
sent AS (
  SELECT ind_raw, unique_id,
         CASE WHEN title LIKE 'No Title Data%' THEN NULL ELSE title END AS title,
         CASE WHEN description LIKE 'No description available%' THEN NULL
              ELSE description END AS description,
         CASE WHEN poster_name LIKE 'User Info Error%' THEN NULL
              ELSE poster_name END AS poster_name,
         CASE WHEN follower_count LIKE 'User Info Error%' THEN NULL
              ELSE follower_count END AS follower_count,
         CASE WHEN tag_list LIKE 'N,o, ,T,a,g,s,%' THEN NULL ELSE tag_list END AS tag_list,
         is_image_or_video,
         CASE WHEN image_src LIKE 'Image src error%' THEN NULL ELSE image_src END AS image_src,
         save_location, category
  FROM swept
),
fc AS (
  SELECT *,
         regexp_extract(follower_count, '^([0-9]+\\.?[0-9]*)', 1) AS fc_num,
         upper(regexp_extract(follower_count, '([kKmM])$', 1)) AS fc_suf
  FROM sent
)
SELECT ind_raw AS ind, unique_id, title, description,
       CASE WHEN fc_num = '' OR fc_num IS NULL THEN NULL
            ELSE TRY_CAST(TRUNC(CAST(fc_num AS DOUBLE) *
                 CASE WHEN fc_suf = 'K' THEN 1000.0
                      WHEN fc_suf = 'M' THEN 1000000.0
                      ELSE 1.0 END) AS INT) END AS follower_count,
       poster_name, tag_list, is_image_or_video, image_src,
       regexp_replace(save_location, '^Local save in ', '') AS save_location,
       category
FROM fc
ORDER BY ind
"""


def _raw_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    k = F.col("c_custkey")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    ts = F.concat(
        F.date_add(F.to_date(F.lit("2015-01-01")), (k * 7 % 2922).cast("int")).cast("string"),
        F.lit(" "),
        F.lpad((k % 24).cast("string"), 2, "0"),
        F.lit(":30:00"),
    )
    return joined.select(
        k.cast("int").alias("ind"),
        ts.alias("timestamp"),
        ((k % 1800) / F.lit(10.0) - F.lit(90.0)).alias("latitude"),
        ((k % 3600) / F.lit(10.0) - F.lit(180.0)).alias("longitude"),
        F.col("n_name").alias("country"),
    )


_RAW_GEO_SQL = """
  SELECT CAST(c_custkey AS INT) AS ind,
         CAST(CAST(DATE '2015-01-01' + INTERVAL ((c_custkey * 7) % 2922) DAY AS DATE) AS VARCHAR)
           || ' ' || lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0') || ':30:00' AS ts_str,
         (c_custkey % 1800) / 10.0 - 90.0 AS latitude,
         (c_custkey % 3600) / 10.0 - 180.0 AS longitude,
         n_name AS country
  FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def geo_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Task 2 end-to-end on the derived geo table (cell 25): coordinates
    array ctor (P12) + timestamp parse (P10) + contract projection.

    clean_geo's contract keeps the array<double> coordinates column (the
    reference's shape); the gated projection re-extracts the elements as two
    double columns because the driver's row canonicalizer cannot hash array
    cells — the array ctor is still on the executed path (elements come OUT
    of the constructed array), and the array contract itself stays covered by
    tests/test_plans.py."""
    cleaned = clean_geo(_raw_geo(spark, sf_dir))
    return cleaned.select(
        "ind",
        "country",
        cleaned["coordinates"][0].alias("latitude"),
        cleaned["coordinates"][1].alias("longitude"),
        "timestamp",
    ).orderBy("ind")


GEO_CLEAN_SQL = f"""
WITH raw AS ({_RAW_GEO_SQL})
SELECT ind, country,
       CAST(latitude AS DOUBLE) AS latitude,
       CAST(longitude AS DOUBLE) AS longitude,
       CAST(ts_str AS TIMESTAMP) AS timestamp
FROM raw
ORDER BY ind
"""


def _raw_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dj = F.concat(
        F.date_add(F.to_date(F.lit("2015-01-01")), (k * 11 % 2192).cast("int")).cast("string"),
        F.lit(" 08:15:00"),
    )
    return c.select(
        k.cast("int").alias("ind"),
        F.substring(F.col("c_name"), 1, 8).alias("first_name"),
        F.substring(F.col("c_name"), 10, 9).alias("last_name"),
        F.when(k % 17 == 0, "").otherwise((F.lit(10) + k % 70).cast("string")).alias("age"),
        dj.alias("date_joined"),
    )


_RAW_USER_SQL = """
  SELECT CAST(c_custkey AS INT) AS ind,
         substr(c_name, 1, 8) AS first_name,
         substr(c_name, 10, 9) AS last_name,
         CASE WHEN c_custkey % 17 = 0 THEN ''
              ELSE CAST(10 + c_custkey % 70 AS VARCHAR) END AS age,
         CAST(CAST(DATE '2015-01-01' + INTERVAL ((c_custkey * 11) % 2192) DAY AS DATE) AS VARCHAR)
           || ' 08:15:00' AS date_joined
  FROM customer
"""


def user_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Task 3 end-to-end on the derived user table (cell 27): name concat
    (P11) + drop (P2) + lenient int cast (P9) + timestamp parse (P10)."""
    return clean_user(_raw_user(spark, sf_dir)).orderBy("ind")


USER_CLEAN_SQL = f"""
WITH raw AS ({_RAW_USER_SQL})
SELECT ind,
       first_name || ' ' || last_name AS user_name,
       TRY_CAST(age AS INT) AS age,
       CAST(date_joined AS TIMESTAMP) AS date_joined
FROM raw
ORDER BY ind
"""


def t8_compat_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's window-median + SELECT DISTINCT idiom, verbatim shape
    (W2, BatchProcessingFinal.ipynb:6213-6216) with exact percentile: the
    compat formulation proving the grouped rewrite in analytics_tpch.t8 is
    semantics-preserving. Kept OUT of bench: the window duplicates the
    median onto every row before DISTINCT collapses it, which is exactly why
    the engine's declared mode is the grouped aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    from .analytics_tpch import balance_band

    banded = customer.select(
        balance_band(F.col("c_acctbal")).alias("band"), "c_acctbal"
    )
    return (
        banded.select(
            "band",
            F.round(
                F.expr("percentile(c_acctbal, 0.5) OVER (PARTITION BY band)"), 4
            )
            .cast("double")
            .alias("median_acctbal"),
        )
        .distinct()
        .orderBy("band")
    )


T8_COMPAT_SQL = """
WITH banded AS (
  SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
              WHEN c_acctbal < 3000 THEN 'low'
              WHEN c_acctbal < 7000 THEN 'mid'
              ELSE 'high' END AS band,
         c_acctbal
  FROM customer
)
SELECT DISTINCT band,
       CAST(ROUND(QUANTILE_CONT(c_acctbal, 0.5) OVER (PARTITION BY band), 4) AS DOUBLE)
         AS median_acctbal
FROM banded
ORDER BY band
"""


def user_oldest_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 (`ORDER BY ... DESC NULLS LAST`, the reference's commented-out
    vestige at Cleaning notebook :1557-1558) exercised for real: top-20
    oldest users where unparseable ages became NULL (P9's try_cast). Spark's
    default desc ordering puts NULLs LAST while DuckDB's puts them FIRST, so
    the explicit modifier is semantics-bearing for the top-k cut — without
    it the two engines would disagree on which rows survive the LIMIT."""
    users = clean_user(_raw_user(spark, sf_dir))
    return (
        users.orderBy(F.desc_nulls_last("age"), F.asc("ind"))
        .limit(20)
        .select("ind", "user_name", "age")
    )


USER_OLDEST_SQL = f"""
WITH raw AS ({_RAW_USER_SQL})
SELECT ind, first_name || ' ' || last_name AS user_name, TRY_CAST(age AS INT) AS age
FROM raw
ORDER BY age DESC NULLS LAST, ind ASC
LIMIT 20
"""


QUERIES = {
    "pin_clean_pipeline": pin_clean_pipeline,
    "geo_clean_pipeline": geo_clean_pipeline,
    "user_clean_pipeline": user_clean_pipeline,
    "t8_compat_window_median": t8_compat_window_median,
    "user_oldest_nulls_last": user_oldest_nulls_last,
}

ORACLE = {
    "pin_clean_pipeline": PIN_CLEAN_SQL,
    "geo_clean_pipeline": GEO_CLEAN_SQL,
    "user_clean_pipeline": USER_CLEAN_SQL,
    "t8_compat_window_median": T8_COMPAT_SQL,
    "user_oldest_nulls_last": USER_OLDEST_SQL,
}
