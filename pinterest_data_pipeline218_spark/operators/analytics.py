"""The eight declared analytics queries (T4..T11) over cleaned pin/geo/user.

Each query exists twice, and a test asserts they agree:

- **DataFrame mode** (functions below): the idiomatic physical choice —
  grouped `median`/`percentile_approx` instead of the reference's
  window-median + SELECT DISTINCT (which duplicates the median onto every
  row before collapsing, SURVEY.md §4), rank windows over pre-aggregated
  group counts, explicit aliases.
- **SQL-compat mode** (`sql_compat` dict + run_sql_compat): the reference's
  own SQL shape (window median + DISTINCT, CTEs) over temp views, proving
  plan-for-plan semantic equivalence with the reference
  (BatchProcessingFinal.ipynb cells 34-65).

Join note: pin/geo/user are 1:1 on `ind`, so inner joins preserve row count
(the invariant the property tests rely on). At scale the three tables share
the key, so co-partitioning (bucketing by ind) removes all join shuffles;
in local tests the dimension sides broadcast automatically.

Median semantics (SURVEY.md §7 hard parts): default exact `F.median`
(deterministic, oracle-friendly); `approx=True` switches to
`percentile_approx(.., 0.5)` reproducing the reference (README.md:213).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.cleaning import age_group


def _median(col: str, approx: bool) -> F.Column:
    return F.percentile_approx(col, 0.5) if approx else F.median(col)


def t4_top_category_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Most popular category per country (cell 34)."""
    counts = (
        pin.join(geo, "ind")
        .groupBy("country", "category")
        .agg(F.count(F.lit(1)).alias("category_count"))
    )
    w = Window.partitionBy("country").orderBy(F.desc("category_count"))
    return (
        counts.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("country", "category", "category_count")
        .distinct()
    )


def t5_category_counts_by_year(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Posts per category per year, 2018-2022 (cell 39)."""
    return (
        pin.join(geo, "ind")
        .withColumn("post_year", F.year("timestamp"))
        .filter(F.col("post_year").between(2018, 2022))
        .groupBy("post_year", "category")
        .agg(F.count("category").alias("category_count"))
        .orderBy("post_year", "category")
    )


def t6p1_top_follower_per_country(
    pin: DataFrame, geo: DataFrame, user: DataFrame
) -> DataFrame:
    """User with most followers per country (cell 44); RANK keeps ties."""
    joined = geo.join(user, "ind").join(pin, "ind")
    w = Window.partitionBy("country").orderBy(F.desc("follower_count"))
    return (
        joined.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("country", "poster_name", "follower_count")
        .distinct()
    )


def t6p2_top_country(t6p1_result: DataFrame) -> DataFrame:
    """Country whose top user has most followers (cell 46). Deterministic
    tiebreak (country asc) replaces the reference's bare LIMIT 1."""
    return (
        t6p1_result.groupBy("follower_count", "country")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("country", "follower_count")
        .orderBy(F.desc("follower_count"), F.asc("country"))
        .limit(1)
    )


def t7_top_category_per_age_group(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Most popular category per age group (cell 50)."""
    joined = pin.join(user, "ind").withColumn("age_group", age_group(F.col("age")))
    counts = joined.groupBy("age_group", "category").agg(
        F.count("category").alias("category_count")
    )
    w = Window.partitionBy("age_group").orderBy(F.desc("category_count"))
    return (
        counts.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("age_group", "category", "category_count")
        .distinct()
        .orderBy("age_group")
    )


def t8_median_follower_by_age_group(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count per age group (cell 54) — grouped median, not
    the reference's window+DISTINCT."""
    joined = pin.join(user, "ind").withColumn("age_group", age_group(F.col("age")))
    return (
        joined.groupBy("age_group")
        .agg(_median("follower_count", approx).cast("double").alias("median_follower_count"))
        .orderBy("age_group")
    )


def t9_users_joined_by_year(user: DataFrame) -> DataFrame:
    """Users joined per year 2015-2020 (cell 58)."""
    return (
        user.withColumn("post_year", F.year("date_joined"))
        .filter(F.col("post_year").between(2015, 2020))
        .groupBy("post_year")
        .agg(F.count("user_name").alias("number_users_joined"))
        .orderBy("post_year")
    )


def t10_median_follower_by_join_year(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count by join year 2015-2020 (cell 62)."""
    joined = pin.join(user, "ind").withColumn("post_year", F.year("date_joined"))
    return (
        joined.filter(F.col("post_year").between(2015, 2020))
        .groupBy("post_year")
        .agg(_median("follower_count", approx).cast("double").alias("median_follower_count"))
        .orderBy("post_year")
    )


def t11_median_follower_by_join_year_age(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count by join year × age group (cell 65)."""
    joined = (
        pin.join(user, "ind")
        .withColumn("age_group", age_group(F.col("age")))
        .withColumn("post_year", F.year("date_joined"))
    )
    return (
        joined.filter(F.col("post_year").between(2015, 2020))
        .groupBy("age_group", "post_year")
        .agg(_median("follower_count", approx).cast("double").alias("median_follower_count"))
        .orderBy("age_group", "post_year")
    )


# ---- SQL-compat mode: the reference's own query shapes over temp views ----

SQL_COMPAT: dict[str, str] = {
    # cell 34: CTE join + rank window + DISTINCT
    "t4": """
        WITH join_tables AS (
          SELECT country, category, COUNT(*) AS category_count
          FROM pin_table JOIN geo_table ON geo_table.ind = pin_table.ind
          GROUP BY country, category
        ), get_rank AS (
          SELECT *, RANK() OVER (PARTITION BY country ORDER BY category_count DESC) AS cat_rank
          FROM join_tables
        )
        SELECT DISTINCT country, category, category_count FROM get_rank WHERE cat_rank = 1
    """,
    # cell 39: year extract + BETWEEN
    "t5": """
        SELECT EXTRACT(YEAR FROM timestamp) AS post_year, category,
               COUNT(category) AS category_count
        FROM pin_table JOIN geo_table ON geo_table.ind = pin_table.ind
        WHERE EXTRACT(YEAR FROM timestamp) BETWEEN 2018 AND 2022
        GROUP BY post_year, category
        ORDER BY post_year, category
    """,
    # cell 44: 3-way chain join + rank window
    "t6p1": """
        WITH ranked AS (
          SELECT country, poster_name, follower_count,
                 RANK() OVER (PARTITION BY country ORDER BY follower_count DESC) AS rk
          FROM geo_table
          JOIN user_table ON user_table.ind = geo_table.ind
          JOIN pin_table ON pin_table.ind = user_table.ind
        )
        SELECT DISTINCT country, poster_name, follower_count FROM ranked WHERE rk = 1
    """,
    # cell 46: GROUP BY dedup + ORDER BY DESC LIMIT 1 (deterministic
    # country-asc tiebreak replacing the reference's bare LIMIT 1)
    "t6p2": """
        WITH top AS (
          SELECT country, poster_name, follower_count,
                 RANK() OVER (PARTITION BY country ORDER BY follower_count DESC) AS rk
          FROM geo_table
          JOIN user_table ON user_table.ind = geo_table.ind
          JOIN pin_table ON pin_table.ind = user_table.ind
        )
        SELECT country, follower_count
        FROM (SELECT DISTINCT country, follower_count FROM top WHERE rk = 1)
        GROUP BY follower_count, country
        ORDER BY follower_count DESC, country ASC
        LIMIT 1
    """,
    # cell 50: age bucketing + group-count + rank window
    "t7": """
        WITH with_groups AS (
          SELECT CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                      WHEN age BETWEEN 25 AND 35 THEN '25-35'
                      WHEN age BETWEEN 36 AND 50 THEN '36-50'
                      WHEN age > 50 THEN '+50' END AS age_group,
                 category
          FROM pin_table JOIN user_table ON user_table.ind = pin_table.ind
        ), counts AS (
          SELECT age_group, category, COUNT(category) AS category_count
          FROM with_groups GROUP BY age_group, category
        ), ranked AS (
          SELECT *, RANK() OVER (PARTITION BY age_group ORDER BY category_count DESC) AS rk
          FROM counts
        )
        SELECT DISTINCT age_group, category, category_count
        FROM ranked WHERE rk = 1 ORDER BY age_group
    """,
    # cell 54: the window-median + DISTINCT idiom, verbatim shape
    "t8": """
        WITH with_groups AS (
          SELECT CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                      WHEN age BETWEEN 25 AND 35 THEN '25-35'
                      WHEN age BETWEEN 36 AND 50 THEN '36-50'
                      WHEN age > 50 THEN '+50' END AS age_group,
                 follower_count
          FROM pin_table JOIN user_table ON user_table.ind = pin_table.ind
        )
        SELECT DISTINCT age_group,
               CAST(percentile(follower_count, 0.5) OVER (PARTITION BY age_group) AS DOUBLE)
                 AS median_follower_count
        FROM with_groups
        ORDER BY age_group
    """,
    # cell 58: year extraction + count, 2015-2020
    "t9": """
        SELECT EXTRACT(YEAR FROM date_joined) AS post_year,
               COUNT(user_name) AS number_users_joined
        FROM user_table
        WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        GROUP BY post_year
        ORDER BY post_year
    """,
    # cell 62: window-median by join year
    "t10": """
        WITH joined AS (
          SELECT EXTRACT(YEAR FROM date_joined) AS post_year, follower_count
          FROM pin_table JOIN user_table ON user_table.ind = pin_table.ind
          WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        )
        SELECT DISTINCT post_year,
               CAST(percentile(follower_count, 0.5) OVER (PARTITION BY post_year) AS DOUBLE)
                 AS median_follower_count
        FROM joined
        ORDER BY post_year
    """,
    # cell 65: window-median by join year x age group
    "t11": """
        WITH joined AS (
          SELECT CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                      WHEN age BETWEEN 25 AND 35 THEN '25-35'
                      WHEN age BETWEEN 36 AND 50 THEN '36-50'
                      WHEN age > 50 THEN '+50' END AS age_group,
                 EXTRACT(YEAR FROM date_joined) AS post_year, follower_count
          FROM pin_table JOIN user_table ON user_table.ind = pin_table.ind
          WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        )
        SELECT DISTINCT age_group, post_year,
               CAST(percentile(follower_count, 0.5) OVER (PARTITION BY age_group, post_year)
                 AS DOUBLE) AS median_follower_count
        FROM joined
        ORDER BY age_group, post_year
    """,
}


def register_views(pin: DataFrame, geo: DataFrame, user: DataFrame) -> None:
    """The reference's query layer (BatchProcessingFinal.ipynb:1746-1748)."""
    pin.createOrReplaceTempView("pin_table")
    geo.createOrReplaceTempView("geo_table")
    user.createOrReplaceTempView("user_table")


def run_sql_compat(spark: SparkSession, key: str) -> DataFrame:
    return spark.sql(SQL_COMPAT[key])
