"""The reference's eight declared analytics queries (T4..T11), re-targeted.

The reference runs T4..T11 over its pin/geo/user tables
(reference: Databricks_notebooks/BatchProcessingFinal.ipynb cells 34-65,
SURVEY.md §2.11). The driver's correctness gate runs over the TPC-H-ish
testdata instead, so each query here is the *same operator composition*
(join → group-count → rank-window → distinct; CASE bucketing; year
extraction; exact median per group) mapped onto orders/customer/nation.

Mapping (reference → here):
  country      → n_name        (nation of the customer)
  category     → o_orderpriority
  follower_count → c_acctbal
  age_group    → balance band (CASE WHEN, reference BatchProcessingFinal.ipynb:5947-5956)
  post year    → year(o_orderdate)

Scale notes (100 TB design):
- nation (25 rows) and region (5 rows) are always broadcast — no shuffle for
  dimension joins.
- orders ⋈ customer shuffles on the key; at scale both sides would be
  bucketed by custkey so the exchange disappears. AQE handles skew.
- every "top-1 per group" is RANK over a partitioned window (tie-preserving,
  reference BatchProcessingFinal.ipynb:5687), *after* a group-count has
  already collapsed cardinality — the window input is |groups|, not |rows|.
- medians are exact `F.median` grouped aggregation (single shuffle), NOT the
  reference's window-median + DISTINCT idiom, which duplicates the median
  onto every row before collapsing (SURVEY.md §4 rewrite note).

Cross-engine determinism: double sums go through DECIMAL(18,2) (exact,
order-independent) and back to DOUBLE; medians interpolate identically in
Spark and DuckDB for DOUBLE input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table


def _cust_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer enriched with its nation name; nation is broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
        "inner",
    )


def balance_band(col):
    """CASE WHEN bucketing — the reference's age_group idiom (P15)."""
    return (
        F.when(col < 0, "negative")
        .when(col < 3000, "low")
        .when(col < 7000, "mid")
        .otherwise("high")
    )


BALANCE_BAND_SQL = (
    "CASE WHEN c_acctbal < 0 THEN 'negative' "
    "WHEN c_acctbal < 3000 THEN 'low' "
    "WHEN c_acctbal < 7000 THEN 'mid' "
    "ELSE 'high' END"
)


def t4_top_priority_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: most popular category per country → most common order priority per
    nation. J1 + A1 + W1 + A5 (rank ties preserved)."""
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(_cust_nation(spark, sf_dir), orders.o_custkey == F.col("c_custkey"))
    counts = joined.groupBy("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("order_count"))
    return (
        counts.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("order_priority"),
            "order_count",
        )
        .distinct()
    )


T4_SQL = """
WITH counts AS (
  SELECT n_name AS nation, o_orderpriority AS order_priority, COUNT(*) AS order_count
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, RANK() OVER (PARTITION BY nation ORDER BY order_count DESC) AS rk
  FROM counts
)
SELECT DISTINCT nation, order_priority, order_count FROM ranked WHERE rk = 1
"""


def t5_priority_counts_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: posts per category per year in a range → orders per priority per
    year(o_orderdate) BETWEEN 1996 AND 2000. date-extract + P16 + A2 + O1."""
    orders = load_table(spark, sf_dir, "orders")
    # the year-range filter is expressed directly on o_orderdate so it lands
    # in PushedFilters at the parquet scan — year(o_orderdate) BETWEEN is an
    # opaque derived expression the source can't prune on
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("2001-01-01").cast("date"))
        )
        .withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year", F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy("order_year", "order_priority")
    )


T5_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       o_orderpriority AS order_priority,
       COUNT(o_orderkey) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '2001-01-01'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def t6p1_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 part 1: user with most followers per country → customer with the
    highest account balance per nation. J2 + W1 + A5."""
    cn = _cust_nation(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"))
    return (
        cn.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer_name"),
            F.round("c_acctbal", 2).cast("double").alias("acctbal"),
        )
        .distinct()
    )


T6P1_SQL = """
WITH ranked AS (
  SELECT n_name AS nation, c_name AS customer_name, c_acctbal,
         RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT DISTINCT nation, customer_name, CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS acctbal
FROM ranked WHERE rk = 1
"""


def t6p2_top_nation_by_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 part 2: country whose top user has the most followers. A7 + O2 + O3.

    The reference's LIMIT 1 is nondeterministic under ties
    (BatchProcessingFinal.ipynb:5680); we declare the tiebreak nation ASC.
    """
    top = t6p1_top_customer_per_nation(spark, sf_dir)
    return (
        top.groupBy("acctbal", "nation")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("nation", "acctbal")
        .orderBy(F.desc("acctbal"), F.asc("nation"))
        .limit(1)
    )


T6P2_SQL = f"""
WITH top AS ({T6P1_SQL})
SELECT nation, acctbal FROM top
GROUP BY acctbal, nation
ORDER BY acctbal DESC, nation ASC
LIMIT 1
"""


def t7_top_priority_per_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: most popular category per age group → most common order priority
    per customer balance band. J3 + P15 + A2 + W1 + O1."""
    orders = load_table(spark, sf_dir, "orders")
    cn = _cust_nation(spark, sf_dir).withColumn("band", balance_band(F.col("c_acctbal")))
    joined = orders.join(cn, orders.o_custkey == F.col("c_custkey"))
    counts = joined.groupBy("band", "o_orderpriority").agg(
        F.count("o_orderpriority").alias("order_count")
    )
    w = Window.partitionBy("band").orderBy(F.desc("order_count"))
    return (
        counts.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("band", F.col("o_orderpriority").alias("order_priority"), "order_count")
        .distinct()
        .orderBy("band")
    )


T7_SQL = f"""
WITH counts AS (
  SELECT {BALANCE_BAND_SQL} AS band, o_orderpriority AS order_priority,
         COUNT(o_orderpriority) AS order_count
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, RANK() OVER (PARTITION BY band ORDER BY order_count DESC) AS rk FROM counts
)
SELECT DISTINCT band, order_priority, order_count FROM ranked WHERE rk = 1 ORDER BY band
"""


def t8_median_balance_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: median follower count per age group → exact median account balance
    per balance band. J3 + P15 + median-agg (grouped rewrite of the
    reference's window-median + DISTINCT idiom, SURVEY.md §4)."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.withColumn("band", balance_band(F.col("c_acctbal")))
        .groupBy("band")
        .agg(F.round(F.median("c_acctbal"), 4).cast("double").alias("median_acctbal"))
        .orderBy("band")
    )


T8_SQL = f"""
SELECT {BALANCE_BAND_SQL.replace("c_acctbal", "c_acctbal")} AS band,
       CAST(ROUND(QUANTILE_CONT(c_acctbal, 0.5), 4) AS DOUBLE) AS median_acctbal
FROM customer
GROUP BY 1
ORDER BY 1
"""


def t9_active_customers_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: users joined per year → distinct ordering customers per year.
    date-extract + A2 (count distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("order_year")
    )


T9_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1 ORDER BY 1
"""


def t10_median_order_total_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: median follower count by join year → exact median order total per
    order year."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .agg(F.round(F.median("o_totalprice"), 4).cast("double").alias("median_total"))
        .orderBy("order_year")
    )


T10_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS DOUBLE) AS median_total
FROM orders GROUP BY 1 ORDER BY 1
"""


def t11_median_order_total_by_band_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: median follower count by join year × age group → median order
    total per (balance band, order year). Two-key grouped median."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumn(
        "band", balance_band(F.col("c_acctbal"))
    )
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return (
        joined.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("band", "order_year")
        .agg(F.round(F.median("o_totalprice"), 4).cast("double").alias("median_total"))
        .orderBy("band", "order_year")
    )


T11_SQL = f"""
SELECT {BALANCE_BAND_SQL} AS band,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS DOUBLE) AS median_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "t4_top_priority_per_nation": t4_top_priority_per_nation,
    "t5_priority_counts_by_year": t5_priority_counts_by_year,
    "t6p1_top_customer_per_nation": t6p1_top_customer_per_nation,
    "t6p2_top_nation_by_top_customer": t6p2_top_nation_by_top_customer,
    "t7_top_priority_per_band": t7_top_priority_per_band,
    "t8_median_balance_by_band": t8_median_balance_by_band,
    "t9_active_customers_by_year": t9_active_customers_by_year,
    "t10_median_order_total_by_year": t10_median_order_total_by_year,
    "t11_median_order_total_by_band_year": t11_median_order_total_by_band_year,
}

ORACLE = {
    "t4_top_priority_per_nation": T4_SQL,
    "t5_priority_counts_by_year": T5_SQL,
    "t6p1_top_customer_per_nation": T6P1_SQL,
    "t6p2_top_nation_by_top_customer": T6P2_SQL,
    "t7_top_priority_per_band": T7_SQL,
    "t8_median_balance_by_band": T8_SQL,
    "t9_active_customers_by_year": T9_SQL,
    "t10_median_order_total_by_year": T10_SQL,
    "t11_median_order_total_by_band_year": T11_SQL,
}
