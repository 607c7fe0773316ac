"""TPC-H-style headline queries over the driver testdata.

These exercise the scan→filter→join→agg→topk spine at bench scale (sf0.1) and
are the throughput headliners in bench.py. Plans are written so that:

- filters sit directly on the scan (predicate pushdown into parquet —
  check `PushedFilters` in `.explain("formatted")`),
- only referenced columns are read (`ReadSchema` pruning),
- small dimensions (region, nation) are explicitly broadcast,
- money arithmetic goes through DECIMAL(18,2|4) so grouped sums are exact and
  order-independent (required for cross-engine hash equality and, at scale,
  for reproducible results under any partitioning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

_DEC = "decimal(18,2)"


def _revenue() -> F.Column:
    """extendedprice * (1 - discount), DECIMAL-exact — the one revenue
    expression every revenue query shares (bit-parity with _REV_SQL)."""
    return (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    ).cast("decimal(28,4)")


_REV_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: lineitem pricing summary by returnflag/linestatus.

    Pure scan + partial-agg + final-agg: one shuffle of |groups| rows.
    """
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast(_DEC) - disc)).cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                (price * (F.lit(1).cast(_DEC) - disc) * (F.lit(1).cast(_DEC) + tax)).cast(
                    "decimal(32,6)"
                )
            )
            .cast("double")
            .alias("sum_charge"),
            # raw double quotients of exact DECIMAL sums: identical bits in
            # both engines; ROUND here would *introduce* tie divergence
            # (Spark rounds the shortest decimal repr HALF_UP, DuckDB the
            # scaled binary)
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(32,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: top 10 open orders by revenue for one segment.

    customer filter pushed to scan; orders⋈customer then lineitem⋈orders
    shuffle on their keys; sort+limit fuses to TakeOrderedAndProject.
    """
    cutoff = F.lit("1998-01-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = _revenue()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(F.col("l_orderkey").alias("orderkey"), "revenue", F.col("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey AS orderkey,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       o_orderdate AS orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: revenue per nation for one region where the
    supplier and customer share a nation.

    Six-table join; region+nation broadcast, the fact-side joins shuffle.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _revenue()
    return (
        l.join(orders, l.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, (l.l_suppkey == supplier.s_suppkey) & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(F.col("n_name").alias("nation"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


Q5_SQL = """
SELECT n_name AS nation,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, nation ASC
"""


QUERIES = {
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "tpch_q3_shipping_priority": q3_shipping_priority,
    "tpch_q5_regional_volume": q5_regional_volume,
}

ORACLE = {
    "tpch_q1_pricing_summary": Q1_SQL,
    "tpch_q3_shipping_priority": Q3_SQL,
    "tpch_q5_regional_volume": Q5_SQL,
}
