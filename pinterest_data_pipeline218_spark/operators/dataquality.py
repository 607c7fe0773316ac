"""Declarative data-quality constraint checking (the Deequ/Great-
Expectations pattern, public): evaluate a suite of table constraints —
completeness, uniqueness, referential integrity, range, domain membership
— in as few passes as the constraints allow, and emit one row per
constraint with its violation count and verdict.

Design for 100 TB:
- **Single-pass scan constraints fuse into ONE aggregate**: every
  completeness/range/domain check is a conditional SUM over the same
  scan, so adding checks adds expressions, not passes — the core Deequ
  move.
- **Uniqueness** is the same aggregate's COUNT(*) minus COUNT(DISTINCT
  key) (one extra shuffle inside the agg, map-side partially combined).
- **Referential integrity** is a broadcast/shuffle ANTI join against the
  parent key set — the only second pass, and it's keyed.
- Output is |constraints| rows — planning-state sized; a production run
  writes it next to the table version it audited.

Reference scope: beyond-reference (the reference trusts its inputs);
extends the cleaning/quality family (P13/P14 null handling,
corpus_quality_report) from documents to the relational tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

ORDER_STATUSES = ("O", "F", "P")  # TPC-H order-status domain


def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over `orders` (one row per constraint, ordered):

      not_null_custkey      — completeness of the FK column
      unique_orderkey       — key uniqueness (COUNT vs COUNT DISTINCT)
      fk_custkey_customer   — referential integrity (anti join vs customer)
      positive_totalprice   — range: o_totalprice > 0
      status_in_domain      — domain: o_orderstatus ∈ {O, F, P}
      orderdate_in_range    — sanity range on the date column

    Each row: (check_name, n_violations, pass). The suite passes on the
    driver's synthetic data by construction — the value the gate pins is
    the exact violation arithmetic, and the planted-violation pytest
    proves each check actually fires."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    in_domain = F.col("o_orderstatus").isin(*ORDER_STATUSES)
    scan = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("not_null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("unique_orderkey"),
        F.sum(
            F.when(F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") <= 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("positive_totalprice"),
        F.sum(F.when(~F.coalesce(in_domain, F.lit(False)), 1).otherwise(0))
        .cast("long")
        .alias("status_in_domain"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2100-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("orderdate_in_range"),
    )
    orphans = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("fk_custkey_customer"))
    )
    wide = scan.crossJoin(F.broadcast(orphans))  # 1-row x 1-row assembly
    long = wide.selectExpr(
        "stack(6, "
        "'fk_custkey_customer', fk_custkey_customer, "
        "'not_null_custkey', not_null_custkey, "
        "'orderdate_in_range', orderdate_in_range, "
        "'positive_totalprice', positive_totalprice, "
        "'status_in_domain', status_in_domain, "
        "'unique_orderkey', unique_orderkey"
        ") AS (check_name, n_violations)"
    )
    return long.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    ).orderBy("check_name")


DQ_ORDERS_SQL = f"""
WITH scan AS (
  SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS not_null_custkey,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS unique_orderkey,
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice <= 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS positive_totalprice,
         CAST(SUM(CASE WHEN NOT COALESCE(
                    o_orderstatus IN {ORDER_STATUSES!r}, FALSE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS status_in_domain,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                         OR o_orderdate >= TIMESTAMP '2100-01-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_in_range
  FROM orders
), orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS fk_custkey_customer
  FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), wide AS (
  SELECT * FROM scan CROSS JOIN orphans
)
SELECT check_name, n_violations, n_violations = 0 AS pass
FROM (
  SELECT 'fk_custkey_customer' AS check_name, fk_custkey_customer AS n_violations FROM wide
  UNION ALL SELECT 'not_null_custkey', not_null_custkey FROM wide
  UNION ALL SELECT 'orderdate_in_range', orderdate_in_range FROM wide
  UNION ALL SELECT 'positive_totalprice', positive_totalprice FROM wide
  UNION ALL SELECT 'status_in_domain', status_in_domain FROM wide
  UNION ALL SELECT 'unique_orderkey', unique_orderkey FROM wide
)
ORDER BY check_name
"""


QUERIES = {"dq_orders_constraints": dq_orders_constraints}
ORACLE = {"dq_orders_constraints": DQ_ORDERS_SQL}
