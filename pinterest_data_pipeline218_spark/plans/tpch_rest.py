"""The last four TPC-H shapes (Q2 / Q9 / Q11 / Q20), adapted to this schema.

With these, every one of the 22 TPC-H query shapes has an analogue under the
oracle gate (the other 18 live in analytics_tpch / tpch / tpch_more /
tpch_extra). The reference repo declares none of these (its analytics surface
is the 9 notebook queries, SURVEY.md §2.11); they are engine extensions
proving the remaining decorrelation patterns a complete engine needs:

  Q2  — correlated MIN subquery  → decorrelated per-group min + rejoin
  Q9  — multi-dim profit rollup  → 5-way join, derived measure, nation×year
  Q11 — scalar-subquery fraction → HAVING share-of-total, multiply-not-divide
  Q20 — nested IN chains         → stacked semi-joins over an aggregate

The canonical queries need `partsupp`, which the synthetic testdata lacks;
`lineitem (l_partkey, l_suppkey)` is the part↔supplier bridge instead — the
derived per-(part, supplier) aggregate plays partsupp's role, preserving each
query's plan shape without inventing data.

Scale notes:
- the derived bridge is |part×supplier|-sized and grows with the data: it is
  never broadcast (AQE decides); only constant-size nation/region carry hints;
- min-cost equality (Q2) joins on the exact double produced by MIN over the
  same set, so the float equality is bitwise-safe cross-engine;
- money math stays in DECIMAL until the final cast (see tpch_extra.Q6);
- date predicates are direct range bounds so they reach PushedFilters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

_DEC = "decimal(18,2)"


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each size-15 part, the EUROPE supplier(s) offering it at
    the minimum observed unit price. The correlated
    `cost = (SELECT MIN(cost) ... WHERE ps_partkey = p_partkey)` becomes a
    per-part min aggregate joined back on (partkey, cost) — the decorrelation
    Catalyst itself would apply, but here both sides of the oracle agree on
    the explicit form."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # derived partsupp: best observed unit price per (part, supplier).
    # l_extendedprice / l_quantity is double ÷ double — IEEE-exact, so both
    # engines derive bit-identical costs from the same parquet values.
    supply = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    min_cost = supply.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    # no broadcast hints: supply/min_cost are |part×supplier|-sized and grow
    # with the data; AQE broadcasts while they fit, shuffles when they don't
    best = supply.join(
        min_cost,
        (supply.l_partkey == F.col("mk")) & (supply.unit_cost == F.col("min_cost")),
    )
    eu_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        best.join(part.filter(F.col("p_size") == 15), best.l_partkey == part.p_partkey)
        .join(supplier, best.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(eu_nations), supplier.s_nationkey == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.col("unit_cost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name,
       unit_cost AS supply_cost
FROM supply
JOIN part ON l_partkey = p_partkey AND p_size = 15
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE unit_cost = (SELECT MIN(unit_cost) FROM supply s2
                   WHERE s2.l_partkey = supply.l_partkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation × order year over gear-like parts.
    partsupp's ps_supplycost is replaced by the part's retail price as unit
    cost: profit = extprice·(1-disc) − retailprice·qty, in DECIMAL end to
    end. One fact pass, two sf-scaled joins (part, orders) left to AQE, the
    constant-size nation broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    ).cast("decimal(28,4)")
    cost = (F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)).cast(
        "decimal(28,4)"
    )
    return (
        lineitem.join(
            part.filter(F.col("p_name").like("%gear%")).select(
                "p_partkey", "p_retailprice"
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(supplier.select("s_suppkey", "s_nationkey"), lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders.select("o_orderkey", "o_orderdate"), lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(revenue - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))
         - CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
                CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))
       ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value through NATION_7's suppliers
    exceeds 3× the mean per-part value — the scalar-subquery HAVING. Q11's
    fixed fraction (0.0001/SF) bakes the scale factor into the query text;
    the mean-multiple form `value * n_parts > 3 * total` is the
    scale-invariant equivalent (same 1-row-aggregate shape, and still
    multiply-not-divide: DECIMAL division scale rules differ across
    engines, products don't). The global total is a 1-row aggregate
    crossJoined in (always broadcast)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # left_semi (not inner+project): an inner join would let the broadcast
    # hint float up to the outer lineitem join and force a supplier-sized
    # broadcast — the semi join consumes the hint at the nation build side
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supplier.s_nationkey == nation.n_nationkey,
        "left_semi",
    ).select("s_suppkey")
    val = F.col("l_extendedprice").cast(_DEC)
    per_part = (
        lineitem.join(nat_supp, lineitem.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("value"))
    )
    stats = per_part.agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(F.col("value") * F.col("n_parts") > F.lit(3) * F.col("total_value"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_7')
  GROUP BY l_partkey
),
stats AS (SELECT SUM(value) AS total_value, COUNT(*) AS n_parts FROM per_part)
SELECT partkey, CAST(value AS DOUBLE) AS value
FROM per_part CROSS JOIN stats
WHERE value * n_parts > 3 * total_value
ORDER BY value DESC, partkey
"""


def tpch_q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: ASIA suppliers who shipped MORE than half of their total
    quantity of some small-* part during 1997 — availqty > ½·shipped becomes
    qty_1997·2 > total_qty on the derived bridge. The oracle keeps the
    canonical nested-IN form; the plan stacks left-semi joins over one
    single-pass conditional aggregate (no second fact scan for the 1997
    subtotal)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    qty = F.col("l_quantity").cast(_DEC)
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    bridge = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("total_qty"),
        F.sum(F.when(in_1997, qty).otherwise(F.lit(0).cast(_DEC))).alias("qty_1997"),
    )
    concentrated = (
        bridge.filter(F.col("qty_1997") * F.lit(2) > F.col("total_qty"))
        .join(
            part.filter(F.col("p_name").like("small%")).select("p_partkey"),
            bridge.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_suppkey")
    )
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    return (
        supplier.join(concentrated, supplier.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(asia_nations), supplier.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate < TIMESTAMP '1998-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1997
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    WHERE qty_1997 * 2 > total_qty
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  )
  AND s_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'ASIA')
ORDER BY s_name
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q20_concentrated_suppliers": tpch_q20_concentrated_suppliers,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": Q2_SQL,
    "tpch_q9_product_profit": Q9_SQL,
    "tpch_q11_important_parts": Q11_SQL,
    "tpch_q20_concentrated_suppliers": Q20_SQL,
}
