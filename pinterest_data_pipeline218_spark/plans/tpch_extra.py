"""Join/subquery/set-op/window coverage beyond the reference's surface.

The reference exercises only inner equi-joins, rank windows, and plain
aggregation (SURVEY.md §2.3/2.5/2.7). A complete engine needs the rest of
the relational algebra; these queries put semi joins, anti joins, outer
joins, scalar subqueries, correlated-subquery decorrelation, set operations,
and the full window-function family under the same DuckDB oracle gate.

Scale/determinism notes:
- semi/anti joins never materialize the probe side's matches (Spark's
  LeftSemi/LeftAnti build a hash set of keys only);
- the scalar-subquery comparison is kept in DECIMAL with a
  multiply-not-divide rewrite (`bal * n > total`), so the predicate is exact
  and engine-independent (no decimal-division scale drift);
- the correlated q17-style subquery is expressed as its decorrelated form
  (groupBy + join) — what Catalyst rewrites correlated scalar subqueries
  into anyway;
- window orderings always include a unique tiebreak column so ROW_NUMBER /
  LAG are deterministic cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table

_DEC = "decimal(18,2)"


def tpch_q4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts for 1997Q1 orders that have at least one big
    lineitem — EXISTS ≡ left-semi join (hash set of keys, no fan-out)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def tpch_q22_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers with no recent (1998+) orders, per nation — scalar subquery (global
    mean balance) + NOT EXISTS ≡ left-anti join.

    The mean comparison is decimal-exact via `bal * n_customers >
    total_balance` (multiply, don't divide: decimal division scale rules
    differ across engines; products and sums don't)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast(_DEC)
    stats = customer.agg(
        F.sum(bal).alias("total_bal"), F.count(F.lit(1)).alias("n_cust")
    )
    rich = (
        customer.crossJoin(F.broadcast(stats))
        .filter(bal * F.col("n_cust") > F.col("total_bal"))
        .join(
            # direct date bound (not year(...) >= 1998) so the predicate
            # prunes the orders scan via PushedFilters
            orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_inactive"),
            F.sum(bal).cast("double").alias("total_acctbal"),
        )
        .orderBy("nation")
    )


Q22_SQL = """
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total_bal, COUNT(*) AS n_cust
  FROM customer
)
SELECT n_name AS nation, COUNT(*) AS n_rich_inactive,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer CROSS JOIN stats
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_cust > total_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '1998-01-01')
GROUP BY n_name
ORDER BY nation
"""


def tpch_q13_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution — LEFT OUTER join (zero-order
    customers must appear with count 0), two-level aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    per_cust = (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue delta: tight scan-level predicate + single DECIMAL
    aggregate — the pushdown showcase (explain shows all three filters in
    PushedFilters)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from small-quantity lineitems of each part — the q17
    correlated scalar subquery in its decorrelated form (per-part avg via
    groupBy, broadcast back). Predicate kept exact: `qty * 5 * cnt <
    sum_qty` instead of `qty < 0.2 * avg` (integer-ish DECIMAL math both
    engines agree on bitwise)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt_qty")
    )
    return (
        # no broadcast hint: per_part is |parts|-sized and grows with the
        # data — AQE picks broadcast at bench scale and shuffle at cluster
        # scale; a forced broadcast would OOM the driver at 100 TB
        lineitem.join(per_part, lineitem.l_partkey == F.col("pk"))
        .filter(qty * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         COUNT(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_small
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
"""


def set_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one gated query: overlap between
    high-balance customers and 1998-active customers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    high = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("k")
    )
    active = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    both = high.intersect(active).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("segment"), "n"
    )
    only_high = high.subtract(active).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_high").alias("segment"), "n"
    )
    only_active = active.subtract(high).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_active").alias("segment"), "n"
    )
    return both.unionAll(only_high).unionAll(only_active).orderBy("segment")


SET_OVERLAP_SQL = """
WITH high AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
     active AS (SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01')
SELECT 'both' AS segment, COUNT(*) AS n FROM (SELECT * FROM high INTERSECT SELECT * FROM active)
UNION ALL
SELECT 'only_high', COUNT(*) FROM (SELECT * FROM high EXCEPT SELECT * FROM active)
UNION ALL
SELECT 'only_active', COUNT(*) FROM (SELECT * FROM active EXCEPT SELECT * FROM high)
ORDER BY segment
"""


def window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER / DENSE_RANK / LAG / NTILE / PERCENT_RANK / CUME_DIST /
    NTH_VALUE over one partitioned ordering — the window families beyond the
    reference's RANK (W1). Ordering includes the unique c_custkey tiebreak
    so every function is deterministic (and RANGE == ROWS for the running
    nth_value frame, since sort keys are total)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cn = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cn.select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            F.round("c_acctbal", 2).cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("dr"),
            F.round(F.lag("c_acctbal", 1).over(w), 2).cast("double").alias("prev_bal"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.round(F.nth_value("c_acctbal", 2).over(w), 2).cast("double").alias("second_bal"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("nation", "rn")
    )


WINDOW_SHOWCASE_SQL = """
WITH cn AS (
  SELECT n_name AS nation, c_custkey, c_acctbal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
ranked AS (
  SELECT nation, c_custkey,
         CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS acctbal,
         ROW_NUMBER() OVER w AS rn,
         DENSE_RANK() OVER w AS dr,
         CAST(ROUND(LAG(c_acctbal, 1) OVER w, 2) AS DOUBLE) AS prev_bal,
         NTILE(4) OVER w AS quartile,
         PERCENT_RANK() OVER w AS pct_rank,
         CUME_DIST() OVER w AS cume,
         CAST(ROUND(NTH_VALUE(c_acctbal, 2) OVER w, 2) AS DOUBLE) AS second_bal
  FROM cn
  WINDOW w AS (PARTITION BY nation ORDER BY c_acctbal DESC, c_custkey ASC)
)
SELECT * FROM ranked WHERE rn <= 3 ORDER BY nation, rn
"""


def tpch_q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's join shape (EXISTS + NOT EXISTS on the same fact table with
    different correlated predicates) adapted to the synthetic lineitem (no
    receipt/commit dates): suppliers who were the SOLE returning supplier
    (l_returnflag = 'R') in orders that involved more than one supplier;
    count such lineitems per supplier, top 10.

    The scale-correct plan decorrelates BOTH subqueries into one per-order
    aggregate computed in a single lineitem pass:
      EXISTS(other supplier in order)            ⇔ n_supp > 1
      NOT EXISTS(other RETURNING supplier)       ⇔ n_return_supp = 1
    then joins the R-flagged lineitems against the |orders|-sized aggregate.
    The naive correlated form (the oracle) rescans lineitem per row — the
    oracle cross-checks that the rewrite is semantics-preserving."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_return_supp"),
    )
    l1 = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        l1.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_return_supp") == 1))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("suppkey"))
        .limit(10)
    )


Q21_SQL = """
SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
FROM lineitem l1
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY l1.l_suppkey
ORDER BY numwait DESC, suppkey ASC
LIMIT 10
"""


def tpch_full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join family the suite did not yet gate
    (inner / left outer / semi / anti / disjunctive all have driver
    rows): per-nation coverage of high-balance customers vs low-cost
    suppliers, where each side's filter leaves some nations one-sided so
    BOTH null-preserving directions are exercised in the checked result.
    Scale note: a full outer equi-join shuffles both sides on the key
    like any join; what it cannot do is broadcast (neither side may be
    build-side-only), which is why Catalyst plans it as a sort-merge —
    the correct plan, not a missed optimization."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    hc = (
        customer.filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_cust"))
    )
    ls = (
        supplier.filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_debt_supp"))
    )
    return (
        hc.join(ls, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
            F.coalesce("n_debt_supp", F.lit(0)).alias("n_debt_supp"),
        )
        .orderBy("nationkey")
    )


FULL_OUTER_SQL = """
WITH hc AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_rich_cust
  FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
),
ls AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_debt_supp
  FROM supplier WHERE s_acctbal < 0 GROUP BY s_nationkey
)
SELECT COALESCE(hc.nk, ls.nk) AS nationkey,
       COALESCE(n_rich_cust, 0) AS n_rich_cust,
       COALESCE(n_debt_supp, 0) AS n_debt_supp
FROM hc FULL OUTER JOIN ls ON hc.nk = ls.nk
ORDER BY nationkey
"""


def t_unpivot_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long), the inverse of the gated pivot: per-nation
    customer/supplier counts melted to (nationkey, metric, n) rows via
    stack() — the codegen'd melt that stays scan-pipelined (each input
    row fans out to a fixed small number of output rows, no shuffle
    beyond the upstream aggregate)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    wide = (
        customer.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .join(
            supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
                F.count(F.lit(1)).alias("n_supp")
            ),
            "nationkey",
        )
    )
    return wide.select(
        "nationkey",
        F.expr(
            "stack(2, 'customers', n_cust, 'suppliers', n_supp)"
            " as (metric, n)"
        ),
    ).orderBy("nationkey", "metric")


UNPIVOT_SQL = """
WITH wide AS (
  SELECT c.nationkey, c.n_cust, s.n_supp
  FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
        FROM customer GROUP BY 1) c
  JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
        FROM supplier GROUP BY 1) s USING (nationkey)
)
SELECT nationkey, 'customers' AS metric, n_cust AS n FROM wide
UNION ALL
SELECT nationkey, 'suppliers', n_supp FROM wide
ORDER BY nationkey, metric
"""


def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiset) semantics, the set-op
    variants set_customer_overlap's DISTINCT forms cannot express:
    duplicates count with multiplicity, so the result is sensitive to HOW
    MANY times a key appears on each side (here: nations of high-balance
    customers as a bag vs nations of suppliers as a bag — a nation with 5
    rich customers and 2 suppliers contributes 2 to the intersection and
    3 to the except). Spark plans both as aggregate+generate (count
    per key on each side, replicate by min / by difference) — exactly
    the map-side-combinable shape the bag algebra needs at scale."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    sn = supplier.select(F.col("s_nationkey").alias("nk"))
    both = cn.intersectAll(sn).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("intersect_all").alias("op"), "n")
    only = cn.exceptAll(sn).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("except_all").alias("op"), "n")
    return both.unionAll(only).orderBy("op")


SET_BAG_SQL = """
WITH cn AS (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000),
sn AS (SELECT s_nationkey AS nk FROM supplier)
SELECT 'except_all' AS op, COUNT(*) AS n FROM (
  SELECT nk FROM cn EXCEPT ALL SELECT nk FROM sn
)
UNION ALL
SELECT 'intersect_all', COUNT(*) FROM (
  SELECT nk FROM cn INTERSECT ALL SELECT nk FROM sn
)
ORDER BY op
"""


LATERAL_SQL = """
SELECT n_name, c_custkey, c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
)
ORDER BY n_name, c_acctbal DESC, c_custkey
"""


def tpch_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:1999 lateral derived table, the
    CROSS APPLY idiom): for each nation, its top-2 customers by balance —
    the per-outer-row parameterized subquery surface that plain joins
    can't express directly. The engine story is the point: Catalyst
    DECORRELATES the per-nation ORDER BY ... LIMIT 2 into a
    WindowGroupLimit (rank push-down with a map-side partial top-k before
    the shuffle) + one broadcast join — not a re-executed subquery per
    outer row, which is what a naive LATERAL implementation (and the
    oracle's nested-loop reading) would do. Same text runs on DuckDB.

    100 TB shape: partial WindowGroupLimit bounds every map task's output
    at k rows per group BEFORE the exchange, so the shuffle carries
    ~|groups|·k rows, and the outer side is a broadcast dim join."""
    from .. import data as _data

    nation = _data.load_table(spark, sf_dir, "nation")
    customer = _data.load_table(spark, sf_dir, "customer")
    return spark.sql(
        LATERAL_SQL.replace("FROM nation n", "FROM {n} n").replace(
            "FROM customer", "FROM {c}"
        ),
        n=nation,
        c=customer,
    )


QUERIES = {
    "tpch_q4_semi_join": tpch_q4_semi_join,
    "tpch_q21_sole_returner": tpch_q21_sole_returner,
    "tpch_q22_anti_join": tpch_q22_anti_join,
    "tpch_q13_outer_join": tpch_q13_outer_join,
    "tpch_q6_revenue": tpch_q6_revenue,
    "tpch_q17_small_qty": tpch_q17_small_qty,
    "set_customer_overlap": set_customer_overlap,
    "window_showcase": window_showcase,
    "tpch_full_outer_nation_coverage": tpch_full_outer_nation_coverage,
    "t_unpivot_nation_stats": t_unpivot_nation_stats,
    "set_bag_ops": set_bag_ops,
    "tpch_lateral_topk": tpch_lateral_topk,
}

ORACLE = {
    "tpch_q4_semi_join": Q4_SQL,
    "tpch_q21_sole_returner": Q21_SQL,
    "tpch_q22_anti_join": Q22_SQL,
    "tpch_q13_outer_join": Q13_SQL,
    "tpch_q6_revenue": Q6_SQL,
    "tpch_q17_small_qty": Q17_SQL,
    "set_customer_overlap": SET_OVERLAP_SQL,
    "window_showcase": WINDOW_SHOWCASE_SQL,
    "tpch_full_outer_nation_coverage": FULL_OUTER_SQL,
    "t_unpivot_nation_stats": UNPIVOT_SQL,
    "set_bag_ops": SET_BAG_SQL,
    "tpch_lateral_topk": LATERAL_SQL,
}
