"""As-of join — the point-in-time join Spark has no native operator for.

Semantics (matching DuckDB's ASOF JOIN): for each left row, attach the
right row with the greatest `ts` ≤ the left row's `ts` within the same key
group; left rows with no prior right row keep NULLs (LEFT semantics).

Scale design — the naive formulations both explode:
- an equi+range join (`l.user = r.user AND r.ts <= l.ts`) produces the full
  O(|l| x |r|) per-key prefix stream before a per-row max;
- a correlated MAX subquery rescans the right side per left row.

The Spark-first plan is **union + window carry-forward**: tag both sides,
union them, and run `last(right_col, ignorenulls=True)` over a window
partitioned by key, ordered by (ts, side, id), framed UNBOUNDED
PRECEDING..CURRENT ROW. One shuffle on the key, one sort, linear in
|l|+|r| — the running-frame machinery Spark already optimizes
(UnboundedPreceding frames keep O(1) state per row). Ordering puts the
right side (side=0) before the left (side=1) at equal ts, which is exactly
ASOF's `>=` tie rule; the unique id tiebreak makes the sort total, so the
result is deterministic under any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_ts_as: str = "asof_ts",
) -> DataFrame:
    """Attach to each `left` row the greatest right-`ts` ≤ its `ts` (same
    `key`), as column `right_ts_as`. Left columns pass through unchanged."""
    lcols = [c for c in left.columns]
    tagged = left.select(
        *lcols, F.lit(1).alias("__side"), F.lit(None).cast("timestamp").alias("__rts")
    ).unionByName(
        right.select(
            F.col(key), F.col(ts), F.col(ts).alias("__rts"), F.lit(0).alias("__side")
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__side"), F.col("__rts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(right_ts_as, F.last("__rts", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__rts")
    )


def ev_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the user's most recent click at-or-before
    the purchase, and the microsecond gap (NULL when no prior click) —
    attribution, the canonical as-of workload."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts", right_ts_as="click_ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    ).orderBy("event_id")


EV_ASOF_SQL = """
SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
       c.ts AS click_ts,
       date_diff('microsecond', c.ts, p.ts) AS gap_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY event_id
"""


QUERIES = {"ev_asof_click_before_purchase": ev_asof_click_before_purchase}
ORACLE = {"ev_asof_click_before_purchase": EV_ASOF_SQL}
