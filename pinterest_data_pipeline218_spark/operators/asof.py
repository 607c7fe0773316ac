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
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.types import TimestampNTZType

from ..data import load_table


def _epoch_us(df: DataFrame, col: str) -> Column:
    """Epoch microseconds for a timestamp column of EITHER dtype.

    `unix_micros` rejects TIMESTAMP_NTZ; for NTZ we difference against the
    NTZ epoch literal instead — pure wall-clock arithmetic, no session-tz
    dependence, exact integer µs.

    DTYPE CONTRACT: callers comparing the two sides' epochs ABSOLUTELY
    (range_join_count's `BETWEEN ± radius`, asof's carry-forward ordering)
    must feed both sides the SAME timestamp dtype. Mixing NTZ (wall-as-UTC)
    with LTZ under a non-UTC session timezone shifts one side by the tz
    offset. A per-side monotone mapping is only sufficient for same-side
    bucketing, not for the cross-side predicate — asserted at the asof/range
    entry points via `_assert_same_ts_dtype`."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def _assert_same_ts_dtype(left: DataFrame, lcol: str, right: DataFrame, rcol: str):
    """Both sides of an absolute-epoch comparison must share a timestamp
    dtype (see _epoch_us's DTYPE CONTRACT)."""
    lt, rt = left.schema[lcol].dataType, right.schema[rcol].dataType
    if lt != rt:
        raise TypeError(
            f"asof/range join requires matching timestamp dtypes on both "
            f"sides; got {lt.simpleString()} vs {rt.simpleString()} — "
            f"cast one side (NTZ↔LTZ mixing shifts results by the session "
            f"tz offset)"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_ts_as: str = "asof_ts",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Attach to each `left` row the nearest right-`ts` (same `key`), as
    column `right_ts_as`. Left columns pass through unchanged.

    - ``direction='backward'`` (default): greatest right ts ≤ left ts —
      DuckDB ASOF / pandas merge_asof default.
    - ``direction='forward'``: smallest right ts ≥ left ts. Same
      union + carry-forward plan with the traversal order reversed; the
      side tiebreak keeps rights before lefts at equal ts, which is the
      ``≥``-inclusive tie rule.
    - ``tolerance_us``: maximum |gap| in microseconds (pandas merge_asof's
      `tolerance`). Applied AFTER the carry-forward as a null-out: the
      carry always surfaces the nearest candidate, so if the nearest is
      out of tolerance, no match exists — one scan-local expression, no
      extra join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    _assert_same_ts_dtype(left, ts, right, ts)
    lcols = [c for c in left.columns]
    # The null literal's dtype must match the right side's ts dtype (NTZ vs
    # LTZ) or the union coerces with an illegal/implicit cast — derive it
    # from the schema instead of hardcoding "timestamp".
    ts_type = right.schema[ts].dataType
    tagged = left.select(
        *lcols, F.lit(1).alias("__side"), F.lit(None).cast(ts_type).alias("__rts")
    ).unionByName(
        right.select(
            F.col(key), F.col(ts), F.col(ts).alias("__rts"), F.lit(0).alias("__side")
        ),
        allowMissingColumns=True,
    )
    ts_order = F.col(ts) if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("__side"), F.col("__rts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tagged.withColumn(right_ts_as, F.last("__rts", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__rts")
    )
    if tolerance_us is not None:
        gap = F.abs(F.expr(f"timestampdiff(MICROSECOND, `{right_ts_as}`, `{ts}`)"))
        out = out.withColumn(
            right_ts_as,
            F.when(gap <= tolerance_us, F.col(right_ts_as)),
        )
    return out


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
    # timestampdiff works for TIMESTAMP and TIMESTAMP_NTZ alike (unix_micros
    # rejects NTZ); NULL click_ts propagates to a NULL gap either way.
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_ts",
        F.expr("timestampdiff(MICROSECOND, click_ts, ts)").alias("gap_us"),
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


US_PER_HOUR = 3_600_000_000


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    radius_us: int,
    count_as: str = "n_in_range",
) -> DataFrame:
    """Count right rows within ±radius of each left row's timestamp (same
    key) — the interval/range join, bucketized so it scales.

    A naive `l.key = r.key AND r.ts BETWEEN l.ts-R AND l.ts+R` join gives
    Spark only the equi-key to hash on; a hot key degenerates to its full
    cross product before the range filter. Here both sides are bucketed to
    R-sized epochs and the left side explodes to its 3 adjacent buckets, so
    the join is a 2-column equi-join (key, bucket): candidate pairs are
    bounded by bucket co-occupancy, and every true match lands in exactly
    one of the 3 buckets (a right row matches only via its OWN bucket — no
    double counting). LEFT semantics: zero-match left rows count 0.
    """
    # integer div, not float-divide-then-cast: µs epochs are near 2^50, where
    # a double quotient's rounding could (in principle) flip a bucket edge.
    # Epochs via _epoch_us: dtype-agnostic (TIMESTAMP_NTZ rejects unix_micros).
    _assert_same_ts_dtype(left, left_ts, right, right_ts)
    lx = left.withColumn("__lus", _epoch_us(left, left_ts))
    lb = F.expr(f"__lus div {radius_us}")
    lx = lx.withColumn("__b", F.explode(F.array(lb - 1, lb, lb + 1)))
    rx = right.select(
        F.col(key).alias("__rk"), _epoch_us(right, right_ts).alias("__rus")
    ).withColumn("__rb", F.expr(f"__rus div {radius_us}"))
    in_range = F.col("__rus").between(
        F.col("__lus") - radius_us, F.col("__lus") + radius_us
    )
    return (
        lx.join(rx, (F.col(key) == F.col("__rk")) & (F.col("__b") == F.col("__rb")) & in_range, "left")
        .groupBy(*[F.col(c) for c in left.columns])
        .agg(F.count("__rus").alias(count_as))
    )


def ev_errors_near_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase: how many error events the same user had within
    ±1 hour — the blast-radius/interval-join workload."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    out = range_join_count(
        purchases, errors, key="user_id", left_ts="ts", right_ts="ts",
        radius_us=US_PER_HOUR, count_as="n_errors_1h",
    )
    return out.select("event_id", "user_id", "n_errors_1h").orderBy("event_id")


EV_RANGE_SQL = f"""
SELECT p.event_id AS event_id, p.user_id AS user_id,
       CAST(COUNT(e.ts) AS BIGINT) AS n_errors_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND epoch_us(e.ts) BETWEEN epoch_us(p.ts) - {US_PER_HOUR} AND epoch_us(p.ts) + {US_PER_HOUR}
GROUP BY p.event_id, p.user_id
ORDER BY event_id
"""


QUERIES = {
    "ev_asof_click_before_purchase": ev_asof_click_before_purchase,
    "ev_errors_near_purchase": ev_errors_near_purchase,
}
ORACLE = {
    "ev_asof_click_before_purchase": EV_ASOF_SQL,
    "ev_errors_near_purchase": EV_RANGE_SQL,
}
