"""Event-stream analytics over the `events` table.

The reference's streaming surface is pure stateless ETL to an append sink
(Kinesis_Processing.ipynb cells 8-32); SURVEY.md §2.9/ST4 declares windowed
event-time aggregation as the engine's streaming-analytics extension. These
are the *batch* formulations of those operators — the identical expressions
run unchanged on a streaming DataFrame (see streaming/pipeline.py), which is
the core Structured Streaming design point.

Scale notes:
- tumbling-window counts are a single shuffle on (window, type) with map-side
  partial aggregation;
- sessionization is a window function over (user_id, ts) — one shuffle-sort
  per user partition, no driver-side state;
- running totals keep the same sort order, so Catalyst reuses the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table

SESSION_GAP_SECONDS = 1800


def ev_counts_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts per type (F.window ≡ date_trunc for
    hour-aligned tumbling windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


EV_COUNTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def ev_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value stats; sums via DECIMAL for exact, order-independent
    aggregation."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(v).cast("double").alias("total_value"),
            (F.sum(v).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


EV_STATS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def ev_json_extract_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: extract a numeric field and aggregate.
    (The reference's from_json blob-decode idiom, S4; regexp form keeps the
    oracle engine-neutral.)"""
    ev = load_table(spark, sf_dir, "events")
    # try_cast: props with no digits extract '' — NULL, not an ANSI cast error
    k = F.regexp_extract("props", r"[0-9]+", 0).try_cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


EV_JSON_SQL = """
SELECT event_type,
       CAST(SUM(TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def ev_json_schema_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parse of the props column — the REAL parser
    (`from_json` with a declared schema, the reference's S4 blob-decode
    idiom applied to a nested column), where ev_json_extract_sum's regexp
    rendering only pattern-matches digits: a malformed document or a
    quoted number behaves like JSON says it should, not like a regex
    does. Per type: sum/min/max of the parsed field plus a bad-document
    count (from_json yields NULL on corrupt input — the quarantine
    contract, countable). Scan-local parse, one grouped agg."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint").getField("k")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k").isNull() & F.col("props").isNotNull(), 1)).alias(
                "n_bad"
            ),
        )
        .orderBy("event_type")
    )


EV_JSON_SCHEMA_SQL = """
WITH p AS (
  SELECT event_type, props,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(COUNT(CASE WHEN k IS NULL AND props IS NOT NULL THEN 1 END) AS BIGINT) AS n_bad
FROM p GROUP BY event_type ORDER BY event_type
"""


def ev_sessions_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: number of activity sessions per user with a 30-minute
    inactivity gap. lag → gap flag → running sum (the streaming equivalent is
    `F.session_window`)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Timestamp difference vs an interval literal, NOT cast-to-double: valid
    # for both TIMESTAMP and TIMESTAMP_NTZ (NTZ rejects numeric casts), and
    # stays exact integer µs arithmetic instead of double seconds.
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            gap > F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECONDS"), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("user_id")
        .agg((F.lit(1) + F.sum("new_sess")).alias("n_sessions"))
        .orderBy("user_id")
    )


EV_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_SECONDS} SECONDS
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(1 + SUM(new_sess) AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id ORDER BY user_id
"""


def ev_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user value total — the reference's vestigial frame spec
    `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
    (BatchProcessingFinal.ipynb:1533, W3). DECIMAL keeps the fold exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    ).orderBy("event_id")


EV_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events ORDER BY event_id
"""


def ev_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type sums/counts via salted two-phase aggregation
    (functions/skew.py): `event_type` has single-digit cardinality, the
    textbook skewed grouping — a plain groupBy puts each type's whole weight
    on one reducer; salting makes phase 1 uniform. DECIMAL sums mean the
    result is bit-identical to the unsalted aggregate (the oracle)."""
    from ..functions.skew import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    out = salted_sum_count(
        ev, ["event_type"], F.col("value").cast("decimal(18,2)"), salt_from="event_id"
    )
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("total_value"),
        F.col("n_rows").alias("n_events"),
    ).orderBy("event_type")


EV_SALTED_STATS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def ev_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via salted two-phase distinct:
    the (type, user) pairs dedup under (type, salt-of-user) partitions, then
    the per-salt distinct counts sum exactly — no single reducer ever sees a
    hot type's full user set."""
    from ..functions.skew import salted_count_distinct

    ev = load_table(spark, sf_dir, "events")
    return (
        salted_count_distinct(ev, ["event_type"], "user_id")
        .select("event_type", F.col("n_distinct").alias("n_users"))
        .orderBy("event_type")
    )


EV_SALTED_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def ev_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(event_type, day): per-(type, day) counts plus per-type and
    grand-total subtotal rows in one aggregation pass — Catalyst expands the
    grouping sets so partial aggregation still applies. NULL grouping
    columns on subtotal rows are labeled explicitly (COALESCE) so the
    subtotal rows are distinguishable from genuine NULL keys."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", F.to_date("ts").cast("string").alias("day"), "value")
    return (
        base.rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("day", F.lit("<all>")).alias("day"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "day")
    )


EV_ROLLUP_SQL = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '<all>') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
ORDER BY event_type, day
"""

def ev_cube_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(event_type, day-of-week): all four grouping sets — (type, dow),
    (type), (dow), () — in one aggregation pass, completing the
    grouping-sets family next to ev_rollup_daily's ROLLUP. dow is
    `dayofweek(ts) - 1` so it equals DuckDB's date_part('dow') (Sunday=0)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow"), "value"
    )
    return (
        base.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("<all>")).alias("dow"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "dow")
    )


EV_CUBE_SQL = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(date_part('dow', ts) AS VARCHAR), '<all>') AS dow,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(date_part('dow', ts) AS VARCHAR))
ORDER BY event_type, dow
"""


def ev_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type — the scale path for
    count-distinct: one pass, fixed sketch memory per group, mergeable
    across partitions, where the exact form shuffles every distinct key.

    ORACLED VIA BOUNDS ATTESTATION (r11): sketch internals are
    engine-specific, so the raw estimate can never hash-match DuckDB.
    Instead the gated output carries the EXACT count plus a boolean each
    engine computes from its own sketch — `approx_within_5pct` =
    20·|est − exact| ≤ max(20, exact), i.e. |err| ≤ max(1, 5%·exact),
    integer arithmetic so there is no float edge. Spark attests its
    HLL++ (rsd 2%); the DuckDB oracle attests its own HLL the same way.
    A sketch drifting past the bound flips the boolean on one side only
    → hash mismatch → red row. The exact aggregate exists here purely as
    the verification harness; the production operator at 100 TB is the
    sketch alone (the old estimate-only rendering is one `.agg` away).
    pytest additionally bounds the raw estimate (test_approx_distinct_
    within_bound)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("a") - F.col("exact_users")) * 20
                <= F.greatest(F.lit(20), F.col("exact_users"))
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


EV_APPROX_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id)) * 20
         <= GREATEST(20, COUNT(DISTINCT user_id)) AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


HLL_LGK = 14


def hll_daily_sketches(ev: DataFrame) -> DataFrame:
    """(event_type, week, day, sk): the materialized daily HLL sketch
    table — shared VERBATIM by the gated batch rollup and the streaming
    per-micro-batch upsert (`streaming.pipeline.hll_state_batch`), which
    is what makes stream == batch sketch equality exact by construction:
    DataSketches HLL union at equal lgConfigK is a lossless register-wise
    max, so per-batch partial sketches union to exactly the sketch one
    pass over the union would build."""
    return (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            "user_id",
        )
        .groupBy("event_type", F.expr("day div 7").alias("week"), "day")
        .agg(F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("sk"))
    )


def hll_weekly_rollup(daily: DataFrame) -> DataFrame:
    """(event_type, week, est, n_days) from a daily sketch table — the
    read-side weekly union shared by the batch query and the streaming
    assembly. Never re-scans raw data: input is one bounded blob per
    (type, week, day)."""
    return daily.groupBy("event_type", "week").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.count(F.lit(1)).alias("n_days"),
    )


def ev_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-sketch rollup (r11) — THE 100 TB distinct-count
    pattern: per (event_type, day) an HLL SKETCH is materialized (what a
    production system writes to its metrics store, one bounded blob per
    partition instead of the raw keys), and weekly distinct users come
    from hll_union_agg over the stored daily sketches — never from
    re-scanning raw data. DataSketches HLL union at equal lgConfigK is
    LOSSLESS (register-wise max), so the two-level estimate is
    bit-identical to a direct single-pass sketch of the union —
    pytest-pinned (test_hll_daily_rollup_union_is_lossless).

    ORACLED VIA BOUNDS ATTESTATION like its r11 sketch siblings: the
    gated output is the exact weekly distinct count plus a boolean
    attesting the union estimate lands within max(1, 5%·exact)
    (lgK=14 → rsd 0.8%, 6× inside the bound); the DuckDB oracle attests
    its own per-week HLL the same way. Week = epoch-day div 7
    (convention-free integer arithmetic, like ev_seasonal_dow's dow).

    Plan: one grouped sketch-agg (map-side mergeable like every
    DataSketches aggregate), one union-agg over |days| sketch rows, one
    exact count-distinct as the verification harness. At 100 TB the
    exact side disappears and the daily sketch table IS the input."""
    ev = load_table(spark, sf_dir, "events")
    daily = hll_daily_sketches(ev)
    weekly = hll_weekly_rollup(daily)
    base = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "user_id",
    )
    exact = base.groupBy(
        "event_type", F.expr("day div 7").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_weekly_users"))
    return (
        exact.join(weekly, ["event_type", "week"])
        .select(
            "event_type",
            "week",
            "n_days",
            "exact_weekly_users",
            (
                F.abs(F.col("est") - F.col("exact_weekly_users")) * 20
                <= F.greatest(F.lit(20), F.col("exact_weekly_users"))
            ).alias("union_within_5pct"),
        )
        .orderBy("event_type", "week")
    )


EV_HLL_ROLLUP_SQL = """
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         user_id
  FROM events
)
SELECT event_type,
       CAST(day // 7 AS BIGINT) AS week,
       COUNT(DISTINCT day) AS n_days,
       COUNT(DISTINCT user_id) AS exact_weekly_users,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id)) * 20
         <= GREATEST(20, COUNT(DISTINCT user_id)) AS union_within_5pct
FROM base
GROUP BY event_type, day // 7
ORDER BY event_type, week
"""


PIVOT_TYPES = ["click", "purchase", "scroll", "share", "view"]


def ev_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns per user. The pivot value list is
    explicit: at scale an implicit pivot runs a distinct-values job first
    and bakes an unbounded column count into the schema."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PIVOT_TYPES)
        .orderBy("user_id")
    )


EV_PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'scroll' THEN 1 ELSE 0 END) AS BIGINT) AS scroll,
       CAST(SUM(CASE WHEN event_type = 'share' THEN 1 ELSE 0 END) AS BIGINT) AS share,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


def ev_sliding_1h_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the same user's event count and value sum over the
    PRECEDING hour — a time-RANGE window frame (`RANGE BETWEEN INTERVAL 1
    HOUR PRECEDING AND CURRENT ROW`), the W-family member ROWS frames can't
    express (the frame is defined by the ORDER-BY value, not row position,
    so ties and gaps behave correctly by construction).

    Scale: one shuffle on user_id + one sort — identical cost profile to
    ev_running_total; Spark's range-frame machinery keeps a sliding
    aggregate state, not the whole frame. RANGE aggregates are
    order-insensitive within ts ties, so the result is deterministic
    without an event_id tiebreak. DECIMAL keeps the sum exact."""
    ev = load_table(spark, sf_dir, "events")
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id",
        "user_id",
        F.expr(f"count(*) {over}").alias("n_1h"),
        F.expr(f"cast(sum(cast(value as decimal(18,2))) {over} as double)").alias(
            "value_1h"
        ),
    ).orderBy("event_id")


EV_SLIDING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def ev_approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p95 of `value` via percentile_approx (the
    KLL/GK-family mergeable quantile sketch) — the sketch a 100 TB engine
    uses where an exact percentile would need a full sort per group.

    ORACLED VIA RANK-BOUND ATTESTATION (r11): the estimates themselves
    are engine-specific (Spark GK returns an order statistic, DuckDB
    t-digest interpolates), so the gated output is the group size plus a
    rank-interval boolean each engine computes from its own estimate:
    the estimate's rank interval [cnt_lt+1, cnt_le] must intersect
    [(q−2%)·n, (q+2%)·n] — tie-safe (a heavily-tied exact median still
    passes because cnt_lt stays low even when cnt_le overshoots) and
    integer-exact (cross-multiplied, no float ranks). Either sketch
    drifting past 2% rank error flips its own boolean → hash mismatch →
    red. GK at accuracy 10 000 has rank error ≤ 0.01% — 200× inside the
    bound. Plan: the 5-row approx aggregate broadcasts back onto ONE
    verification scan (the ev_trend_slope shape); both aggregates
    map-side combinable. pytest separately pins the estimates to ±1 rank
    (test_approx_quantiles_land_on_correct_order_statistics)."""
    ev = load_table(spark, sf_dir, "events")
    appx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10_000).alias("p50a"),
        F.percentile_approx("value", 0.95, 10_000).alias("p95a"),
    )
    j = ev.select("event_type", "value").join(F.broadcast(appx), "event_type")
    counted = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("value") < F.col("p50a"), 1)).alias("lt50"),
        F.count(F.when(F.col("value") <= F.col("p50a"), 1)).alias("le50"),
        F.count(F.when(F.col("value") < F.col("p95a"), 1)).alias("lt95"),
        F.count(F.when(F.col("value") <= F.col("p95a"), 1)).alias("le95"),
    )
    n = F.col("n_events")
    return counted.select(
        "event_type",
        "n_events",
        ((F.col("lt50") * 100 <= n * 52) & (F.col("le50") * 100 >= n * 48)).alias(
            "p50_rank_ok"
        ),
        ((F.col("lt95") * 100 <= n * 97) & (F.col("le95") * 100 >= n * 93)).alias(
            "p95_rank_ok"
        ),
    ).orderBy("event_type")


EV_APPROX_QUANTILES_SQL = """
WITH appx AS (
  SELECT event_type,
         approx_quantile(value, 0.5) AS p50a,
         approx_quantile(value, 0.95) AS p95a
  FROM events GROUP BY 1
), counted AS (
  SELECT e.event_type,
         COUNT(*) AS n_events,
         COUNT(CASE WHEN value < p50a THEN 1 END) AS lt50,
         COUNT(CASE WHEN value <= p50a THEN 1 END) AS le50,
         COUNT(CASE WHEN value < p95a THEN 1 END) AS lt95,
         COUNT(CASE WHEN value <= p95a THEN 1 END) AS le95
  FROM events e JOIN appx USING (event_type)
  GROUP BY 1
)
SELECT event_type, n_events,
       (lt50 * 100 <= n_events * 52 AND le50 * 100 >= n_events * 48) AS p50_rank_ok,
       (lt95 * 100 <= n_events * 97 AND le95 * 100 >= n_events * 93) AS p95_rank_ok
FROM counted
ORDER BY event_type
"""


def ev_theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over per-segment distinct-user sketches:
    distinct users who clicked, who purchased, who did BOTH
    (intersection) and EITHER (union) — the audience-overlap question a
    100 TB engine answers with mergeable sketches, because plain HLL
    cannot intersect and the exact form is a full distinct-join per
    segment pair. One pass builds one bounded-size sketch per event type
    (map-side mergeable, like all DataSketches aggs); the set algebra
    then runs on two 1-row sketch blobs — a broadcast crossJoin of
    query-planning state, not data.

    Sketch family member #3 (HLL = distinct, KLL/percentile_approx =
    quantiles, theta = distinct WITH set operations).

    ORACLED VIA BOUNDS ATTESTATION (r11): the gated output carries the
    four EXACT cardinalities (one per-user flag pass — bool_or(click),
    bool_or(purchase), then one 1-row count; both engines compute these
    identically) plus four booleans attesting each theta estimate is
    within max(1, 2%) of its exact value — except the intersection, which
    attests within max(1, 2% of EITHER_USERS), because theta intersection
    error scales with the union cardinality (the relative-error guarantee
    is on the union-sized sample the intersection is estimated from), so
    a 2%-of-exact bound on a small overlap inside a big union would flip
    red on a healthy sketch at larger SFs. DuckDB has no theta sketch, so
    its oracle emits the literal TRUE expectation — the gate therefore
    reads "Spark's theta estimates must all be inside the bound", which
    is exactly the contract pytest pins (test_theta_sketch_overlap_
    matches_exact_sets). The exact side exists as the verification
    harness; the 100 TB operator is the sketch algebra (mergeable
    bounded-size sketches, intersection/union on two 1-row blobs)."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    # each filter keeps exactly one group row; limit(1) makes the 1-row
    # bound provable (logical maxRows=1) so the cross join is an asserted
    # 1-row broadcast in the plan audit
    a = (
        sk.filter(F.col("event_type") == "click")
        .select(F.col("sk").alias("a"))
        .limit(1)
    )
    b = (
        sk.filter(F.col("event_type") == "purchase")
        .select(F.col("sk").alias("b"))
        .limit(1)
    )
    est = a.crossJoin(F.broadcast(b)).select(
        F.expr("theta_sketch_estimate(a)").alias("est_click"),
        F.expr("theta_sketch_estimate(b)").alias("est_purchase"),
        F.expr("theta_sketch_estimate(theta_intersection(a, b))").alias(
            "est_both"
        ),
        F.expr("theta_sketch_estimate(theta_union(a, b))").alias("est_either"),
    )
    flags = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "c"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("p"),
        )
    )
    exact = flags.agg(
        F.sum("c").alias("click_users"),
        F.sum("p").alias("purchase_users"),
        F.sum(F.col("c") * F.col("p")).alias("both_users"),
        F.count(F.lit(1)).alias("either_users"),
    )

    def ok(est_col: str, exact_col: str, scale_col: str | None = None):
        # Theta INTERSECTION error scales with the UNION cardinality, not
        # the intersection (ADVICE r11): a small true overlap inside a big
        # union can carry absolute error ~2% of the union while the sketch
        # is perfectly healthy. So est_both attests against either_users;
        # the three sketches whose error tracks their own cardinality
        # attest against themselves.
        scale = F.col(scale_col or exact_col)
        return (
            F.abs(F.col(est_col) - F.col(exact_col))
            <= F.greatest(F.lit(1.0), scale * 0.02)
        ).alias(f"theta_{exact_col.split('_')[0]}_ok")

    return exact.crossJoin(F.broadcast(est)).select(
        "click_users",
        "purchase_users",
        "both_users",
        "either_users",
        ok("est_click", "click_users"),
        ok("est_purchase", "purchase_users"),
        ok("est_both", "both_users", scale_col="either_users"),
        ok("est_either", "either_users"),
    )


EV_THETA_OVERLAP_SQL = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
)
SELECT CAST(SUM(c) AS BIGINT) AS click_users,
       CAST(SUM(p) AS BIGINT) AS purchase_users,
       CAST(SUM(c * p) AS BIGINT) AS both_users,
       CAST(COUNT(*) AS BIGINT) AS either_users,
       TRUE AS theta_click_ok,
       TRUE AS theta_purchase_ok,
       TRUE AS theta_both_ok,
       TRUE AS theta_either_ok
FROM flags
"""


KMV_K = 256
KMV_HEX_CHARS = 13  # 52-bit hash: (k-1) * 2^52 stays inside int64 exactly
KMV_SCALE = 1 << (4 * KMV_HEX_CHARS)
KMV_SALT_BUCKETS = 64


def kmv_hashes(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, h): the distinct 52-bit hash set per group — the raw
    material both the batch sketch and the streaming partial sketches
    consume."""
    from ..functions.text import token_hash

    return df.select(
        F.col(group_col).alias("g"),
        token_hash(
            F.col(key_col).cast("string"), hex_chars=KMV_HEX_CHARS
        ).alias("h"),
    ).distinct()


def kmv_estimate_from_hashes(d: DataFrame, k: int = KMV_K) -> DataFrame:
    """(g, kmv_users): the KMV estimator over a distinct (g, h) hash set
    — shared verbatim by the gated batch query and the incremental
    streaming assembly, which is what makes stream == batch equality
    hold by construction (min-k of a union equals min-k of the union of
    per-batch min-k sets, and below k total hashes the union is complete
    so exact mode sees the true distinct count)."""
    w1 = Window.partitionBy("g", "salt").orderBy("h")
    cand = (
        d.withColumn("salt", F.pmod(F.col("h"), F.lit(KMV_SALT_BUCKETS)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("g").orderBy("h")
    kth = (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == k)
        .select("g", F.col("h").alias("kth"))
    )
    n = d.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    return (
        n.join(kth, "g", "left")
        .select(
            "g",
            F.when(F.col("nd") < k, F.col("nd"))
            .otherwise(F.expr(f"({k - 1}L * {KMV_SCALE}L) div kth"))
            .alias("kmv_users"),
        )
        .orderBy("g")
    )


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — sketch
    family member #4, and the one with an ENGINE-INDEPENDENT contract:
    where HLL/KLL/theta estimates depend on engine-internal sketch
    encodings (their gated queries are deliberately rows-only), KMV over
    a deterministic md5-derived hash is bit-reproducible anywhere, so
    `ev_kmv_distinct_users` carries a full value-exact DuckDB oracle.
    Estimator: with h uniform on [0, 2^52), the k-th smallest distinct
    hash value estimates density, so n_distinct ~= (k-1) * 2^52 / h_(k);
    below k distinct keys the sketch IS the exact answer (exact mode).
    All arithmetic is integer (52-bit hash so (k-1) * 2^52 fits int64;
    both engines truncate positive integer division identically).

    100 TB shape: the candidate generation is a TWO-LEVEL min-k — a
    per-(group, salt) row_number keeps the k smallest hashes inside each
    of 64 salt buckets (bounded sort groups, map-side parallel), then a
    per-group pass over <= 64k surviving candidates takes the global
    k-th. That second level is exactly a KMV MERGE (union candidate
    sets, re-take the k smallest) — each salt bucket is a partial
    sketch, which is the mergeability argument for running this over
    100 TB partitions or micro-batches. The exact-count fallback `nd`
    is a plain distinct count only groups in exact mode consult;
    at scale the estimate branch never needs it, and Catalyst computes
    it from the same shuffled distinct set the sketch reads."""
    return kmv_estimate_from_hashes(
        kmv_hashes(df, group_col, key_col), k
    ).withColumnRenamed("g", group_col)


STREAK_MIN_RUN = 3


def click_streaks(ev: DataFrame, min_run: int = STREAK_MIN_RUN) -> DataFrame:
    """Maximal runs of CONSECUTIVE 'click' events per user (engagement
    bursts), length >= min_run — the classic gaps-and-islands idiom: a
    click's island id is its position among the user's ALL events minus
    its position among the user's clicks, constant exactly while no
    non-click interrupts. Ordering is total (ts, event_id) so islands are
    deterministic under timestamp ties. One shuffle on user_id + two
    same-ordered windows (Catalyst reuses the sort), then a small
    grouped aggregate over the islands."""
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_click = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = ev.withColumn("rn", F.row_number().over(w_all))
    clicks = rn.filter(F.col("event_type") == "click").withColumn(
        "island", F.col("rn") - F.row_number().over(w_click)
    )
    return (
        clicks.groupBy("user_id", "island")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_clicks"),
        )
        .filter(F.col("n_clicks") >= min_run)
        .select("user_id", "run_start", "run_end", "n_clicks")
        .orderBy("user_id", "run_start")
    )


def ev_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for semi-structured props — Spark 4's modern
    replacement for schema'd from_json when the schema is open-ended:
    try_parse_json shreds once into the binary VARIANT encoding, typed
    access is try_variant_get per field (no full-schema declaration, no
    re-parse per field). Same quarantine discipline as
    ev_json_schema_stats, split FINER: parse failures (not valid JSON →
    NULL variant) and type failures (valid JSON, field not castable)
    count separately. The oracle replays the identical semantics through
    DuckDB's json functions — the VALUES are engine-portable even though
    the variant encoding is not."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    parsed = ev.select(
        "event_type",
        "props",
        v.alias("v"),
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").alias(
            "k"
        ),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(
                F.when(F.col("v").isNull() & F.col("props").isNotNull(), 1)
            ).alias("n_parse_fail"),
            F.count(
                F.when(F.col("v").isNotNull() & F.col("k").isNull(), 1)
            ).alias("n_type_fail"),
        )
        .orderBy("event_type")
    )


EV_VARIANT_SQL = """
WITH p AS (
  SELECT event_type, props,
         TRY_CAST(props AS JSON) AS v,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(CASE WHEN v IS NULL AND props IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_parse_fail,
       CAST(COUNT(CASE WHEN v IS NOT NULL AND k IS NULL THEN 1 END) AS BIGINT)
         AS n_type_fail
FROM p GROUP BY event_type ORDER BY event_type
"""


def ev_click_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated rendering of click_streaks over the events table; the
    streaming twin (`streaming/stateful.streak_stream`) detects the same
    runs incrementally with applyInPandasWithState and is pytest-proved
    equal on closed runs."""
    return click_streaks(load_table(spark, sf_dir, "events"))


EV_STREAKS_SQL = f"""
WITH rn AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
clicks AS (
  SELECT user_id, ts,
         rn - row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
  FROM rn WHERE event_type = 'click'
)
SELECT user_id, MIN(ts) AS run_start, MAX(ts) AS run_end,
       COUNT(*) AS n_clicks
FROM clicks
GROUP BY user_id, island
HAVING COUNT(*) >= {STREAK_MIN_RUN}
ORDER BY user_id, run_start
"""


def ev_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling — the dense hourly series every metrics
    consumer expects from sparse event data: per type, materialize EVERY
    hour between that type's first and last event (sequence + explode —
    the grid generation no groupBy can produce), left-join the observed
    per-hour aggregates, zero-fill the counts, and carry the last
    observed hourly total forward across gaps (LOCF via
    last(ignorenulls=True) over an UNBOUNDED..CURRENT frame). Totals are
    DECIMAL cents so the carried values stay integer-exact.

    100 TB shape: the grid is |types| x |hours| rows (tiny relative to
    events), the observed aggregate is one map-side-combinable grouped
    count, the join is keyed on (type, hour) and the LOCF window sorts
    only the grid — the events table is scanned once and never sorted."""
    ev = load_table(spark, sf_dir, "events")
    return gapfill_from_hourly(gapfill_hourly_agg(ev))


def gapfill_hourly_agg(ev: DataFrame) -> DataFrame:
    """(event_type, h, n, v_cents): the per-hour observed aggregate —
    the MERGEABLE state of the gap-fill dashboard: counts and cent sums
    add, and the grid bounds are derivable (min/max of the observed
    hours), so per-batch partials summed at assembly feed the identical
    finisher (stream == batch exactly)."""
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "cast(sum(cast(try_cast(value as decimal(18,2)) * 100 as bigint))"
            " as bigint)"
        ).alias("v_cents"),
    )


def gapfill_from_hourly(agg: DataFrame) -> DataFrame:
    """The grid/zero-fill/LOCF finisher over a merged hourly aggregate —
    shared verbatim by the gated batch query and the incremental
    streaming assembly. Bounds come from the aggregate itself (min/max
    observed hour per type), which is what makes the hourly table the
    COMPLETE state: no separate bounds bookkeeping to drift."""
    bounds = agg.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
            F.last("v_cents", ignorenulls=True).over(w).alias("v_cents_locf"),
        )
        .orderBy("event_type", "hour_ts")
    )


EV_GAPFILL_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.event_type, g.h AS hour_ts,
       COALESCE(a.n, 0) AS n_events,
       last_value(a.v_cents IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_cents_locf
FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.h = a.h
ORDER BY g.event_type, hour_ts
"""


HIST_BIN_CENTS = 100  # fixed-bin histogram: 1-unit bins over DECIMAL cents


def ev_hist_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p95 of `value` from a FIXED-BIN mergeable histogram —
    the quantile axis of the sketch family done the value-oracled way:
    where percentile_approx's KLL internals are engine-specific (its
    gated query is rows-only by design), a fixed-bin histogram is pure
    integer arithmetic end to end — DECIMAL cents, `div`-binned counts,
    ceil-rank lookup — so the DuckDB oracle verifies the quantiles
    bitwise. The answer is the bin LOWER BOUND (in cents): a one-bin-
    granularity approximation with a pytest-pinned error bound vs the
    exact percentile.

    100 TB shape: ONE grouped count bounded by |types| x |bins| rows
    (bin counts are cell-wise additive, so partial aggregation is the
    histogram merge — the same mergeability argument as count-min), a
    window cumsum over the tiny histogram, and a conditional-min rank
    lookup. The exact form sorts every group; this never shuffles more
    than the histogram."""
    ev = load_table(spark, sf_dir, "events")
    return hist_quantiles_from_counts(hist_bin_counts(ev))


def hist_bin_counts(ev: DataFrame) -> DataFrame:
    """(event_type, bin, c): the histogram itself — the additive sketch
    state the streaming assembly sums across batches."""
    binned = ev.select(
        "event_type",
        F.expr(
            f"cast(try_cast(value as decimal(18,2)) * 100 as bigint)"
            f" div {HIST_BIN_CENTS}"
        ).alias("bin"),
    ).filter(F.col("bin").isNotNull())
    return binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))


def hist_quantiles_from_counts(hist: DataFrame) -> DataFrame:
    """The rank-lookup finisher over a (event_type, bin, c) histogram —
    shared verbatim by the gated batch query and the incremental
    streaming assembly (bin counts add, so summed per-batch histograms
    feed the identical finisher and stream == batch holds exactly)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
    return (
        cum.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n * 50 + 99) div 100"),
                    F.col("bin") * HIST_BIN_CENTS,
                )
            ).alias("p50_lo_cents"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n * 95 + 99) div 100"),
                    F.col("bin") * HIST_BIN_CENTS,
                )
            ).alias("p95_lo_cents"),
        )
        .orderBy("event_type")
    )


EV_HIST_QUANTILES_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // {HIST_BIN_CENTS} AS bin
  FROM events WHERE value IS NOT NULL
),
hist AS (SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
n AS (SELECT event_type, COUNT(*) AS n FROM binned GROUP BY 1)
SELECT cum.event_type,
       MIN(CASE WHEN cum >= (n.n * 50 + 99) // 100
                THEN bin * {HIST_BIN_CENTS} END) AS p50_lo_cents,
       MIN(CASE WHEN cum >= (n.n * 95 + 99) // 100
                THEN bin * {HIST_BIN_CENTS} END) AS p95_lo_cents
FROM cum JOIN n ON cum.event_type = n.event_type
GROUP BY cum.event_type
ORDER BY cum.event_type
"""


CM_D = 4  # count-min depth (hash rows)
CM_W = 1024  # count-min width (counters per row)


def cm_heavy_hitters(
    df: DataFrame, key_col: str, top_n: int = 10, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Count-min heavy hitters per key — the COUNTING sketch beside KMV's
    distinct sketch, same engine-independent contract: d seeded
    md5-derived hash rows x w counters, every estimate = min over rows of
    the key's counter. With deterministic hashes even the collision
    overestimates are a FIXED value, so the gated query carries a full
    value-exact DuckDB oracle AND reports the exact count next to the
    estimate — the one-sided error guarantee (est >= exact, always) is
    itself part of the checked result.

    100 TB shape: the counter build is ONE grouped count over d
    scan-side hash projections (map-side combinable — counter matrices
    merge by cell-wise addition, which is exactly what partial
    aggregation does), and the whole matrix is <= d*w rows regardless of
    key cardinality — kilobytes where an exact per-key count is
    |keys| rows. The estimate probe here ranges over all distinct keys
    (fine at test scale and needed for the top-n answer); a production
    heavy-hitter pipeline tracks a bounded candidate set (per-partition
    top-k or a sample) and probes only those — the sketch's value is the
    bounded counter state, not the probe."""
    counters, key_counts = cm_partials(df, key_col, d=d, w=w)
    return cm_finish(counters, key_counts, key_col, top_n=top_n, d=d, w=w)


def _cm_pairs(keyed: DataFrame, d: int, w: int) -> DataFrame:
    """(key, j, c): the d deterministic counter positions per row."""
    from ..functions.text import token_hash

    k = F.col("key").cast("string")
    branches = [
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(token_hash(k, seed=j), F.lit(w)).alias("c"),
        )
        for j in range(d)
    ]
    return keyed.select("key", F.explode(F.array(*branches)).alias("p")).select(
        "key", F.col("p.j").alias("j"), F.col("p.c").alias("c")
    )


def cm_partials(
    df: DataFrame, key_col: str, d: int = CM_D, w: int = CM_W
) -> tuple[DataFrame, DataFrame]:
    """The sketch's two ADDITIVE partials — (j, c, n) counter cells and
    (key, exact_count) per-key counts — shared by the batch query and the
    streaming per-batch state (both merge by plain summation, so the
    incremental assembly is exact)."""
    keyed = df.select(F.col(key_col).alias("key"))
    counters = _cm_pairs(keyed, d, w).groupBy("j", "c").agg(
        F.count(F.lit(1)).alias("n")
    )
    key_counts = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("exact_count"))
    return counters, key_counts


def cm_finish(
    counters: DataFrame,
    key_counts: DataFrame,
    key_col: str,
    top_n: int = 10,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """The probe/rank finisher over merged partials — positions are
    recomputed from the candidate keys (they are deterministic functions
    of the key, so they never need to be stored), estimates are the min
    joined counter, and the answer is the top-n by (estimate, key)."""
    est = (
        _cm_pairs(key_counts.select("key"), d, w)
        .join(F.broadcast(counters), ["j", "c"])
        .groupBy("key")
        .agg(F.min("n").alias("est_count"))
    )
    return (
        est.join(key_counts, "key")
        .select(
            F.col("key").alias(key_col),
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overshoot"),
        )
        .orderBy(F.col("est_count").desc(), key_col)
        .limit(top_n)
    )


def ev_cm_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by count-min-estimated event count (see
    cm_heavy_hitters) — est/exact/overshoot all value-oracled."""
    return cm_heavy_hitters(load_table(spark, sf_dir, "events"), "user_id")


def _cm_sql() -> str:
    def pos(j: int) -> str:
        return (
            f"('0x' || substr(md5('{j}:' || CAST(user_id AS VARCHAR)), 1, 15))"
            f"::BIGINT % {CM_W}"
        )

    union = "\n  UNION ALL\n".join(
        f"  SELECT user_id AS key, {j} AS j, {pos(j)} AS c FROM events"
        for j in range(CM_D)
    )
    return f"""
WITH pairs AS (
{union}
),
counters AS (SELECT j, c, COUNT(*) AS n FROM pairs GROUP BY j, c),
est AS (
  SELECT key, MIN(n) AS est_count
  FROM (SELECT DISTINCT key, j, c FROM pairs) p
  JOIN counters USING (j, c)
  GROUP BY key
),
exact AS (SELECT user_id AS key, COUNT(*) AS exact_count FROM events GROUP BY user_id)
SELECT est.key AS user_id, est.est_count, exact.exact_count,
       est.est_count - exact.exact_count AS overshoot
FROM est JOIN exact ON est.key = exact.key
ORDER BY est.est_count DESC, est.key
LIMIT 10
"""


def ev_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the KMV sketch (see
    kmv_distinct) — the value-oracled counterpart of
    ev_approx_distinct_users: same question, but the estimate itself is
    engine-exact, so the driver's hash gate verifies it end-to-end."""
    return kmv_distinct(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


EV_KMV_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, {KMV_HEX_CHARS}))::BIGINT AS h
  FROM events
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
), n AS (
  SELECT event_type, COUNT(*) AS nd FROM d GROUP BY event_type
), kth AS (
  SELECT event_type, h AS kth FROM r WHERE rn = {KMV_K}
)
SELECT n.event_type,
       CASE WHEN n.nd < {KMV_K} THEN n.nd
            ELSE ({KMV_K - 1} * {KMV_SCALE}) // kth.kth END AS kmv_users
FROM n LEFT JOIN kth ON n.event_type = kth.event_type
ORDER BY n.event_type
"""


def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user counts at
    step k only with a step-k event STRICTLY AFTER their step-(k-1) entry
    time (first-touch attribution — the standard product-analytics funnel,
    which plain per-type distinct counts get wrong because they ignore
    ordering). Output: one row per step with the user count and
    basis-point conversion vs step 1 (integer fixed-point).

    100 TB shape: three filtered aggregates chained by user_id equi-joins —
    every shuffle is keyed on user_id (the natural bucketing key for an
    events store, so with a bucketed layout the joins are exchange-free —
    PROVEN by test_bucketed_funnel_has_no_user_id_exchange: against a
    user_id-bucketed events table the executed plan contains zero
    hashpartitioning(user_id) exchanges, only the 1-row global-count
    exchanges at the very top), each join's right side is the shrinking
    survivor set, and the final counts are 1-row aggregates
    broadcast-joined for the ratio. No windows over unpartitioned data, no
    self-cartesian."""
    return funnel_steps(load_table(spark, sf_dir, "events"))


FUNNEL_DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_steps(
    ev: DataFrame, steps: tuple[str, ...] = FUNNEL_DEFAULT_STEPS
) -> DataFrame:
    """DataFrame→DataFrame combinator behind ev_funnel_steps; expects
    (user_id, event_type, ts) — runnable against any layout, including a
    user_id-bucketed table where its per-user shuffles vanish.

    Generalized to ANY ordered step list (first-touch semantics per step:
    a user reaches step k with a step-k event strictly after their
    step-(k-1) entry time): the plan is a chain of len(steps) filtered
    per-user min aggregates joined on user_id — each stage's right side is
    the shrinking survivor set, so adding steps adds user_id-keyed stages,
    never another pass over non-matching events."""
    assert len(steps) >= 1
    survivors = []
    cur = None
    for name in steps:
        stage = ev.filter(F.col("event_type") == name)
        if cur is not None:
            stage = stage.join(cur, "user_id").filter(F.col("ts") > F.col("t"))
        cur = stage.groupBy("user_id").agg(F.min("ts").alias("t"))
        survivors.append(cur)
    n1 = survivors[0].agg(F.count(F.lit(1)).alias("n1"))

    def count_step(df: DataFrame, i: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("event_type"), "n_users"
        )

    counted = count_step(survivors[0], 1, steps[0])
    for i, (name, df) in enumerate(zip(steps[1:], survivors[1:]), start=2):
        counted = counted.unionAll(count_step(df, i, name))
    return (
        counted.crossJoin(F.broadcast(n1))  # 1-row scalar-subquery idiom
        .select(
            "step",
            "event_type",
            "n_users",
            # nullif: zero step-1 users (empty corpus / empty stream
            # state) yields NULL conversion, not an ANSI divide-by-zero
            F.expr("(10000L * n_users) div nullif(n1, 0)").alias("conv_bp"),
        )
        .orderBy("step")
    )


EV_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
), n1 AS (SELECT COUNT(*) AS n1 FROM v),
steps AS (
  SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users FROM v
  UNION ALL SELECT 2, 'click', COUNT(*) FROM c
  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
)
SELECT step, event_type, n_users,
       (10000 * n_users) // nullif(n1.n1, 0) AS conv_bp
FROM steps CROSS JOIN n1
ORDER BY step
"""


def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; each later active week counts them at offset
    (active_week - cohort_week)/7 days. Output is the standard retention
    triangle (cohort_week, week_offset, n_users).

    100 TB shape: one scan → per-user first-week aggregate (map-side
    combined) → distinct (user, week) activity set → user_id equi-join →
    count by (cohort, offset). All shuffles keyed on user_id until the
    final small rollup; cohort arithmetic is integer day-diff div 7, so
    the result is engine-exact with no timezone or float drift (both
    engines truncate weeks to ISO Monday)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    )
    return retention_triangle_from_activity(ev.distinct())


def retention_triangle_from_activity(act: DataFrame) -> DataFrame:
    """The triangle from a DISTINCT (user_id, w) activity set — the
    combinator shared by the batch query and the incremental streaming
    assembly (streaming/pipeline.incremental_retention_triangle): the
    activity set is exactly the MERGEABLE state retention decomposes into
    (union of per-batch distinct pairs, re-distinct-ed at read), because
    both the cohort (min week) and every offset count are functions of it."""
    first = act.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    return (
        act.join(first, "user_id")
        .select(
            F.col("cohort_w").cast("date").alias("cohort_week"),
            F.expr("datediff(w, cohort_w) div 7").cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EV_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS w FROM events
), first AS (
  SELECT user_id, MIN(w) AS cohort_w FROM ev GROUP BY user_id
), act AS (SELECT DISTINCT user_id, w FROM ev)
SELECT CAST(f.cohort_w AS DATE) AS cohort_week,
       CAST(date_diff('day', f.cohort_w, a.w) // 7 AS INT) AS week_offset,
       COUNT(*) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-sequence mining: the Markov transition matrix of
    event types — for each (from_type, to_type), how often a user's next
    event is to_type, with the row-conditional probability in basis points
    (integer fixed-point). The 'what happens after X' primitive behind
    next-event prediction features and anomalous-flow detection.

    100 TB shape: ONE shuffle — the per-user lead() window keyed on
    user_id (ties broken by event_id, deterministic cross-engine) — then a
    |types|² grouped count with map-side combine and a broadcast 1-level
    rollup join for the conditional denominator. Nothing quadratic; state
    is the type-pair matrix (tiny at any corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    return markov_from_counts(markov_pair_counts(ev))


def markov_pair_counts(ev: DataFrame) -> DataFrame:
    """(from_type, to_type, n): adjacent-pair counts per the (ts,
    event_id) user ordering — the ADDITIVE piece of the Markov state
    (pair matrices sum; the streaming assembly adds per-batch matrices
    plus boundary pairs stitched through a per-user carry)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def markov_from_counts(counts: DataFrame) -> DataFrame:
    """The conditional-probability finisher over a (from, to, n) pair
    matrix — shared verbatim by the gated batch query and the
    incremental streaming assembly."""
    totals = counts.groupBy(F.col("from_type").alias("ft")).agg(
        F.sum("n").alias("n_from")
    )
    return (
        counts.join(F.broadcast(totals), counts.from_type == totals.ft)
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.expr("(10000L * n) div n_from").alias("p_bp"),
        )
        .orderBy("from_type", "to_type")
    )


EV_MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type AS ft, CAST(SUM(n) AS BIGINT) AS n_from
  FROM counts GROUP BY from_type
)
SELECT from_type, to_type, n, (10000 * n) // n_from AS p_bp
FROM counts JOIN totals ON counts.from_type = totals.ft
ORDER BY from_type, to_type
"""


OUTLIER_SIGMAS = 3


def ev_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value anomalies — the data-quality screen a pipeline runs
    before trusting a metric column: flag events whose value deviates
    more than OUTLIER_SIGMAS standard deviations from their event_type's
    population. ENGINE-EXACT without a single float: values are scaled to
    integer cents (the trunc of value*100 is the same IEEE double op in
    both engines), and the sigma test is cleared of divisions and square
    roots by squaring —

        |x - s/n| > k·sigma  <=>  n·(n·x - s)² > k²·n·(n·q - s²)
                             <=>  (n·x - s)² > k²·(n·q - s²)

    with s = Σx, q = Σx² per type. Every quantity is a BIGINT; overflow
    bound stated honestly: s² < 2^63 requires n·avg_cents < 3·10^9 per
    group — beyond that, swap the comparison operands to DECIMAL(38,0)
    (one cast, same plan). 100 TB shape: one map-side-combined per-type
    aggregate (|types| rows, broadcast back), one scan-side comparison —
    no shuffle beyond the tiny stats table and the final order."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.expr("CAST(value * 100 AS BIGINT)")
    stats = (
        ev.select("event_type", vc.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.expr("v * v")).alias("q"),
        )
    )
    k2 = OUTLIER_SIGMAS * OUTLIER_SIGMAS
    return (
        ev.select("event_id", "event_type", vc.alias("v"))
        .join(F.broadcast(stats), "event_type")
        .filter(
            F.expr(f"(n * v - s) * (n * v - s) > {k2}L * (n * q - s * s)")
        )
        .select("event_id", "event_type", F.col("v").alias("value_cents"))
        .orderBy("event_id")
    )


EV_VALUE_OUTLIERS_SQL = f"""
WITH e AS (
  -- TRUNC before the cast: DuckDB's double->int cast ROUNDS, Spark's
  -- truncates (the repo-wide QUANT convention)
  SELECT event_id, event_type, CAST(TRUNC(value * 100) AS BIGINT) AS v FROM events
), stats AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS q
  FROM e GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.v AS value_cents
FROM e JOIN stats USING (event_type)
WHERE (n * e.v - s) * (n * e.v - s) > {OUTLIER_SIGMAS * OUTLIER_SIGMAS} * (n * q - s * s)
ORDER BY e.event_id
"""


DRIFT_MIN_PRIOR = 5  # flag only after this many prior events for the user
DRIFT_SIGMAS = 3


def ev_user_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RUNNING-history anomaly flags — the online twin of
    ev_value_outliers' population screen: an event is flagged when its
    value deviates more than DRIFT_SIGMAS from the running mean/variance
    of that user's OWN PRIOR events (exclusive window), after at least
    DRIFT_MIN_PRIOR observations. The sigma test is division- and
    sqrt-free by the same squaring identity as ev_value_outliers
    ((n·v − s)² > k²·(n·q − s²) with s = Σv, q = Σv² over the prior
    frame), and every quantity is BIGINT cents, so the driver's bitwise
    value gate applies.

    This is the exact per-event decision the streaming drift monitor
    (streaming/stateful.py drift_stream, transformWithStateInPandas)
    makes with (n, s, q) as its per-user ValueState — batch == stream is
    pytest-proved over arbitrary micro-batch splits.

    100 TB shape: one window partitioned by user_id (running sums, no
    second pass), state per user is three longs; no global sort, no
    population join."""
    return drift_flags(load_table(spark, sf_dir, "events")).orderBy("event_id")


def drift_flags(ev: DataFrame) -> DataFrame:
    """The per-event drift decision, shared verbatim by the gated batch
    query and the streaming pytest oracle: prior-only running (n, s, q)
    per user, flag where the squared sigma test clears."""
    vc = F.expr("CAST(value * 100 AS BIGINT)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    k2 = DRIFT_SIGMAS * DRIFT_SIGMAS
    return (
        ev.select("event_id", "user_id", "ts", vc.alias("v"))
        .select(
            "event_id",
            "user_id",
            "v",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("v").over(w).alias("s"),
            F.sum(F.expr("v * v")).over(w).alias("q"),
        )
        .filter(
            F.expr(
                f"n >= {DRIFT_MIN_PRIOR}"
                f" AND (n * v - s) * (n * v - s) > {k2}L * (n * q - s * s)"
            )
        )
        .select("event_id", "user_id", F.col("v").alias("value_cents"), "n", "s", "q")
    )


EV_USER_DRIFT_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, ts, CAST(TRUNC(value * 100) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT event_id, user_id, v,
         COUNT(*) OVER w AS n,
         CAST(SUM(v) OVER w AS BIGINT) AS s,
         CAST(SUM(v * v) OVER w AS BIGINT) AS q
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, v AS value_cents, n, s, q
FROM r
WHERE n >= {DRIFT_MIN_PRIOR}
  AND (n * v - s) * (n * v - s) > {DRIFT_SIGMAS * DRIFT_SIGMAS} * (n * q - s * s)
ORDER BY event_id
"""


def ev_scd2_band_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build — the temporal attribute history every
    warehouse keeps for its slowly-changing dimensions: per user, collapse
    the event stream into validity intervals of a derived attribute (the
    value band), with `valid_from` = the first event of the run and
    `valid_to` = the start of the next run (NULL = current). Classic
    gaps-and-islands: change marker (lag IS DISTINCT FROM) → run id
    (running sum) → per-run aggregate → valid_to via lead over run ids.

    100 TB shape: every window is partitioned by user_id and both windows
    plus the groupBy share that key, so Catalyst plans ONE exchange on
    user_id and reuses it across the lag, the running sum, the aggregate
    (user_id, grp is a superset key) and the lead — no global sort, no
    unbounded state, per-user memory bounded by the user's own history."""
    ev = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 20, "low")
        .when(F.col("value") < 55, "mid")
        .otherwise("high")
    )
    base = ev.select("user_id", "ts", "event_id", band.alias("band"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = base.withColumn(
        "chg",
        F.when(~F.lag("band").over(w).eqNullSafe(F.col("band")), 1).otherwise(0),
    )
    runs = marked.withColumn(
        "grp",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    agg = runs.groupBy("user_id", "grp", "band").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("grp")
    return (
        agg.select(
            "user_id",
            "band",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


EV_SCD2_SQL = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < 20 THEN 'low'
              WHEN value < 55 THEN 'mid'
              ELSE 'high' END AS band
  FROM events
), marked AS (
  SELECT *, CASE WHEN band IS DISTINCT FROM
                      lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 THEN 1 ELSE 0 END AS chg
  FROM base
), runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM marked
), agg AS (
  SELECT user_id, grp, band, MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, grp, band
)
SELECT user_id, band, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
       n_events
FROM agg
ORDER BY user_id, valid_from
"""


def ev_groupingsets_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((type, hour), (type), (hour)) — the third
    member of the grouping-sets family next to ROLLUP (ev_rollup_daily)
    and CUBE (ev_cube_type_dow): an ARBITRARY set list that neither
    shorthand can express (no grand-total set here), plus the GROUPING()
    indicator columns that disambiguate subtotal rows from genuine NULL
    keys. Catalyst expands the sets into one Expand + aggregate, so
    map-side partial aggregation still applies — one shuffle, |sets| ×
    |rows| expanded only at the map side."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", F.hour("ts").cast("long").alias("hr"), "value"
    )
    return (
        base.groupingSets(
            [["event_type", "hr"], ["event_type"], ["hr"]], "event_type", "hr"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hr").cast("int").alias("g_hr"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("hr").cast("string"), F.lit("<all>")).alias("hr"),
            "n_events",
            "total_value",
            "g_type",
            "g_hr",
        )
        .orderBy("g_type", "g_hr", "event_type", "hr")
    )


EV_GROUPINGSETS_SQL = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(CAST(date_part('hour', ts) AS BIGINT) AS VARCHAR), '<all>') AS hr,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(CAST(date_part('hour', ts) AS BIGINT)) AS INT) AS g_hr
FROM events
GROUP BY GROUPING SETS (
  (event_type, CAST(date_part('hour', ts) AS BIGINT)),
  (event_type),
  (CAST(date_part('hour', ts) AS BIGINT))
)
ORDER BY g_type, g_hr, event_type, hr
"""


def ev_extremes_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregation (`max_by`/`min_by`, SQL:2023) — WHICH row
    holds the extreme, not just the extreme value: per event type, the
    event that carried the highest / lowest value. One grouped aggregate —
    no window, no self-join back to the extreme (the two classic
    alternatives, both strictly more expensive: a rank window sorts every
    partition; the self-join rescans).

    Both engines leave max_by ties implementation-defined, so the ordering
    key is made a TOTAL order: ord = v_centi · 2³² + event_id (exact while
    event_id < 2³² and v_centi < 2²¹ — both hold at any plausible SF of
    this schema; a wider schema would switch to a struct key). The arg is
    the event_id; values are re-derived from the centi-encoded key so the
    output is integer-exact.

    100 TB shape: map-side combinable grouped aggregate on event_type —
    the cheapest possible plan for this question."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    ).withColumn("ord", F.expr("v * 4294967296 + event_id"))
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("event_id", "ord").alias("peak_event_id"),
            F.expr("max(ord) div 4294967296").alias("peak_centi"),
            F.min_by("event_id", "ord").alias("trough_event_id"),
            F.expr("min(ord) div 4294967296").alias("trough_centi"),
        )
        .orderBy("event_type")
    )


EV_EXTREMES_SQL = """
WITH base AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), k AS (
  SELECT event_type, event_id, v, v * 4294967296 + event_id AS ord
  FROM base
)
SELECT event_type,
       COUNT(*) AS n_events,
       max_by(event_id, ord) AS peak_event_id,
       CAST(MAX(ord) // 4294967296 AS BIGINT) AS peak_centi,
       min_by(event_id, ord) AS trough_event_id,
       CAST(MIN(ord) // 4294967296 AS BIGINT) AS trough_centi
FROM k GROUP BY event_type ORDER BY event_type
"""


def ev_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median absolute deviation (MAD), the
    breakdown-resistant counterpart of ev_value_outliers' mean/sigma
    screen — one far outlier inflates a sigma threshold and hides its
    peers ("masking"); it barely moves the median. Per type:
    n_outliers = |v − median| > 3·MAD.

    Integer-exact doubling trick: the median of BIGINTs is k or k+0.5, so
    2·median is a BIGINT — med2 = round(2·median(v)) and deviations
    d = |2v − med2| stay integral; mad4 = round(2·median(d)) is 4·MAD in
    centi-units, and the flag 2d > 3·mad4 is the pure-integer form of
    |v − median| > 3·MAD. Exact interpolated median on both engines
    (F.median ≡ QUANTILE_CONT 0.5 — the t8 idiom).

    Scale: the two ≤|event_type| (5-row) median tables are resolved at
    PLANNING time — collected to the driver and re-broadcast as literal
    relations — so the RETURNED plan is one events scan + one broadcast
    join + one grouped conditional count, with no persisted blocks left
    behind (VERDICT r9 #2: the r8 persist variant never unpersisted).
    Driver-side state is ≤2×|event_type| rows — bounded planning state,
    the classifier-eval pattern.

    r11 (VERDICT r10 #4): the two planning jobs share ONE transient
    persist of the projected (type, v) base — the med2 job fills the
    cache off the parquet scan, the mad4 job reads the cache, and the
    persist is dropped (blocking) before the plan is returned, so the
    total is 2 parquet scans per execution (planning + returned plan)
    instead of 3 and zero storage blocks survive (delta-asserted by
    test_outliers_mad_leaves_no_cache). Cluster equivalent of the
    transient: persist(DISK_ONLY) — the projection is 2 columns, a tiny
    fraction of the fact table's width."""
    # r15 (guide §5 "the driver should do almost no data work"): the r11
    # form resolved the two ≤|event_type| median tables at PLANNING time —
    # two collect jobs + a transient persist per EXECUTION, re-paid on
    # every bench rep. The pure-plan form below keeps the medians as plan
    # subtrees (AQE broadcasts the 5-row aggregates at runtime), runs ZERO
    # driver actions, leaves zero cache blocks, and measured 2.06 → 1.17 s
    # median (interleaved, order-alternated, rows identical). At cluster
    # scale this additionally removes the two driver round-trips from the
    # per-execution critical path.
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    )
    med = base.groupBy("event_type").agg(
        F.round(F.median("v") * 2, 0).cast("long").alias("med2")
    )
    dev = base.join(med, "event_type").withColumn(
        "d", F.abs(2 * F.col("v") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.median("d") * 2, 0).cast("long").alias("mad4")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("med2").alias("med2_centi"),
            F.max("mad4").alias("mad4_centi"),
            F.count(F.when(2 * F.col("d") > 3 * F.col("mad4"), 1)).alias(
                "n_outliers"
            ),
        )
        .orderBy("event_type")
    )


EV_OUTLIERS_MAD_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), med AS (
  SELECT event_type, CAST(ROUND(QUANTILE_CONT(v, 0.5) * 2, 0) AS BIGINT) AS med2
  FROM base GROUP BY event_type
), dev AS (
  SELECT b.event_type, v, med2, abs(2 * v - med2) AS d
  FROM base b JOIN med USING (event_type)
), mad AS (
  SELECT event_type, CAST(ROUND(QUANTILE_CONT(d, 0.5) * 2, 0) AS BIGINT) AS mad4
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_events,
       MAX(med2) AS med2_centi,
       MAX(mad4) AS mad4_centi,
       CAST(COUNT(CASE WHEN 2 * d > 3 * mad4 THEN 1 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
ORDER BY dev.event_type
"""


def ev_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per observed day — the
    rolling-DAU/WAU metric. Sliding DISTINCT is the window aggregation
    window frames cannot do (distinct state is not mergeable across frame
    slides), so the scalable idiom is EXPLODE-TO-WINDOW: reduce events to
    the DISTINCT (day, user) relation first, fan each activity day out to
    the ≤7 window days it contributes to (bounded ×7 on the small
    relation, not on raw events), and run one grouped count-distinct per
    target day. The oracle states the same semantics declaratively as a
    range join (day BETWEEN g.day-6 AND g.day) — the plan Spark would need
    a bucketized range join for; value-equal by construction.

    Scale: the ×7 fan-out applies AFTER the distinct reduction (per-day
    actives, orders of magnitude below raw events); the final
    count-distinct is one two-phase aggregate keyed on window day. Output
    restricted to observed days (partial leading windows included, the
    standard trailing-metric convention)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    return rolling_7d_from_activity(du)


def rolling_7d_from_activity(du: DataFrame) -> DataFrame:
    """The trailing-7-day distinct count from a DISTINCT (day, user_id)
    activity set — the combinator both the batch query and the streaming
    assembly (streaming/pipeline.incremental_rolling_7d) share, so
    stream == batch holds once the accumulated activity sets are equal
    (the retention-triangle factoring pattern)."""
    grid = du.select("day").distinct()
    contrib = du.select(
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("wday"),
        "user_id",
    )
    return (
        contrib.join(grid, contrib.wday == grid.day)
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


EV_ROLLING_7D_SQL = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
grid AS (SELECT DISTINCT day FROM du)
SELECT CAST(g.day AS VARCHAR) AS day,
       COUNT(DISTINCT u.user_id) AS users_7d
FROM grid g
JOIN du u ON u.day BETWEEN g.day - 6 AND g.day
GROUP BY g.day
ORDER BY day
"""


def ev_division_all_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (Codd's ÷, the algebra cell none of the join
    queries cover): users whose activity covers EVERY event type the
    table contains. The set-containment rendering — per-user distinct
    type count equals the global distinct type count — is the standard
    decorrelated form: the divisor is a 1-row global aggregate broadcast
    back (the asserted-1-row crossJoin idiom), so division costs exactly
    one grouped count-distinct plus a scan-local filter. The dual
    NOT-EXISTS(EXCEPT) phrasing would plan as a quadratic anti-join;
    this is the shape you want at scale.

    Output keeps the qualifying users' per-type evidence (n_events,
    n_types) so the gate compares more than membership."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )
    divisor = ev.agg(F.countDistinct("event_type").alias("n_all"))
    return (
        per_user.crossJoin(F.broadcast(divisor))
        .filter(F.col("n_types") == F.col("n_all"))
        .select("user_id", "n_types", "n_events")
        .orderBy("user_id")
    )


EV_DIVISION_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
  FROM events GROUP BY user_id
),
divisor AS (SELECT COUNT(DISTINCT event_type) AS n_all FROM events)
SELECT user_id, n_types, n_events
FROM per_user CROSS JOIN divisor
WHERE n_types = n_all
ORDER BY user_id
"""


def ev_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE `F.session_window` aggregate under the value gate — the
    operator Structured Streaming uses for event-time sessions, here in
    its batch rendering: per user, session count, total events, and the
    largest session's event count. ev_sessions_per_user proves the
    lag-gap formulation; this query gates the engine-native one (their
    agreement is pytest-pinned in
    test_native_session_window_agrees_with_lag_sessionization).

    Boundary semantics, stated exactly: session_window extends a session
    to ts + gap and a new session starts when the next event lands AT or
    AFTER that end — so the oracle's lag test is `>= gap` (the lag-gap
    query ev_sessions_per_user uses the `>` convention; the two differ
    only on microsecond-exact gap collisions, absent by measure in
    continuous timestamps).

    100 TB shape: session_window is one aggregate keyed on (user_id,
    merged window) — Catalyst plans a user_id exchange + sort + merging
    session aggregation, the same single-exchange posture as the window
    formulation, and the same operator runs unchanged on a stream with a
    watermark."""
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


EV_SESSION_NATIVE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL {SESSION_GAP_SECONDS} SECONDS
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), runs AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
), sess AS (
  SELECT user_id, grp, COUNT(*) AS n FROM runs GROUP BY user_id, grp
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       MAX(n) AS max_session_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


def ev_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF fill via `last_value(... IGNORE NULLS)` — the windowed
    null-skipping surface (SQL:2011 NULL treatment clause) the engine had
    not yet exercised: only click events carry the sensor reading (the
    props field), and every other event inherits the user's most recent
    observed reading. This is the per-ROW LOCF idiom — the dual of
    ev_gapfill_hourly's per-GRID-slot carry — and it is one window
    expression, no grid explode, no self-join.

    Rollup per event type: rows, genuinely observed readings, rows whose
    reading was FILLED by the carry (null observation, non-null fill),
    and the exact sum of the filled series (readings are small integers —
    exact in BIGINT, CAST guarded in the oracle).

    100 TB shape: one window partitioned by user_id (running frame, no
    global sort) + one map-side-combinable grouped rollup."""
    ev = load_table(spark, sf_dir, "events")
    k_obs = F.when(
        F.col("event_type") == "click",
        F.from_json("props", "k bigint").getField("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.withColumn("k_obs", k_obs).withColumn(
        "k_fill", F.last("k_obs", ignorenulls=True).over(w)
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k_obs").alias("n_observed"),
            F.count(
                F.when(F.col("k_obs").isNull() & F.col("k_fill").isNotNull(), 1)
            ).alias("n_filled"),
            F.sum("k_fill").alias("sum_filled"),
        )
        .orderBy("event_type")
    )


EV_LOCF_SQL = """
WITH base AS (
  SELECT event_type, user_id, ts, event_id,
         CASE WHEN event_type = 'click'
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k_obs
  FROM events
), filled AS (
  SELECT *, last_value(k_obs IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_fill
  FROM base
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(k_obs) AS n_observed,
       CAST(COUNT(CASE WHEN k_obs IS NULL AND k_fill IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_filled,
       CAST(SUM(k_fill) AS BIGINT) AS sum_filled
FROM filled
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------- CUSUM change-points (r13)
# Page's CUSUM (1954, public) detects sustained level shifts a fixed
# sigma-threshold misses (many small same-direction deviations). The
# recursive textbook form S_t = max(0, S_{t-1} + dev_t) is not a plain
# window — but it has a closed form over cumulative windows:
#     S_t = cum_t - min_{0<=s<=t} cum_s      (upward shifts)
#     T_t = max_{0<=s<=t} cum_s - cum_t      (downward shifts)
# with cum_t = Σ_{s<=t} (x_s - target) and the VIRTUAL cum_0 = 0 included
# in the extremum (LEAST/GREATEST with 0 — dropping it shifts every value
# by the first deviation; caught by the recursion-replay pytest). Both
# engines compute these as
# running sum + running extremum windows PARTITIONED BY event_type (never
# global), and everything stays BIGINT cents, so the driver's bitwise
# gate applies. Threshold h = one target-day's total (CUSUM_H_PCT=100):
# flags 6/150 type-days at sf0.01, 127/150 on the noisier sf0.001.
CUSUM_H_PCT = 100


def cusum_daily_agg(ev: DataFrame) -> DataFrame:
    """(event_type, day, v_cents): the per-type daily value totals the
    monitor reads — one map-side-combinable aggregate, ADDITIVE across
    micro-batches (the incremental twin's state cells)."""
    return (
        ev.select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
                "vc"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("vc").alias("v_cents"))
    )


def cusum_flag(daily: DataFrame) -> DataFrame:
    """(event_type, day, v_cents, s_up, s_dn, direction) for flagged
    days, from the (event_type, day, v_cents) daily table: one tiny
    per-type stats join, two cumulative windows. Shared verbatim by the
    batch query and the streaming twin's read side."""
    from pyspark.sql import Window

    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("v_cents").alias("tot")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("target", F.expr("tot div nd"))
        .withColumn("cum", F.sum(F.col("v_cents") - F.col("target")).over(w))
        .withColumn(
            "s_up", F.col("cum") - F.least(F.min("cum").over(w), F.lit(0))
        )
        .withColumn(
            "s_dn", F.greatest(F.max("cum").over(w), F.lit(0)) - F.col("cum")
        )
        .withColumn("h", F.expr(f"({CUSUM_H_PCT} * target) div 100"))
    )
    return (
        c.filter((F.col("s_up") > F.col("h")) | (F.col("s_dn") > F.col("h")))
        .select(
            "event_type",
            "day",
            "v_cents",
            "s_up",
            "s_dn",
            F.when(
                (F.col("s_up") > F.col("h")) & (F.col("s_dn") > F.col("h")),
                F.lit("both"),
            )
            .when(F.col("s_up") > F.col("h"), F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("direction"),
        )
        .orderBy("event_type", "day")
    )


def cusum_daily(ev: DataFrame) -> DataFrame:
    """Batch composition: daily totals → flagged change-point days."""
    return cusum_flag(cusum_daily_agg(ev))


def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r13 (gates r14): CUSUM change-point days per event type —
    the sustained-shift monitor beside ev_value_outliers' point-anomaly
    sigma screen and dq_events_drift's cohort drift. Distinct from
    ev_cusum_excursion (plans/experiments.py), which summarizes each
    type to ONE max-|excursion| row of the un-reset cumulative deviation
    at event grain: this operator computes the actual reset-based Page
    statistic (the max(0,·) recursion, via its closed form) at DAY grain
    and lists every thresholded day with its direction — the monitoring
    surface, where the excursion query is the screening summary.
    Streaming twin: `streaming/pipeline.py incremental_cusum` (additive
    daily cells + this exact finisher)."""
    return cusum_daily(load_table(spark, sf_dir, "events"))


def _changepoint_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_changepoint_oracle_agrees_cross_engine; registers r14): same
    cumulative-window closed form. Division semantics agree on EVERY
    sign: Spark's `div` truncates toward zero, and DuckDB's `//` on the
    integer operands used here (nd is BIGINT, tot is an integer SUM →
    HUGEINT) also truncates — `//` floors only after a DOUBLE promotion,
    which this query never performs. Pinned on a planted net-negative
    corpus by test_cusum_negative_values_agree_cross_engine (ADVICE r13);
    the windows are type-partitioned in both engines."""
    return f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v_cents
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS nd, SUM(v_cents) AS tot
  FROM daily GROUP BY event_type
),
c AS (
  SELECT d.event_type, d.day, d.v_cents,
         s.tot // s.nd AS target,
         SUM(d.v_cents - s.tot // s.nd) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily d JOIN stats s USING (event_type)
),
sc AS (
  SELECT *,
         cum - LEAST(MIN(cum) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS UNBOUNDED PRECEDING), 0) AS s_up,
         GREATEST(MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING), 0) - cum AS s_dn,
         ({CUSUM_H_PCT} * target) // 100 AS h
  FROM c
)
SELECT event_type, day, CAST(v_cents AS BIGINT) AS v_cents,
       CAST(s_up AS BIGINT) AS s_up, CAST(s_dn AS BIGINT) AS s_dn,
       CASE WHEN s_up > h AND s_dn > h THEN 'both'
            WHEN s_up > h THEN 'up' ELSE 'down' END AS direction
FROM sc
WHERE s_up > h OR s_dn > h
ORDER BY event_type, day
"""


# ----------------------------------- seasonal-naive backtest (staged r14)
# Forecast-quality guardrail over the daily value series: score the
# SEASONAL-NAIVE forecast v̂(d) = v(d−7) against the actuals, with the
# one-step naive v̂(d) = v(d−1) as the denominator — the MASE framing
# (Hyndman & Koehler 2006, public): a monitor (or any model someone
# wires in) must beat the naive baselines before its alerts mean
# anything, and the per-type MASE is the number that says whether the
# series is weekly-seasonal at all (mase << 1) or a random walk
# (mase ≈ 1). Reads the SAME (event_type, day, v_cents) additive cells
# as the CUSUM monitor — one state family, two analyses; errors stay
# exact BIGINT cents, the ratio is a raw double quotient of exact sums.
SEASONAL_LAG_DAYS = 7


def seasonal_backtest(daily: DataFrame) -> DataFrame:
    """(event_type, n_days_scored, sae_seasonal_cents, sae_naive1_cents,
    mase) from a (event_type, day, v_cents) daily table. Scored days are
    those where BOTH the d−7 and d−1 predecessors exist (aligned support
    — the standard MASE contract), via two equi-joins on the shifted
    date key; everything is keyed on (event_type, day), map-side
    combinable, |types| output rows."""
    d = daily.select(
        "event_type", F.to_date("day").alias("dte"), "v_cents"
    )
    lag7 = d.select(
        "event_type",
        F.date_add("dte", SEASONAL_LAG_DAYS).alias("dte"),
        F.col("v_cents").alias("v_lag7"),
    )
    lag1 = d.select(
        "event_type",
        F.date_add("dte", 1).alias("dte"),
        F.col("v_cents").alias("v_lag1"),
    )
    return (
        d.join(lag7, ["event_type", "dte"])
        .join(lag1, ["event_type", "dte"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            F.sum(F.abs(F.col("v_cents") - F.col("v_lag7"))).alias(
                "sae_seasonal_cents"
            ),
            F.sum(F.abs(F.col("v_cents") - F.col("v_lag1"))).alias(
                "sae_naive1_cents"
            ),
        )
        .select(
            "event_type",
            "n_days_scored",
            "sae_seasonal_cents",
            "sae_naive1_cents",
            (
                F.col("sae_seasonal_cents") / F.col("sae_naive1_cents")
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


def ev_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r14 (gates r15): seasonal-naive vs one-step-naive backtest
    per event type over the shared daily value cells."""
    return seasonal_backtest(cusum_daily_agg(load_table(spark, sf_dir, "events")))


def _seasonal_backtest_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_seasonal_backtest_oracle_agrees_cross_engine; registers r15)."""
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS dte,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v_cents
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT d.event_type, d.v_cents, l7.v_cents AS v_lag7, l1.v_cents AS v_lag1
  FROM daily d
  JOIN daily l7 ON d.event_type = l7.event_type
               AND d.dte = l7.dte + {SEASONAL_LAG_DAYS}
  JOIN daily l1 ON d.event_type = l1.event_type AND d.dte = l1.dte + 1
)
SELECT event_type,
       COUNT(*) AS n_days_scored,
       CAST(SUM(ABS(v_cents - v_lag7)) AS BIGINT) AS sae_seasonal_cents,
       CAST(SUM(ABS(v_cents - v_lag1)) AS BIGINT) AS sae_naive1_cents,
       CAST(SUM(ABS(v_cents - v_lag7)) AS BIGINT)
         / CAST(CAST(SUM(ABS(v_cents - v_lag1)) AS BIGINT) AS DOUBLE) AS mase
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "ev_counts_hourly": ev_counts_hourly,
    "ev_stats_by_type": ev_stats_by_type,
    "ev_json_extract_sum": ev_json_extract_sum,
    "ev_json_schema_stats": ev_json_schema_stats,
    "ev_variant_stats": ev_variant_stats,
    "ev_click_streaks": ev_click_streaks,
    "ev_sessions_per_user": ev_sessions_per_user,
    "ev_running_total": ev_running_total,
    "ev_salted_stats": ev_salted_stats,
    "ev_salted_distinct_users": ev_salted_distinct_users,
    "ev_rollup_daily": ev_rollup_daily,
    "ev_pivot_type_counts": ev_pivot_type_counts,
    "ev_cube_type_dow": ev_cube_type_dow,
    "ev_approx_distinct_users": ev_approx_distinct_users,
    "ev_hll_daily_rollup": ev_hll_daily_rollup,
    "ev_kmv_distinct_users": ev_kmv_distinct_users,
    "ev_cm_top_users": ev_cm_top_users,
    "ev_hist_value_quantiles": ev_hist_value_quantiles,
    "ev_gapfill_hourly": ev_gapfill_hourly,
    "ev_sliding_1h_value": ev_sliding_1h_value,
    "ev_approx_value_quantiles": ev_approx_value_quantiles,
    "ev_theta_user_overlap": ev_theta_user_overlap,
    "ev_funnel_steps": ev_funnel_steps,
    "ev_retention_cohorts": ev_retention_cohorts,
    "ev_markov_transitions": ev_markov_transitions,
    "ev_value_outliers": ev_value_outliers,
    "ev_scd2_band_history": ev_scd2_band_history,
    "ev_groupingsets_type_hour": ev_groupingsets_type_hour,
    "ev_user_value_drift": ev_user_value_drift,
    "ev_extremes_by_type": ev_extremes_by_type,
    "ev_outliers_mad": ev_outliers_mad,
    "ev_rolling_7d_users": ev_rolling_7d_users,
    "ev_division_all_types": ev_division_all_types,
    "ev_locf_fill": ev_locf_fill,
    "ev_session_window_native": ev_session_window_native,
    "ev_changepoint_cusum": ev_changepoint_cusum,
    "ev_seasonal_backtest": ev_seasonal_backtest,
}

ORACLE = {
    "ev_counts_hourly": EV_COUNTS_HOURLY_SQL,
    "ev_stats_by_type": EV_STATS_SQL,
    "ev_json_extract_sum": EV_JSON_SQL,
    "ev_json_schema_stats": EV_JSON_SCHEMA_SQL,
    "ev_variant_stats": EV_VARIANT_SQL,
    "ev_click_streaks": EV_STREAKS_SQL,
    "ev_sessions_per_user": EV_SESSIONS_SQL,
    "ev_running_total": EV_RUNNING_SQL,
    "ev_salted_stats": EV_SALTED_STATS_SQL,
    "ev_salted_distinct_users": EV_SALTED_DISTINCT_SQL,
    "ev_rollup_daily": EV_ROLLUP_SQL,
    "ev_pivot_type_counts": EV_PIVOT_SQL,
    "ev_cube_type_dow": EV_CUBE_SQL,
    # sketch family, oracled via bounds attestation since r11: the gated
    # outputs are exact values + within-tolerance booleans both engines can
    # agree on (estimates themselves are engine-specific)
    "ev_approx_distinct_users": EV_APPROX_DISTINCT_SQL,
    "ev_approx_value_quantiles": EV_APPROX_QUANTILES_SQL,
    "ev_theta_user_overlap": EV_THETA_OVERLAP_SQL,
    "ev_hll_daily_rollup": EV_HLL_ROLLUP_SQL,
    "ev_kmv_distinct_users": EV_KMV_SQL,
    "ev_cm_top_users": _cm_sql(),
    "ev_hist_value_quantiles": EV_HIST_QUANTILES_SQL,
    "ev_gapfill_hourly": EV_GAPFILL_SQL,
    "ev_sliding_1h_value": EV_SLIDING_SQL,
    "ev_funnel_steps": EV_FUNNEL_SQL,
    "ev_retention_cohorts": EV_RETENTION_SQL,
    "ev_markov_transitions": EV_MARKOV_SQL,
    "ev_value_outliers": EV_VALUE_OUTLIERS_SQL,
    "ev_scd2_band_history": EV_SCD2_SQL,
    "ev_groupingsets_type_hour": EV_GROUPINGSETS_SQL,
    "ev_user_value_drift": EV_USER_DRIFT_SQL,
    "ev_extremes_by_type": EV_EXTREMES_SQL,
    "ev_outliers_mad": EV_OUTLIERS_MAD_SQL,
    "ev_rolling_7d_users": EV_ROLLING_7D_SQL,
    "ev_division_all_types": EV_DIVISION_SQL,
    "ev_locf_fill": EV_LOCF_SQL,
    "ev_session_window_native": EV_SESSION_NATIVE_SQL,
    "ev_changepoint_cusum": _changepoint_sql(),
    "ev_seasonal_backtest": _seasonal_backtest_sql(),
}
