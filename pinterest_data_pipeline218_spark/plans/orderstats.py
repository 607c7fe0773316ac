"""Order-statistics & trend analytics over `events`: discrete grouped
quantiles, deterministic mode, exact least-squares trend slope, and a
seasonal day-of-week baseline screen — the descriptive-statistics surface
beside the t8/t10/t11 interpolated-median family and the MAD/σ outlier
screens.

Reference scope: beyond-reference (the reference's only statistics are
counts and medians); extends the aggregation family (SURVEY §2.4) with
order statistics (A6's DISC counterpart), argmax-of-count (mode), and
regression-by-sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table

QUANTS = (50, 90, 99)  # discrete quantile points, in percent


def _v_centi() -> F.Column:
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")


def ev_quantiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE grouped quantiles (p50/p90/p99 of centi-value per
    event type): the order statistic at 1-based rank ceil(q·n) — an
    OBSERVED value, which is what a latency/size SLO reports (the
    interpolated t8 median can emit a value no event ever had). The rank
    rule is stated explicitly and mirrored in the oracle, sidestepping
    the engines' differing quantile_disc conventions.

    Plan: ONE window pass partitioned by event_type supplies row_number
    and the partition count together (same partition spec -> one exchange
    + one sort), then a grouped conditional max pivots the three selected
    ranks to columns. Ties need no tie-break: row_number among equal v is
    arbitrary, but the VALUE at any fixed rank of the sorted multiset is
    unique, so the output is deterministic. 100 TB: one exchange on
    event_type; skew equals category skew (bounded type cardinality)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", _v_centi().alias("v"))
    w = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    aggs = [F.max("n").alias("n_events")] + [
        F.max(
            F.when(F.col("rn") == F.expr(f"({q} * n + 99) div 100"), F.col("v"))
        ).alias(f"p{q}_centi")
        for q in QUANTS
    ]
    return ranked.groupBy("event_type").agg(*aggs).orderBy("event_type")


_QCOLS = ",\n       ".join(
    f"MAX(CASE WHEN rn = ({q} * n + 99) // 100 THEN v END) AS p{q}_centi"
    for q in QUANTS
)

EV_QUANTILES_DISC_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), ranked AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       {_QCOLS}
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


def ev_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped MODE: the most frequent centi-value per event
    type, smallest value on frequency ties — the determinism both
    engines' native mode() declines to promise (implementation-defined
    tie). Two map-side-combinable aggregates: count per (type, value),
    then argmax by the STRUCT total-order key (cnt, −v) — lexicographic
    struct comparison is exact in every regime (no 2³¹/2²⁰ bound, no
    silent BIGINT wrap vs loud DuckDB overflow divergence the old
    cnt·2³² − v arithmetic key carried). Also reports the distinct-value
    count the mode was elected from. 100 TB: two grouped aggregates,
    both partial-aggregable; no window, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select("event_type", _v_centi().alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("ord", F.struct(F.col("cnt"), (-F.col("v")).alias("nv")))
    )
    return (
        counts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_values"),
            F.max_by("v", "ord").alias("mode_centi"),
            F.max_by("cnt", "ord").alias("mode_count"),
        )
        .orderBy("event_type")
    )


EV_MODE_SQL = """
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         COUNT(*) AS cnt
  FROM events
  GROUP BY 1, 2
), keyed AS (
  -- DuckDB max_by rejects STRUCT ordering keys, so the oracle elects the
  -- mode with a regime-free window instead (same total order: cnt DESC,
  -- then smallest v on ties).
  SELECT event_type, v, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY cnt DESC, v ASC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_vals
  FROM counts
)
SELECT event_type,
       CAST(MAX(n_vals) AS BIGINT) AS n_distinct_values,
       CAST(MAX(CASE WHEN rn = 1 THEN v END) AS BIGINT) AS mode_centi,
       CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS mode_count
FROM keyed
GROUP BY event_type
ORDER BY event_type
"""


def ev_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend of value over time, by EXACT integer
    sums: slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) with x = whole minutes
    since the type's first event and y = centi-value. The output is the
    exact rational (slope_num, slope_den) pair — DECIMAL(38,0), so the
    arithmetic survives n ~ 10¹² rows/group (BIGINT sums overflow at
    ~10-gate-scale; a float regression is neither exact nor
    oracle-matchable bitwise.) slope_den = 0 (all events in one minute)
    yields the honest NULL-direction num/den = (num, 0) consumers test.

    Plan: a 5-row min-ts aggregate broadcast back (map-side combinable),
    then ONE grouped sum pass — no window. 100 TB: two aggregates on
    event_type, both partial-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", "ts", _v_centi().alias("y"))
    t0 = base.groupBy("event_type").agg(F.min("ts").alias("ts0"))
    xy = base.join(F.broadcast(t0), "event_type").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, ts0, ts) div 60000000").alias("x"),
        "y",
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sxx"),
    )
    # The OUTPUT casts to BIGINT: at gate SFs the num/den peak ≈6.4e14,
    # far inside int64, and BIGINT dodges the driver's DECIMAL(38,0)
    # hash canonicalization (values were byte-identical, the r10 red row
    # was representation-only). The INTERNAL sums stay DECIMAL(38,0) for
    # the documented 10¹²-row headroom; at that scale widen the output
    # back to DECIMAL or emit strings.
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
    ).orderBy("event_type")


EV_TREND_SQL = """
WITH base AS (
  SELECT event_type, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events
), t0 AS (
  SELECT event_type, MIN(ts) AS ts0 FROM base GROUP BY 1
), xy AS (
  SELECT b.event_type,
         CAST((epoch_us(ts) - epoch_us(ts0)) // 60000000 AS DECIMAL(38,0)) AS x,
         CAST(y AS DECIMAL(38,0)) AS y
  FROM base b JOIN t0 USING (event_type)
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
  FROM xy GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM sums
ORDER BY event_type
"""


def ev_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (day-of-week) baseline screen: per (event_type, dow) —
    volume, value sum, and how many events clear the cell's own average
    by integer cross-multiplication (v·n > S; no division, no float, the
    ev_abtest/cusum idiom). The dow derives from pure epoch-day
    arithmetic ((epoch_us div 86400000000 + 4) % 7, 0 = Sunday) because
    the engines' dayofweek() conventions differ (1-based Sunday vs
    0-based) — integer arithmetic is convention-free and identical.

    Plan: ONE scan, one window pass partitioned by (event_type, dow)
    supplying n and S, then the grouped conditional count on the same
    keys — the second aggregate reuses the window's partitioning (no
    second exchange). 100 TB: keyed on (type, dow) — bounded cardinality,
    map-side combinable final agg."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) div 86400000000 + 4) % 7"
        ).alias("dow"),
        _v_centi().alias("v"),
    )
    w = Window.partitionBy("event_type", "dow")
    cells = base.select(
        "event_type",
        "dow",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
    )
    return (
        cells.groupBy("event_type", "dow")
        .agg(
            F.max("n").alias("n_events"),
            F.max("s").alias("sum_centi"),
            F.count(F.when(F.col("v") * F.col("n") > F.col("s"), 1)).alias(
                "n_above"
            ),
        )
        .orderBy("event_type", "dow")
    )


EV_SEASONAL_SQL = """
WITH base AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), cells AS (
  SELECT event_type, dow, v,
         COUNT(*) OVER (PARTITION BY event_type, dow) AS n,
         SUM(v) OVER (PARTITION BY event_type, dow) AS s
  FROM base
)
SELECT event_type, CAST(dow AS BIGINT) AS dow,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MAX(s) AS BIGINT) AS sum_centi,
       CAST(COUNT(CASE WHEN v * n > s THEN 1 END) AS BIGINT) AS n_above
FROM cells
GROUP BY event_type, dow
ORDER BY event_type, dow
"""


def ev_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value DECILES via NTILE(10) (r11) — the last window-function
    surface member (RANK/ROW_NUMBER/LAG/LEAD/frames are covered elsewhere):
    per (event_type, decile), the bucket's row count and its min/max
    centi-value. NTILE's floor-distribution semantics (bucket sizes differ
    by <= 1, assigned in ORDER) are identical in both engines GIVEN a total
    order, so ties break on event_id.

    Scale posture, stated plainly: NTILE is a declared-exact full sort per
    partition — with |event_type| partitions that is the one shape that
    does not scale past a partition's sort budget; the 100 TB path for
    decile BOUNDARIES is ev_quantiles_disc / ev_hist_value_quantiles /
    ev_approx_value_quantiles (all gated), and this query is the exact
    window-surface rendering kept at dashboard grain (5 types × 10 rows
    out)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", "event_id", _v_centi().alias("v"))
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    return (
        base.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("v").alias("min_centi"),
            F.max("v").alias("max_centi"),
        )
        .orderBy("event_type", "decile")
    )


EV_NTILE_SQL = """
WITH base AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), tiled AS (
  SELECT event_type, v,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY v, event_id) AS decile
  FROM base
)
SELECT event_type, CAST(decile AS INT) AS decile,
       COUNT(*) AS n_events,
       CAST(MIN(v) AS BIGINT) AS min_centi,
       CAST(MAX(v) AS BIGINT) AS max_centi
FROM tiled
GROUP BY event_type, decile
ORDER BY event_type, decile
"""


WINSOR_LO_PCT = 5  # winsorization percentiles (discrete, ceil-rank rule)
WINSOR_HI_PCT = 95


def ev_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type (r12): clamp every
    centi-value into its type's exact discrete [p5, p95] band, then report
    raw vs winsorized sums and how many observations each tail clamped —
    the standard metric-pipeline defense against fat-tailed outliers,
    complementing the MAD screen (which FLAGS outliers) by producing the
    robust AGGREGATE itself. Percentiles use ev_quantiles_disc's stated
    ceil-rank rule ((q·n + 99) div 100, an observed value), so the clamp
    thresholds are engine-independent integers and every output column is
    exact integer arithmetic.

    Plan: the quantiles_disc window pass (ONE exchange + sort on
    event_type) yields the two thresholds as a |event_type|-row aggregate,
    which broadcast-joins back to the scan for the clamped re-aggregation
    — no second shuffle of event rows, both aggregates partial-
    aggregable. 100 TB: at scale the exact-percentile pass is the
    expensive exactness anchor; swapping it for the mergeable histogram
    sketch (ev_hist_value_quantiles) changes only the threshold rows."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", _v_centi().alias("v"))
    w = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    thresholds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({WINSOR_LO_PCT} * n + 99) div 100"),
                F.col("v"),
            )
        ).alias("p_lo"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({WINSOR_HI_PCT} * n + 99) div 100"),
                F.col("v"),
            )
        ).alias("p_hi"),
    )
    clamped = base.join(F.broadcast(thresholds), "event_type")
    wins = F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col("v")))
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("raw_sum_centi"),
            F.sum(wins).alias("wins_sum_centi"),
            F.sum((F.col("v") < F.col("p_lo")).cast("long")).alias("n_clamped_lo"),
            F.sum((F.col("v") > F.col("p_hi")).cast("long")).alias("n_clamped_hi"),
            F.max("p_lo").alias("p_lo_centi"),
            F.max("p_hi").alias("p_hi_centi"),
        )
        .orderBy("event_type")
    )


EV_WINSORIZED_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), ranked AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
), t AS (
  SELECT event_type,
         MAX(CASE WHEN rn = ({WINSOR_LO_PCT} * n + 99) // 100 THEN v END) AS p_lo,
         MAX(CASE WHEN rn = ({WINSOR_HI_PCT} * n + 99) // 100 THEN v END) AS p_hi
  FROM ranked GROUP BY event_type
)
SELECT base.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(v) AS BIGINT) AS raw_sum_centi,
       CAST(SUM(GREATEST(p_lo, LEAST(p_hi, v))) AS BIGINT) AS wins_sum_centi,
       CAST(SUM(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
       CAST(SUM(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
       MAX(p_lo) AS p_lo_centi,
       MAX(p_hi) AS p_hi_centi
FROM base JOIN t USING (event_type)
GROUP BY base.event_type
ORDER BY base.event_type
"""


QUERIES = {
    "ev_quantiles_disc": ev_quantiles_disc,
    "ev_mode_value": ev_mode_value,
    "ev_trend_slope": ev_trend_slope,
    "ev_seasonal_dow": ev_seasonal_dow,
    "ev_value_ntiles": ev_value_ntiles,
    "ev_winsorized_stats": ev_winsorized_stats,
}

ORACLE = {
    "ev_quantiles_disc": EV_QUANTILES_DISC_SQL,
    "ev_mode_value": EV_MODE_SQL,
    "ev_trend_slope": EV_TREND_SQL,
    "ev_seasonal_dow": EV_SEASONAL_SQL,
    "ev_value_ntiles": EV_NTILE_SQL,
    "ev_winsorized_stats": EV_WINSORIZED_SQL,
}
