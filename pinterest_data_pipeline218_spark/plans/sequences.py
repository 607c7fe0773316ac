"""Sequence mining and irregular-time-series smoothing over `events`.

Three operator families a training-data / product-analytics pipeline runs
that the engine did not yet express:

- **ordered sequence assembly + pattern classification**
  (`ev_journey_pattern`): per-user journey strings built with a
  deterministic ORDER BY inside the aggregate, then classified with regex /
  substring pattern counters — the portable rendering of
  MATCH_RECOGNIZE-style row-pattern queries (SQL:2016), which neither Spark
  nor DuckDB ships.
- **fixed-horizon exponential smoothing** (`ev_ewma_last8`): EWMA over the
  trailing 8 events per user with halving integer weights — a lag-chain
  window, no recursion, integer-exact in both engines.
- **LOCF time-weighted average** (`ev_twa_daily`): the TimescaleDB-style
  `time_weight('LOCF')` operator — each observation holds its value until
  the next one (or the end of the day), and the average weights values by
  held microseconds.

Reference scope: beyond-reference (the reference's analytics are grouped
counts/medians over cleaned pin/geo/user tables — SURVEY.md §2.11); these
extend the event-stream family (`plans/events.py`) the way the funnel /
retention / Markov queries do.

Oracle discipline: value is carried as exact centi-units
(`CAST(value AS DECIMAL(18,2)) * 100 → BIGINT`), time as `unix_micros` /
`epoch_us` BIGINT microseconds, every quotient is a truncating integer
`div` with a `nullif` guard on BOTH sides, and DuckDB-side SUMs are
CAST(... AS BIGINT) so no HUGEINT reaches the driver hash (the r7 lesson,
guarded by test_no_oracle_output_is_hugeint).

100 TB shape: all three queries shuffle ONCE on user_id (journey/EWMA) or
(user_id, day) — a superset key planned as one user_id exchange — with
per-user state bounded by that user's own history; the pattern counters,
weight arithmetic and quotients are scan-local expressions after the
window/aggregate. No global sort until the final presentation ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table
from .events import SESSION_GAP_SECONDS

# trailing-horizon EWMA: weight of the event k steps back is 2^(7-k) — the
# most recent event weighs 128, the 8th-most-recent weighs 1
EWMA_HORIZON = 8

DAY_US = 86_400_000_000


def _v_centi() -> F.Column:
    """value in exact centi-units (the repo's DECIMAL(18,2) discipline)."""
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")


def journey_strings(base: DataFrame) -> DataFrame:
    """(user_id, journey, n_events): the ordered event-initial string per
    user from (user_id, ts, event_id, ch) rows. Struct sort order = field
    order, so array_sort(struct(ts, event_id, ch)) realizes exactly the
    oracle's `ORDER BY ts, event_id` inside string_agg. Shared verbatim by
    the batch query and the streaming carry chain
    (streaming/pipeline.journey_state_batch)."""
    return base.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda x: x["ch"],
            ),
            "",
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )


def journey_finisher(j: DataFrame) -> DataFrame:
    """Classifiers over assembled (user_id, journey, n_events) rows —
    shared verbatim by batch and incremental assembly, so stream == batch
    holds by construction once the carried strings are equal."""
    return (
        j.select(
            "user_id",
            "n_events",
            F.length("journey").cast("long").alias("journey_len"),
            F.md5("journey").alias("journey_md5"),
            F.expr(
                "(length(journey) - length(replace(journey, 'cp', ''))) div 2"
            ).alias("n_quick_convert"),
            F.when(F.col("journey").startswith("s"), 1).otherwise(0).alias(
                "starts_signup"
            ),
            F.when(F.col("journey").rlike("c[ve]*p"), 1).otherwise(0).alias(
                "has_assisted_convert"
            ),
        )
        .orderBy("user_id")
    )


def ev_journey_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type journey string (initials, ordered by ts then
    event_id — a deterministic total order) with pattern classifiers:

    - `journey_md5` pins the exact sequence without shipping long strings;
    - `n_quick_convert` counts click→purchase adjacencies (the
      replace-and-measure idiom — no regex engine divergence possible);
    - `starts_signup` / `has_assisted_convert` are anchored-LIKE and
      regex classifiers (`c[ve]*p`: a click that converts through views
      or errors).

    Scale: one shuffle on user_id with map-side partial collect_list; the
    per-user journey is bounded by that user's history (the same bound the
    funnel/Markov queries already carry); classifiers are scan-local after
    the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
    )
    return journey_finisher(journey_strings(base))


EV_JOURNEY_SQL = """
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey,
         COUNT(*) AS n_events
  FROM events
  GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(length(journey) AS BIGINT) AS journey_len,
       md5(journey) AS journey_md5,
       CAST((length(journey) - length(replace(journey, 'cp', ''))) // 2 AS BIGINT)
         AS n_quick_convert,
       CASE WHEN journey LIKE 's%' THEN 1 ELSE 0 END AS starts_signup,
       CASE WHEN regexp_matches(journey, 'c[ve]*p') THEN 1 ELSE 0 END
         AS has_assisted_convert
FROM j
ORDER BY user_id
"""


def ev_ewma_last8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of value at the
    user's LAST event, over a fixed 8-event trailing horizon with halving
    integer weights (128, 64, …, 1 from newest to oldest). The fixed
    horizon makes EWMA a lag-chain — a plain window expression, no
    recursion — and the power-of-two weights keep it integer-exact, so the
    oracle replays it bitwise.

    ewma_centi = (Σ_k w_k · v_{t-k}) div (Σ_k w_k over PRESENT lags): a
    user with fewer than 8 events is averaged over the weights that exist
    (the standard partial-horizon normalization).

    Scale: both windows (the lag chain and the last-row row_number) are
    partitioned on user_id — one exchange, two sorts; everything else is
    scan-local arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id", "ts", "event_id", _v_centi().alias("v"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = base.select(
        "user_id",
        "ts",
        "event_id",
        "v",
        *[
            F.lag("v", k).over(w).alias(f"v{k}")
            for k in range(1, EWMA_HORIZON)
        ],
    )
    num = sum(
        (
            F.coalesce(F.col(f"v{k}") if k else F.col("v"), F.lit(0))
            * F.lit(1 << (EWMA_HORIZON - 1 - k))
        )
        for k in range(EWMA_HORIZON)
    )
    den = sum(
        (
            F.when(
                (F.col(f"v{k}") if k else F.col("v")).isNotNull(),
                F.lit(1 << (EWMA_HORIZON - 1 - k)),
            ).otherwise(F.lit(0))
        )
        for k in range(EWMA_HORIZON)
    )
    wn = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        lagged.withColumn("num", num.cast("long"))
        .withColumn("den", den.cast("long"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("v").alias("last_value_centi"),
            F.expr("num div nullif(den, 0)").alias("ewma_centi"),
        )
        .orderBy("user_id")
    )


def _ewma_sql() -> str:
    lags = ",\n         ".join(
        f"lag(v, {k}) OVER w AS v{k}" for k in range(1, EWMA_HORIZON)
    )
    # k=0 guards mirror the Spark side exactly: a NULL events.value at the
    # last event must contribute 0/0-weight in BOTH engines (ADVICE r8)
    terms = ["COALESCE(v, 0) * 128"] + [
        f"COALESCE(v{k}, 0) * {1 << (EWMA_HORIZON - 1 - k)}"
        for k in range(1, EWMA_HORIZON)
    ]
    wterms = ["CASE WHEN v IS NOT NULL THEN 128 ELSE 0 END"] + [
        f"CASE WHEN v{k} IS NOT NULL THEN {1 << (EWMA_HORIZON - 1 - k)} ELSE 0 END"
        for k in range(1, EWMA_HORIZON)
    ]
    return f"""
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), lagged AS (
  SELECT user_id, ts, event_id, v,
         {lags},
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       v AS last_value_centi,
       CAST(({" + ".join(terms)}) // nullif({" + ".join(wterms)}, 0) AS BIGINT)
         AS ewma_centi
FROM lagged
WHERE rn = 1
ORDER BY user_id
"""


EV_EWMA_SQL = _ewma_sql()


def ev_twa_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average per (user, day) — the TimescaleDB
    `time_weight` operator: each event's value holds from its timestamp
    until the next event of that user-day (or midnight), and the day's
    average weights values by microseconds held. Irregularly-sampled
    telemetry averaged this way is NOT the row mean — a value held for 20
    hours counts 20 hours, however many rows follow it.

    Integer-exact: time in unix_micros/epoch_us BIGINT, value in
    centi-units; twa_centi = Σ(v·held_us) div Σ(held_us). The held span of
    the last event ends at the next UTC midnight, so Σ(held_us) — exposed
    as span_us — is also the observed-coverage metric (first event →
    midnight).

    Scale: lead() and the aggregate both key on (user_id, day) — one
    exchange; sums stay within BIGINT (centi-value < 2^16, day span
    < 2^37 µs, per-group product sum < 2^53 even at billions of rows per
    user-day)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.to_date("ts").cast("string").alias("day"),
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.unix_micros(F.to_date("ts").cast("timestamp")).alias("day_us"),
        "event_id",
        _v_centi().alias("v"),
    )
    return twa_daily_from(base)


def twa_daily_from(base: DataFrame) -> DataFrame:
    """The TWA core over (user_id, day, t_us, day_us, event_id, v) rows —
    factored so the hypothesis property suite can drive it on generated
    series (same-value-subdivision invariance)."""
    w = Window.partitionBy("user_id", "day").orderBy("t_us", "event_id")
    held = base.withColumn(
        "held_us",
        F.coalesce(F.lead("t_us").over(w), F.col("day_us") + F.lit(DAY_US))
        - F.col("t_us"),
    )
    return (
        held.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("held_us").alias("span_us"),
            F.expr("sum(v * held_us) div nullif(sum(held_us), 0)").alias(
                "twa_centi"
            ),
        )
        .orderBy("user_id", "day")
    )


EV_TWA_SQL = """
WITH base AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         epoch_us(ts) AS t_us,
         epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us,
         event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), held AS (
  SELECT *,
         COALESCE(lead(t_us) OVER (PARTITION BY user_id, day
                                   ORDER BY t_us, event_id),
                  day_us + 86400000000) - t_us AS held_us
  FROM base
)
SELECT user_id, day,
       COUNT(*) AS n_events,
       CAST(SUM(held_us) AS BIGINT) AS span_us,
       CAST(SUM(v * held_us) // nullif(SUM(held_us), 0) AS BIGINT) AS twa_centi
FROM held
GROUP BY user_id, day
ORDER BY user_id, day
"""


# SESSION_GAP_SECONDS is imported from .events (module header) — the same
# gap the sessionization family declares, so the copresence baskets can
# never desynchronize from it.


def ev_session_copresence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over sessions: for every pair of
    event types, how much more often do they co-occur in one session than
    independence predicts — lift(a,b) = P(a,b) / (P(a)·P(b)) with the
    session as the basket. The support counts are classic a-priori
    1-itemset / 2-itemset counts; lift is emitted in exact milli-units via
    the repo's fixed-point discipline.

    Pipeline: lag-gap sessionization (the ev_sessions_per_user machinery)
    → DISTINCT (user, session, type) triples → pair supports via one
    self-equi-join on the session key with a < b canonicalization →
    broadcast 1-itemset counts + the 1-row basket total back onto the
    |types|² pair table. lift_milli = (1000·n_ab·n_total) div (n_a·n_b),
    computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the product
    can't overflow at any basket count; the quotient is BIGINT-exact.

    100 TB shape: the sessionization window and the triple distinct key on
    user_id (one exchange); the pair join keys on (user, session) —
    per-session fan-out is |distinct types in session|² ≤ 25, a constant;
    the count tables that join back are |types| rows and 1 row (broadcast,
    the asserted-1-row idiom)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {SESSION_GAP_SECONDS} SECONDS"),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    runs = marked.select(
        "user_id",
        "event_type",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    )
    triples = runs.select("user_id", "grp", "event_type").distinct()
    tot = (
        triples.select("user_id", "grp")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    nt = triples.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = triples.alias("a"), triples.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = nt.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = nt.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.col("n_total").alias("n_sessions"),
            F.expr(
                "CAST((1000 * CAST(n_ab AS DECIMAL(38,0)) * n_total)"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy("type_a", "type_b")
    )


EV_COPRESENCE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_SECONDS} SECONDS
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), runs AS (
  SELECT user_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM marked
), triples AS (SELECT DISTINCT user_id, grp, event_type FROM runs),
tot AS (SELECT COUNT(*) AS n_total FROM (SELECT DISTINCT user_id, grp FROM triples)),
nt AS (SELECT event_type, COUNT(*) AS n FROM triples GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM triples a
  JOIN triples b ON a.user_id = b.user_id AND a.grp = b.grp
                AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab, na.n AS n_a, nb.n AS n_b, tot.n_total AS n_sessions,
       CAST((1000 * CAST(n_ab AS HUGEINT) * n_total)
            // (CAST(na.n AS HUGEINT) * nb.n) AS BIGINT) AS lift_milli
FROM pairs
JOIN nt na ON na.event_type = type_a
JOIN nt nb ON nb.event_type = type_b
CROSS JOIN tot
ORDER BY type_a, type_b
"""


# ------------------------------------------------- multi-touch attribution

ATTR_LOOKBACK_DAYS = 7  # credit touches within this many days before a purchase
ATTR_TOUCH_TYPES = ("click", "view")
ATTR_CREDIT_BP = 10_000  # one conversion = 10000 basis points of credit


def ev_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution (r12, gates in the r13 window —
    the r12 window is full by the rotation contract): every purchase
    credits the SAME user's click/view touches inside the
    ATTR_LOOKBACK_DAYS window before it, under the three standard models
    at once — FIRST-touch and LAST-touch counts, and LINEAR credit where
    the conversion's 10000 bp are split evenly (integer div) with the
    remainder assigned to the LAST touch (the one nearest the purchase),
    so per-conversion credit sums to exactly 10000 bp and every output
    column is an exact integer. Funnel's first-touch column is the
    degenerate case; this is the general marketing/growth-analytics form.

    Scale shape: the purchase↔touch interval join is bucketized to
    epoch-day grain — purchases explode to their LOOKBACK+1 candidate
    days (bounded fan-out on the smaller side), the join is an equi-join
    on (user_id, day), and the exact interval filter runs on the
    bounded candidates (the ev_session_outage_overlap / geo-grid
    discipline; candidates per purchase ≈ touch density × lookback, a
    constant as users scale). Per-conversion ranking windows key on
    purchase id; the final rollup is a 2-row partial-aggregable groupBy."""
    from ..operators.asof import _epoch_us

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "user_id",
        "event_id",
        _epoch_us(ev, "ts").alias("us"),
    ).withColumn("day", F.expr("us div 86400000000"))
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("p_id"),
        F.col("us").alias("p_us"),
        F.explode(
            F.sequence(
                F.col("day") - ATTR_LOOKBACK_DAYS, F.col("day")
            )
        ).alias("day"),
    )
    touches = base.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        "user_id",
        "day",
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("t_id"),
        F.col("us").alias("t_us"),
    )
    cand = purchases.join(touches, ["user_id", "day"]).filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - ATTR_LOOKBACK_DAYS * DAY_US)
    )
    w = Window.partitionBy("p_id").orderBy("t_us", "t_id")
    ranked = cand.select(
        "p_id", "touch_type", "t_us", "t_id"
    ).withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    )
    credited = ranked.select(
        "touch_type",
        (F.col("rn") == 1).cast("long").alias("is_first"),
        (F.col("rn") == F.col("n")).cast("long").alias("is_last"),
        (
            F.expr(f"{ATTR_CREDIT_BP} div n")
            + F.when(
                F.col("rn") == F.col("n"), F.expr(f"{ATTR_CREDIT_BP} % n")
            ).otherwise(F.lit(0))
        ).alias("credit_bp"),
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("is_first").alias("n_first_touch"),
            F.sum("is_last").alias("n_last_touch"),
            F.sum("credit_bp").alias("linear_credit_bp"),
        )
        .orderBy("touch_type")
    )


def _attribution_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_attribution_oracle_agrees_cross_engine; registered r13). The
    oracle replays the interval join NAIVELY (user_id theta-join), so the
    bucketized rewrite is value-verified — the intervals.py pattern."""
    types = ", ".join(f"'{t}'" for t in ATTR_TOUCH_TYPES)
    return f"""
WITH base AS (
  SELECT event_type, user_id, event_id, epoch_us(ts) AS us FROM events
),
p AS (
  SELECT user_id, event_id AS p_id, us AS p_us FROM base
  WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type AS touch_type, event_id AS t_id, us AS t_us
  FROM base WHERE event_type IN ({types})
),
cand AS (
  SELECT p.p_id, t.touch_type, t.t_us, t.t_id
  FROM p JOIN t USING (user_id)
  WHERE t.t_us < p.p_us
    AND t.t_us >= p.p_us - {ATTR_LOOKBACK_DAYS} * {DAY_US}
),
ranked AS (
  SELECT p_id, touch_type,
         ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rn,
         COUNT(*) OVER (PARTITION BY p_id) AS n
  FROM cand
),
credited AS (
  SELECT touch_type,
         CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_first,
         CASE WHEN rn = n THEN 1 ELSE 0 END AS is_last,
         ({ATTR_CREDIT_BP} // n)
           + CASE WHEN rn = n THEN {ATTR_CREDIT_BP} % n ELSE 0 END AS credit_bp
  FROM ranked
)
SELECT touch_type,
       COUNT(*) AS n_touches,
       CAST(SUM(is_first) AS BIGINT) AS n_first_touch,
       CAST(SUM(is_last) AS BIGINT) AS n_last_touch,
       CAST(SUM(credit_bp) AS BIGINT) AS linear_credit_bp
FROM credited
GROUP BY touch_type
ORDER BY touch_type
"""


QUERIES = {
    "ev_journey_pattern": ev_journey_pattern,
    "ev_ewma_last8": ev_ewma_last8,
    "ev_twa_daily": ev_twa_daily,
    "ev_session_copresence_lift": ev_session_copresence_lift,
    "ev_attribution_multitouch": ev_attribution_multitouch,
}

ORACLE = {
    "ev_journey_pattern": EV_JOURNEY_SQL,
    "ev_ewma_last8": EV_EWMA_SQL,
    "ev_twa_daily": EV_TWA_SQL,
    "ev_session_copresence_lift": EV_COPRESENCE_SQL,
    "ev_attribution_multitouch": _attribution_sql(),
}
