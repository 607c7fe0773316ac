"""Experimentation / monitoring analytics over the `events` table:
deterministic A/B assignment with a chi-square contingency test, and
CUSUM-style change-point excursion screening.

Both are the batch forms of jobs a production event pipeline runs
continuously (experiment readouts, metric-drift pages), expressed in the
repo's oracle-exact discipline: integer counts, fixed-point rates, and —
for the one genuinely real-valued statistic (chi²) — a SINGLE SQL
expression string evaluated by both engines, so the double arithmetic
shares one expression tree and rounds identically.

Reference scope: beyond-reference (the reference has no statistics
surface); extends the event-analytics family of plans/events.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..data import load_table
from ..functions import text as T
from .sequences import _v_centi

# one shared chi² expression string (see module docstring): 2x2 chi-square
# N(ad-bc)² / ((a+b)(c+d)(a+c)(b+d)) over BIGINT cells a..d, left-to-right
# double chain identical in Spark and DuckDB. A zero margin (e.g. EVERY
# user converted — true on the dense dev events) makes the statistic
# undefined; nullif yields NULL in both engines instead of an ANSI
# divide-by-zero error.
_CHI2_EXPR = (
    "CAST(n_total AS DOUBLE) * CAST(ad_bc AS DOUBLE) * CAST(ad_bc AS DOUBLE)"
    " / nullif(CAST(n_control AS DOUBLE), 0.0)"
    " / nullif(CAST(n_treatment AS DOUBLE), 0.0)"
    " / nullif(CAST(n_conv AS DOUBLE), 0.0)"
    " / nullif(CAST(n_noconv AS DOUBLE), 0.0)"
)


def ev_abtest_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout: users hash-split into two
    arms (md5 of user_id, the same engine-portable hash the sampling
    family uses — assignment is stable across runs and engines),
    conversion = the user is an ABOVE-AVERAGE purchaser, decided by exact
    integer cross-multiplication (np·U > P, where np is the user's
    purchase count and U/P the global user/purchase totals — no division,
    no SF-tuned constant, both margins populated at any scale); emits the
    2x2 cell counts, per-arm conversion rates in basis points, and the
    Pearson chi-square statistic with 1 df.

    Scale shape: ONE distinct-user reduction shuffled on user_id (the
    purchase count folds into it), a 1-row global total broadcast back
    (the asserted 1-row crossJoin idiom), then a 2-row aggregate → 1-row
    contingency assembly. No windows, no joins against the raw event
    stream. At 100 TB the distinct-user table is the only wide
    intermediate, and it is the same reduction ev_retention/rolling
    already run.

    Correctness: cells and rates are integer-exact; chi² is a double but
    both engines evaluate the IDENTICAL expression string over identical
    integer cells (module docstring), so the value gate's bitwise compare
    holds."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np")
        )
    )
    totals = per_user.agg(
        F.count(F.lit(1)).alias("u_total"), F.sum("np").alias("p_total")
    )
    users = per_user.crossJoin(F.broadcast(totals)).select(
        F.pmod(T.token_hash(F.col("user_id").cast("string")), F.lit(2)).alias(
            "arm"
        ),
        F.when(
            F.col("np") * F.col("u_total") > F.col("p_total"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("converted"),
    )
    cells = users.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_treatment"),
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("conv_control"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("conv_treatment"),
    )
    return cells.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        F.expr("10000 * conv_control div nullif(n_control, 0)").alias("cr_control_bp"),
        F.expr("10000 * conv_treatment div nullif(n_treatment, 0)").alias("cr_treatment_bp"),
        F.expr(
            "conv_control * (n_treatment - conv_treatment)"
            " - (n_control - conv_control) * conv_treatment"
        ).alias("ad_bc"),
        "n_total",
        F.expr("conv_control + conv_treatment").alias("n_conv"),
        F.expr("n_total - conv_control - conv_treatment").alias("n_noconv"),
    ).select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        "cr_control_bp",
        "cr_treatment_bp",
        F.expr(_CHI2_EXPR).alias("chi2"),
    )


EV_ABTEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS np
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), totals AS (
  SELECT COUNT(*) AS u_total, CAST(SUM(np) AS BIGINT) AS p_total FROM per_user
), users AS (
  SELECT ({T.token_hash_sql("CAST(user_id AS VARCHAR)")}) % 2 AS arm,
         CASE WHEN np * u_total > p_total THEN 1 ELSE 0 END AS converted
  FROM per_user CROSS JOIN totals
), cells AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
         CAST(SUM(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_control,
         CAST(SUM(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_treatment
  FROM users
), named AS (
  SELECT n_control, n_treatment, conv_control, conv_treatment,
         10000 * conv_control // nullif(n_control, 0) AS cr_control_bp,
         10000 * conv_treatment // nullif(n_treatment, 0) AS cr_treatment_bp,
         conv_control * (n_treatment - conv_treatment)
           - (n_control - conv_control) * conv_treatment AS ad_bc,
         n_total,
         conv_control + conv_treatment AS n_conv,
         n_total - conv_control - conv_treatment AS n_noconv
  FROM cells
)
SELECT n_control, n_treatment, conv_control, conv_treatment,
       cr_control_bp, cr_treatment_bp,
       {_CHI2_EXPR} AS chi2
FROM named
"""


def ev_cusum_excursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen per event type: walk the type's events in
    time order accumulating the deviation from the type mean; the maximum
    absolute excursion of that cumulative sum is the classic CUSUM
    change-point statistic (Page 1954, public) — a level shift mid-stream
    produces a large excursion even when the overall mean looks normal.

    Integer-exact via mean-clearing scale-up: dev_i = v_i·n − S (value in
    centi-units, n/S the type's count/sum), so Σ dev = 0 exactly and every
    cusum prefix is a BIGINT — no float mean, no division at all. Output
    per type: n_events, the max |cusum| (in centi·n units), and the
    event_id where it peaks (earliest on ties — min-struct argmax).

    Scale shape: one grouped (n, S) aggregate broadcast back (1 row per
    type), one window partitioned BY TYPE ordered by (ts, event_id) — a
    single exchange+sort — then a grouped argmax. The scaled BIGINT
    (v·n ≤ 2^63) bounds the decade this SF family spans; at true 100 TB
    per-type row counts the same plan runs with dev in DECIMAL(38,0)
    (the copresence-lift idiom) — a dtype swap, not a plan change."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", "ts", "event_id", _v_centi().alias("v"))
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("s")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        base.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.sum(F.expr("v * n_events - s")).over(w))
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.first("n_events").alias("n_events"),
            F.min(
                F.struct(
                    (-F.abs(F.col("cusum"))).alias("neg_exc"),
                    F.col("event_id").alias("eid"),
                )
            ).alias("mn"),
        )
        .select(
            "event_type",
            "n_events",
            (-F.col("mn.neg_exc")).alias("max_excursion"),
            F.col("mn.eid").alias("peak_event_id"),
        )
        .orderBy("event_type")
    )


EV_CUSUM_SQL = """
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
), stats AS (
  SELECT event_type, COUNT(*) AS n_events, SUM(v) AS s
  FROM base GROUP BY event_type
), cu AS (
  SELECT b.event_type, b.event_id, st.n_events,
         CAST(SUM(b.v * st.n_events - st.s) OVER (
           PARTITION BY b.event_type ORDER BY b.ts, b.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
  FROM base b JOIN stats st USING (event_type)
)
SELECT event_type,
       ANY_VALUE(n_events) AS n_events,
       -((MIN(struct_pack(neg_exc := -ABS(cusum), eid := event_id))).neg_exc)
         AS max_excursion,
       (MIN(struct_pack(neg_exc := -ABS(cusum), eid := event_id))).eid
         AS peak_event_id
FROM cu
GROUP BY event_type
ORDER BY event_type
"""



# ------------------------------------------------------------ SRM (r13)
# Sample-ratio mismatch (Kohavi et al., "Trustworthy Online Controlled
# Experiments", public): the first guardrail an experiment platform runs —
# if the OBSERVED arm split deviates from the INTENDED allocation beyond
# chance, every downstream readout is invalid (assignment or logging is
# broken). Chi-square with 1 df at alpha=0.001 (the standard SRM bar)
# is 10.828; the test statistic is rendered division-free by
# cross-multiplication so the flag is exact integer arithmetic:
#   (n_t - p·N)² / (N·p·(1-p)) > 10.828
#   ⇔ (DEN·n_t - NUM·N)² · 1000 > 10828 · NUM · (DEN-NUM) · N
# with the intended ratio p = NUM/DEN.
SRM_CHI2_X1000 = 10828  # chi-square(1df) at alpha = 0.001, x1000
SRM_DESIGNS = (
    ("ab_50_50", 1, 2),    # 50/50 split: arm = hash % 2 == 0
    ("ramp_10_90", 1, 10),  # 10% ramp: arm = hash % 10 == 0
)


def srm_check(users: DataFrame) -> DataFrame:
    """(experiment, n_treatment, n_total, intended_num, intended_den,
    srm_flag): one fused aggregate over the distinct-user table computes
    every design's observed treatment count; the flag is the exact
    cross-multiplied chi-square exceedance. Scale shape: ONE pass over
    |users| rows, output |designs| rows."""
    aggs = []
    for name, num, den in SRM_DESIGNS:
        arm = F.pmod(
            T.token_hash(F.col("user_id").cast("string"), seed=den), F.lit(den)
        )
        aggs.append(
            F.sum(F.when(arm < num, 1).otherwise(0)).alias(f"nt_{name}")
        )
    cells = users.agg(F.count(F.lit(1)).alias("n_total"), *aggs)
    rows = []
    for name, num, den in SRM_DESIGNS:
        nt = F.col(f"nt_{name}")
        # squared via self-multiplication in DECIMAL(38,0) — `** 2` is a
        # DOUBLE pow in Spark, which would break the exact comparison
        diff = F.lit(den) * nt - F.lit(num) * F.col("n_total")
        lhs = diff.cast("decimal(38,0)") * diff * 1000
        rhs = (
            F.lit(SRM_CHI2_X1000).cast("decimal(38,0)")
            * F.lit(num)
            * F.lit(den - num)
            * F.col("n_total")
        )
        rows.append(
            cells.select(
                F.lit(name).alias("experiment"),
                nt.cast("long").alias("n_treatment"),
                F.col("n_total").cast("long").alias("n_total"),
                F.lit(num).cast("int").alias("intended_num"),
                F.lit(den).cast("int").alias("intended_den"),
                (lhs > rhs).alias("srm_flag"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("experiment")


def ev_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r13 (gates r14): SRM guardrail over the events user
    population for both standing designs. The deterministic hash split
    is balanced by construction, so the gated rendering reports clean
    experiments — the VIOLATION path is pinned by the planted-skew
    pytest (`test_srm_flags_planted_skew`), the dq-constraint posture."""
    users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
    return srm_check(users)


def _srm_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_srm_oracle_agrees_cross_engine; registers r14)."""
    h2 = T.token_hash_sql("CAST(user_id AS VARCHAR)", seed=2)
    h10 = T.token_hash_sql("CAST(user_id AS VARCHAR)", seed=10)
    parts = []
    for name, num, den, hexpr in (
        ("ab_50_50", 1, 2, h2),
        ("ramp_10_90", 1, 10, h10),
    ):
        # diff squared via self-multiplication on HUGEINT (DuckDB's ^ is
        # a DOUBLE power — it would break the exact integer comparison)
        parts.append(f"""
SELECT experiment, n_treatment, n_total, intended_num, intended_den,
       CAST({den} * n_treatment - {num} * n_total AS HUGEINT)
         * ({den} * n_treatment - {num} * n_total) * 1000
         > CAST({SRM_CHI2_X1000} AS HUGEINT) * {num} * {den - num} * n_total
         AS srm_flag
FROM (
  SELECT '{name}' AS experiment,
         CAST(SUM(CASE WHEN ({hexpr}) % {den} < {num} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_treatment,
         COUNT(*) AS n_total,
         CAST({num} AS INT) AS intended_num,
         CAST({den} AS INT) AS intended_den
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
)""")
    body = "\nUNION ALL\n".join(parts)
    return "SELECT * FROM (\n" + body + "\n) ORDER BY experiment"

# -------------------- difference-in-differences readout (staged r15)
# The experimentation family's causal-lift estimator (public standard:
# Card & Krueger 1994 two-period two-group DiD): lift = (post−pre mean
# change in TREATMENT) − (post−pre change in CONTROL), so any secular
# drift shared by both arms cancels — the readout a pipeline needs when
# an intervention launched mid-stream WITHOUT a holdout re-randomization.
# Determinism discipline: arms from the same seed-2 token_hash split the
# SRM/abtest family uses; the pre/post boundary is the dataset's own
# midpoint at MICROSECOND grain (timestampdiff / date_diff agree at that
# grain; both quotients non-negative so trunc == floor); values in exact
# centi (DECIMAL(18,2)·100); the one real-valued statistic is a SINGLE
# shared expression string over the four exact cells (the _CHI2_EXPR
# pattern), FLOORed at milli-centi so both engines emit one BIGINT.
_DID_EXPR = (
    "CAST(FLOOR(1000.0 * ("
    "CAST(s_post_treat AS DOUBLE) / nullif(CAST(n_post_treat AS DOUBLE), 0.0)"
    " - CAST(s_pre_treat AS DOUBLE) / nullif(CAST(n_pre_treat AS DOUBLE), 0.0)"
    " - (CAST(s_post_ctrl AS DOUBLE) / nullif(CAST(n_post_ctrl AS DOUBLE), 0.0)"
    " - CAST(s_pre_ctrl AS DOUBLE) / nullif(CAST(n_pre_ctrl AS DOUBLE), 0.0))"
    ")) AS BIGINT)"
)


def _midpoint_post(cells: DataFrame) -> DataFrame:
    """cells + a `post` flag: the SHARED two-period boundary derivation
    for the DiD and CUPED finishers — 1-row min/max day bounds broadcast
    back, post = day-grain elapsed >= elapsed div 2. Day cells are
    midnights in both engines, so elapsed == boundary-crossing counts
    and the flag is engine-exact; keeping the derivation in ONE place is
    what keeps the two readouts' boundaries provably identical."""
    bounds = cells.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    post = F.expr("timestampdiff(DAY, d0, day)") >= F.expr(
        "timestampdiff(DAY, d0, d1) div 2"
    )
    return (
        cells.crossJoin(F.broadcast(bounds))
        .withColumn("post", post)
        .drop("d0", "d1")
    )


def did_daily_agg(ev: DataFrame) -> DataFrame:
    """(treat, day, n, s): per-(arm, day) row counts and exact centi
    sums — the ADDITIVE cell grain the streaming twin accumulates (the
    cusum_daily_agg precedent: cells add per (treat, day), so batch
    boundaries cannot matter and a late batch only adds into its
    cells). The pre/post boundary is deliberately DAY-grain — derived
    from these cells' own min/max day by the finisher, never from
    microsecond state the cells couldn't carry."""
    treat = (
        F.pmod(T.token_hash(F.col("user_id").cast("string"), seed=2), F.lit(2))
        < 1
    )
    return (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            treat.alias("treat"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            _v_centi().alias("v"),
        )
        .groupBy("treat", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )
    )


def did_lift_report(cells: DataFrame) -> DataFrame:
    """The DiD finisher over (treat, day, n, s) cells: boundary = the
    cells' own midpoint day (min_day + elapsed-days div 2 — midnights
    in both engines, so elapsed == boundary-crossing day counts), then
    one fused conditional aggregate into the four (arm × period) cells
    and the shared _DID_EXPR lift."""
    base = _midpoint_post(cells).select("post", "treat", "n", "s")

    def n_of(cond):
        return F.sum(F.when(cond, F.col("n")).otherwise(0)).cast("long")

    def s_of(cond):
        return F.sum(F.when(cond, F.col("s")).otherwise(0)).cast("long")

    p, t = F.col("post"), F.col("treat")
    agg = base.agg(
        n_of(~p & ~t).alias("n_pre_ctrl"),
        s_of(~p & ~t).alias("s_pre_ctrl"),
        n_of(~p & t).alias("n_pre_treat"),
        s_of(~p & t).alias("s_pre_treat"),
        n_of(p & ~t).alias("n_post_ctrl"),
        s_of(p & ~t).alias("s_post_ctrl"),
        n_of(p & t).alias("n_post_treat"),
        s_of(p & t).alias("s_post_treat"),
    )
    return agg.select(
        F.lit("ab_50_50").alias("experiment"),
        "n_pre_ctrl",
        "s_pre_ctrl",
        "n_pre_treat",
        "s_pre_treat",
        "n_post_ctrl",
        "s_post_ctrl",
        "n_post_treat",
        "s_post_treat",
        F.expr(_DID_EXPR).alias("did_milli_centi"),
    )


def ev_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r15 (gates r16): two-period two-group
    difference-in-differences over the events table — the four
    (arm × period) cell counts and exact centi-value sums, plus the DiD
    lift in milli-centi.

    Scale shape: one (treat, day)-keyed cell aggregate (map-side
    combinable, ≤ 2·|days| rows), a 1-row min/max bounds aggregate
    broadcast back (the asserted 1-row crossJoin idiom), then one fused
    conditional aggregate over the tiny cell table — no window, no join
    against the raw stream, output one row per standing design. The
    streaming twin (`streaming/pipeline.incremental_did_lift`)
    accumulates the same cells per micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    return did_lift_report(did_daily_agg(ev))


def _did_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_did_lift_matches_model_and_oracle; registers r16)."""
    h2 = T.token_hash_sql("CAST(user_id AS VARCHAR)", seed=2)
    return f"""
WITH cells0 AS (
  SELECT ({h2}) % 2 < 1 AS treat,
         date_trunc('day', ts) AS day,
         COUNT(*) AS n,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cells0),
e AS (
  SELECT date_diff('day', b.d0, day)
           >= date_diff('day', b.d0, b.d1) // 2 AS post,
         treat, n, s
  FROM cells0 CROSS JOIN b
),
cells AS (
  SELECT
    CAST(SUM(CASE WHEN NOT post AND NOT treat THEN n ELSE 0 END) AS BIGINT) AS n_pre_ctrl,
    CAST(SUM(CASE WHEN NOT post AND NOT treat THEN s ELSE 0 END) AS BIGINT) AS s_pre_ctrl,
    CAST(SUM(CASE WHEN NOT post AND treat THEN n ELSE 0 END) AS BIGINT) AS n_pre_treat,
    CAST(SUM(CASE WHEN NOT post AND treat THEN s ELSE 0 END) AS BIGINT) AS s_pre_treat,
    CAST(SUM(CASE WHEN post AND NOT treat THEN n ELSE 0 END) AS BIGINT) AS n_post_ctrl,
    CAST(SUM(CASE WHEN post AND NOT treat THEN s ELSE 0 END) AS BIGINT) AS s_post_ctrl,
    CAST(SUM(CASE WHEN post AND treat THEN n ELSE 0 END) AS BIGINT) AS n_post_treat,
    CAST(SUM(CASE WHEN post AND treat THEN s ELSE 0 END) AS BIGINT) AS s_post_treat
  FROM e
)
SELECT 'ab_50_50' AS experiment, n_pre_ctrl, s_pre_ctrl, n_pre_treat,
       s_pre_treat, n_post_ctrl, s_post_ctrl, n_post_treat, s_post_treat,
       {_DID_EXPR} AS did_milli_centi
FROM cells
"""


# ------------------- CUPED variance-reduced lift (staged r15, gates r16)
# Deng, Xu, Kohavi & Walker 2013 ("Improving the Sensitivity of Online
# Controlled Experiments by Utilizing Pre-Experiment Data"): the
# pre-period per-user metric X is a covariate for the post-period metric
# Y; theta = cov(X, Y) / var(X) POOLED across arms, and the adjusted
# lift (ȳ_t − ȳ_c) − theta·(x̄_t − x̄_c) removes the covariate-imbalance
# component of the raw lift, shrinking readout variance by rho². This is
# the third leg of the experimentation family: srm_check guards the
# split, abtest_chi2/did_lift read the effect, cuped_adjust reads it at
# higher power when a pre-period exists.
#
# Exactness discipline: per-user x, y are exact centi BIGINT sums (per-
# user products x·y ≤ ~1.4e15 stay BIGINT); the POOLED cross-moments
# Σxy, Σx², Σy² accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
# because corpus-level sums of 1e15-scale products leave BIGINT at
# scale; num/den/deny are exact wide-integer cross-multiplications (the
# srm_check idiom), and ONLY the final quotients evaluate in doubles via
# SHARED expression strings over identically-valued integer columns —
# CAST(DECIMAL(38,0) AS DOUBLE) and CAST(HUGEINT AS DOUBLE) round the
# same integer to the same double, so both engines emit one BIGINT.
#
# Scale shape: one (user, day)-keyed additive cell aggregate (map-side
# combinable — the SAME cell grain the streaming twin accumulates, so a
# late batch that extends the window moves the re-derived boundary
# exactly as batch would), a 1-row bounds broadcast, one user-keyed
# rollup, one fused 1-row moment aggregate. No window, no join against
# the raw stream.
_CUPED_THETA_D = "CAST(num AS DOUBLE) / nullif(CAST(den AS DOUBLE), 0.0)"
_CUPED_DX = (
    "(CAST(sx_treat AS DOUBLE) / nullif(CAST(n_treat AS DOUBLE), 0.0)"
    " - CAST(sx_ctrl AS DOUBLE) / nullif(CAST(n_ctrl AS DOUBLE), 0.0))"
)
_CUPED_DY = (
    "(CAST(sy_treat AS DOUBLE) / nullif(CAST(n_treat AS DOUBLE), 0.0)"
    " - CAST(sy_ctrl AS DOUBLE) / nullif(CAST(n_ctrl AS DOUBLE), 0.0))"
)
_CUPED_THETA_MILLI = "CAST(FLOOR(1000.0 * theta_d) AS BIGINT)"
_CUPED_LIFT_RAW = f"CAST(FLOOR(1000.0 * {_CUPED_DY}) AS BIGINT)"
_CUPED_LIFT_ADJ = (
    f"CAST(FLOOR(1000.0 * ({_CUPED_DY} - theta_d * {_CUPED_DX})) AS BIGINT)"
)
# rho² = num² / (den·deny) = theta²·den/deny — the theta_d·theta_d form
# stays inside double range where num² would overflow DECIMAL(38,0)
_CUPED_VR_PPM = (
    "CAST(FLOOR(1000000.0 * theta_d * theta_d * CAST(den AS DOUBLE)"
    " / nullif(CAST(deny AS DOUBLE), 0.0)) AS BIGINT)"
)


def cuped_user_day_agg(ev: DataFrame) -> DataFrame:
    """(user_id, day, s): per-(user, day) exact centi sums — the
    ADDITIVE cell grain the streaming twin accumulates (the
    did_daily_agg precedent, one key finer because CUPED needs per-USER
    pre/post sums; no row count — unlike DiD's four cell counts, the
    CUPED moments read only the sums). Day-grain so the finisher can
    re-derive the pre/post boundary from the cells' own min/max day."""
    return (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            _v_centi().alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").cast("long").alias("s"))
    )


def cuped_report(cells: DataFrame) -> DataFrame:
    """The CUPED finisher over (user_id, day, s) cells: boundary = the
    cells' own midpoint day (the SHARED _midpoint_post derivation, so
    DiD and CUPED can never disagree on the boundary rule), per-user
    pre-sum x / post-sum y, seed-2 token_hash arms, pooled theta from
    exact wide-integer moments, then the shared double-quotient
    expressions for theta / raw lift / adjusted lift / variance shrink."""
    dec = "decimal(38,0)"
    per_user = (
        _midpoint_post(cells).select("user_id", "post", "s")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(~F.col("post"), F.col("s")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("post"), F.col("s")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select(
            "x",
            "y",
            (
                F.pmod(
                    T.token_hash(F.col("user_id").cast("string"), seed=2),
                    F.lit(2),
                )
                < 1
            ).alias("treat"),
        )
    )
    stats = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("treat").cast("long")).cast("long").alias("n_treat"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("treat"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx_treat"),
        F.sum(F.when(F.col("treat"), F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_treat"),
    )
    m = stats.select(
        "*",
        (
            F.col("n_users").cast(dec) * F.col("sxy")
            - F.col("sx").cast(dec) * F.col("sy").cast(dec)
        ).alias("num"),
        (
            F.col("n_users").cast(dec) * F.col("sxx")
            - F.col("sx").cast(dec) * F.col("sx").cast(dec)
        ).alias("den"),
        (
            F.col("n_users").cast(dec) * F.col("syy")
            - F.col("sy").cast(dec) * F.col("sy").cast(dec)
        ).alias("deny"),
        (F.col("n_users") - F.col("n_treat")).cast("long").alias("n_ctrl"),
        (F.col("sx") - F.col("sx_treat")).cast("long").alias("sx_ctrl"),
        (F.col("sy") - F.col("sy_treat")).cast("long").alias("sy_ctrl"),
    ).withColumn("theta_d", F.expr(_CUPED_THETA_D))
    return m.select(
        F.lit("ab_50_50").alias("experiment"),
        "n_users",
        "n_treat",
        "n_ctrl",
        F.expr(_CUPED_THETA_MILLI).alias("theta_milli"),
        F.expr(_CUPED_LIFT_RAW).alias("lift_raw_milli_centi"),
        F.expr(_CUPED_LIFT_ADJ).alias("lift_adj_milli_centi"),
        F.expr(_CUPED_VR_PPM).alias("var_reduction_ppm"),
    )


def ev_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r15 (gates r16): CUPED variance-reduced experiment readout
    over the events table — pooled theta in exact wide-integer moments,
    raw vs adjusted lift in milli-centi, variance shrink in ppm."""
    ev = load_table(spark, sf_dir, "events")
    return cuped_report(cuped_user_day_agg(ev))


def _cuped_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_cuped_adjust_matches_model_and_oracle; registers r16)."""
    h2 = T.token_hash_sql("CAST(user_id AS VARCHAR)", seed=2)
    return f"""
WITH cells0 AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cells0),
pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN NOT post THEN s ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN post THEN s ELSE 0 END) AS BIGINT) AS y,
         ({h2}) % 2 < 1 AS treat
  FROM (
    SELECT user_id,
           date_diff('day', b.d0, day)
             >= date_diff('day', b.d0, b.d1) // 2 AS post,
           s
    FROM cells0 CROSS JOIN b
  )
  GROUP BY user_id
),
stats AS (
  SELECT COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         CAST(SUM(CASE WHEN treat THEN x ELSE 0 END) AS BIGINT) AS sx_treat,
         CAST(SUM(CASE WHEN treat THEN y ELSE 0 END) AS BIGINT) AS sy_treat
  FROM pu
),
m AS (
  SELECT *,
         n_users * sxy - CAST(sx AS HUGEINT) * sy AS num,
         n_users * sxx - CAST(sx AS HUGEINT) * sx AS den,
         n_users * syy - CAST(sy AS HUGEINT) * sy AS deny,
         n_users - n_treat AS n_ctrl,
         sx - sx_treat AS sx_ctrl,
         sy - sy_treat AS sy_ctrl
  FROM stats
),
t AS (SELECT *, {_CUPED_THETA_D} AS theta_d FROM m)
SELECT 'ab_50_50' AS experiment, n_users, n_treat, n_ctrl,
       {_CUPED_THETA_MILLI} AS theta_milli,
       {_CUPED_LIFT_RAW} AS lift_raw_milli_centi,
       {_CUPED_LIFT_ADJ} AS lift_adj_milli_centi,
       {_CUPED_VR_PPM} AS var_reduction_ppm
FROM t
"""


QUERIES = {
    "ev_abtest_chi2": ev_abtest_chi2,
    "ev_cusum_excursion": ev_cusum_excursion,
    "ev_srm_check": ev_srm_check,
}

ORACLE = {
    "ev_abtest_chi2": EV_ABTEST_SQL,
    "ev_cusum_excursion": EV_CUSUM_SQL,
    "ev_srm_check": _srm_sql(),
}
