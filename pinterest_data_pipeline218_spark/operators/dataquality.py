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


# Benford first-digit milli-probabilities log10(1 + 1/d) — public constants
BENFORD_MILLI = (301, 176, 125, 97, 79, 67, 58, 51, 46)


def dq_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over o_totalprice — the classic forensic /
    data-quality test for fabricated or truncated numeric columns: the
    leading significant digit of naturally-occurring multi-scale amounts
    follows P(d) = log10(1 + 1/d), and a generator bug (or fraud) shows
    up as a digit histogram far from that curve. One row per digit 1-9:
    observed count, observed milli-frequency (exact integer div), the
    Benford expectation, and the absolute deviation in milli-units —
    integer throughout (the irrational expectations enter as fixed
    public milli-constants, so both engines agree bitwise; no logs at
    query time). The verdict column flags digits off by > 50 milli.

    Leading digit without floats: digit = first character of the
    DECIMAL-formatted absolute amount (amounts >= 0.01; zero/null rows
    are excluded and reported via n_events in dq_orders_constraints'
    completeness checks instead).

    Scale: one scan, one 9-group aggregate — map-side combinable."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
    ).select(
        F.substring(
            F.regexp_replace(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                r"[0.]",
                "",
            ),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    tot = base.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    n = tot.agg(F.sum("cnt").alias("n"))
    exp = spark.createDataFrame(
        [(d + 1, m) for d, m in enumerate(BENFORD_MILLI)],
        "digit int, expected_milli long",
    )
    return (
        tot.join(F.broadcast(exp), "digit", "full_outer")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.expr("(1000 * coalesce(cnt, 0)) div n").alias("observed_milli"),
            "expected_milli",
            F.expr(
                "abs((1000 * coalesce(cnt, 0)) div n - expected_milli)"
            ).alias("dev_milli"),
        )
        .withColumn("suspicious", F.col("dev_milli") > 50)
        .orderBy("digit")
    )


DQ_BENFORD_SQL = f"""
WITH base AS (
  SELECT CAST(substr(regexp_replace(
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
           '[0.]', ''), 1, 1) AS INT) AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
), tot AS (
  SELECT digit, COUNT(*) AS cnt FROM base GROUP BY digit
), n AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM tot
), exp AS (
  SELECT * FROM (VALUES {", ".join(f"({d + 1}, {m})" for d, m in enumerate(BENFORD_MILLI))})
         AS t(digit, expected_milli)
)
SELECT e.digit,
       CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt,
       (1000 * COALESCE(cnt, 0)) // n AS observed_milli,
       CAST(expected_milli AS BIGINT) AS expected_milli,
       abs((1000 * COALESCE(cnt, 0)) // n - expected_milli) AS dev_milli,
       abs((1000 * COALESCE(cnt, 0)) // n - expected_milli) > 50 AS suspicious
FROM tot t FULL OUTER JOIN exp e ON t.digit = e.digit CROSS JOIN n
ORDER BY e.digit
"""


def dq_documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over `documents` — the OTHER half of the
    Deequ pattern next to dq_orders_constraints' pass/fail suite: per
    column, completeness (non-null count), approximate-free exact
    distinct count, and for the numeric column min/max — the statistics
    a profiler computes BEFORE anyone writes constraints. One row per
    column, assembled by stack() from ONE fused aggregate pass (adding a
    profiled column adds expressions, not passes).

    Scale: a single scan-aggregate; the distinct counts are the only
    shuffling sub-aggregates and all share the pass."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("doc_id").cast("long").alias("c_doc_id"),
        F.countDistinct("doc_id").cast("long").alias("d_doc_id"),
        F.count("text").cast("long").alias("c_text"),
        F.countDistinct("text").cast("long").alias("d_text"),
        F.count("lang").cast("long").alias("c_lang"),
        F.countDistinct("lang").cast("long").alias("d_lang"),
        F.count("source").cast("long").alias("c_source"),
        F.countDistinct("source").cast("long").alias("d_source"),
        F.count("n_chars").cast("long").alias("c_n_chars"),
        F.countDistinct("n_chars").cast("long").alias("d_n_chars"),
        F.min("n_chars").cast("long").alias("min_n_chars"),
        F.max("n_chars").cast("long").alias("max_n_chars"),
    )
    long = agg.selectExpr(
        "n_rows",
        "min_n_chars",
        "max_n_chars",
        "stack(5, "
        "'doc_id', c_doc_id, d_doc_id, "
        "'lang', c_lang, d_lang, "
        "'n_chars', c_n_chars, d_n_chars, "
        "'source', c_source, d_source, "
        "'text', c_text, d_text"
        ") AS (column_name, n_complete, n_distinct)",
    )
    return long.select(
        "column_name",
        "n_complete",
        "n_distinct",
        "n_rows",
        (F.col("n_complete") == F.col("n_rows")).alias("complete"),
        F.when(F.col("column_name") == "n_chars", F.col("min_n_chars")).alias(
            "min_value"
        ),
        F.when(F.col("column_name") == "n_chars", F.col("max_n_chars")).alias(
            "max_value"
        ),
    ).orderBy("column_name")


DQ_PROFILE_SQL = """
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(doc_id) AS BIGINT) AS c_doc_id,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d_doc_id,
         CAST(COUNT(text) AS BIGINT) AS c_text,
         CAST(COUNT(DISTINCT text) AS BIGINT) AS d_text,
         CAST(COUNT(lang) AS BIGINT) AS c_lang,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS d_lang,
         CAST(COUNT(source) AS BIGINT) AS c_source,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS d_source,
         CAST(COUNT(n_chars) AS BIGINT) AS c_n_chars,
         CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS d_n_chars,
         CAST(MIN(n_chars) AS BIGINT) AS min_n_chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_n_chars
  FROM documents
)
SELECT column_name, n_complete, n_distinct, n_rows,
       n_complete = n_rows AS complete,
       CASE WHEN column_name = 'n_chars' THEN min_n_chars END AS min_value,
       CASE WHEN column_name = 'n_chars' THEN max_n_chars END AS max_value
FROM (
  SELECT 'doc_id' AS column_name, c_doc_id AS n_complete, d_doc_id AS n_distinct, n_rows, min_n_chars, max_n_chars FROM agg
  UNION ALL SELECT 'lang', c_lang, d_lang, n_rows, min_n_chars, max_n_chars FROM agg
  UNION ALL SELECT 'n_chars', c_n_chars, d_n_chars, n_rows, min_n_chars, max_n_chars FROM agg
  UNION ALL SELECT 'source', c_source, d_source, n_rows, min_n_chars, max_n_chars FROM agg
  UNION ALL SELECT 'text', c_text, d_text, n_rows, min_n_chars, max_n_chars FROM agg
)
ORDER BY column_name
"""


DRIFT_BIN_CENTI = 2500  # 25.00-unit value bins (events value spans ~0-500)
DRIFT_N_BINS = 20
DRIFT_SHIFT_PCT_X100 = 2  # flag a bin whose share moved > 2 percentage points


def dq_events_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (r11) — the data-quality check a training
    pipeline runs between ingest snapshots: per (event_type, value bin),
    compare the bin's SHARE of events between the first and second half of
    the time range and flag bins whose share moved by more than
    {DRIFT_SHIFT_PCT_X100} percentage points. The drift predicate is pure
    integer cross-multiplication (|n1·N2 − n2·N1| · 100 >
    {DRIFT_SHIFT_PCT_X100}·N1·N2 — the ev_abtest/cusum idiom), so there is
    no float divergence between engines; a PSI/KL rendering would need
    ln() and is deliberately avoided. Bins are fixed-width
    ({DRIFT_BIN_CENTI} centi-units, clamped to {DRIFT_N_BINS}) —
    mergeable across partitions AND snapshots, unlike quantile bins.

    Plan: the half boundary is the midpoint of one 1-row (min, max)
    aggregate broadcast back (crossJoin of planning-sized state); then ONE
    grouped count per (type, bin, half) pivoted by half, plus a per-type
    total window-free rollup re-joined. Both aggregates map-side
    combinable; no windows, no per-row Python. 100 TB: (type × 20 bins)
    output, a fixed-size dashboard relation."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    binned = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        drift_bin().alias("bin"),
        (F.unix_micros("ts") * 2 < F.col("t0") + F.col("t1")).alias("first_half"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("first_half"), 1)).alias("n_first"),
        F.count(F.when(~F.col("first_half"), 1)).alias("n_second"),
    )
    return drift_report(cells)


def drift_bin() -> F.Column:
    """The fixed-width bin of the `value` column every drift surface
    shares (mergeable across partitions AND snapshots, unlike quantile
    bins) — integer `div`, no float division anywhere. Clamped to
    [0, DRIFT_N_BINS-1] on BOTH ends: without the GREATEST a negative
    `value` yields a negative bin, where Spark's `div` (truncate toward
    zero) and DuckDB's `//` (floor) disagree (-0.5 → bin 0 vs bin -1) —
    and drift_cells is the reusable streaming-state primitive, fed
    arbitrary batch data, not just the non-negative events fixture."""
    return F.greatest(
        F.least(
            F.expr(
                f"cast(cast(value as decimal(18,2)) * 100 as bigint)"
                f" div {DRIFT_BIN_CENTI}"
            ),
            F.lit(DRIFT_N_BINS - 1).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
    )


def drift_cells(df: DataFrame, side: str) -> DataFrame:
    """(event_type, bin, n) for one snapshot — the purely ADDITIVE drift
    state (cell counts sum across micro-batches / partitions), bounded at
    |types| × {DRIFT_N_BINS} rows. `side` only names the count column."""
    return (
        df.select("event_type", drift_bin().alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias(side))
    )


def drift_report(cells: DataFrame) -> DataFrame:
    """The shared drift FINISHER: joint (event_type, bin, n_first,
    n_second) cells → per-type totals → the integer cross-multiplied
    >2pp share-shift flag. Consumed verbatim by the gated
    dq_events_drift (single-pass conditional-count cells) and by the
    streaming baseline-vs-accumulated assembly
    (incremental_events_drift) — so stream == batch equality is exact by
    construction, not approximately."""
    totals = cells.groupBy("event_type").agg(
        F.sum("n_first").alias("tot_first"),
        F.sum("n_second").alias("tot_second"),
    )
    shifted = (
        F.abs(
            F.col("n_first") * F.col("tot_second")
            - F.col("n_second") * F.col("tot_first")
        )
        * 100
        > F.lit(DRIFT_SHIFT_PCT_X100) * F.col("tot_first") * F.col("tot_second")
    )
    return (
        cells.join(totals, "event_type")
        .select(
            "event_type",
            "bin",
            "n_first",
            "n_second",
            shifted.alias("shifted"),
        )
        .orderBy("event_type", "bin")
    )


DQ_DRIFT_SQL = f"""
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events
), binned AS (
  SELECT event_type,
         GREATEST(LEAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               // {DRIFT_BIN_CENTI}, {DRIFT_N_BINS - 1}), 0) AS bin,
         epoch_us(ts) * 2 < t0 + t1 AS first_half
  FROM events, span
), cells AS (
  SELECT event_type, bin,
         COUNT(CASE WHEN first_half THEN 1 END) AS n_first,
         COUNT(CASE WHEN NOT first_half THEN 1 END) AS n_second
  FROM binned GROUP BY 1, 2
), totals AS (
  SELECT event_type, SUM(n_first) AS tot_first, SUM(n_second) AS tot_second
  FROM cells GROUP BY 1
)
SELECT c.event_type, c.bin,
       CAST(n_first AS BIGINT) AS n_first,
       CAST(n_second AS BIGINT) AS n_second,
       ABS(n_first * tot_second - n_second * tot_first) * 100
         > {DRIFT_SHIFT_PCT_X100} * tot_first * tot_second AS shifted
FROM cells c JOIN totals t USING (event_type)
ORDER BY event_type, bin
"""


PROFILE_DRIFT_COLS = ("lang", "n_chars", "source", "text")
PROFILE_SHIFT_PCT_X100 = 500  # distinct-share shift > 5pp flags drift


def profile_drift_cells(docs: DataFrame) -> DataFrame:
    """Per-column two-half profile cells over a documents-shaped frame —
    the kernel of dq_profile_drift (r12, gates r13). Halves split by
    doc_id parity (deterministic, engine-neutral); per column per half:
    non-null count and exact distinct count, all from ONE fused
    conditional-aggregate pass (adding a column adds expressions, not
    passes). The drift verdict compares DISTINCT SHARES (distinct/rows)
    between halves by integer cross-multiplication — the drift_report
    idiom at profile grain: a column whose value diversity collapses or
    explodes between cohorts (schema rot, a constant-filled backfill, an
    id column turning categorical) flags without any float division."""
    exprs = []
    for c in PROFILE_DRIFT_COLS:
        for h in (0, 1):
            cond = F.when(F.col("doc_id") % 2 == h, F.col(c))
            exprs.append(F.count(cond).cast("long").alias(f"c_{c}_{h}"))
            exprs.append(F.countDistinct(cond).cast("long").alias(f"d_{c}_{h}"))
    agg = docs.agg(*exprs)
    stack_args = ", ".join(
        f"'{c}', c_{c}_0, d_{c}_0, c_{c}_1, d_{c}_1" for c in PROFILE_DRIFT_COLS
    )
    long = agg.selectExpr(
        f"stack({len(PROFILE_DRIFT_COLS)}, {stack_args}) AS "
        "(column_name, n_first, d_first, n_second, d_second)"
    )
    shifted = (
        F.abs(
            F.col("d_first") * F.col("n_second")
            - F.col("d_second") * F.col("n_first")
        )
        * 10_000
        > F.lit(PROFILE_SHIFT_PCT_X100) * F.col("n_first") * F.col("n_second")
    )
    return long.select(
        "column_name",
        "n_first",
        "d_first",
        "n_second",
        "d_second",
        shifted.alias("share_shifted"),
    ).orderBy("column_name")


def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated rendering (r13): two-cohort column-profile drift over the
    documents table."""
    return profile_drift_cells(load_table(spark, sf_dir, "documents"))


def _profile_drift_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_profile_drift_oracle_agrees_cross_engine; registered r13)."""
    cols = []
    for c in PROFILE_DRIFT_COLS:
        for h in (0, 1):
            cols.append(
                f"CAST(COUNT({c}) FILTER (WHERE doc_id % 2 = {h}) AS BIGINT)"
                f" AS c_{c}_{h}"
            )
            cols.append(
                f"CAST(COUNT(DISTINCT {c}) FILTER (WHERE doc_id % 2 = {h})"
                f" AS BIGINT) AS d_{c}_{h}"
            )
    sel = ",\n         ".join(cols)
    unions = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS column_name, c_{c}_0 AS n_first, d_{c}_0 AS d_first,"
        f" c_{c}_1 AS n_second, d_{c}_1 AS d_second FROM agg"
        for c in PROFILE_DRIFT_COLS
    )
    return f"""
WITH agg AS (
  SELECT {sel}
  FROM documents
),
long AS (
{unions}
)
SELECT column_name, n_first, d_first, n_second, d_second,
       ABS(d_first * n_second - d_second * n_first) * 10000
         > {PROFILE_SHIFT_PCT_X100} * n_first * n_second AS share_shifted
FROM long
ORDER BY column_name
"""


# -------------------------------------------------- k-anonymity (r13)
# k-anonymity screening (Sweeney 2002, public): before a corpus leaves
# the pipeline, every combination of quasi-identifier values must be
# shared by at least k records, or the small group re-identifies its
# members. The screen is one grouped count over the quasi-identifier
# tuple — map-side combinable, the cheapest possible shape — emitting
# the violating groups (bounded: at most |rows|/1 groups, in practice
# the small tail) ordered by size.
K_ANON_K = 5
K_ANON_CHARS_BUCKET = 200  # n_chars coarsened to buckets (generalization)


def k_anonymity_violations(docs: DataFrame) -> DataFrame:
    """(lang, source, chars_bucket, n): quasi-identifier groups with
    fewer than K_ANON_K members. chars_bucket generalizes the numeric
    quasi-identifier (the standard k-anonymity move: coarsen until
    groups are large enough — the bucket width is the dial)."""
    qi = docs.select(
        "lang",
        "source",
        F.expr(f"n_chars div {K_ANON_CHARS_BUCKET}").alias("chars_bucket"),
    )
    return (
        qi.groupBy("lang", "source", "chars_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < K_ANON_K)
        .orderBy("n", "lang", "source", "chars_bucket")
    )


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r13 (gates r14): quasi-identifier groups of the documents
    table below the k=5 anonymity floor — the privacy screen beside
    text_pii_redact's content scrubbing (redaction removes identifiers
    IN the text; k-anonymity catches re-identification BY metadata)."""
    return k_anonymity_violations(load_table(spark, sf_dir, "documents"))


def _k_anonymity_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_k_anonymity_oracle_agrees_cross_engine; registers r14)."""
    return f"""
SELECT lang, source, n_chars // {K_ANON_CHARS_BUCKET} AS chars_bucket,
       COUNT(*) AS n
FROM documents
GROUP BY 1, 2, 3
HAVING COUNT(*) < {K_ANON_K}
ORDER BY n, lang, source, chars_bucket
"""


# ---------------- l-diversity (staged r15, gates r16)
# The sensitive-attribute refinement of k-anonymity (Machanavajjhala et
# al. 2007, "l-Diversity: Privacy Beyond k-Anonymity", public): a
# quasi-identifier group can be LARGE (k-anonymous) yet still leak — if
# every member shares one sensitive value, matching the QI tuple reveals
# that value with certainty (the homogeneity attack). Here the QI is
# (source, chars_bucket) — deliberately EXCLUDING the sensitive column,
# unlike the k-anon screen where lang is itself a quasi-identifier — and
# the sensitive attribute is `lang`: a group below distinct-l-diversity
# L=2 lets an attacker infer a document's language from its metadata
# alone. Same cheapest-possible shape as the k-anon screen: ONE grouped
# aggregate over the QI tuple (count + count-distinct, map-side
# partially combinable), emitting the violating groups.
L_DIV_L = 2


def l_diversity_cells(docs: DataFrame) -> DataFrame:
    """(source, chars_bucket, lang, n): the ADDITIVE sensitive-value
    cells the streaming twin accumulates — counts add per (QI, lang)
    cell, and the distinct-lang verdict re-derives from the merged
    cells, so a late batch that introduces a group's second language
    clears the flag exactly as batch would."""
    return (
        docs.select(
            "source",
            F.expr(f"n_chars div {K_ANON_CHARS_BUCKET}").alias(
                "chars_bucket"
            ),
            "lang",
        )
        .groupBy("source", "chars_bucket", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def l_diversity_report(cells: DataFrame) -> DataFrame:
    """The l-diversity finisher over (source, chars_bucket, lang, n)
    cells: group sizes and distinct sensitive values from one rollup."""
    return (
        cells.groupBy("source", "chars_bucket")
        .agg(
            F.sum("n").cast("long").alias("n"),
            # one cell per distinct lang; NULL-lang cells don't count as
            # a language (COUNT(DISTINCT) semantics), but their docs do
            # count toward the group size
            F.sum(F.when(F.col("lang").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_langs"),
        )
        .filter(F.col("n_langs") < L_DIV_L)
        .orderBy(F.desc("n"), "n_langs", "source", "chars_bucket")
    )


def l_diversity_violations(docs: DataFrame) -> DataFrame:
    """(source, chars_bucket, n, n_langs): quasi-identifier groups whose
    members span fewer than L_DIV_L distinct sensitive (lang) values —
    the homogeneity-attack surface, ordered worst (largest group, fewest
    values) first."""
    return l_diversity_report(l_diversity_cells(docs))


def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r15 (gates r16): quasi-identifier groups of the documents
    table below the distinct-l-diversity floor — the homogeneity-attack
    screen beside dq_k_anonymity's small-group screen (k-anonymity bounds
    group SIZE; l-diversity bounds what a group REVEALS)."""
    return l_diversity_violations(load_table(spark, sf_dir, "documents"))


def _l_diversity_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_l_diversity_matches_model_and_oracle; registers r16)."""
    return f"""
SELECT source, n_chars // {K_ANON_CHARS_BUCKET} AS chars_bucket,
       COUNT(*) AS n, COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY 1, 2
HAVING COUNT(DISTINCT lang) < {L_DIV_L}
ORDER BY n DESC, n_langs, source, chars_bucket
"""


# ------------------------------------------- freshness / lag (staged r14)
# Pipeline-freshness monitoring (the fourth Deequ-style dimension beside
# constraints, profile, and drift): per event type, how STALE is the
# newest record relative to the dataset's frontier, and what does the
# arrival cadence look like (max + exact-median inter-arrival gap). A
# type whose staleness grows or whose gap distribution stretches is a
# stalled upstream producer — the alert that fires before volume drift
# does. Deterministic by construction: the reference "now" is the
# dataset's own MAX ts (a 1-row broadcast planning aggregate), never
# wall-clock; gaps between equal timestamps are 0 regardless of tie
# order, so the gap multiset needs no tie rule. All arithmetic is
# integer seconds via timestampdiff/date_diff — dtype-agnostic under the
# events-ts encoding drift, bitwise across engines.


def freshness_report(ev: DataFrame) -> DataFrame:
    """(event_type, n_events, staleness_s, max_gap_s, p50_gap_s): one
    type-partitioned window pass for gaps (lag + row_number + count share
    the partition spec -> one exchange), a grouped rollup, and the 1-row
    frontier broadcast. p50 is the exact DISCRETE order statistic at
    ceil-rank (the ev_quantiles_disc rule). 100 TB: one exchange on
    event_type; skew equals bounded type cardinality."""
    from pyspark.sql import Window

    base = ev.select("event_type", "ts", "event_id")
    frontier = base.agg(F.max("ts").alias("t_max")).limit(1)
    gapped = base.select(
        "event_type",
        "ts",
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER "
            "(PARTITION BY event_type ORDER BY ts, event_id), ts) div 1000000"
        ).alias("gap_s"),
    )
    wg = Window.partitionBy("event_type")
    ranked = gapped.filter(F.col("gap_s").isNotNull()).select(
        "event_type",
        "gap_s",
        F.row_number().over(wg.orderBy("gap_s")).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("ng"),
    )
    gap_stats = ranked.groupBy("event_type").agg(
        F.max("gap_s").alias("max_gap_s"),
        F.max(
            F.when(F.col("rn") == F.expr("(50 * ng + 99) div 100"), F.col("gap_s"))
        ).alias("p50_gap_s"),
    )
    per_type = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("t_last")
    )
    return (
        per_type.crossJoin(F.broadcast(frontier))
        .join(gap_stats, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.expr(
                "timestampdiff(MICROSECOND, t_last, t_max) div 1000000"
            ).alias("staleness_s"),
            "max_gap_s",
            "p50_gap_s",
        )
        .orderBy("event_type")
    )


def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r14 (gates r15): per-type freshness/staleness + arrival
    cadence over the events table."""
    return freshness_report(load_table(spark, sf_dir, "events"))


def _freshness_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_freshness_oracle_agrees_cross_engine; registers r15)."""
    return """
WITH base AS (SELECT event_type, ts, event_id FROM events),
frontier AS (SELECT MAX(ts) AS t_max FROM base),
gapped AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id), ts) // 1000000 AS gap_s
  FROM base
),
ranked AS (
  SELECT event_type, gap_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_s) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS ng
  FROM gapped WHERE gap_s IS NOT NULL
),
gap_stats AS (
  SELECT event_type, MAX(gap_s) AS max_gap_s,
         MAX(CASE WHEN rn = (50 * ng + 99) // 100 THEN gap_s END) AS p50_gap_s
  FROM ranked GROUP BY event_type
),
per_type AS (
  SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS t_last
  FROM base GROUP BY event_type
)
SELECT p.event_type AS event_type, p.n_events AS n_events,
       CAST(date_diff('microsecond', p.t_last, f.t_max) // 1000000
            AS BIGINT) AS staleness_s,
       CAST(g.max_gap_s AS BIGINT) AS max_gap_s,
       CAST(g.p50_gap_s AS BIGINT) AS p50_gap_s
FROM per_type p CROSS JOIN frontier f
LEFT JOIN gap_stats g USING (event_type)
ORDER BY event_type
"""


# ---------------- embedding-table profile (staged r15, gates r16)
# The DQ screen a training pipeline runs over its VECTOR asset before any
# ANN/dedup/sampling stage consumes it: per cell (label) — row count,
# NULL vectors, zero-norm vectors (they NULL every cosine downstream:
# _cos_ppm and the oracle's CASE both yield NULL, and the r14 MMR advice
# item was exactly a zero-norm crash), byte-identical duplicate vectors
# (an exact-dup cluster inflates every pairwise stage quadratically), and
# dimension constancy (a ragged vector silently NULLs unrolled dots past
# its end). Exactness: each component truncated onto the 2^-20 QUANT grid
# (the build_ivf_centroids quantization — `(val * QUANT).cast("long")` is
# trunc-toward-zero, DuckDB TRUNC), so "duplicate", "zero norm", and the
# norm² stats are integer facts both engines agree on bitwise. norm²
# bound: (2^20·|x|)² ≈ 9e10/component, ·64 dims ≈ 6e12 — BIGINT-safe.
#
# Scale shape: scan-local quantization, ONE (label, qvec)-keyed grouped
# count (map-side combinable — the only corpus-sized shuffle, keyed on the
# vector itself so identical vectors collide by construction), then one
# tiny (label)-keyed rollup. No window, no join, output = |cells| rows.
def dq_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r15 (gates r16): per-cell embedding-asset profile — counts,
    NULL/zero-norm/exact-duplicate vectors, dim constancy, quantized-norm²
    stats; all-integer outputs."""
    from ..functions.vectors import as_double_array
    from .similarity import QUANT

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", as_double_array("embedding").alias("v")
    )
    g = (
        emb.select(
            "label",
            F.transform("v", lambda x: (x * QUANT).cast("long")).alias("q"),
        )
        .groupBy("label", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    n2 = F.aggregate(
        "q", F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    s = g.select(
        "label",
        "cnt",
        F.col("q").isNull().alias("is_null"),
        F.size("q").alias("dim"),
        n2.alias("n2"),
    )
    real = ~F.col("is_null")
    return (
        s.groupBy("label")
        .agg(
            F.sum("cnt").cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("is_null"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_null_vec"),
            F.sum(F.when(real & (F.col("cnt") > 1), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_dup_vecs"),
            F.sum(F.when(real & (F.col("n2") == 0), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_zero_norm"),
            F.min("dim").cast("integer").alias("min_dim"),
            F.max("dim").cast("integer").alias("max_dim"),
            F.min("n2").cast("long").alias("min_norm2_q"),
            F.max("n2").cast("long").alias("max_norm2_q"),
            # numerator widened to DECIMAL(38,0): n2 ≈ 1.1e12 for a
            # unit-norm vector, so a cell of ~8.4e6 vectors (or one
            # exact-dup clique of ~7.7e5) pushes Σ n2·cnt past BIGINT —
            # the corpus-scale-sum class the cuped/srm idiom exists for;
            # the QUOTIENT is a per-vector norm² and fits BIGINT
            F.expr(
                "sum(CASE WHEN n2 IS NOT NULL THEN"
                " CAST(n2 AS DECIMAL(38,0)) * cnt ELSE 0 END)"
                " div nullif(sum(CASE WHEN n2 IS NOT NULL THEN cnt"
                " ELSE 0 END), 0)"
            )
            .cast("long")
            .alias("avg_norm2_q"),
        )
        .orderBy("label")
    )


def _embedding_profile_sql() -> str:
    """Staged DuckDB oracle (validated by
    test_dq_embedding_profile_matches_model_and_oracle; registers r16)."""
    from .similarity import QUANT

    return f"""
WITH e AS (
  SELECT label,
         list_transform(embedding::DOUBLE[],
                        __x -> CAST(TRUNC(__x * {QUANT}) AS BIGINT)) AS q
  FROM embeddings
),
g AS (SELECT label, q, COUNT(*) AS cnt FROM e GROUP BY label, q),
s AS (
  SELECT label, cnt, q IS NULL AS is_null, len(q) AS dim,
         -- list_reduce errors on []; Spark's aggregate folds [] to its
         -- 0 init, so an empty vector is zero-norm in both engines
         CASE WHEN len(q) = 0 THEN 0
              ELSE list_reduce(list_transform(q, __x -> __x * __x),
                               (__a, __b) -> __a + __b) END AS n2
  FROM g
)
SELECT label,
       CAST(SUM(cnt) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN is_null THEN cnt ELSE 0 END) AS BIGINT)
         AS n_null_vec,
       CAST(SUM(CASE WHEN NOT is_null AND cnt > 1 THEN cnt ELSE 0 END)
         AS BIGINT) AS n_dup_vecs,
       CAST(SUM(CASE WHEN NOT is_null AND n2 = 0 THEN cnt ELSE 0 END)
         AS BIGINT) AS n_zero_norm,
       CAST(MIN(dim) AS INT) AS min_dim,
       CAST(MAX(dim) AS INT) AS max_dim,
       CAST(MIN(n2) AS BIGINT) AS min_norm2_q,
       CAST(MAX(n2) AS BIGINT) AS max_norm2_q,
       CAST(SUM(CASE WHEN n2 IS NOT NULL
                THEN CAST(n2 AS HUGEINT) * cnt ELSE 0 END)
            // NULLIF(SUM(CASE WHEN n2 IS NOT NULL THEN cnt ELSE 0 END), 0)
         AS BIGINT) AS avg_norm2_q
FROM s
GROUP BY label
ORDER BY label
"""


QUERIES = {
    "dq_orders_constraints": dq_orders_constraints,
    "dq_benford_totalprice": dq_benford_totalprice,
    "dq_documents_profile": dq_documents_profile,
    "dq_events_drift": dq_events_drift,
    "dq_profile_drift": dq_profile_drift,
    "dq_k_anonymity": dq_k_anonymity,
    "dq_freshness_lag": dq_freshness_lag,
}
ORACLE = {
    "dq_orders_constraints": DQ_ORDERS_SQL,
    "dq_benford_totalprice": DQ_BENFORD_SQL,
    "dq_documents_profile": DQ_PROFILE_SQL,
    "dq_events_drift": DQ_DRIFT_SQL,
    "dq_profile_drift": _profile_drift_sql(),
    "dq_k_anonymity": _k_anonymity_sql(),
    "dq_freshness_lag": _freshness_sql(),
}
