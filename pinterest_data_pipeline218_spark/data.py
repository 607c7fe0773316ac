"""Testdata loading.

The driver provides deterministic TPC-H-ish parquet tables (see TESTDATA.md):
region nation customer supplier part orders lineitem events documents
embeddings. We read them as plain parquet scans — column pruning and filter
pushdown then happen for free at the source (verify with
``df.explain('formatted')``: look for ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os
import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Memo of loaded LAZY table plans, per live SparkSession (r16, guide §5):
# `spark.read.parquet` re-resolves the source per call — file listing +
# footer/schema inference through py4j, measured ~110-135 ms per call on
# this host — and the bench harness pays it per table per rep for all 207
# queries (the single largest driver-tax line of the r16 builder sweep:
# ~90 s of cumulative builder time, roughly half of it load_table).
# Stores only the lazy DataFrame (no data, no results — every action still
# computes from the parquet inputs); callers get a fresh select("*")
# wrapper so physical planning stays per-action under the CURRENT session
# conf (the _memo_plan discipline in operators/dedup.py). Keys carry the
# file's mtime+size (the on-disk IVF index convention), so a rewritten
# fixture misses the memo instead of serving a stale file listing; the
# WeakKeyDictionary drops entries with their session, which also keeps a
# sibling spark.newSession() from inheriting plans resolved under another
# session's conf (ADVICE r15).
_LOAD_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)
_LOAD_MEMO_MAX = 64  # distinct (sf_dir, table, stat) per session


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        stat_key = (st.st_mtime_ns, st.st_size)
    except OSError:
        stat_key = None
    per = _LOAD_MEMO.setdefault(spark, {})
    key = (sf_dir, name, stat_key)
    got = per.get(key)
    if got is None:
        got = _load_table_build(spark, sf_dir, name)
        if len(per) >= _LOAD_MEMO_MAX:
            per.pop(next(iter(per)))
        per[key] = got
    return got.select("*")


def _load_table_build(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet's ts encoding has drifted across data generations
        # (INT64 TIMESTAMP(NANOS), then timestamp[us] without a timezone).
        # Spark rejects NANOS outright unless this legacy conf is on. It must
        # be set on whatever session performs the read (callers may not use
        # our session factory), and it is runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to one dtype (TIMESTAMP, i.e. LTZ) whatever the file
        # encoding, so every downstream operator sees a single type:
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            # TIMESTAMP(NANOS) read as int64 via nanosAsLong: floor-divide to
            # micros (integer math — exact, and matches DuckDB's ns→µs
            # truncation) and rebuild the timestamp.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # timestamp[us] with no timezone reads as TIMESTAMP_NTZ in
            # Spark 4, which rejects epoch casts (unix_micros, cast-to-
            # double). Treat the wall time as UTC. Session-tz-independent
            # conversion (no session mutation — VERDICT r4 #8):
            # convert_timezone('UTC', current_timezone(), ts) re-renders the
            # UTC wall time in the caller's session tz (still NTZ), and the
            # NTZ→TIMESTAMP cast then interprets that wall time under the
            # SAME session tz — both are resolved during the same analysis
            # pass, so the composition yields the UTC instant under ANY
            # session timezone (pytest: test_ntz_load_is_session_tz_neutral).
            # Downstream wall-time extraction (dates, hours) follows the
            # session tz as everywhere in Spark; the package session factory
            # pins UTC (session.py), matching DuckDB's naive read.
            df = df.withColumn(
                "ts",
                F.expr(
                    "cast(convert_timezone('UTC', current_timezone(), ts)"
                    " as timestamp)"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view (the reference's query layer is SQL
    over temp views — BatchProcessingFinal.ipynb:1746-1748)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# Literal (collected-values) relations, memoized per live SparkSession
# (r16): a trained-planning-state table (Lloyd codebook, k-means
# centroids) embedded via spark.createDataFrame gets a FRESH RDD identity
# on every call, so every downstream plan digest (plan_identity) and
# CacheManager plan key changes per execution — ml_semantic_keepers'
# edge registry missed on every rep and re-paid its pair materialization
# (A/B 2.0 -> 3.4 s) until the relation object was made stable. Returning
# the SAME DataFrame object is safe here because it is a leaf relation
# over immutable collected values: there is no physical plan beneath it
# that a session-conf flip could re-shape (contrast _memo_plan's fresh
# select('*') discipline for composite plans).
_LITERAL_DF_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)
_LITERAL_DF_MEMO_MAX = 64


def literal_df(spark: SparkSession, key: tuple, rows: list, schema: str) -> DataFrame:
    per = _LITERAL_DF_MEMO.setdefault(spark, {})
    df = per.get(key)
    if df is None:
        df = spark.createDataFrame(rows, schema)
        if len(per) >= _LITERAL_DF_MEMO_MAX:
            per.pop(next(iter(per)))
        per[key] = df
    return df


def shielded_sort(df: DataFrame, *cols: str) -> DataFrame:
    """Global presentation sort behind a hash-exchange shield (r15, from
    the VERDICT r14 #3 root cause): a bare orderBy's RangePartitioner
    runs a SAMPLING JOB over its child to pick range bounds, and that
    job re-executes everything between the sort and the nearest
    materialized shuffle — for a scan-rooted per-document pipeline
    (codec mapInPandas, regex chains, token stats) that is the ENTIRE
    compute, twice per action. Hash-repartitioning on the lead sort key
    first materializes the already-reduced output rows once; the
    sampling job then re-reads shuffle blocks instead of re-running the
    stage (measured at sf0.1: mm_audio_decode 0.82 → 0.55 s,
    corpus_reservoir_sample's fix is the bounded-output special case).
    Only worth it when the child is expensive and exchange-free — an
    aggregate output's final sort re-samples a tiny post-shuffle stage
    and needs no shield."""
    return df.repartition(*[F.col(c) for c in cols[:1]]).orderBy(*cols)


def plan_identity(df: DataFrame) -> str:
    """Collision-resistant identity of a DataFrame's logical plan: MD5 of
    the analyzed-plan string (which embeds the resolved input relations,
    i.e. the concrete file paths for file sources) with expression ids
    canonicalized. Raw exprIds (`doc_id#123`) are allocation-order
    globals, so two builds of the SAME query differ textually — the same
    reason DataFrame.semanticHash() normalizes them; lambda variables
    (`lambda x_7#id`) carry a second global counter in the NAME itself.
    Renumbering each distinct `#n` exprId and each `x_n#` lambda name in
    first-occurrence order keeps semantically-identical plans equal
    (attestation memos still hit across bench reps) while remaining a
    full-plan digest, not a 32-bit one (ADVICE r13: two different plans
    must never share a memoized attestation verdict)."""
    import hashlib
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    seen: dict[str, str] = {}

    def canon(m: re.Match) -> str:
        return seen.setdefault(m.group(0), f"@c{len(seen)}")

    # x_n only when attribute-named (followed by #) — Spark's fresh
    # lambda-variable scheme; then #n exprIds in ATTRIBUTE context only
    # (ADVICE r14): an exprId's '#' is always glued to the last char of
    # its attribute name (`value#3`, `sum(value)#45`), while a string
    # LITERAL rendering like '#1' is preceded by the expression-level
    # delimiter — space, '(', '[' or ',' — so requiring a non-delimiter
    # lookbehind keeps plans differing only in such a literal from
    # canonicalizing to the same digest.
    plan = re.sub(r"\bx_\d+(?=#)", canon, plan)
    plan = re.sub(r"(?<=[^\s(\[,])#\d+", canon, plan)
    # An in-memory relation's string rendering shows only its SCHEMA,
    # never its rows, so two different in-memory datasets of the same
    # shape canonicalized identically (caught r15: the edge-plan registry
    # served one pytest's CC edges to another). Mixing in semanticHash —
    # which hashes the canonicalized plan OBJECT, where in-memory inputs
    # carry data/RDD identity — keeps them apart. RDD-backed rebuilds of
    # the same data then hash fresh each time: a safe MISS, never a
    # collision; memo stability holds for file-rooted plans (embedded
    # paths + stable canonicalization), which is every gated query.
    return hashlib.md5(f"{plan}:{df.semanticHash()}".encode()).hexdigest()
