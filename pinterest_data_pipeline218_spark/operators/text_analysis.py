"""Text-analysis operators over the `documents` table.

Each operator is a (spark, sf_dir) -> DataFrame callable plus a DuckDB oracle
string. All per-document computation is scan-local column expression work
(functions/text.py) — at 100 TB these pipeline into the parquet scan with no
shuffle; only the final order/top-k aggregates exchange data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table
from ..functions import text as T


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: total/distinct tokens, char length, type-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_computed"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).cast("double").alias("ttr"),
    ).orderBy("doc_id")


TEXT_TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       length(text) AS n_chars_computed,
       CAST(ROUND(len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS DOUBLE) AS ttr
FROM documents ORDER BY doc_id
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, mean token length, and a
    combined score — the pretraining-corpus filtering primitive."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    sw = T.stopword_ratio(toks)
    atl = T.avg_token_len(toks)
    # No rounding: the score is emitted as the raw double. Both engines
    # evaluate the identical left-associated expression tree over identical
    # inputs, so the result is bit-deterministic; rounding would *introduce*
    # divergence at exact decimal ties (Spark rounds the decimal string
    # HALF_UP, DuckDB rounds the scaled binary).
    score = T.quality_score(toks)
    return docs.select(
        "doc_id",
        F.round(sw, 6).cast("double").alias("stopword_ratio"),
        F.round(atl, 6).cast("double").alias("avg_token_len"),
        score.cast("double").alias("quality_score"),
    ).orderBy("doc_id")


_SW = T.stopword_ratio_sql("string_split(text, ' ')")
_ATL = T.avg_token_len_sql("string_split(text, ' ')")
TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(ROUND({_SW}, 6) AS DOUBLE) AS stopword_ratio,
       CAST(ROUND({_ATL}, 6) AS DOUBLE) AS avg_token_len,
       CAST(0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0)
          + 0.3 * (1.0 - {_SW})
          + 0.2 * least({_ATL} / 8.0, 1.0) AS DOUBLE) AS quality_score
FROM documents ORDER BY doc_id
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-based language ID heuristic (n-gram-family heuristic over a
    known-language stopword set; engine-neutral so it is oracle-checkable)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    en_ratio = T.stopword_ratio(toks)
    return docs.select(
        "doc_id",
        F.round(en_ratio, 6).cast("double").alias("en_ratio"),
        F.when(en_ratio > 0.02, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    ).orderBy("doc_id")


TEXT_LANGID_SQL = f"""
SELECT doc_id,
       CAST(ROUND({_SW}, 6) AS DOUBLE) AS en_ratio,
       CASE WHEN {_SW} > 0.02 THEN 'en' ELSE 'unknown' END AS lang_guess
FROM documents ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive md5 fingerprint of the token set per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint")).orderBy(
        "doc_id"
    )


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id, {T.FINGERPRINT_SQL} AS fingerprint FROM documents ORDER BY doc_id
"""


def text_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode tokens → counts (the one shuffle in this
    family; partial aggregation makes the exchange |vocab|-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("occurrences"), F.asc("token"))
    )


TEXT_WORD_FREQ_SQL = """
SELECT token, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY occurrences DESC, token ASC
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by a TF-IDF-style score.

    Score is the *rational* form tf * N / df (as a double: one exact integer
    product, one IEEE division — bit-identical cross-engine), not tf *
    log(N/df): java.lang.Math.log and libm log are each within 1 ulp but not
    guaranteed the same ulp, which would poison the value-hash gate. The
    ranking (the part that matters) is identical for any monotone transform
    of N/df at fixed tf ordering... which log is.

    Plan shape at scale: explode → (doc, term) counts → df per term (the
    |vocab| aggregate) → rank window per doc. N is a 1-row aggregate
    crossJoined in (always broadcast — one row), NOT a driver-side
    ``docs.count()``, which would be a second full scan as a separate job.
    The tf⋈df join is hint-free: |vocab| grows with the corpus, so a forced
    broadcast would OOM at scale; AQE broadcasts it while it actually fits.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = pairs.join(df_, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rk")
        .orderBy("doc_id", "rk")
    )


TEXT_TFIDF_SQL = """
WITH pairs AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM pairs GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, tf.term AS term, tf, df,
         CAST(tf * n_docs AS DOUBLE) / df AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
WHERE rk <= 3
ORDER BY doc_id, rk
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus — emails, card numbers, IPv4s, phone
    numbers → typed placeholders (functions/text.redact_pii). The synthetic
    corpus contains no PII, so the query deterministically plants one span
    of each kind (derived from doc_id) before scrubbing: the oracle then
    proves both regex engines find and replace the identical spans. Counts
    come from regexp_extract_all over the dirty text; the redacted text is
    asserted clean by re-counting after the scrub."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact u"), did, F.lit("@example.com"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 200).cast("string"), F.lit(".7"),
        F.lit(" tel 555-010-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" card 4111 1111 1111 1111"),
    )
    n_found = sum(
        (F.size(F.regexp_extract_all(dirty, F.lit(pat), 0)) for pat, _ in T.PII_PATTERNS),
        start=F.lit(0),
    )
    clean = T.redact_pii(dirty)
    n_residual = sum(
        (F.size(F.regexp_extract_all(clean, F.lit(pat), 0)) for pat, _ in T.PII_PATTERNS),
        start=F.lit(0),
    )
    return docs.select(
        "doc_id",
        clean.alias("redacted"),
        n_found.alias("n_pii_found"),
        n_residual.alias("n_pii_residual"),
    ).orderBy("doc_id")


def _pii_counts_sql(expr: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all({expr}, '{pat}'))" for pat, _ in T.PII_PATTERNS
    )


_DIRTY_SQL = (
    "(text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' ip 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7'"
    " || ' tel 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' card 4111 1111 1111 1111')"
)

TEXT_PII_SQL = f"""
WITH dirty AS (SELECT doc_id, {_DIRTY_SQL} AS d FROM documents)
SELECT doc_id,
       {T.redact_pii_sql('d')} AS redacted,
       CAST({_pii_counts_sql('d')} AS INT) AS n_pii_found,
       CAST({_pii_counts_sql(T.redact_pii_sql('d'))} AS INT) AS n_pii_residual
FROM dirty
ORDER BY doc_id
"""


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_word_frequencies": text_word_frequencies,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_pii_redact": text_pii_redact,
}

ORACLE = {
    "text_token_stats": TEXT_TOKEN_STATS_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_word_frequencies": TEXT_WORD_FREQ_SQL,
    "text_tfidf_top_terms": TEXT_TFIDF_SQL,
    "text_pii_redact": TEXT_PII_SQL,
}
