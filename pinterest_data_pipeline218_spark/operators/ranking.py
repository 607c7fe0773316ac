"""Lexical relevance ranking over `documents`: integer-exact BM25-lite.

A retrieval pipeline needs a keyword-relevance ranker beside the vector
ANN family (`operators/similarity.py`) — BM25 (Robertson/Spärck Jones,
public) is the standard: per matched term,

    idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

with k1 = 1.2, b = 0.75. This rendering keeps the repo's bitwise-oracle
discipline by staying in integer arithmetic end to end:

- the log idf is replaced by the RATIONAL idf
  `idf_milli = (1000·(2N − 2df + 1)) div (2df + 1)` — exactly
  1000·(N − df + ½)/(df + ½), the BM25+ idf ratio without the log (same
  ordering, bounded ratio; documented contract, not a float approximation);
- the tf normalization is multiplied through by 10·avgdl so k1 = 6/5 and
  b = 3/4 stay integral:
  `score_milli = (idf_milli · 22 · tf · avgdl) div (10·avgdl·tf + 3·avgdl + 9·dl)`.

Reference scope: beyond-reference (the reference has no text retrieval);
completes the retrieval family: exact/ANN vector search finds *similar*
documents, BM25 finds *relevant* ones for a term query.

100 TB shape: tf is one explode→filter→groupBy(doc, term) — map-side
combinable, keyed on doc_id; df and the (N, avgdl) pair are tiny
aggregates broadcast back (|terms| rows and 1 row — the asserted
1-row-broadcast idiom); scoring is scan-local arithmetic; only the final
top-k is a TakeOrdered. No shuffle is keyed on anything but doc_id/term.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

BM25_QUERY_TERMS = ("spark", "join", "window")
BM25_TOP_K = 20


def bm25_scores(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """(doc_id, dl, n_hit_terms, score_milli): integer BM25-lite of each
    document containing ≥1 query term. `docs` needs (doc_id, text);
    tokens are the single-space split the corpus is written with."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    dls = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dls.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(dl) div count(1)").alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfs), "term")
        .withColumn(
            "sc",
            F.expr(
                "(((1000 * (2*n_docs - 2*df + 1)) div (2*df + 1))"
                " * 22 * tf * avgdl)"
                " div (10*avgdl*tf + 3*avgdl + 9*dl)"
            ),
        )
    )
    return scored.groupBy("doc_id", "dl").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("sc").alias("score_milli"),
    )


def corpus_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated rendering: top-20 documents for the fixed 3-term query,
    ranked by integer BM25-lite score (ties by doc_id)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        bm25_scores(docs, BM25_QUERY_TERMS)
        .select("doc_id", "dl", "n_hit_terms", "score_milli")
        .orderBy(F.col("score_milli").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


CORPUS_BM25_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dls AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) // COUNT(*) AS BIGINT) AS avgdl
  FROM dls
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN {BM25_QUERY_TERMS!r}
  GROUP BY doc_id, term
),
dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id, d.dl,
         (((1000 * (2*s.n_docs - 2*f.df + 1)) // (2*f.df + 1))
          * 22 * t.tf * s.avgdl)
         // (10*s.avgdl*t.tf + 3*s.avgdl + 9*d.dl) AS sc
  FROM tf t
  JOIN dls d USING (doc_id)
  CROSS JOIN stats s
  JOIN dfs f USING (term)
)
SELECT doc_id, dl, COUNT(*) AS n_hit_terms, CAST(SUM(sc) AS BIGINT) AS score_milli
FROM scored
GROUP BY doc_id, dl
ORDER BY score_milli DESC, doc_id
LIMIT {BM25_TOP_K}
"""


QUERIES = {"corpus_bm25_search": corpus_bm25_search}
ORACLE = {"corpus_bm25_search": CORPUS_BM25_SQL}
