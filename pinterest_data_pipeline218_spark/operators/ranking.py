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


RRF_K = 60  # the standard Reciprocal Rank Fusion damping constant
RRF_POOL = 50  # per-leg candidate pool depth
RRF_TOP_K = 20
RRF_SCALE = 1_000_000  # fixed-point: rrf contribution = SCALE div (K + rank)


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (r12, gates in the r13 window — the r12 window is
    full by the rotation contract): fuse the LEXICAL ranker
    (corpus_bm25_search's integer BM25-lite over the fixed 3-term query)
    with the VECTOR ranker (exact cosine against the sim family's fixed
    query vector, docs joined to their embeddings on doc_id = vec_id) by
    Reciprocal Rank Fusion — score = Σ_legs SCALE div (60 + rank), the
    Cormack/Clarke/Büttcher formula in fixed point so every output column
    is an exact integer. A document missing from a leg's pool (no term
    hit / no embedding — the dev tables embed only a doc prefix)
    contributes 0 from that leg, which is RRF's point: the fusion
    degrades gracefully per leg instead of requiring both.

    This is the modern RAG retrieval stack's first stage, composed
    entirely from already-gated machinery (bm25_scores + the
    vectors.py cosine discipline).

    100 TB shape: each leg is its own gated query's plan (BM25: doc_id/
    term-keyed map-side-combinable aggregates; cosine: scan-local scoring
    against a 1-row broadcast query); the fusion joins two ≤RRF_POOL-row
    ranked lists — bounded planning-sized state — then TakeOrdered."""
    from .similarity import QUERY_VEC_ID

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf(docs, emb, BM25_QUERY_TERMS, QUERY_VEC_ID)


def rrf_lex_pool(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """(doc_id, lex_rank): the lexical leg's ranked candidate pool.
    Pool cut FIRST via orderBy().limit() — fuses to TakeOrdered, no
    global sort — then rank the provably ≤RRF_POOL-row pool with a
    partitionless window the plan audit classifies as bounded planning
    state (maxRows from the limit), not a global-sort scale-killer."""
    from pyspark.sql import Window

    lex = bm25_scores(docs, terms)
    w_lex = Window.orderBy(F.col("score_milli").desc(), F.col("doc_id"))
    return (
        lex.orderBy(F.col("score_milli").desc(), "doc_id")
        .limit(RRF_POOL)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .select("doc_id", "lex_rank")
    )


def rrf_vec_pool(emb: DataFrame, query_vec_id: int) -> DataFrame:
    """(doc_id, vec_rank): the vector leg's ranked candidate pool —
    exact cosine against the 1-row broadcast query (the sim_topk idiom),
    same TakeOrdered pool cut + bounded window as the lexical leg.
    ``emb`` expects (vec_id, embedding array<float>)."""
    from pyspark.sql import Window

    from ..functions.vectors import as_double_array, cosine

    vecs = emb.select("vec_id", as_double_array("embedding").alias("v"))
    qrow = (
        vecs.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("v").alias("q"))
        .limit(1)  # provable 1-row bound
    )
    vec_scored = (
        vecs.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qrow))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), F.col("q")), 6).alias("cos6"),
        )
    )
    w_vec = Window.orderBy(F.col("cos6").desc(), F.col("doc_id"))
    return (
        vec_scored.orderBy(F.col("cos6").desc(), "doc_id")
        .limit(RRF_POOL)
        .withColumn("vec_rank", F.row_number().over(w_vec))
        .select("doc_id", "vec_rank")
    )


def rrf_fuse_pools(lex_pool: DataFrame, vec_pool: DataFrame) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked pools: score =
    Σ_legs SCALE div (K + rank), missing legs contribute 0."""
    fused = (
        lex_pool.join(vec_pool, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
            (
                F.when(
                    F.col("lex_rank").isNotNull(),
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rank)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("vec_rank").isNotNull(),
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + vec_rank)"),
                ).otherwise(F.lit(0))
            ).alias("rrf_ppm"),
        )
    )
    return fused.orderBy(F.col("rrf_ppm").desc(), "doc_id").limit(RRF_TOP_K)


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: tuple[str, ...],
    query_vec_id: int,
) -> DataFrame:
    """DataFrame→DataFrame combinator behind hybrid_rrf_search,
    parameterized on the query so the recall study (tools/
    recall_study.py, `test_hybrid_rrf_fused_beats_each_leg`) can drive
    fixture queries through the exact gated plan."""
    return rrf_fuse_pools(rrf_lex_pool(docs, terms), rrf_vec_pool(emb, query_vec_id))


# Oracle for hybrid_rrf_search, staged with the operator (r12) and
# validated by test_hybrid_rrf_oracle_agrees_cross_engine so the r13
# window registration is a two-line dict change. The vector leg inlines
# the vectors.py cosine discipline (sequential fold, CASE zero guard).
def _hybrid_rrf_sql() -> str:
    from ..functions.vectors import cosine_sql_duckdb
    from .similarity import QUERY_VEC_ID

    cosexpr = cosine_sql_duckdb("e.v", "q.q")
    return f"""
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
  SELECT t.doc_id,
         (((1000 * (2*s.n_docs - 2*f.df + 1)) // (2*f.df + 1))
          * 22 * t.tf * s.avgdl)
         // (10*s.avgdl*t.tf + 3*s.avgdl + 9*d.dl) AS sc
  FROM tf t
  JOIN dls d USING (doc_id)
  CROSS JOIN stats s
  JOIN dfs f USING (term)
),
lex AS (
  SELECT doc_id, CAST(SUM(sc) AS BIGINT) AS score_milli
  FROM scored GROUP BY doc_id
),
lex_pool AS (
  SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS rn
    FROM lex
  ) WHERE rn <= {RRF_POOL}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT embedding::DOUBLE[] AS q FROM embeddings
      WHERE vec_id = {QUERY_VEC_ID}),
vecsc AS (
  SELECT e.vec_id AS doc_id, CAST(ROUND({cosexpr}, 6) AS DOUBLE) AS cos6
  FROM e CROSS JOIN q
  WHERE e.vec_id != {QUERY_VEC_ID}
),
vec_pool AS (
  SELECT doc_id, CAST(rn AS INT) AS vec_rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos6 DESC, doc_id) AS rn
    FROM vecsc
  ) WHERE rn <= {RRF_POOL}
)
SELECT doc_id,
       CAST(COALESCE(l.lex_rank, 0) AS INT) AS lex_rank,
       CAST(COALESCE(v.vec_rank, 0) AS INT) AS vec_rank,
       CAST(
         (CASE WHEN l.lex_rank IS NOT NULL
               THEN {RRF_SCALE} // ({RRF_K} + l.lex_rank) ELSE 0 END)
         + (CASE WHEN v.vec_rank IS NOT NULL
                 THEN {RRF_SCALE} // ({RRF_K} + v.vec_rank) ELSE 0 END)
       AS BIGINT) AS rrf_ppm
FROM lex_pool l FULL OUTER JOIN vec_pool v USING (doc_id)
ORDER BY rrf_ppm DESC, doc_id
LIMIT {RRF_TOP_K}
"""


QUERIES = {
    "corpus_bm25_search": corpus_bm25_search,
    "hybrid_rrf_search": hybrid_rrf_search,
}
ORACLE = {
    "corpus_bm25_search": CORPUS_BM25_SQL,
    "hybrid_rrf_search": _hybrid_rrf_sql(),
}
