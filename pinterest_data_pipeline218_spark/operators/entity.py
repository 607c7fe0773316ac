"""Record linkage / entity resolution: blocked Levenshtein near-matching.

The dedup family (`operators/dedup.py`) catches near-duplicates by shingle
or embedding overlap; record linkage asks the finer-grained question — are
two records THE SAME entity up to small edits? — and the standard
architecture is blocking + pairwise edit distance (Fellegi–Sunter /
Christen, public):

1. **block**: candidate pairs only form inside a cheap equality bucket
   (here: language + the first {FUZZY_BLOCK_CHARS} characters), so the
   self-join is an equi-join, never all-pairs;
2. **compare**: Levenshtein distance over a fixed-length prefix
   ({FUZZY_PREFIX_CHARS} chars) — O(prefix²) per candidate, constant cost
   independent of document length;
3. **decide**: keep pairs with distance ≤ {FUZZY_MAX_DIST}.

Recall is the block key's recall (an edit inside the first
{FUZZY_BLOCK_CHARS} characters hides the pair) — the standard trade;
multi-pass blocking on other keys is the standard fix and composes as a
UNION of the same plan shape.

Reference scope: beyond-reference; extends the dedup/linkage family.

100 TB shape: one shuffle on the (lang, block) key; per-bucket work is
|bucket|² × prefix² with buckets kept tiny by the 16-char key (measured:
the dev corpus's largest bucket is single-digit). Both engines ship the
same character-level Levenshtein (the corpus is ASCII; for non-ASCII the
prefix would be normalized first), so the oracle replays the distance
bitwise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

FUZZY_BLOCK_CHARS = 16
FUZZY_PREFIX_CHARS = 96
FUZZY_MAX_DIST = 12


def fuzzy_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id_a, doc_id_b, lang, edit_dist): blocked Levenshtein
    candidate pairs with a < b canonical ordering. `docs` needs
    (doc_id, lang, text)."""
    d = docs.select(
        "doc_id",
        "lang",
        F.substring("text", 1, FUZZY_BLOCK_CHARS).alias("blk"),
        F.substring("text", 1, FUZZY_PREFIX_CHARS).alias("pfx"),
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.lang").alias("lang"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).cast("long").alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
    )


def text_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated rendering over the documents corpus, ordered for the gate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return fuzzy_pairs(docs).orderBy("doc_id_a", "doc_id_b")


TEXT_FUZZY_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         substr(text, 1, {FUZZY_BLOCK_CHARS}) AS blk,
         substr(text, 1, {FUZZY_PREFIX_CHARS}) AS pfx
  FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.lang AS lang,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
FROM d a
JOIN d b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {FUZZY_MAX_DIST}
ORDER BY doc_id_a, doc_id_b
"""


QUERIES = {"text_fuzzy_pairs": text_fuzzy_pairs}
ORACLE = {"text_fuzzy_pairs": TEXT_FUZZY_SQL}
