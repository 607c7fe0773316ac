"""Text-analysis column expressions for the `documents` table.

Everything is built-in `pyspark.sql.functions` composition (JVM-side,
codegen'd) — language ID, quality scoring, token counting, fingerprinting and
the shingle/minhash primitives all evaluate per-row at the scan with zero
shuffles and zero Python. That is the property that makes them viable over
100 TB of documents: signature computation is embarrassingly parallel and
pipelined into the parquet scan.

Deterministic 60-bit token hash: the first 15 hex chars of md5, which both
Spark (`conv(substr(md5(t),1,15),16,10)`) and DuckDB
(`('0x'||substr(md5(t),1,15))::BIGINT`) can compute identically — the basis
for cross-engine-checkable MinHash/SimHash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny English stopword list used for quality/langid heuristics; kept minimal
# and engine-neutral (mirrored literally in the oracle SQL).
STOPWORDS = ("a", "the")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def token_hash(tok: Column, seed: int | None = None, hex_chars: int = 15) -> Column:
    """Deterministic md5-derived token hash: 15 hex chars = 60 bits (the
    default, for verify/simhash), 7 = 28 bits (minhash base hash, small
    enough that the affine universal-hash transforms stay in bigint range).
    NB when used inside F.transform, wrap in a single-arg lambda — transform
    passes the element index as a second argument."""
    salted = tok if seed is None else F.concat(F.lit(f"{seed}:"), tok)
    return F.conv(F.substring(F.md5(salted), 1, hex_chars), 16, 10).cast("bigint")


def token_hash_sql(tok_expr: str, seed: int | None = None) -> str:
    """DuckDB expression computing the identical hash."""
    salted = tok_expr if seed is None else f"('{seed}:' || {tok_expr})"
    return f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles via 1-based element_at (aligns with DuckDB list
    indexing). Documents shorter than n yield an empty array."""
    def shingle(i):
        pieces = [F.element_at(toks, i + j) for j in range(n)]
        out = pieces[0]
        for p in pieces[1:]:
            out = F.concat(out, F.lit(" "), p)
        return out

    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), shingle),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(toks_expr: str, n: int = 3) -> str:
    pieces = " || ' ' || ".join(f"{toks_expr}[__i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"__i -> {pieces})"
    )


def stopword_ratio(toks: Column) -> Column:
    in_list = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(in_list) / F.size(toks)


def stopword_ratio_sql(toks_expr: str) -> str:
    lits = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"(len(list_filter({toks_expr}, __t -> __t IN ({lits}))) / len({toks_expr}))"


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def avg_token_len_sql(toks_expr: str) -> str:
    return (
        f"(list_reduce(list_transform({toks_expr}, __t -> strlen(__t)), "
        f"(__x,__y) -> __x+__y) / CAST(len({toks_expr}) AS DOUBLE))"
    )


def quality_score(toks: Column) -> Column:
    """Heuristic corpus-quality score in [0,1]: length, stopword, and
    token-shape terms. Kept as one shared expression so the gated
    text_quality_score query and the corpus pipeline filter on the SAME
    bits (left-assoc order matters for the oracle)."""
    sw = stopword_ratio(toks)
    atl = avg_token_len(toks)
    return (
        F.lit(0.5) * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - sw)
        + F.lit(0.2) * F.least(atl / F.lit(8.0), F.lit(1.0))
    )


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (reference-class doc fingerprinting, per SURVEY extension)."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


FINGERPRINT_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
)


# PII redaction: ordered (pattern, replacement) pairs. Patterns restrict
# themselves to the regex subset Java (Spark) and RE2 (DuckDB) evaluate
# identically: character classes, bounded repeats, non-capturing groups and
# ASCII \b — no backreferences, no lookaround. Email first so its local part
# can't be half-eaten by the number patterns; the remaining three are
# mutually disjoint (dots vs dashes vs 4-4-4-4 grouping).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{4}[ -]){3}\d{4}\b", "[CARD]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\b\d{3}[ -]\d{3}[ -]\d{4}\b", "[PHONE]"),
)


def redact_pii(text: Column | str) -> Column:
    """Scrub emails / card numbers / IPv4s / phone numbers to typed
    placeholder tokens — the pre-training privacy-scrub primitive. A chain
    of regexp_replace stays JVM-side and codegen'd, so at 100 TB it
    pipelines into the scan like every other kernel in this module."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB mirror ('g' flag: RE2 replaces first match by default,
    Java replaces all)."""
    expr = text_expr
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
