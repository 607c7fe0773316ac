"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB the single biggest scan-cost lever after partition pruning is
FILE skipping: parquet footers carry per-column min/max, and a reader can
drop a whole file when its [min, max] ranges miss the predicate box. A
layout sorted on ONE column gives perfect skipping on that column and none
on any other; interleaving the bits of two (or more) columns into a Morton
z-value and range-partitioning + sorting on it bounds EVERY interleaved
dimension per file, so multi-dimensional box predicates skip files no
single-column sort could (Morton 1966; the technique Delta Lake/Iceberg
expose as OPTIMIZE ZORDER BY — re-expressed here on plain parquet).

Reference scope: the reference has no layout operators (its tables are
written as the notebook ETL leaves them); this is a beyond-reference
extension in the corpus-construction family.

Oracle parity: the z-value is pure integer bit arithmetic (shift/and/or),
generated from ONE Python loop into the SAME SQL expression string for
the Spark side and the DuckDB oracle — Spark 4 and DuckDB both parse the
`>>`/`<<`/`&` operators natively, so the plans are expression-identical
and the driver's bitwise value gate applies.

100 TB shape: the z-value is a scan-local projection (no shuffle, no UDF,
whole-stage codegen); the layout write is one repartitionByRange on zkey
(a single range shuffle — the same cost as any global sort the writer
would do anyway) + sortWithinPartitions, so the cost is one pass and the
benefit is permanent for every subsequent multi-dimensional scan. The
pruning win is asserted by pytest (test_zorder_layout_prunes_files):
fewer files intersect a 2-D predicate box under the z layout than under
the natural single-key layout on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..data import load_table

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit z-value (BIGINT-safe)


def z_interleave_sql(x_expr: str, y_expr: str, bits: int = ZBITS) -> str:
    """The 2-D Morton interleave as a SQL expression string: bit i of x
    lands at even position 2i, bit i of y at odd position 2i+1. One
    generator, both engines — Spark and DuckDB evaluate the identical
    text, so the oracle is bit-exact by construction."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# documents: x = length dimension (clipped to 16 bits), y = id dimension.
_ZX = "least(n_chars, 65535)"
_ZY = "doc_id % 65536"


def zorder_key(df: DataFrame, x_expr: str = _ZX, y_expr: str = _ZY) -> DataFrame:
    """Append the Morton z-value column — the scan-local projection every
    layout job runs before its range-partitioned write."""
    return df.withColumn("zkey", F.expr(z_interleave_sql(x_expr, y_expr)))


def write_zordered(df: DataFrame, path: str, n_files: int,
                   x_expr: str = _ZX, y_expr: str = _ZY) -> None:
    """Materialize the z-ordered layout: one range shuffle on zkey into
    `n_files` output files, each internally sorted, each with tight
    parquet min/max footers on BOTH interleaved dimensions."""
    (
        zorder_key(df, x_expr, y_expr)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def corpus_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated query: the z-value assignment over `documents` — every doc
    keyed by the interleave of its clipped length and id-residue, in
    layout order. This is the exact ordering `write_zordered` lays files
    down in, so the oracle pins the layout itself, not just the keys."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(_ZX).cast("long").alias("zx"),
            F.expr(_ZY).cast("long").alias("zy"),
            F.expr(z_interleave_sql(_ZX, _ZY)).cast("long").alias("zkey"),
        )
        .orderBy("zkey", "doc_id")
    )


CORPUS_ZORDER_SQL = f"""
SELECT doc_id,
       CAST({_ZX} AS BIGINT) AS zx,
       CAST({_ZY} AS BIGINT) AS zy,
       CAST({z_interleave_sql(_ZX, _ZY)} AS BIGINT) AS zkey
FROM documents
ORDER BY zkey, doc_id
"""


HBITS = 16  # bits per dimension; 2 dims -> 32-bit Hilbert distance


def hilbert_sql(src: str, x_expr: str, y_expr: str, bits: int = HBITS) -> str:
    """The 2-D Hilbert distance (Wikipedia xy2d, one level per CTE) as a
    chained-CTE SQL text — ONE generator for both engines, like
    z_interleave_sql. Per level s = 2^i: the quadrant digit
    (3·rx + ry − 2·rx·ry — the arithmetic form of (3rx)^ry, because `^`
    is POWER in DuckDB) is appended to d, then the frame is conditionally
    reflected/transposed for the next level. Intermediate x/y go negative
    by design (the reference algorithm's rotation does too); `&` on
    signed BIGINT is two's-complement in both engines, so the texts
    evaluate identically. The Hilbert curve's draw over Morton: EVERY
    consecutive key step is grid-adjacent (no Morton jumps), so
    range-partitioned files get strictly tighter per-dimension bounds —
    the layout Delta Lake exposes as Liquid Clustering
    (pytest-pinned adjacency: test_hilbert_keys_walk_the_grid)."""
    parts = [
        f"s{bits} AS (SELECT doc_id, CAST({x_expr} AS BIGINT) AS hx, "
        f"CAST({y_expr} AS BIGINT) AS hy, CAST({x_expr} AS BIGINT) AS x, "
        f"CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {src})"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        dn = f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
        xn = f"CASE WHEN {ry} = 1 THEN x WHEN {rx} = 1 THEN {s - 1} - y ELSE y END"
        yn = f"CASE WHEN {ry} = 1 THEN y WHEN {rx} = 1 THEN {s - 1} - x ELSE x END"
        parts.append(
            f"s{i} AS (SELECT doc_id, hx, hy, {xn} AS x, {yn} AS y, {dn} AS d "
            f"FROM s{i + 1})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT doc_id, hx, hy, d AS hkey FROM s0 ORDER BY hkey, doc_id"
    )


def corpus_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated query: the Hilbert layout key over `documents` on the SAME
    two dimensions as corpus_zorder_keys (clipped length × id-residue),
    in layout order — the space-filling-curve upgrade of the z layout.

    100 TB shape: identical to the z path — the key is a scan-local
    projection (16 chained SELECTs of integer CASE arithmetic, all fused
    into one whole-stage-codegen span, no shuffle, no UDF); a layout
    write is one repartitionByRange on hkey."""
    docs = load_table(spark, sf_dir, "documents")
    return spark.sql(hilbert_sql("{src}", _ZX, _ZY), src=docs)


CORPUS_HILBERT_SQL = hilbert_sql("documents", _ZX, _ZY)


QUERIES = {
    "corpus_zorder_keys": corpus_zorder_keys,
    "corpus_hilbert_keys": corpus_hilbert_keys,
}

ORACLE = {
    "corpus_zorder_keys": CORPUS_ZORDER_SQL,
    "corpus_hilbert_keys": CORPUS_HILBERT_SQL,
}
