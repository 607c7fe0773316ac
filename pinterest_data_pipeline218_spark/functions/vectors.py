"""Vector column expressions (embeddings as array<float>/array<double>).

All pure Catalyst higher-order functions — `zip_with` + `aggregate` run
inside whole-stage codegen on the JVM; no Python crosses the row path. The
fold is sequential left-to-right, so results are bit-deterministic for a
given array (needed for the cross-engine oracle and for reproducibility at
scale regardless of partitioning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double_array(c: Column | str) -> Column:
    """Exact float→double elementwise widening."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) for zero-norm vectors; the
    oracle twin mirrors with an explicit CASE guard."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_sql_duckdb(a: str, b: str) -> str:
    """DuckDB expression computing the identical sequential fold (list_reduce
    is a left fold; 0.0+x == x in IEEE, so the missing init is harmless)."""
    def _dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, len({x})+1), "
            f"__i -> {x}[__i]*{y}[__i]), (__x,__y) -> __x+__y)"
        )

    denom = f"(sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"
    return f"(CASE WHEN {denom} = 0 THEN NULL ELSE {_dot(a, b)} / {denom} END)"
