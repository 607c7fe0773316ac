"""Vector column expressions (embeddings as array<float>/array<double>).

Two formulations of the same left-associated sequential fold, chosen by
where the expression sits in the plan (all variants measured at sf0.1):

- **Fold** (`dot`/`cosine`, the default): `zip_with` + `aggregate` higher-
  order functions. Right for *scan-side* evaluation — one cosine per row —
  where the workload is small and the giant unrolled expression's generated
  bytecode exceeds HotSpot JIT method limits (measured 4x SLOWER unrolled
  on sim_topk/sim_ann/sim_ivf).
- **Unrolled** (`dot_unrolled`, explicit opt-in): a static 64-term sum of
  products via 0-based `F.get`, no per-evaluation array allocation
  (`zip_with` materializes a fresh 64-element array per call). On the
  pairwise block join, 3 unrolled dots measured 4.7s vs the fold's 12.4s.
- **Norm precompute** (`cosine_from_norms`, the pairwise default): compute
  each vector's norm once scan-side, carry it through the join, pay ONE
  fold dot per pair — 5.3s on the same join, but a 3x FLOP cut of the
  quadratic term, which is the lever that matters at 100 TB. (Combining
  norm-carry WITH the unrolled dot measured pathological — 15s — so the
  two optimizations are alternatives, not composable.)

All forms compute the identical left-to-right IEEE addition order
(((0+t1)+t2)+...), so results are bit-equal between them, across
partitionings, and against the DuckDB oracle's `list_reduce` replay.
"""

from __future__ import annotations

import functools
import operator

import pyspark.sql.functions as F
from pyspark.sql import Column

DIM = 64  # the corpus embedding width (TESTDATA.md)


def as_double_array(c: Column | str) -> Column:
    """Exact float→double elementwise widening."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays (scan-side default)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_unrolled(a: Column, b: Column, dim: int = DIM) -> Column:
    """Static unrolled dot product: same left-assoc fold order, zero array
    allocation per evaluation — use on pairwise-join hot paths. `F.get`
    (0-based) returns NULL past the array end, mirroring DuckDB's
    out-of-bounds NULL, so a short vector yields NULL, never an ANSI error."""
    terms = [F.get(a, i) * F.get(b, i) for i in range(dim)]
    return functools.reduce(operator.add, terms, F.lit(0.0))


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) for zero-norm vectors; the
    oracle twin mirrors with an explicit CASE guard."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_from_norms(dab: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine when the per-vector norms were precomputed scan-side (the
    pairwise-join optimization: each vector's norm is computed once per
    vector, not once per pair — identical bits, 3x less pair work)."""
    return F.try_divide(dab, norm_a * norm_b)


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
