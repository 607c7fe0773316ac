"""Skew-mitigation helpers: salted two-phase aggregation.

A `groupBy(k).agg(...)` over a key with heavy hitters puts each hot key's
entire weight on one reduce task. Salting splits every key into
`n_salts` sub-keys for a partial aggregate, then combines the partials in a
second (tiny) aggregate — the shuffle for phase 1 is uniform by
construction, and phase 2 moves |keys| x n_salts rows only.

Note Spark's hash aggregate already does map-side partial aggregation,
which fixes skew for *algebraic* aggregates on its own; explicit salting is
the tool for the cases partial agg can't cover: high-cardinality
`collect_list`-style state, exact count-distinct re-aggregation
(`count(distinct x)` needs the distinct pairs shuffled — salt on (k, x)),
or sort-based aggs. It composes with AQE skew-join splitting, which handles
the join-side version of the same problem.

The salt must be deterministic for re-aggregable distinct-style state (the
same (key, x) pair must land in the same salt bucket), so we derive it by
hashing the value column, not by rand().
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    n_salts: int = 64,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase exact SUM/COUNT per key group under skew.

    Phase 1 groups by (keys…, salt); phase 2 re-aggregates the n_salts
    partials. Returns columns: *keys, sum_value, n_rows. DECIMAL-exact iff
    `value` is DECIMAL (then the result is identical to the unsalted
    aggregate under any partitioning).

    Salt choice: sum/count state merges commutatively, so the salt needs no
    value affinity — the default hashes a per-row id, which is uniform even
    when a hot key carries one constant (or NULL) value; hashing the value
    itself would collapse such a key back onto a single reducer. Pass
    `salt_from` to salt on a column (e.g. a unique record id) instead.
    """
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
        if salt_from
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("sum_value"), F.sum("__pcnt").alias("n_rows")
    )


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 64,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key group under skew.

    A plain `countDistinct` shuffles every (key, value) pair to the key's
    single reducer. Here the distinct-ing happens under (keys…, salt) with
    the salt derived from the value (so equal values share a salt bucket and
    dedup correctly), then the per-salt distinct counts sum exactly.
    Returns columns: *keys, n_distinct.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(F.col(value_col)).alias("__pnd"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pnd").cast("bigint").alias("n_distinct"))
