"""Batch sinks: partitioned / bucketed parquet layouts.

The reference's storage layout is one-JSON-per-record under a hardcoded
`partition=0` path (SURVEY.md §2.1 S10, §4 partition pruning) — pruning by
string-gluing paths. The engine replaces that with real partitioned layouts
so Catalyst's static + dynamic partition pruning works:

- `write_partitioned`: hive-style `col=value` directories. A filter on the
  partition column prunes at the *file listing* level — at 100 TB, a
  per-day/per-source partition scheme turns a full-corpus scan into a
  handful of directories (verified by test_partition_pruning).
- `write_bucketed`: pre-shuffled, sorted buckets on the join/agg key; a
  bucketed⋈bucketed join plans with zero Exchange
  (tests/test_plans.py::test_bucketed_join_eliminates_shuffle).

Partition-count guidance at scale: keep partitions ≥ ~1 GiB (too many tiny
partitions push the bottleneck into listing/planning), bucket counts a
multiple of cluster parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    df.write.mode(mode).format(fmt).partitionBy(*partition_by).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
