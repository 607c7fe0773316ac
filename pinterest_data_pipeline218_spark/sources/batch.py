"""Batch sources: the reference's readers, Spark-first.

- read_json_dir: the S1 scan (BatchProcessingFinal.ipynb:680-705) — a
  directory of one-record-per-file JSON (the MSK-Connect flush.size=1 S3
  layout, README.md:85). Supports both the reference's schema modes
  (§1.3): inference (batch path) and explicit StructType (stream path).
  Explicit is the default: at scale, inference is a second full read.
- read_csv: the S2 credentials-style reader (BatchProcessingFinal.ipynb:249-257).
- read_jdbc: the S6 bulk equivalent of the row-sampler origin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Read a directory (or glob) of JSON records.

    With `schema`, the scan is schema-on-read (streaming-path semantics,
    Kinesis_Processing.ipynb:676-699). With `infer=True`, reproduces the
    reference's batch inference (`inferSchema`, BatchProcessingFinal
    .ipynb:700-701). One of the two must be chosen.
    """
    reader = spark.read.format("json")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    else:
        raise ValueError("pass an explicit schema or infer=True")
    return reader.load(path)


def read_csv(spark: SparkSession, path: str, header: bool = True, sep: str = ",") -> DataFrame:
    return (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("sep", sep)
        .load(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """XML scan via Spark 4's NATIVE xml data source (no external package —
    the spark-xml library was folded into Spark itself): one DataFrame row
    per ``row_tag`` element, schema inferred from the elements unless
    given. Corrupt elements follow the same PERMISSIVE/columnNameOfCorrupt-
    Record contract as the JSON scan, so the quarantine pattern composes."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan — Spark-native columnar alternative to parquet, with the
    same pushdown/pruning machinery (PushedFilters reach the ORC reader).
    Kept schema-optional: ORC files carry their schema in the footer."""
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, target: StructType | None = None
) -> DataFrame:
    """Schema-evolution read: a long-lived parquet directory accumulates
    files written under DIFFERENT schema versions (columns added over
    time); a plain read takes one footer's schema and silently drops the
    others' columns. ``mergeSchema`` unions every file footer's schema
    (added columns surface as NULL for files that predate them — additive
    evolution, the only kind plain parquet supports; a TYPE change for
    an existing column is a conflict and fails the merge, which is the
    correct loud behavior). With ``target`` the merged frame is then
    reconciled to a fixed contract: missing columns materialize as typed
    NULLs, extra columns drop, and each column try_casts to the target
    type — the lenient reader a consumer pins its downstream schema with.

    Scale: schema merging reads FOOTERS (one small read per file, spread
    across the cluster), not data — it is off by default in Spark
    precisely because of that extra footer pass, so turning it on is a
    per-read decision, which this wrapper makes explicit."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if target is None:
        return df
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(
                F.expr(f"try_cast({f.name} as {f.dataType.simpleString()})").alias(
                    f.name
                )
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout (`col=value/` directories).

    The on-disk contract that makes 100-TB scans cheap: an equality or IN
    filter on a partition column becomes directory pruning (PartitionFilters
    in the scan node) — files outside the matching directories are never
    opened. Choose low-cardinality, filter-frequent columns (dt, lang,
    source); high-cardinality partitioning produces the small-files problem
    instead."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Spark's `binaryFile` source: each matching file becomes one row of
    (path, modificationTime, length, content BINARY) — the ingestion path
    for a multimodal corpus (images/audio/video land as opaque binary
    columns with typed metadata, exactly the contract operators/multimodal
    consumes). `pathGlobFilter` prunes by extension at listing time, so
    non-matching files are never opened."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


ZORDER_BITS = 16  # bucket resolution per dimension (2^16 buckets)


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> "F.Column":
    """Morton (Z-order) code over two numeric columns: each value is
    width-bucketed into 2^bits uniform buckets between its column min/max
    (the driver-side range read is query-planning state, like a range
    partitioner's sampling), then the bucket ids' bits are interleaved —
    a static chain of shift/mask expressions, fully codegen'd."""
    import pyspark.sql.functions as F

    assert len(cols) == 2, "zorder_code interleaves exactly two dimensions"
    bounds = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).head()
    parts = []
    for d, c in enumerate(cols):
        if bounds[f"mn_{c}"] is None or bounds[f"mx_{c}"] is None:
            raise ValueError(
                f"zorder_code: column {c!r} has no non-null values to bound "
                "(empty input?) — a Z-order layout over it is undefined"
            )
        mn, mx = float(bounds[f"mn_{c}"]), float(bounds[f"mx_{c}"])
        if mn == mx:
            # constant dimension: width_bucket(x, v, v, n) is NULL for every
            # row, which would NULL the whole code — a constant column carries
            # no skipping power, so its contribution is bucket 0.
            continue
        b = (
            F.width_bucket(F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit((1 << bits) - 1))
            - 1
        ).cast("bigint")
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + d)
            )
    if not parts:  # both dimensions constant: every row is the same cell
        return F.lit(0).cast("bigint")
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Multi-dimensional layout clustering — the OPTIMIZE ZORDER analog
    (Delta/Iceberg's data-skipping layout, done with plain Spark + parquet):
    range-sort the write by the Morton interleaving of the cluster columns,
    so EVERY clustered dimension gets tight per-file and per-rowgroup
    min/max statistics. A single-column sort gives one dimension perfect
    stats and leaves the others uniform; the Z-order curve splits the
    skipping power across all of them — the layout lever for a 100 TB table
    filtered on more than one column. Pruning then happens for free:
    parquet rowgroup stats + Spark's pushed filters skip non-matching
    files/rowgroups (pytest measures the stat tightness directly)."""
    z = zorder_code(df, cols)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed table write (`bucketBy` + `saveAsTable`): rows are
    hash-distributed into a fixed bucket count on the join/agg key at WRITE
    time. Two tables bucketed the same way join with ZERO exchange — the
    shuffle is paid once at layout time instead of per query, which is the
    single biggest lever for a fact⋈fact join an analytics engine re-runs
    daily at 100 TB. (Bucketing requires the table catalog: `saveAsTable`,
    not `save(path)`.)"""
    w = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, bucket_by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Bulk JDBC read. For scale, pass partition_column + bounds so the read
    fans out across executors instead of a single connection."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    return reader.load()
