"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query registry lives in the package; this file just aggregates it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline218_spark.operators import dedup, multimodal, similarity, text_analysis
from pinterest_data_pipeline218_spark.plans import (
    analytics_tpch,
    events,
    pin_domain,
    tpch,
    tpch_extra,
    tpch_more,
)

_MODULES = (
    analytics_tpch,
    tpch,
    tpch_extra,
    tpch_more,
    events,
    pin_domain,
    text_analysis,
    dedup,
    similarity,
    multimodal,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (T4 composition: join → group-count → rank window →
    distinct) on /root/testdata/sf0.001."""
    return analytics_tpch.t4_top_priority_per_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
