"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row-count, column names, and sorted row
values (exact string equality after canonicalization — stricter than a hash,
so passing here implies passing any order-insensitive value-hash).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pinterest_data_pipeline218_spark.data import TABLES


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if abs(v) < 1e15 and v == int(v):
            return str(int(v))
        return repr(v)  # full precision: require bitwise cross-engine equality
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return canon(float(v))
    except ImportError:
        pass
    return str(v)


def rows_to_set(cols, rows):
    # tuples, not joined strings: a separator char inside a value must not
    # let different rows canonicalize identically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Deliberately a PLAIN session (not session.get_spark): the driver's gate
    # builds its own conf-less session, so queries must be self-sufficient —
    # any conf a read depends on has to be set at read time (r01 lesson:
    # nanosAsLong was only in the factory and all 9 ev_* queries failed).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("selfcheck").getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}; known: {sorted(qs)}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:500]}")
            failures.append(name)
            continue
        finally:
            # cache hygiene between queries: persisted planning state
            # (q15's rev, ev_outliers_mad's dev) must not accumulate
            spark.catalog.clearCache()
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only, no oracle) [{spark_s:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:500]}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        if sorted(scols_l) != sorted(dcols):
            print(f"FAIL {name}: columns spark={scols_l} duckdb={dcols}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            failures.append(name)
            continue
        sset = rows_to_set(scols_l, srows)
        dset = rows_to_set(dcols, drows)
        if sset != dset:
            ds, ss = set(dset), set(sset)
            diff_s = [r for r in sset if r not in ds][:3]
            diff_d = [r for r in dset if r not in ss][:3]
            print(f"FAIL {name}: values differ; spark-only={diff_s} duckdb-only={diff_d}")
            failures.append(name)
            continue
        print(f"PASS {name}: rows={len(srows)} [{spark_s:.1f}s]")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
