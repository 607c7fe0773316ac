"""Builder-call time sweep: how long does CONSTRUCTING each gated query's
DataFrame take (pure driver/py4j plan-graph build, no action)?

A Spark action inside a builder or a huge Column-algebra chain is re-paid on
every bench rep (bench.py calls the builder per rep), so builder time is
real bench time. This sweep names the rows worth the F.expr / builder-memo
treatment (guide §5 "the driver should do almost no data work").

Usage:
    python tools/buildtime.py                # all registry queries, 2 reps
    python tools/buildtime.py q1 q2          # named queries
    BUILD_REPS=3 BUILD_SF_DIR=... python tools/buildtime.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from pinterest_data_pipeline218_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = int(os.environ.get("BUILD_REPS", "2"))
    sf_dir = os.environ.get("BUILD_SF_DIR", "/root/testdata/sf0.1")
    qs = E.queries()
    if not names:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark()
    out = []
    for n in names:
        qs[n](spark, sf_dir)  # warm-up build (imports, first-touch caches)
        best = min(
            _timed(qs[n], spark, sf_dir) for _ in range(reps)
        )
        out.append((best, n))
    out.sort(reverse=True)
    for t, n in out:
        print(f"BUILD {t:7.3f}s {n}")


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.monotonic()
    fn(spark, sf_dir)
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
