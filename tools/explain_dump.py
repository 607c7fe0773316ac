"""Dump .explain('formatted') for named gated queries to files.

Usage:
    python tools/explain_dump.py OUTDIR query [query ...]
    python tools/explain_dump.py OUTDIR --suffix _after query ...

Writes OUTDIR/<query><suffix>.txt. Uses sf0.1 (override EXPLAIN_SF_DIR).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from pinterest_data_pipeline218_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    outdir = args.pop(0)
    suffix = ""
    if args and args[0] == "--suffix":
        args.pop(0)
        suffix = args.pop(0)
    sf_dir = os.environ.get("EXPLAIN_SF_DIR", "/root/testdata/sf0.1")
    qs = E.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark()
    for n in args:
        df = qs[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{n}{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
