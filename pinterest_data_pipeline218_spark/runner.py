"""CLI entry points (the reference's Entry points A/B/C, SURVEY.md §3).

Usage:
  python -m pinterest_data_pipeline218_spark.runner batch  --out /tmp/out [--n 500]
  python -m pinterest_data_pipeline218_spark.runner stream --src /tmp/blobs --out /tmp/out
  python -m pinterest_data_pipeline218_spark.runner queries --sf-dir /root/testdata/sf0.01
  python -m pinterest_data_pipeline218_spark.runner corpus --sf-dir ... --out /tmp/corpus

`batch` runs the full Entry-point-A pipeline: generate (or read) raw
pin/geo/user, clean, write parquet tables, run T4..T11, print row counts.
`stream` runs the Entry-point-B ETL over blob files. Scheduling (the
reference's Airflow DAG, Entry point C) stays out-of-engine: point the
scheduler at these commands.
"""

from __future__ import annotations

import argparse
import os

from .data import DEFAULT_SF_DIR
from .functions.cleaning import clean_geo, clean_pin, clean_user
from .operators import analytics as A
from .session import get_spark
from .sources.generator import to_dataframes


def cmd_batch(args: argparse.Namespace) -> None:
    spark = get_spark("batch")
    pin_raw, geo_raw, user_raw = to_dataframes(spark, n=args.n)
    pin, geo, user = clean_pin(pin_raw), clean_geo(geo_raw), clean_user(user_raw)
    if args.out:
        for name, df in (("pin_table", pin), ("geo_table", geo), ("user_table", user)):
            df.write.mode("overwrite").parquet(os.path.join(args.out, name))
    results = {
        "t4": A.t4_top_category_per_country(pin, geo),
        "t5": A.t5_category_counts_by_year(pin, geo),
        "t6p1": A.t6p1_top_follower_per_country(pin, geo, user),
        "t7": A.t7_top_category_per_age_group(pin, user),
        "t8": A.t8_median_follower_by_age_group(pin, user),
        "t9": A.t9_users_joined_by_year(user),
        "t10": A.t10_median_follower_by_join_year(pin, user),
        "t11": A.t11_median_follower_by_join_year_age(pin, user),
    }
    results["t6p2"] = A.t6p2_top_country(results["t6p1"])
    for name, df in results.items():
        print(f"{name}: {df.count()} rows")


def cmd_stream(args: argparse.Namespace) -> None:
    from .streaming.pipeline import run_table_etl

    spark = get_spark("stream")
    queries = [
        run_table_etl(spark, os.path.join(args.src, t), t, args.out)
        for t in ("pin", "geo", "user")
    ]
    for q in queries:
        if args.once:
            q.processAllAvailable()
            q.stop()
        else:
            q.awaitTermination()


def cmd_queries(args: argparse.Namespace) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    spark = get_spark("queries")
    for name, fn in entrymod.queries().items():
        print(f"{name}: {fn(spark, args.sf_dir).count()} rows")


def cmd_corpus(args: argparse.Namespace) -> None:
    """Training-corpus build: quality filter → [repetition gate] →
    [decontamination] → dedup → sample → split → chunk →
    split-partitioned parquet."""
    from .operators.corpus import build_training_corpus, write_training_corpus

    spark = get_spark("corpus")
    rows = build_training_corpus(
        spark,
        args.sf_dir,
        quality_threshold=args.quality,
        sample_pct=args.sample_pct,
        repetition_gate=args.repetition_gate,
        decontaminate=args.decontaminate,
        near_dedup=args.near_dedup,
    )
    write_training_corpus(rows, args.out)
    back = spark.read.parquet(args.out)
    for r in back.groupBy("split").count().orderBy("split").collect():
        print(f"{r['split']}: {r['count']} chunks")


def main() -> None:
    p = argparse.ArgumentParser(prog="pinterest_data_pipeline218_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("batch")
    b.add_argument("--out", default=None)
    b.add_argument("--n", type=int, default=500)
    b.set_defaults(fn=cmd_batch)
    s = sub.add_parser("stream")
    s.add_argument("--src", required=True)
    s.add_argument("--out", required=True)
    s.add_argument(
        "--once",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="drain available data and exit (--no-once runs continuously)",
    )
    s.set_defaults(fn=cmd_stream)
    q = sub.add_parser("queries")
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.set_defaults(fn=cmd_queries)
    c = sub.add_parser("corpus")
    c.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    c.add_argument("--out", required=True)
    c.add_argument("--quality", type=float, default=0.5)
    c.add_argument("--sample-pct", type=int, default=100)
    c.add_argument("--repetition-gate", action=argparse.BooleanOptionalAction, default=False)
    c.add_argument("--decontaminate", action=argparse.BooleanOptionalAction, default=False)
    c.add_argument("--near-dedup", action=argparse.BooleanOptionalAction, default=False)
    c.set_defaults(fn=cmd_corpus)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
