"""Scaling study harness (BASELINE §2b): replicate the sf tables 1x/2x/4x/8x
with id offsets (replica text perturbed by one token so replicas are near-
but not exact duplicates), then time selected gated queries per scale.

Round 4 ran this ad hoc; this tool makes the protocol reproducible.

Usage:
    python tools/scaling_study.py [sf_dir] [query ...]

Default query set = the round-5 additions. Output: one markdown table row
per query in the §2b format (min of 2 warm runs per scale).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = (1, 2, 4, 8)
DEFAULT_QUERIES = (
    # round-6 additions
    "text_langid_trained",
    "text_lm_backoff",
    "dedup_containment_seeds",
    "sim_ivfpq_wide_topk",
    "mm_image_phash",
)


def replicate(spark, sf_dir: str, out_dir: str, k: int) -> str:
    """Write documents/embeddings/events replicated k times with id offsets.
    Document text gets a per-replica suffix token (near- not exact dup);
    event user_ids offset per replica so the user population scales too."""
    import pyspark.sql.functions as F

    from pinterest_data_pipeline218_spark.data import load_table

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    reps = None
    for i in range(k):
        r = docs.select(
            (F.col("doc_id") + i * n_docs).alias("doc_id"),
            "source",
            "lang",
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            "n_chars",
        )
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).head()[0] + 1
    reps = None
    for i in range(k):
        r = ev.select(
            (F.col("event_id") + i * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + i * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    reps = None
    for i in range(k):
        r = emb.select(
            (F.col("vec_id") + i * n_emb).alias("vec_id"), "embedding", "label"
        )
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # TPC-H side, for the graph / runtime-filter operators: facts
    # (lineitem, orders) replicate with key offsets — the customer
    # population scales, the supplier dimension does NOT (so the trade
    # graph gains edges linearly and a Bloom filter built on a dim key
    # set stays fixed-size while its probe side scales); dims copy as-is.
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    max_ok = orders.agg(F.max("o_orderkey")).head()[0] + 1
    max_ck = orders.agg(F.max("o_custkey")).head()[0] + 1
    reps = None
    for i in range(k):
        r = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * max_ok)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * max_ck))
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    reps = None
    for i in range(k):
        r = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok))
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    for dim in ("supplier", "nation", "region", "customer", "part"):
        load_table(spark, sf_dir, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )
    return out_dir


def main():
    import __spark_entry__ as entrymod
    from pinterest_data_pipeline218_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(DEFAULT_QUERIES)
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    dirs = {}
    for k in SCALES:
        d = os.path.join(tempfile.gettempdir(), f"scaling_{k}x")
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            replicate(spark, sf_dir, d, k)
        dirs[k] = d

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    print("| operator | " + " | ".join(f"{k}x" for k in SCALES) + " | 8x/1x |")
    print("|---|" + "---|" * (len(SCALES) + 1))
    for name in names:
        times = []
        for k in SCALES:
            force(qs[name](spark, dirs[k]))  # warm
            best = min(
                (lambda: (lambda t0: (force(qs[name](spark, dirs[k])), time.time() - t0)[1])(
                    time.time()
                ))()
                for _ in range(2)
            )
            times.append(best)
        ratio = times[-1] / times[0]
        row = " | ".join(f"{t:.2f}" for t in times)
        print(f"| {name} | {row} | {ratio:.1f}x |", flush=True)


if __name__ == "__main__":
    main()
