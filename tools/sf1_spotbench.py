"""sf1 spot-bench (BASELINE §2d): time the most expensive gated queries at
sf0.1 and at an sf1-equivalent dataset (sf0.1 replicated 10x with id
offsets and per-replica text perturbation — the scaling_study protocol at
the next decade), reporting the sf0.1→sf1 wall ratio per query.

8x replication (§2b) shows the curve's shape; the 10x decade catches
super-linear stages whose constants only bite past the last §2b point —
the VERDICT r6 #6 / r7 #8 ask. A linear operator should land near 10x
(± partition-count and cache effects); >30x suggests a quadratic stage.

Usage:
    python tools/sf1_spotbench.py [query ...]        # default: the top-10
    SF1_DIR=/tmp/sf1x10 python tools/sf1_spotbench.py

Output: one markdown table in the §2d format, plus a JSON line for the
round ledger. Per-query wall guard: a watchdog thread cancels all Spark
jobs once an sf1 run exceeds SPOT_TIMEOUT_S (default 600), so the query
is recorded as DNF with the elapsed floor and a hung query can never
block the harness — a DNF at 10x IS the finding, not a harness failure.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_study import replicate  # noqa: E402  (same tools/ dir)

TOP10 = (
    "dedup_containment",
    "corpus_build_full",
    "dedup_cluster_best",
    "dedup_containment_seeds",
    "sim_ivfpq_lloyd_topk",
    "sim_ivfpq_wide_topk",
    "ml_hard_negatives",
    "dedup_semantic_kmeans",
    "tpch_bloom_prefilter",
    "text_dupspan_remove",
)

SPOT_TIMEOUT_S = float(os.environ.get("SPOT_TIMEOUT_S", "600"))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed(fn, *args) -> float:
    t0 = time.perf_counter()
    force(fn(*args))
    return time.perf_counter() - t0


def timed_watchdog(spark, fn, *args, timeout: float) -> tuple[float, bool]:
    """(seconds, timed_out): run under a watchdog that cancels every Spark
    job at `timeout` — the cancelled action raises, so a genuinely hung
    query surfaces as DNF-with-elapsed-floor instead of blocking forever."""
    done = threading.Event()
    fired = threading.Event()

    def watchdog() -> None:
        if not done.wait(timeout):
            fired.set()
            spark.sparkContext.cancelAllJobs()

    w = threading.Thread(target=watchdog, daemon=True)
    t0 = time.perf_counter()
    w.start()
    try:
        force(fn(*args))
        return time.perf_counter() - t0, fired.is_set()
    finally:
        done.set()


def main() -> None:
    import __spark_entry__ as entrymod
    from pinterest_data_pipeline218_spark.session import get_spark

    names = sys.argv[1:] or list(TOP10)
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.environ.get("SF1_DIR", "/tmp/sf1x10")
    spark = get_spark("sf1_spotbench")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(sf1, "lineitem.parquet")):
        print(f"replicating {sf01} x10 -> {sf1} ...", file=sys.stderr)
        replicate(spark, sf01, sf1, 10)
    qs = entrymod.queries()

    rows = []
    for name in names:
        fn = qs[name]
        timed(fn, spark, sf01)  # warm (codegen/JIT)
        t01 = min(timed(fn, spark, sf01), timed(fn, spark, sf01))
        t0 = time.perf_counter()
        try:
            t1, dnf = timed_watchdog(spark, fn, spark, sf1, timeout=SPOT_TIMEOUT_S)
            if not dnf and t1 <= SPOT_TIMEOUT_S:
                t1 = min(t1, timed(fn, spark, sf1))
        except Exception as exc:  # noqa: BLE001 — a failure/cancel at 10x is a finding
            t1 = time.perf_counter() - t0
            print(f"{name} DNF at sf1 after {t1:.0f}s: {exc}", file=sys.stderr)
            dnf = True
        ratio = t1 / t01 if t01 else float("inf")
        rows.append((name, t01, t1, ratio, dnf))
        flag = " DNF" if dnf else ""
        print(
            f"| {name} | {t01:.2f} | {t1:.2f}{flag} | {ratio:.1f}x |",
            flush=True,
        )
    print(
        json.dumps(
            {
                "spotbench_sf1": {
                    n: {"sf0.1_s": round(a, 3), "sf1_s": round(b, 3),
                        "ratio": round(r, 2), "dnf": d}
                    for n, a, b, r, d in rows
                }
            }
        )
    )


if __name__ == "__main__":
    main()
