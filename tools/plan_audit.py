"""Plan audit: formatted physical plans + plan-health stats for gated queries.

The judge's per-round audit (VERDICT "Plan audit of the N most expensive
queries") mechanized: for each query, print the counts that summarize plan
health — exchanges, whole-stage-codegen spans, pushed-filter scans,
broadcast vs sort-merge joins, and the red flags (CartesianProduct,
BroadcastNestedLoopJoin outside the 1-row scalar-subquery idiom, Python
row-at-a-time UDF evals) — plus, with --full, the formatted plan itself.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]
    python tools/plan_audit.py /root/testdata/sf0.01 --top 8   # costliest by latest BENCH
    python tools/plan_audit.py /root/testdata/sf0.01 t4_top_priority_per_nation --full
"""

from __future__ import annotations

import contextlib
import glob
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def top_from_bench(n: int) -> list[str]:
    benches = sorted(glob.glob("BENCH_r*.json"))
    if not benches:
        return []
    try:
        tail = json.load(open(benches[-1])).get("tail", "")
        m = re.search(r"\{.*\}", tail)
        qs = json.loads(m.group(0))["queries"] if m else {}
    except Exception:
        return []
    timed = [(v, k) for k, v in qs.items() if isinstance(v, (int, float))]
    return [k for _, k in sorted(timed, reverse=True)[:n]]


def _walk(jnode):
    """Depth-first walk of a Catalyst tree via py4j, INCLUDING subquery
    plans (scalar/IN/EXISTS subqueries carry their own joins and windows —
    string-walking the main tree alone missed them, ADVICE r8)."""
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))
    try:
        subs = jnode.subqueries()
        for i in range(subs.size()):
            yield from _walk(subs.apply(i))
    except Exception:  # noqa: BLE001 — physical wrappers without subqueries()
        pass


def _conjuncts(jexpr):
    """Top-level AND conjuncts of a join condition."""
    if jexpr.getClass().getSimpleName() == "And":
        yield from _conjuncts(jexpr.left())
        yield from _conjuncts(jexpr.right())
    else:
        yield jexpr


def _max_rows(jnode) -> int | None:
    """Logical-plan maxRows as a Python int (None = unbounded)."""
    try:
        opt = jnode.maxRows()
        return int(opt.get()) if opt.isDefined() else None
    except Exception:  # noqa: BLE001 — physical nodes lack maxRows
        return None


# A non-equi (cross / nested-loop) join is scale-safe iff Catalyst can PROVE
# one side tiny: 1-row global aggregates (the scalar-subquery idiom) and the
# literal few-row local relations (decile/threshold tables) both carry a
# logical maxRows. 8 covers every such table in the registry while staying
# far below anything that could make the multiply quadratic.
BNLJ_BOUND = 8
# A provable bound in (8, 4096] is the BOUNDED-BATCH class (r12): a
# contract-limited broadcast batch (e.g. sim_knn_classify's ordered
# limit(KNN_QUERY_BATCH) labeling batch) against a scan — |batch|·n work,
# linear in the big side. Asserted distinctly so the scalar idiom's tight
# bound stays meaningful; anything unprovable remains INVESTIGATE.
BNLJ_BATCH_BOUND = 4096


def classify_nonequi_joins(df) -> tuple[int, list[int | None]]:
    """(global_sort_windows, bounded-side maxRows per non-equi join).

    Walks the OPTIMIZED LOGICAL plan: a Join with no condition (or a
    non-equi-only condition) plans as BroadcastNestedLoopJoin/Cartesian;
    for each, report min(maxRows) across its sides — a provable bound
    turns the bnlj flag into an assertion. Window nodes with an empty
    partitionSpec are the global-sort scale-killers VERDICT r6 #4 asks to
    count (zero-or-justified)."""
    jplan = df._jdf.queryExecution().optimizedPlan()
    global_windows = 0
    nonequi_bounds: list[int | None] = []
    for node in _walk(jplan):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            # a partitionless Window over a PROVABLY bounded input (a
            # limit-ed codebook-seed / planning-state table) sorts <=k
            # rows on one task — constant work, not the global-sort
            # scale-killer this counter exists to catch
            child_rows = _max_rows(node.child())
            if child_rows is None or child_rows > 4096:
                global_windows += 1
        elif cls == "Join":
            # expression-tree check, not string-stripping: a join is equi
            # iff some TOP-LEVEL conjunct is EqualTo/EqualNullSafe (what
            # ExtractEquiJoinKeys keys on) — '<=>' counts as equi, and an
            # '=' buried inside a literal/cast of a non-equi predicate
            # doesn't (ADVICE r8)
            cond = node.condition()
            has_equi = False
            if cond.isDefined():
                has_equi = any(
                    c.getClass().getSimpleName() in ("EqualTo", "EqualNullSafe")
                    for c in _conjuncts(cond.get())
                )
            if not has_equi:
                sides = [
                    _max_rows(node.left()),
                    _max_rows(node.right()),
                ]
                known = [s for s in sides if s is not None]
                nonequi_bounds.append(min(known) if known else None)
    return global_windows, nonequi_bounds


def audit(name: str, df, full: bool) -> None:
    plan = formatted_plan(df)
    # codegen stage markers (*(N)) only appear in the simple-string plan;
    # under AQE the formatted pre-execution plan carries no codegen ids
    simple = df._jdf.queryExecution().executedPlan().toString()
    global_windows, nonequi_bounds = classify_nonequi_joins(df)
    stats = {
        "exchanges": plan.count("Exchange"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "scans": plan.count("Scan parquet") + plan.count("Scan orc"),
        "pushed_filter_scans": len(
            [s for s in plan.split("PushedFilters: [")[1:] if not s.startswith("]")]
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "global_sort_windows": global_windows,
        # Arrow python stages are legitimate at the codec boundary, but
        # their MULTIPLICITY is a re-execution tripwire: an expensive
        # python subtree referenced from several plan branches (a union
        # + self-join) duplicates wholesale — mm_phash_neardup's first
        # form showed 8 MapInPandas nodes where the chain has 2, a 4x
        # re-decode the headline stats above could not see
        "arrow_map_nodes": simple.count("MapInPandas")
        + simple.count("MapInArrow"),
    }
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        if nonequi_bounds and all(
            b is not None and b <= BNLJ_BOUND for b in nonequi_bounds
        ):
            mx = max(nonequi_bounds)
            flags.append(
                "bnlj(1-row, asserted)"
                if mx <= 1
                else f"bnlj({mx}-row, asserted)"
            )
        elif nonequi_bounds and all(
            b is not None and b <= BNLJ_BATCH_BOUND for b in nonequi_bounds
        ):
            flags.append(
                f"bnlj(bounded-batch {max(nonequi_bounds)}, asserted)"
            )
        else:
            flags.append(f"bnlj(INVESTIGATE: side bounds {nonequi_bounds})")
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        flags.append("python-eval")
    line = ", ".join(f"{k}={v}" for k, v in stats.items())
    print(f"{name}: {line}" + (f"  [{' '.join(flags)}]" if flags else ""), flush=True)
    if full:
        print(plan, flush=True)


def main() -> None:
    import __spark_entry__ as E
    from pinterest_data_pipeline218_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    full = "--full" in args
    args = [a for a in args if a != "--full"]
    top_n = 0
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    if not names:
        names = top_from_bench(top_n or 8) or list(qs)[:8]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    # AQE wraps the pre-execution plan in AdaptiveSparkPlan, which hides
    # the whole-stage-codegen stage markers until runtime; plan the audit
    # with AQE off so codegen spans are countable (the production session
    # keeps AQE on — this is measurement, not configuration advice)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for n in names:
            audit(n, qs[n](spark, sf_dir), full)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
