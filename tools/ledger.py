"""Staleness ledger: per-query latest driver CORRECTNESS round.

Joins the live registry (``__spark_entry__.queries()``) against every
committed ``CORRECTNESS_r*.json`` and prints, per query, the most recent
driver round that produced a row for it and whether that row was green.
This is the computation the window-rotation comments in
``__spark_entry__.py`` cite: the 50-slot driver window should always take
(a) rows whose plan/contract/fixture changed this round, then (b) the
stalest remaining rows, so no green ages more than a few rounds.

Usage:
    python tools/ledger.py            # full table, stalest first
    python tools/ledger.py --max N    # only rows whose latest round <= N
    python tools/ledger.py --summary  # round -> count histogram only
    python tools/ledger.py --window   # current first-50 window + their ages
    python tools/ledger.py --next     # suggested NEXT-round window skeleton:
                                      # never-windowed first, then stalest, 50
                                      # names total — paste into _WINDOW and
                                      # add this round's plan/oracle CHANGES
                                      # by hand (the ledger cannot see diffs)

Exit status is 0 always — this is a reporting tool, not a gate (the gate
is the driver's own CORRECTNESS run plus tools/selfcheck.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rotation_n(registry_size: int) -> int:
    """The rotation contract, derived from registry size (r14): every
    gated row must be re-gated within this many rounds. The driver gates
    a FIXED 50-slot window per round, so a registry of N rows needs
    ceil(N/50) rounds to round-trip even with zero churn; new and
    changed queries preempt staleness-queue slots every round (8 new + 2
    changed at r14), so the contract adds one churn round. A hardcoded
    4 was correct up to ~150 rows and became arithmetically infeasible
    at 192+ (VERDICT r13 'What's wrong' #1: the r13 window could not
    absorb 6 new + 2 changed + 24 r08 + 24 r09 rows)."""
    return -(-registry_size // 50) + 1


def _row_green(v: dict) -> bool:
    # Mirrors the driver's per-row verdict: rows + schema must match, and the
    # value hash must match when the driver computed one (hash_match is None
    # for the weaker rows-only check on oracle-less entries).
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match") in (True, None)
    )


def load_ledger(repo: str = REPO) -> dict[str, dict]:
    """name -> {round, green, rounds: [(round, green), ...]} from all
    CORRECTNESS_r*.json files, latest round winning."""
    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            continue
        for name, v in data.items():
            if not isinstance(v, dict):
                continue
            green = _row_green(v)
            ent = ledger.setdefault(name, {"rounds": []})
            ent["rounds"].append((rnd, green))
            ent["round"] = rnd
            ent["green"] = green
    return ledger


def registry_names() -> list[str]:
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


def main(argv: list[str]) -> int:
    max_round = None
    summary = "--summary" in argv
    window = "--window" in argv
    if "--max" in argv:
        max_round = int(argv[argv.index("--max") + 1])

    ledger = load_ledger()
    names = registry_names()

    rows = []
    for name in names:
        ent = ledger.get(name)
        rnd = ent["round"] if ent else 0  # 0 = never windowed
        green = ent["green"] if ent else None
        rows.append((rnd, name, green, len(ent["rounds"]) if ent else 0))

    stale_names = {name for name in ledger if name not in set(names)}
    if stale_names:
        print(f"# WARNING: {len(stale_names)} ledger names not in registry "
              f"(renamed/retired): {sorted(stale_names)}")

    if summary:
        hist: dict[int, int] = {}
        for rnd, _, _, _ in rows:
            hist[rnd] = hist.get(rnd, 0) + 1
        for rnd in sorted(hist):
            label = f"r{rnd:02d}" if rnd else "never"
            print(f"{label}\t{hist[rnd]}")
        return 0

    if "--next" in argv:
        ranked = sorted(rows, key=lambda t: (t[0], t[1]))
        print("# suggested next-round _WINDOW skeleton (never-windowed first,")
        print("# then stalest; ADD plan/oracle changes of the round by hand):")
        for rnd, name, green, _ in ranked[:50]:
            age = "never" if rnd == 0 else f"last driver row r{rnd:02d}"
            print(f'    "{name}",  # {age}')
        return 0

    if window:
        print("# current first-50 driver window (name, latest round, green)")
        for rnd, name, green, n in sorted(
            ((r, nm, g, n) for r, nm, g, n in rows if nm in set(names[:50])),
            key=lambda t: (t[0], t[1]),
        ):
            print(f"r{rnd:02d}\t{'green' if green else 'RED' if green is False else 'never'}\t{name}")
        return 0

    rows.sort(key=lambda t: (t[0], t[1]))  # stalest first
    for rnd, name, green, n in rows:
        if max_round is not None and rnd > max_round:
            continue
        label = f"r{rnd:02d}" if rnd else "never"
        status = "green" if green else ("RED" if green is False else "never")
        print(f"{label}\t{status}\t{n}x\t{name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
