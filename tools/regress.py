"""Compare two bench.py JSON records and print a regression table.

Usage:
    python tools/regress.py bench_snapshots/r05.json bench_snapshots/r06.json
    python tools/regress.py old.json new.json --threshold 1.5 --min-delta 1.0

Accepts either a raw one-line bench.py output or a snapshot file with a
top-level per-query map (extra keys like "runs" are ignored). Flags
queries slower than --threshold x AND more than --min-delta seconds over
the old record — the same bar VERDICT applies ("regressions >1.5x and
>1s") — plus the added/removed sets and the common-query totals.

With SPARK_GRAFT_BENCH_REPEAT > 1 the bench record's "queries" map
already holds per-query MEDIANS, so this comparison is median-vs-median
by construction; when a record carries "queries_spread", flagged rows
are annotated with the new record's min..max so a one-sample host stall
(median fine, max wild) is distinguishable from a real shift (whole
spread moved).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    try:
        rec = json.loads(text)  # snapshot file (possibly pretty-printed)
    except json.JSONDecodeError:
        rec = json.loads(text.splitlines()[-1])  # raw bench.py stdout
    if "queries" not in rec:
        raise SystemExit(f"{path}: no 'queries' map")
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=1.0)
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    o_tot = sum(oq[q] for q in common)
    n_tot = sum(nq[q] for q in common)
    if common and o_tot > 0:
        print(
            f"common {len(common)} queries: {o_tot:.1f}s -> {n_tot:.1f}s "
            f"({(n_tot / o_tot - 1) * 100:+.1f}%)"
        )
    else:
        print(f"common {len(common)} queries (no comparable total)")
    if added:
        print(f"added {len(added)} (+{sum(nq[q] for q in added):.1f}s): "
              + ", ".join(f"{q} {nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed {len(removed)}: " + ", ".join(removed))

    flagged = [
        q
        for q in common
        if nq[q] > args.threshold * oq[q] and nq[q] - oq[q] > args.min_delta
    ]
    improved = [
        q
        for q in common
        if oq[q] > args.threshold * nq[q] and oq[q] - nq[q] > args.min_delta
    ]
    spread = new.get("queries_spread", {})

    def _spread_note(q: str) -> str:
        s = spread.get(q)
        return f" [spread {s['min']:.2f}..{s['max']:.2f}]" if s else ""

    print(f"\nregressions (> {args.threshold}x and > {args.min_delta}s): "
          f"{len(flagged)}")
    for q in sorted(flagged, key=lambda q: oq[q] - nq[q]):
        print(f"  {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({nq[q] / oq[q]:.1f}x)"
              f"{_spread_note(q)}")
    print(f"improvements (same bar): {len(improved)}")
    for q in sorted(improved, key=lambda q: nq[q] - oq[q]):
        print(f"  {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({nq[q] / oq[q]:.2f}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
