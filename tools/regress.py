"""Compare two bench.py JSON records and print a regression table.

Usage:
    python tools/regress.py bench_snapshots/r05.json bench_snapshots/r06.json
    python tools/regress.py old.json new.json --threshold 1.5 --min-delta 1.0
    python tools/regress.py old.json new.json --rerun   # drift-vs-regression A/B

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

``--rerun`` automates the drift-vs-regression A/B that rounds 8-10 ran
by hand (r10b/r10e sections of bench_snapshots/README.md): every
flagged query is re-benched ISOLATED in one fresh bench.py subprocess
(``SPARK_GRAFT_BENCH_ONLY=<flagged>``, same repeat policy), which
removes the full-registry in-context load — the dominant source of
false flags on this host — while keeping the same machine. Verdict per
query: ``host-drift`` if the isolated median comes back under the flag
bar vs the OLD record, ``regression-confirmed`` if it stays over.
Verdicts are written back into the NEW snapshot file under
``drift_verdicts`` (suppress with ``--no-annotate``), so committed
snapshots carry machine-generated evidence instead of prose. Exit
status is 1 only for CONFIRMED regressions.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


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


def parse_bench_stdout(stdout: str) -> dict[str, float]:
    """Extract the per-query medians from a bench.py subprocess's
    stdout.  The bench record is the LAST JSON-object line in the
    normal case, but late JVM shutdown noise (log4j appender warnings,
    SIGTERM handler prints) can land AFTER it — so scan backwards for
    the last line that parses as an object with a ``queries`` map
    instead of trusting ``splitlines()[-1]`` (r12 verdict ask #4).
    Raises SystemExit with the stdout tail when no line qualifies,
    mirroring the stderr reporting on nonzero exit."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and isinstance(rec.get("queries"), dict):
            return rec["queries"]
    raise SystemExit(
        "isolated re-bench succeeded (exit 0) but no stdout line parses "
        "as the bench JSON record; stdout tail:\n" + stdout[-2000:]
    )


def isolated_rebench(
    names: list[str], sf_dir: str, repeat: int
) -> dict[str, float]:
    """Run bench.py once, restricted to ``names``, in a fresh process;
    return its per-query medians. One subprocess for the whole flagged
    set (not one per query): the point of isolation is shedding the
    full-registry in-context load, and the manual r10b/r10e procedure
    this automates batched the flagged family the same way."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(names)
    env["SPARK_GRAFT_BENCH_REPEAT"] = str(repeat)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        env["SPARK_GRAFT_BENCH_FULL_PATH"] = tf.name  # don't clobber last_run
    bench = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench.py")
    try:
        proc = subprocess.run(
            [sys.executable, bench],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if proc.returncode != 0:
            raise SystemExit(
                f"isolated re-bench failed (exit {proc.returncode}):\n"
                + proc.stderr[-2000:]
            )
        return parse_bench_stdout(proc.stdout)
    finally:
        try:
            os.unlink(env["SPARK_GRAFT_BENCH_FULL_PATH"])
        except OSError:
            pass


def annotate_snapshot(path: str, verdicts: dict) -> bool:
    """Write ``drift_verdicts`` into the snapshot file at ``path`` (only
    if it is a JSON object file we can rewrite); returns success."""
    try:
        with open(path) as fh:
            rec = json.loads(fh.read())
        if not isinstance(rec, dict):
            return False
        rec["drift_verdicts"] = verdicts
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
            fh.write("\n")
        return True
    except (OSError, json.JSONDecodeError):
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=1.0)
    ap.add_argument(
        "--rerun",
        action="store_true",
        help="re-bench flagged queries isolated and classify each as "
        "host-drift vs regression-confirmed",
    )
    ap.add_argument(
        "--no-annotate",
        action="store_true",
        help="with --rerun: print verdicts but do not write them back "
        "into the new snapshot file",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="sf dir for the isolated re-bench (must match the records)",
    )
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="repeat count for the isolated re-bench",
    )
    ap.add_argument(
        "--settle",
        type=int,
        default=30,
        help="seconds to wait before the isolated re-bench, so it does "
        "not inherit the just-finished full bench's host state (page "
        "cache churn, background writeback) — the r11b false-confirm "
        "showed a 0s-settle rerun can still read hot",
    )
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

    if not flagged or not args.rerun:
        return 1 if flagged else 0

    # --- automated drift-vs-regression A/B over the flagged set --------
    if args.settle > 0:
        import time

        print(f"\nsettling {args.settle}s before the isolated re-bench ...")
        time.sleep(args.settle)
    print(f"\nisolated re-bench of {len(flagged)} flagged queries "
          f"(repeat={args.repeat}, sf_dir={args.sf_dir}) ...")
    iso = isolated_rebench(sorted(flagged), args.sf_dir, args.repeat)
    verdicts, confirmed = {}, []
    for q in sorted(flagged):
        iso_t = iso.get(q)
        if iso_t is None:  # bench refused the name — treat as confirmed
            confirmed.append(q)
            verdicts[q] = {"verdict": "rerun-missing"}
            continue
        still_over = (
            iso_t > args.threshold * oq[q] and iso_t - oq[q] > args.min_delta
        )
        verdict = "regression-confirmed" if still_over else "host-drift"
        if still_over:
            confirmed.append(q)
        verdicts[q] = {
            "old": oq[q],
            "snapshot": nq[q],
            "isolated": iso_t,
            "repeat": args.repeat,
            "verdict": verdict,
        }
        print(f"  {q}: old {oq[q]:.2f}s, snapshot {nq[q]:.2f}s, "
              f"isolated {iso_t:.2f}s -> {verdict}")
    if not args.no_annotate:
        ok = annotate_snapshot(args.new, verdicts)
        print(
            f"drift_verdicts written to {args.new}" if ok
            else f"(could not annotate {args.new} — raw bench line or "
            "unwritable; verdicts printed above only)"
        )
    print(f"\nconfirmed regressions after isolation: {len(confirmed)}"
          + (": " + ", ".join(confirmed) if confirmed else ""))
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
