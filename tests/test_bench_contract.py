"""The driver's bench contract: ``python bench.py`` must print exactly
ONE JSON line on stdout with keys metric/value/unit/queries/sf — a
breakage here silently loses the round's BENCH record, so it is pinned
by running the real script in a real subprocess (restricted to two
queries via SPARK_GRAFT_BENCH_ONLY to stay fast)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line_with_contract_keys():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_ONLY"] = "q01_pricing_summary,q03_top_orders"
    env["SPARK_GRAFT_BENCH_REPEAT"] = "1"  # cover the no-spread branch
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        check=True,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "queries", "sf"}
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert set(rec["queries"]) == {"q01_pricing_summary", "q03_top_orders"}
    assert rec["value"] > 0
    assert abs(rec["value"] - sum(rec["queries"].values())) < 1e-6
    # per-query timings go to stderr, never stdout
    assert "q01_pricing_summary" in out.stderr


def test_bench_repeat_reports_median_and_spread():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_ONLY"] = "q01_pricing_summary"
    env["SPARK_GRAFT_BENCH_REPEAT"] = "3"
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        check=True,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["repeat"] == 3
    spread = rec["queries_spread"]["q01_pricing_summary"]
    assert len(spread["runs"]) == 3
    assert spread["min"] <= spread["median"] <= spread["max"]
    # headline per-query value IS the median (and value = sum of medians)
    assert rec["queries"]["q01_pricing_summary"] == spread["median"]
    assert abs(rec["value"] - sum(rec["queries"].values())) < 1e-6
