"""Hard physical-plan invariants over EVERY registered query — the
plan-shape contract that keeps the workload scale-safe:

* no CartesianProduct anywhere (candidate generation must be bucketed);
* no row-at-a-time BatchEvalPython — Python only via Arrow batches
  (ArrowEvalPython / MapInPandas);
* every per-query limit becomes TakeOrderedAndProject or CollectLimit,
  never a global sort feeding a limit.
"""

from __future__ import annotations

import pytest

from data_engineering_examples_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in all_specs().items():
        out[name] = spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_no_row_at_a_time_python(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], offenders


def test_python_stages_are_arrow_batched(plans):
    with_python = {
        n: p
        for n, p in plans.items()
        if "ArrowEvalPython" in p or "MapInPandas" in p
    }
    # the UDF surface exists and is Arrow-only
    assert len(with_python) >= 3


def test_limits_are_topk_not_global_sort(plans):
    # an ordered limit must execute as TakeOrderedAndProject (per-partition
    # top-k + k-row merge), never a full Sort materialized under a
    # GlobalLimit. (GlobalLimit always carries a LocalLimit child, so the
    # check must target the Sort-under-limit shape specifically.)
    offenders = [
        n
        for n, p in plans.items()
        if "GlobalLimit" in p and "Sort " in p and "TakeOrderedAndProject" not in p
    ]
    assert offenders == [], offenders


def test_no_driver_side_collect_in_package():
    """The only acceptable driver materialization is in tools/tests. A
    ``.collect()`` inside the package means an operator is looping rows
    through the driver — the state-rewrite trap (a driver OOM at a 100 TB
    task queue); writes must go executor-side (temp dir + rename swap)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "data_engineering_examples_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".collect()" in code:
                offenders.append(f"{py.name}:{i}")
    assert offenders == [], offenders
