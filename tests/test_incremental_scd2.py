"""Behavioral tests for SCD2 dimension versioning (q89) and incremental
rollup maintenance (q90): does a changed row close v1 and open v2, does a
no-op update stay single-versioned, and does the state/delta merge really
exercise the additive path on the boundary day?
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_scd2_changed_key_has_closed_v1_and_open_v2(spark):
    hist = all_specs()["q89_scd2_dimension"].fn(spark, SF)
    changed = hist.filter(F.col("c_custkey") % 10 == 3).collect()
    by_key = {}
    for r in changed:
        by_key.setdefault(r["c_custkey"], []).append(r)
    assert by_key, "fixture has no %10==3 keys"
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == [1, 2]
        v1, v2 = rows
        # v1 closed exactly where v2 opens; only v2 current
        assert v1["eff_to"] == v2["eff_from"] and v1["eff_to"] is not None
        assert (v1["is_current"], v2["is_current"]) == (False, True)
        assert v2["segment"] == v1["segment"] + "-R"


def test_scd2_noop_update_stays_single_versioned(spark):
    hist = all_specs()["q89_scd2_dimension"].fn(spark, SF)
    noop = hist.filter(F.col("c_custkey") % 10 == 7)
    assert noop.filter(F.col("version") != 1).count() == 0
    assert noop.filter(~F.col("is_current") | F.col("eff_to").isNotNull()).count() == 0
    # untouched keys likewise single current version
    rest = hist.filter(~(F.col("c_custkey") % 10).isin(3, 7))
    assert rest.groupBy("c_custkey").count().filter("count > 1").count() == 0


def test_incremental_rollup_boundary_day_merges_both_sides(spark):
    """The cutoff is mid-day: the boundary day must appear in BOTH state
    and delta, so the merged count exceeds either side alone."""
    from data_engineering_examples_spark.plans.analytics import _INC_CUTOFF

    from data_engineering_examples_spark.sources.tables import load_tables

    ev = load_tables(spark, SF, ["events"])["events"]
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp_ntz")
    boundary_day = _INC_CUTOFF.split(" ")[0]
    before = ev.filter(
        (F.col("ts") < cutoff) & (F.col("ts").cast("date") == boundary_day)
    ).count()
    after = ev.filter(
        (F.col("ts") >= cutoff) & (F.col("ts").cast("date") == boundary_day)
    ).count()
    assert before > 0 and after > 0, "cutoff no longer splits the boundary day"

    merged = (
        all_specs()["q90_incremental_rollup"]
        .fn(spark, SF)
        .filter(F.col("day") == boundary_day)
        .agg(F.sum("n_events").alias("n"))
        .collect()[0]["n"]
    )
    assert merged == before + after
