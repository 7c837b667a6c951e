"""Behavioral tests for the funnel (q91) and retention-cohort (q92)
operators: strict stage ordering, window cutoffs, and week-offset
bucketing, on a hand-built events fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.registry import all_specs

_BASE_NS = 1_700_000_000_000_000_000  # 2023-11-14 22:13:20 UTC
_MIN_NS = 60_000_000_000


def _write_events(spark, tmp_path, rows):
    """rows: (user_id, event_type, minutes_after_base)."""
    data = [
        (i, _BASE_NS + int(m * _MIN_NS), u, t, 1.0, "{}")
        for i, (u, t, m) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_strict_ordering_and_windows(spark, tmp_path):
    rows = [
        # user 1: full conversion inside both windows -> stage 3
        (1, "view", 0), (1, "click", 10), (1, "purchase", 40),
        # user 2: click only BEFORE its first view -> stage 1
        (2, "click", 0), (2, "view", 10),
        # user 3: click 2h after view (outside 1h window) -> stage 1
        (3, "view", 0), (3, "click", 120),
        # user 4: purchase but never views -> stage 0
        (4, "purchase", 0),
        # user 5: view->click ok, purchase 61min after click -> stage 2
        (5, "view", 0), (5, "click", 30), (5, "purchase", 30 + 61),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r["stage_reached"]
        for r in all_specs()["q91_funnel_stages"].fn(spark, sf).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_funnel_uses_first_qualifying_event_per_stage(spark, tmp_path):
    # two views: the funnel anchors on the FIRST view, so the click 45min
    # after the SECOND view (95min after the first) is out of window
    rows = [(1, "view", 0), (1, "view", 50), (1, "click", 95)]
    sf = _write_events(spark, tmp_path, rows)
    row = all_specs()["q91_funnel_stages"].fn(spark, sf).collect()[0]
    assert row["stage_reached"] == 1 and row["click_ts"] is None


def test_retention_week_offsets(spark, tmp_path):
    day = 24 * 60
    rows = [
        (1, "view", 0),            # first event -> offset 0
        (1, "click", 3 * day),     # same week (days 0-6) -> offset 0
        (1, "view", 8 * day),      # days 7-13 -> offset 1
        (2, "view", 1 * day),      # separate user, single event
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = all_specs()["q92_retention_cohorts"].fn(spark, sf).collect()
    m = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in out}
    # user 1 appears at offsets 0 and 1; user 2 only at its own offset 0
    assert sum(m.values()) == 3
    assert {wo for (_, wo) in m} == {0, 1}


def test_sliding_windows_double_count_each_event(spark, tmp_path):
    """1h window at 30min slide => every event lands in exactly 2
    windows: total n_events across windows is 2x the event count, and
    consecutive window starts differ by the slide."""
    import datetime as dt

    import pandas as pd

    from data_engineering_examples_spark.plans.registry import all_specs

    base = dt.datetime(2024, 1, 1, 0, 5, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), 1, "click", 1.0, "{}")
        for i in range(20)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = all_specs()["q109_sliding_window_rates"].fn(spark, str(tmp_path)).collect()
    assert sum(r.n_events for r in out) == 2 * len(rows)
    starts = sorted(r.window_start for r in out)
    assert len(starts) == len(set(starts))  # (type, window) rows unique


def test_partition_pruning_reaches_the_file_index(spark):
    """The event_type filter must appear as a PartitionFilter (plan-time
    directory pruning), not a post-scan data filter."""
    from data_engineering_examples_spark.plans.registry import all_specs

    df = all_specs()["q111_partition_pruning"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the IN filter sits in the partition filters, naming both types
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "click" in m.group(0) and "purchase" in m.group(0)


def test_bucketed_join_has_no_join_exchange(spark):
    """With broadcast disabled, q112's orders⋈lineitem must join on the
    bucket layout alone: the join subtree contains ZERO Exchange and both
    scans report selected buckets."""
    from data_engineering_examples_spark.plans.registry import all_specs
    from .test_storage_layout import no_broadcast

    with no_broadcast(spark):
        df = all_specs()["q112_bucketed_join"].fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("SelectedBucketsCount") == 2
    # the ONLY exchange allowed is the aggregation's, strictly above the
    # join: no Exchange may appear below the SortMergeJoin node
    join_pos = plan.index("SortMergeJoin")
    assert "Exchange" not in plan[join_pos:], plan[join_pos:][:500]


def test_multitouch_linear_credit_conserves_exactly(spark):
    """q165's accounting property: summed linear credit must equal
    exactly 1e6 micro-units per purchase that had >= 1 click touch —
    the integer-remainder-to-last-touch design makes this EXACT, not
    approximate."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_engineering_examples_spark.plans.registry import all_specs
    from data_engineering_examples_spark.sources.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = all_specs()["q165_multitouch_attribution"].fn(spark, sf)
    got = out.agg(
        F.sum("linear_micros").alias("lin"),
        F.sum("first_touch_micros").alias("fst"),
        F.sum("last_touch_micros").alias("lst"),
    ).first()

    ev = [
        (r.user_id, r.event_type, r.t)
        for r in load_tables(spark, sf, ["events"])["events"]
        .select("user_id", "event_type", F.col("ts").cast("timestamp").alias("t"))
        .collect()
    ]
    clicks = [(u, t) for u, e, t in ev if e == "click"]
    n_attributed = sum(
        1
        for u, e, t in ev
        if e == "purchase"
        and any(cu == u and ct <= t and ct > t - dt.timedelta(hours=24)
                for cu, ct in clicks)
    )
    assert got.lin == 1_000_000 * n_attributed
    assert got.fst == 1_000_000 * n_attributed
    assert got.lst == 1_000_000 * n_attributed
