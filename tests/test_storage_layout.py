"""Physical layout (sources/layout.py): the plans must PROVE the layout
pays — partition filters prune at the scan, bucketed joins drop their
exchanges. API-ran-without-error is not the bar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_examples_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)
from data_engineering_examples_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"



import contextlib


@contextlib.contextmanager
def no_broadcast(spark):
    """Disable broadcast joins, restoring the PRIOR session values (a bare
    unset would clobber any session-level override with the Spark default)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    prev = {}
    for k in keys:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    events = load_tables(spark, SF, ["events"])["events"]
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"])

    back = spark.read.parquet(out)
    one = back.filter(F.col("event_type") == "click")
    plan = _physical_plan(one)
    # the predicate must land in PartitionFilters (directory pruning),
    # not in PushedFilters/post-scan Filter
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]

    n_all = back.count()
    n_click = one.count()
    assert 0 < n_click < n_all


def test_bucketed_join_skips_exchange(spark, tmp_path):
    t = load_tables(spark, SF, ["orders", "customer"])
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(
        t["orders"], "b_orders", "o_custkey", 8, path=str(tmp_path / "b_orders")
    )
    write_bucketed(
        t["customer"], "b_customer", "c_custkey", 8, path=str(tmp_path / "b_customer")
    )

    orders = spark.table("b_orders")
    cust = spark.table("b_customer")
    # forbid broadcast so the only shuffle-free path is bucket co-location
    try:
        with no_broadcast(spark):
            joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
                "o_orderkey", "c_name"
            )
            plan = _physical_plan(joined)
            assert "Exchange" not in plan, plan
            # sanity: the join still returns every order
            assert joined.count() == t["orders"].count()

            # control: the same join over plain (non-bucketed) parquet shuffles
            plain = t["orders"].join(
                t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
            )
            assert "Exchange" in _physical_plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_groupby_skips_exchange(spark, tmp_path):
    t = load_tables(spark, SF, ["orders"])
    spark.sql("DROP TABLE IF EXISTS b_orders2")
    write_bucketed(
        t["orders"], "b_orders2", "o_custkey", 8, path=str(tmp_path / "b_orders2")
    )
    try:
        agg = spark.table("b_orders2").groupBy("o_custkey").count()
        assert "Exchange" not in _physical_plan(agg)
        assert agg.count() == t["orders"].select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders2")


def test_compact_parquet_reduces_files(spark, tmp_path):
    from data_engineering_examples_spark.sources.layout import compact_parquet

    out = str(tmp_path / "fragmented")
    events = load_tables(spark, SF, ["events"])["events"]
    # simulate micro-batch accretion: 20 tiny appends
    for i in range(20):
        events.filter(F.col("event_id") % 20 == i).coalesce(1).write.mode(
            "append"
        ).parquet(out)

    import glob

    before = len(glob.glob(out + "/*.parquet"))
    assert before >= 20
    n_total = spark.read.parquet(out).count()

    written = compact_parquet(spark, out, target_mb=256)
    after = len(glob.glob(out + "/*.parquet"))
    assert written == 1 and after == 1  # tiny data → one right-sized file
    assert spark.read.parquet(out).count() == n_total


def test_bucketed_fhir_cohort_join_skips_exchanges(spark, tmp_path):
    """The fhir_queries docstring claims the cohort shuffles collapse to
    co-located work when silver tables are bucketed by patient key —
    prove it: conditions agg + patients join, zero Exchange."""
    from data_engineering_examples_spark.sources.fhir import load_fhir_tables

    t = load_fhir_tables(spark, ["patients", "conditions"])
    spark.sql("DROP TABLE IF EXISTS b_patients")
    spark.sql("DROP TABLE IF EXISTS b_conditions")
    write_bucketed(t["patients"], "b_patients", "key", 8, path=str(tmp_path / "bp"))
    write_bucketed(
        t["conditions"], "b_conditions", "patient", 8, path=str(tmp_path / "bc")
    )
    try:
        with no_broadcast(spark):
            conds = spark.table("b_conditions")
            pats = spark.table("b_patients")
            flags = conds.groupBy("patient").agg(F.count(F.lit(1)).alias("n_conditions"))
            cohort = pats.join(flags, pats.key == flags.patient, "left").select(
                "key", "gender", "n_conditions"
            )
            plan = _physical_plan(cohort)
            assert "Exchange" not in plan, plan
            assert cohort.count() == t["patients"].count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_patients")
        spark.sql("DROP TABLE IF EXISTS b_conditions")


def test_compact_parquet_recovers_from_stale_swap_dirs(spark, tmp_path):
    """Crash leftovers must not abort a rerun: a stale tmp dir is removed,
    and a crash between the two renames (data only at the old-side path)
    is restored before compacting."""
    import os
    import shutil

    from data_engineering_examples_spark.sources.layout import compact_parquet

    out = str(tmp_path / "t")
    spark.range(1000).write.parquet(out)

    # stale tmp from a crashed write
    os.makedirs(out + ".__swap_tmp__/junk")
    assert compact_parquet(spark, out, target_mb=256) >= 1
    assert not os.path.exists(out + ".__swap_tmp__")

    # crash between renames: live path gone, old holds the only copy
    shutil.rmtree(out + ".__swap_old__", ignore_errors=True)
    os.rename(out, out + ".__swap_old__")
    assert compact_parquet(spark, out, target_mb=256) >= 1
    assert spark.read.parquet(out).count() == 1000


def test_swap_write_crash_between_renames_is_recovered(spark, tmp_path):
    """Chaos: simulate death between the two renames (live dir gone, only
    copy at the old-side path, half-written tmp present). recover_swap
    must restore the live dir, and a subsequent swap_write must complete
    normally over the recovered state."""
    import os
    import shutil

    from data_engineering_examples_spark.sources.layout import (
        recover_swap,
        swap_write,
    )

    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)

    # crash state: rename(path, old) happened, rename(tmp, path) did not
    os.rename(path, path + ".__swap_old__")
    os.makedirs(path + ".__swap_tmp__")
    open(path + ".__swap_tmp__/part-half-written.parquet", "w").close()

    assert recover_swap(path) is True
    assert spark.read.parquet(path).count() == 100

    # rerun the swap over the recovered dir: stale tmp must not break it
    swap_write(spark.range(50), path)
    assert spark.read.parquet(path).count() == 50
    assert not os.path.exists(path + ".__swap_tmp__")
    assert not os.path.exists(path + ".__swap_old__")
    shutil.rmtree(path)


def test_range_clustered_layout_skips_files(spark, tmp_path):
    """write_sorted gives each file a narrow min/max span on the cluster
    key, so a selective range filter must read FEWER files than the
    layout holds (parquet footer stats, no index). Compare the scan's
    files-read metric against the file count on disk."""
    import os

    from data_engineering_examples_spark.sources.layout import write_sorted
    from data_engineering_examples_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    ev = load_tables(spark, "/root/testdata/sf0.01", ["events"])["events"]
    out = str(tmp_path / "by_user")
    write_sorted(ev, out, ["user_id"], n_files=8)
    n_files = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_files >= 4  # the layout actually spread across files

    df = spark.read.parquet(out).filter(F.col("user_id").between(100, 199))
    df.write.format("noop").mode("overwrite").save()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    files_read = None
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            files_read = node.metrics().apply("numFiles").value()
            break
    assert files_read is not None and files_read < n_files, (files_read, n_files)


def test_dynamic_partition_overwrite_leaves_other_partitions_untouched(spark, tmp_path):
    """q136's core claim, proven at the file level: a dynamic-mode
    overwrite whose batch covers only the 2 most recent day-partitions
    replaces exactly those directories — every other partition keeps the
    same files with the same mtimes (no rewrite), and a static-mode
    overwrite would NOT have this property (it truncates the table)."""
    import os

    from pyspark.sql import functions as F

    ev = load_tables(spark, SF, ["events"])["events"].select(
        "user_id", "event_type", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(path)

    def snap():
        out = {}
        for d in os.listdir(path):
            if d.startswith("day="):
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                )
        return out

    before = snap()
    days = sorted(d.split("=", 1)[1] for d in before)
    target = {f"day={d}" for d in days[-2:]}
    assert len(before) > 2, "need untouched partitions for the claim"

    batch = ev.filter(F.col("day").isin([d.split("=")[1] for d in target])).filter(
        F.col("value") >= 0.5
    )
    (
        batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    after = snap()
    assert set(after) == set(before)  # no partition vanished (static would drop)
    for d in set(before) - target:
        assert after[d] == before[d], f"untouched partition {d} was rewritten"
    for d in target:
        assert after[d] != before[d], f"target partition {d} was not replaced"
    # replaced partitions hold exactly the batch rows
    got = spark.read.parquet(path).filter(
        F.col("day").isin([d.split("=")[1] for d in target])
    ).count()
    assert got == batch.count()


def test_zorder_layout_skips_files_on_both_dimensions(spark, tmp_path):
    """Morton clustering must let a selective filter on EITHER dimension
    skip files — that's the whole point over single-key clustering,
    which only skips on its own key."""
    import os

    from data_engineering_examples_spark.sources.layout import morton_key, write_sorted
    from pyspark.sql import functions as F

    ev = load_tables(spark, "/root/testdata/sf0.01", ["events"])["events"]
    z = morton_key(
        F.col("user_id").cast("bigint"), F.floor(F.col("value") * 100).cast("bigint")
    )
    out = str(tmp_path / "zorder")
    write_sorted(ev.withColumn("z", z), out, ["z"], n_files=16)
    n_files = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_files >= 8

    def files_read(df):
        df.write.format("noop").mode("overwrite").save()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "Scan" in node.nodeName():
                return node.metrics().apply("numFiles").value()
        raise AssertionError("no scan leaf")

    base = spark.read.parquet(out)
    by_user = files_read(base.filter(F.col("user_id").between(0, 99)))
    by_value = files_read(base.filter(F.col("value") < 30.0))
    assert by_user < n_files, (by_user, n_files)
    assert by_value < n_files, (by_value, n_files)


def test_morton_key_matches_reference_interleave(spark):
    """morton_key must equal the reference bit-interleave for edge cases
    and a seeded random sample across the full 16-bit domain (bijectivity
    over the sample follows from equality with the injective reference)."""
    import random

    from data_engineering_examples_spark.sources.layout import morton_key
    from pyspark.sql import functions as F

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rng = random.Random(11)
    pairs = [(0, 0), (0, 65535), (65535, 0), (65535, 65535), (1, 2), (43690, 21845)]
    pairs += [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "a long, b long").withColumn(
        "z", morton_key(F.col("a"), F.col("b"))
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b, z, ref(a, b))
    assert len(set(got.values())) == len(set(pairs))


def test_wap_republish_is_idempotent_and_atomic(spark):
    """Running q150 twice must leave exactly one live copy (the swap
    replaces, never appends) and no stranded swap side-dirs."""
    import os

    from data_engineering_examples_spark import scratch as _scratch
    from data_engineering_examples_spark.plans.etl_queries import (
        q150_write_audit_publish,
    )

    a = q150_write_audit_publish(spark, SF).collect()
    b = q150_write_audit_publish(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    base = os.path.join(_scratch.scratch_root(), "q150_wap")
    assert os.path.isdir(os.path.join(base, "live"))
    leftovers = [d for d in os.listdir(base) if "__swap_" in d]
    assert not leftovers, leftovers
