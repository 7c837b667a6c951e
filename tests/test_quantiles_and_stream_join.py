"""q96 discrete-quantile selection and q97 stream-stream interval join:
independent-recomputation and operator-shape checks (oracle parity is
the driver gate's job)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.analytics import QUANTILES
from data_engineering_examples_spark.plans.registry import all_specs
from data_engineering_examples_spark.plans.workflow_queries import ATTRIB_WINDOW_MIN

from .conftest import SF_SMOKE


def test_q96_matches_sorted_list_selection(spark):
    """The distributed count+cumulative selection must equal the naive
    'sort all values, take element ceil(q*n)' definition."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/orders.parquet", columns=["o_orderpriority", "o_totalprice"])
    by_prio: dict[str, list[float]] = {}
    for prio, price in zip(*(c.to_pylist() for c in tbl.columns)):
        by_prio.setdefault(prio, []).append(price)
    expected = {}
    for prio, vals in by_prio.items():
        vals.sort()
        n = len(vals)
        row = {"n_orders": n}
        for q in QUANTILES:
            row[f"p{int(q * 100)}"] = vals[math.ceil(q * n) - 1]
        expected[prio] = row

    out = all_specs()["q96_price_quantiles"].fn(spark, SF_SMOKE).collect()
    assert len(out) == len(expected)
    for r in out:
        e = expected[r.o_orderpriority]
        assert r.n_orders == e["n_orders"]
        for q in QUANTILES:
            col = f"p{int(q * 100)}"
            assert getattr(r, col) == e[col], (r.o_orderpriority, col)


def test_q97_equals_batch_interval_join(spark):
    """The drained streaming join must equal the batch interval join —
    the single-micro-batch drain guarantees no row is ever late."""
    from data_engineering_examples_spark.sources.tables import load_tables

    ev = load_tables(spark, SF_SMOKE, ["events"])["events"]
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = (
        c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.expr("timestampdiff(MICROSECOND, cts, pts)").alias("lag_us"),
        )
    )
    expected = {tuple(r) for r in batch.collect()}
    got = {
        tuple(r)
        for r in all_specs()["q97_stream_attribution"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected and got  # equal AND non-trivial


def test_q97_join_requires_watermarks(spark):
    """The implementation must keep both watermarks: an append-mode
    stream-stream inner join without them is rejected by Spark (state
    would grow without bound), so their presence is what makes the
    operator legal at scale. Guard against someone 'simplifying' them
    away while the single-batch drain keeps results accidentally right."""
    import inspect

    from data_engineering_examples_spark.plans import workflow_queries as wq

    src = inspect.getsource(wq._stream_attribution)
    assert src.count("withWatermark") == 2


def test_stream_attribution_production_shape_matches_batch(spark):
    """Multi-file, maxFilesPerTrigger=1 delivery — watermarks advance
    between micro-batches and click state is actually evicted — must
    still produce exactly the batch interval-join result, because
    time-ordered delivery never evicts a click that a future purchase
    could match."""
    from data_engineering_examples_spark.plans.workflow_queries import (
        _stream_attribution,
    )
    from data_engineering_examples_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    prod = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us)
        for r in _stream_attribution(spark, sf, production=True).collect()
    }

    ev = load_tables(spark, sf, ["events"])["events"]
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.expr("timestampdiff(MICROSECOND, cts, pts)").alias("lag_us"),
    )
    expected = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us) for r in batch.collect()
    }
    assert prod == expected and len(prod) > 0
