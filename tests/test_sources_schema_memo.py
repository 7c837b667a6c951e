"""The immutable-input schema memo (sources/tables.py:read_immutable_parquet)
must be metadata-only: same rows and schema on hit and miss, keyed by
application so a different app id can never serve a stale schema."""

from __future__ import annotations

import os

from data_engineering_examples_spark.sources import tables as T

SF = os.path.join(os.path.dirname(__file__), "..", "..", "testdata")
SF001 = "/root/testdata/sf0.001"


def test_memo_hit_matches_miss(spark):
    path = os.path.join(SF001, "orders.parquet")
    key = (spark.sparkContext.applicationId, os.path.realpath(path))
    T._SCHEMA_MEMO.pop(key, None)
    miss = T.read_immutable_parquet(spark, path)
    assert key in T._SCHEMA_MEMO  # the miss populated the memo
    hit = T.read_immutable_parquet(spark, path)
    assert hit.schema == miss.schema
    assert hit.count() == miss.count()
    # the hit plan carries the memoized schema explicitly: collected rows
    # are identical, not just counts
    assert sorted(map(tuple, hit.limit(5).collect())) == sorted(
        map(tuple, miss.limit(5).collect())
    )


def test_memo_is_per_application(spark):
    path = os.path.join(SF001, "orders.parquet")
    T.read_immutable_parquet(spark, path)
    real = os.path.realpath(path)
    app = spark.sparkContext.applicationId
    assert (app, real) in T._SCHEMA_MEMO
    # a different application id is a different key — no cross-app reuse
    assert ("other-app", real) not in T._SCHEMA_MEMO


def test_load_tables_still_lazy_and_green(spark):
    t = T.load_tables(spark, SF001, ["orders", "events", "lineitem"])
    # events passes through the nanos/micros adapter — schema must keep
    # the rebuilt TIMESTAMP_NTZ ts regardless of memo state
    assert dict(t["events"].dtypes)["ts"] == "timestamp_ntz"
    assert t["orders"].count() > 0
    # second load (memo hit) returns the same shape
    t2 = T.load_tables(spark, SF001, ["orders", "events", "lineitem"])
    assert t2["events"].schema == t["events"].schema
    assert t2["lineitem"].schema == t["lineitem"].schema
