"""Property-based tests (hypothesis) for the merge/changeset algebra —
the invariants that make the MERGE sink trustworthy hold for ARBITRARY
table states, not just the fixtures:

* apply(changeset(cur, inc)) == inc  (full-sync convergence: one merge
  reaches the incoming snapshot exactly, including deletes)
* changeset(apply(...), inc) is all-noop  (idempotence: a replay does
  nothing — the at-least-once guarantee the streaming sinks lean on)
* upsert (full_sync=False) == convergence on mentioned keys + survival
  of unmentioned keys

Frames are built per-example from generated (key -> value) maps, so key
overlap, disjointness, null values, and empty sides all get explored.
One shared Spark session; examples capped so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_examples_spark.operators.merge import (
    ACTION,
    apply_changeset,
    changeset,
)

_vals = st.one_of(st.none(), st.integers(0, 5).map(str))
_tables = st.dictionaries(
    st.integers(0, 9).map(lambda i: f"k{i}"), _vals, max_size=6
)


def _df(spark, d):
    rows = [(k, v) for k, v in sorted(d.items())]
    return spark.createDataFrame(rows, "k string, v string") if rows else (
        spark.createDataFrame([], "k string, v string")
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cur=_tables, inc=_tables)
def test_full_sync_merge_converges_and_is_idempotent(spark, cur, inc):
    cur_df, inc_df = _df(spark, cur), _df(spark, inc)
    cs = changeset(cur_df, inc_df, key="k")
    merged = apply_changeset(cur_df, cs, key="k")
    assert {(r.k, r.v) for r in merged.collect()} == set(inc.items())
    # replay: deriving again against the merged table yields only noops
    cs2 = changeset(merged, inc_df, key="k")
    actions = {r.action for r in cs2.collect()}
    assert actions <= {"noop"}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cur=_tables, inc=_tables)
def test_upsert_merge_keeps_unmentioned_keys(spark, cur, inc):
    from pyspark.sql import functions as F

    cur_df, inc_df = _df(spark, cur), _df(spark, inc)
    cs = changeset(cur_df, inc_df, key="k").filter(F.col(ACTION) != "delete")
    merged = apply_changeset(cur_df, cs, key="k")
    expected = dict(cur)
    expected.update(inc)  # incoming wins on overlap; absent keys survive
    assert {(r.k, r.v) for r in merged.collect()} == set(expected.items())


# ---------------------------------------------------------------------------
# _global_rank / cyclic_shift_column (operators/ml.py): the permutation
# properties the importance pass depends on, for arbitrary unique key
# sets and shift sizes.


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(st.integers(0, 999), min_size=2, max_size=40),
    k=st.integers(1, 5),
)
def test_cyclic_shift_is_a_derangement(spark, keys, k):
    from data_engineering_examples_spark.operators.ml import cyclic_shift_column

    n = len(keys)
    if k % n == 0:
        return  # rejected by the operator (identity shift), guarded API
    rows = [(kk, kk * 7) for kk in sorted(keys)]
    df = spark.createDataFrame(rows, "ord int, feat int")
    shifted = cyclic_shift_column(df, "feat", "ord", k=k)
    got = {r.ord: r.feat for r in shifted.collect()}
    # multiset preserved and NO row kept its own value (derangement)
    assert sorted(got.values()) == sorted(v for _, v in rows)
    assert all(got[o] != f for o, f in rows)
    # exact cyclic semantics: row at position i takes position (i+k)%n
    ordered = sorted(keys)
    expect = {ordered[i]: ordered[(i + k) % n] * 7 for i in range(n)}
    assert got == expect
