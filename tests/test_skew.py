"""Skew operators (operators/skew.py): the salted rewrites must be
result-identical to their plain forms — on data WITH a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_examples_spark.operators.skew import (
    salted_equi_join,
    two_stage_agg,
)


@pytest.fixture()
def skewed(spark):
    # 90% of rows share key 0 (the hot key), the rest spread over 1..9
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 9) + 1).alias("k"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    small = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    )
    return big, small


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_matches_plain(skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "inner")
    salted = salted_equi_join(big, small, ["k"], n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_left_join_matches_plain(skewed):
    big, small = skewed
    sparse = small.filter(F.col("k") % 2 == 0)  # force unmatched left rows
    plain = big.join(sparse, ["k"], "left")
    salted = salted_equi_join(big, sparse, ["k"], n_salts=4, how="left")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_rejects_unsupported_how(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_equi_join(big, small, ["k"], how="full")


def test_two_stage_agg_counts(skewed):
    big, _ = skewed
    plain = big.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.countDistinct("v").alias("n_distinct")
    )
    salted = two_stage_agg(big, ["k"], n_salts=16, count_distinct_col="v")
    assert _sorted_rows(salted.select("k", "n_rows", "n_distinct")) == _sorted_rows(
        plain.select("k", "n_rows", "n_distinct")
    )


def test_two_stage_agg_distinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None), ("c", 2)],
        "k string, v int",
    )
    from data_engineering_examples_spark.operators.skew import two_stage_agg

    got = {
        r.k: (r.n_rows, r.n_distinct)
        for r in two_stage_agg(df, ["k"], count_distinct_col="v").collect()
    }
    # COUNT(DISTINCT v) semantics: NULL is not a distinct value
    assert got == {"a": (3, 1), "b": (1, 0), "c": (1, 1)}
