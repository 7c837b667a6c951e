"""Tests for the search-param compiler (S4), the external-sink pattern
(S10), the PractitionerRole builder (U3), stratified sampling (A6), and
the pyspark.ml surface (X4): classifier + regressor + MAE — the Spark
re-expression of DiabetesSQL.ipynb cells 27/31/32/35.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.registry import all_specs
from data_engineering_examples_spark.search.params import compile_search
from data_engineering_examples_spark.sinks.external import post_partitionwise
from data_engineering_examples_spark.sources.fhir import FIXTURES_DIR, load_fhir_tables
from data_engineering_examples_spark.sources.ods import (
    practitioner_role_struct,
    read_egpcur,
)


def test_search_compiler_prefixes_and_tokens(spark):
    obs = load_fhir_tables(spark, ["observations"])["observations"]
    hits = compile_search(obs, {"patient": "Patient/6", "code": "8302-2"}).collect()
    assert hits and all(r.patient == "Patient/6" and "8302-2" in r.code for r in hits)

    tasks = load_fhir_tables(spark, ["tasks"])["tasks"]
    lo = compile_search(tasks, {"authored-on": "le2025-07-01"}).count()
    hi = compile_search(tasks, {"authored-on": "gt2025-07-01"}).count()
    assert lo + hi == tasks.count()
    multi = compile_search(tasks, {"status": "completed,failed"})
    assert {r.status for r in multi.collect()} == {"completed", "failed"}


def test_post_partitionwise_uses_one_transport_per_partition(spark):
    df = spark.range(100).select(F.concat(F.lit("payload-"), F.col("id")).alias("body"))
    df = df.repartition(4)

    def factory():
        # deterministic fake transport: fail payloads ending in 7
        def send(body: str) -> int:
            return 500 if body.endswith("7") else 201

        return send

    sent, failed = post_partitionwise(df, "body", factory)
    assert sent == 90 and failed == 10


def test_practitioner_role_struct(spark):
    eg = read_egpcur(spark, f"{FIXTURES_DIR}/egpcur.csv").limit(50)
    built = eg.select(
        "gmp",
        "started",
        "ended",
        F.to_json(
            practitioner_role_struct(eg, F.lit("p1"), F.lit("o1")),
            {"ignoreNullFields": "true"},
        ).alias("js"),
    ).collect()
    for r in built:
        doc = json.loads(r.js)
        assert doc["practitioner"]["reference"] == "Practitioner/p1"
        assert doc["organization"]["reference"] == "Organization/o1"
        if r.started:
            s = doc["period"]["start"]
            assert s == f"{r.started[:4]}-{r.started[4:6]}-{r.started[6:8]}"
        if not r.ended:
            assert "end" not in doc.get("period", {})


def test_stratified_split_and_ml_surface(spark):
    """A6 sampleBy + X4: tree classifier on the diabetes cohort features,
    forest regressor + MAE on age."""
    mlc = pytest.importorskip("pyspark.ml.classification")
    mlr = pytest.importorskip("pyspark.ml.regression")
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler

    cohort = all_specs()["q11_diabetes_cohort"].fn(spark, "/root/testdata/sf0.001")
    feats = cohort.select(
        "key",
        F.col("age").cast("double").alias("age"),
        F.col("gender_uk").cast("double").alias("gender_uk"),
        F.col("hypertension").cast("double").alias("hypertension"),
        F.col("obese").cast("double").alias("obese"),
        F.col("type2diabetes").cast("double").alias("label"),
    ).na.fill(0.0)

    # A6: stratified 70/30 split via sampleBy (DiabetesSQL cell 31)
    train = feats.sampleBy("label", fractions={0.0: 0.7, 1.0: 0.7}, seed=42)
    test = feats.join(train.select("key"), "key", "left_anti")
    n_train, n_test = train.count(), test.count()
    assert 0.55 < n_train / (n_train + n_test) < 0.85

    va = VectorAssembler(
        inputCols=["age", "gender_uk", "hypertension", "obese"], outputCol="features"
    )
    tree = mlc.DecisionTreeClassifier(maxDepth=4, seed=42).fit(va.transform(train))
    pred = tree.transform(va.transform(test))
    assert pred.filter(~F.col("prediction").isin(0.0, 1.0)).count() == 0

    # X4 regression + MAE (cells 32/35)
    reg_train = va.transform(train).withColumnRenamed("label", "t2d").withColumn(
        "label", F.col("age")
    )
    rf = mlr.RandomForestRegressor(numTrees=5, maxDepth=3, seed=42).fit(reg_train)
    reg_pred = rf.transform(
        va.transform(test).withColumnRenamed("label", "t2d").withColumn("label", F.col("age"))
    )
    mae = RegressionEvaluator(metricName="mae").evaluate(reg_pred)
    assert mae >= 0.0 and mae == mae  # finite


def test_permutation_importance_identifies_signal_feature(spark):
    """X4 permutation importance (DiabetesSQL cell 36): shifting the
    feature the label depends on must hurt accuracy more than shifting a
    noise feature."""
    mlc = pytest.importorskip("pyspark.ml.classification")
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    from data_engineering_examples_spark.operators.ml import permutation_importance

    # label is a pure function of `signal`; `noise` is independent
    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("signal"),
        ((F.col("id") * 31 % 13)).cast("double").alias("noise"),
        ((F.col("id") % 7) >= 4).cast("double").alias("label"),
    )
    va = VectorAssembler(inputCols=["signal", "noise"], outputCol="features")
    model = mlc.DecisionTreeClassifier(maxDepth=3, seed=7).fit(va.transform(df))
    ev = MulticlassClassificationEvaluator(metricName="accuracy")

    imp = permutation_importance(
        model, df, ["signal", "noise"], va, ev, order_col="id", k=13
    )
    assert imp["signal"] > 0.2           # breaking the signal hurts a lot
    assert imp["signal"] > imp["noise"] + 0.1
    assert abs(imp["noise"]) < 0.1       # noise never mattered


def test_cyclic_shift_rejects_identity_k(spark):
    import pytest

    from data_engineering_examples_spark.operators.ml import cyclic_shift_column

    df = spark.createDataFrame([(i, float(i)) for i in range(4)], "id long, x double")
    with pytest.raises(ValueError, match="no-op"):
        cyclic_shift_column(df, "x", "id", k=4)  # k % n == 0 -> identity
