"""SQL-text interface (plans/sql_text.py): reference-shaped SQL strings
must parse against the registered views + L2 functions and return exactly
what the DataFrame plans return."""

from __future__ import annotations

from data_engineering_examples_spark.plans.registry import all_specs
from data_engineering_examples_spark.plans.sql_text import register_views

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_text_matches_dataframe_plans(spark):
    register_views(spark, SF)

    # q01 as SQL text vs the registered DataFrame plan
    sql_q01 = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df_q01 = all_specs()["q01_pricing_summary"].fn(spark, SF).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert _rows(sql_q01) == _rows(df_q01)


def test_sql_text_fhir_functions_callable(spark):
    register_views(spark, SF)

    # the IRIS `[` contains operator, as users would write it in SQL
    hits = spark.sql(
        "SELECT key FROM conditions WHERE fhir_contains(code, '44054006')"
    ).count()
    assert hits > 0

    # 3-arg IFNULL + piece + age_years, SQL-callable end to end
    row = spark.sql(
        """
        SELECT ifnull3(NULL, 0, 1) AS absent,
               ifnull3('x', 0, 1) AS present,
               piece('a|b|c', '|', 2) AS second,
               age_years(DATE '2000-01-02', current_date()) AS age
        """
    ).collect()[0]
    # ifnull3 coerces branches to a common (string) type over untyped NULL
    assert (str(row.absent), str(row.present), row.second) == ("0", "1", "b")
    assert row.age >= 25

    # FHIRPath UDF from SQL text (the reference's GetFHIRPathOne shape)
    gmp = spark.sql(
        """
        SELECT fhirpath_one(resource_string,
                            'Practitioner.identifier[0].value') AS gmp
        FROM resources WHERE resource_type = 'Practitioner' LIMIT 5
        """
    ).collect()
    assert all(r.gmp for r in gmp)


def test_observe_inline_quality_metrics(spark):
    """df.observe(): data-quality counters collected DURING the job — no
    second pass over the data. The production posture for ingest gates:
    row counts / null counts / domain violations ride along with the
    write and are checked after, instead of re-scanning 100 TB to audit
    what was just written."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_engineering_examples_spark.sources.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", ["events"])["events"]
    obs = Observation("ingest_gate")
    gated = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("null_users"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_values"),
    )
    gated.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["null_users"] == 0 and m["neg_values"] == 0


def test_parameterized_sql_text(spark):
    """spark.sql named-parameter binding: the injection-safe form of the
    reference's hand-concatenated SQL strings (dags build WHERE clauses
    by f-string; parameter markers keep user values out of the parse)."""
    from data_engineering_examples_spark.plans.sql_text import register_views

    register_views(spark, "/root/testdata/sf0.001")
    got = spark.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderpriority = :prio AND o_totalprice > :floor",
        args={"prio": "1-URGENT", "floor": 1000.0},
    ).first()
    expected = spark.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000.0"
    ).first()
    assert got.n == expected.n and got.n > 0
