"""L4/L6 — workflow + distribution queries (SURVEY §2 S4, T4, A5, P8).

* **q36** — the FHIR REST task poll as a compiled search-param dict
  (``search/params.py``; reference params at
  ``dags/ConsultationNoteWritebackX.py:63-68``): filters push to the
  scan, `_sort`+`_count` become TakeOrderedAndProject.
* **q39** — the branch-task routing decision (T4/P8,
  ``dags/ConsultationNoteWritebackX.py:401-411``: version runaway,
  already-completed, PROCEED) as a per-row tag column — the set-based
  form of Airflow's ``@task.branch``.
* **q40** — per-group value distribution (A5; the reference's
  ``groupby('gender').AGE.plot(kind='kde')`` cells) via exact
  ``percentile`` — interpolation parity with DuckDB ``quantile_cont``
  verified bit-exact. At scale: one partial+final agg shuffle, the
  percentile state is per-group sorted digests, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..search.params import compile_search
from ..sources.fhir import FIXTURES_DIR
from ..sources.tables import load_tables
from .registry import register

FX = FIXTURES_DIR

_POLL_PARAMS = {
    "_sort": "-authored-on",
    "authored-on": "gt2025-07-01",
    "_count": "5",
    "status": "accepted",
}


@register(
    "q36_task_search",
    oracle=f"""
    SELECT id, status, authored_on, version_id
    FROM read_parquet('{FX}/tasks.parquet')
    WHERE status = 'accepted' AND authored_on > TIMESTAMP '2025-07-01 00:00:00'
    ORDER BY authored_on DESC, id LIMIT 5
    """,
    doc="FHIR search params compiled to filter+sort+limit (S4)",
    tags=("workflow", "S4", "W1"),
)
def q36_task_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    tasks = load_tables(spark, FX, ["tasks"])["tasks"]
    hits = compile_search(tasks, _POLL_PARAMS)
    return hits.select("id", "status", "authored_on", "version_id")


@register(
    "q39_task_branching",
    oracle=f"""
    SELECT id, status, version_id,
      CASE WHEN version_id > 1000 THEN 'SKIP_RUNAWAY'
           WHEN status = 'completed' THEN 'SKIP_COMPLETED'
           WHEN status = 'accepted'
                AND authored_on > TIMESTAMP '2025-07-01 00:00:00' THEN 'PROCEED'
           ELSE 'SKIP_OTHER' END AS branch
    FROM read_parquet('{FX}/tasks.parquet')
    """,
    doc="branch-task routing as a per-row tag (T4/P8)",
    tags=("workflow", "T4", "P8"),
)
def q39_task_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    tasks = load_tables(spark, FX, ["tasks"])["tasks"]
    branch = (
        F.when(tasks.version_id > 1000, "SKIP_RUNAWAY")
        .when(tasks.status == "completed", "SKIP_COMPLETED")
        .when(
            (tasks.status == "accepted")
            & (tasks.authored_on > F.lit("2025-07-01").cast("timestamp_ntz")),
            "PROCEED",
        )
        .otherwise("SKIP_OTHER")
    )
    return tasks.select("id", "status", "version_id", branch.alias("branch"))


@register(
    "q40_event_value_distribution",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           quantile_cont(value, [0.25, 0.5, 0.75, 0.9]) AS percentiles,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    doc="per-group distribution via exact percentiles (A5)",
    tags=("agg", "A5"),
)
def q40_event_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", [0.25, 0.5, 0.75, 0.9]).alias("percentiles"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# q46/q47 — the two workflow document UDF stages as registry entries
# (X2/X3; U5/U6). Recursive JSON restructuring is not SQL-expressible —
# the driver records its weaker rows-only check here; exact-shape
# verification lives in tests/test_streaming_workflow.py. The message
# uuid is DERIVED (md5 of the encounter identifier), not random: replays
# mint the same identity (T2 idempotence; F17 notes uuid() exists for
# when global uniqueness is the requirement).


@register(
    "q46_legacy_qr_batch",
    oracle=None,  # recursive JSON restructure (U5): rows-only + pytest
    doc="legacy QuestionnaireResponse conversion over bundle QR entries (X2/U5)",
    tags=("workflow", "U5", "X2"),
)
def q46_legacy_qr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.documents import register_document_udfs

    register_document_udfs(spark)
    b = load_tables(spark, FX, ["encounter_bundles"])["encounter_bundles"]
    # the QR sits at a fixed entry position in the collection bundles
    # (gen_fixtures emits Patient, Encounter, Observation, QR)
    qr = F.get_json_object("bundle_json", "$.entry[3].resource")
    return b.select(
        "encounter_identifier",
        F.call_udf("legacy_qr_convert", qr).alias("converted_qr"),
    ).filter(F.col("converted_qr").isNotNull())


@register(
    "q47_bundle_to_message",
    oracle=None,  # whole-document assembly (U6): rows-only + pytest
    doc="collection Bundle -> FHIR message with A04 MessageHeader (X3/U6)",
    tags=("workflow", "U6", "X3", "F17"),
)
def q47_bundle_to_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.documents import register_document_udfs

    register_document_udfs(spark)
    b = load_tables(spark, FX, ["encounter_bundles"])["encounter_bundles"]
    # replay-stable message identity: derived, not minted per run
    msg_uuid = F.md5(F.col("encounter_identifier"))
    return b.select(
        "encounter_identifier",
        F.call_udf("bundle_to_message", F.col("bundle_json"), msg_uuid).alias("message_json"),
    )
