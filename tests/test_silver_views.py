"""Bronze→silver derivation consistency (L3): the views derived from the
bronze resource store must agree with the pre-projected fixture tables on
every shared column — i.e. silver is a pure function of bronze.

(Fixture quirks documented where the encodings intentionally differ:
organization/practitioner fixture `identifier` columns carry extra
synthetic entries not present in the JSON; observation fixture
`date_start`/`unit` use display encodings.)
"""

from __future__ import annotations

from data_engineering_examples_spark.fhir import views
from data_engineering_examples_spark.sources.fhir import load_fhir_tables


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_patient_view_matches_fixture(spark):
    t = load_fhir_tables(spark, ["resources", "patients"])
    derived = views.patient_view(t["resources"])
    cols = ["_id", "key", "identifier", "birthdate", "gender", "address_country", "_last_updated"]
    assert _rows(derived, cols) == _rows(t["patients"], cols)


def test_condition_view_matches_fixture(spark):
    t = load_fhir_tables(spark, ["resources", "conditions"])
    derived = views.condition_view(t["resources"])
    cols = ["_id", "key", "patient", "code", "onset_date_start"]
    assert _rows(derived, cols) == _rows(t["conditions"], cols)


def test_observation_views_match_fixture_subset(spark):
    # bronze holds every 5th observation (gen_fixtures keeps resources.parquet
    # small); compare on the intersection by key
    t = load_fhir_tables(spark, ["resources", "observations"])
    derived = views.observation_view(t["resources"])
    fixture = t["observations"].join(derived.select("key"), "key", "left_semi")
    cols = ["_id", "key", "patient", "code", "vq_value", "vq_unit"]
    assert derived.count() > 0
    assert _rows(derived, cols) == _rows(fixture, cols)

    child = views.observation_value_quantity_view(t["resources"])
    assert child.count() == derived.count()


def test_org_practitioner_task_views_project(spark):
    t = load_fhir_tables(spark, ["resources", "organizations", "practitioners", "tasks"])
    org = views.organization_view(t["resources"])
    cols = ["_id", "key", "type", "address_country", "_last_updated", "resource_string"]
    assert _rows(org, cols) == _rows(t["organizations"], cols)

    prac = views.practitioner_view(t["resources"])
    pc = ["_id", "key", "_last_updated", "resource_string"]
    assert _rows(prac, pc) == _rows(t["practitioners"], pc)

    task = views.task_view(t["resources"])
    tc = ["id", "status", "version_id", "focus_identifier_system", "focus_identifier_value"]
    assert _rows(task, tc) == _rows(t["tasks"], tc)
