"""SQL-text entry point (SURVEY §3.1: "Spark engine equivalent:
spark.sql(query_text) → Catalyst parse → analyze against registered FHIR
views").

``register_views`` publishes every data source as a temp view — the ten
generic tables, the FHIR fixture tables, and the silver projections — so
the full workload is reachable from SQL text exactly as the reference's
users write it (IRIS SQL strings). The L2 function surface
(``fhir_contains``, ``ifnull3``, ``piece``, ``age_years``,
``fhirpath_one``…) is registered SQL-callable by ``functions.register_all``,
so reference-shaped statements like

    SELECT key FROM conditions WHERE fhir_contains(code, '44054006')

parse and run unchanged. ``tests/test_sql_text.py`` asserts SQL-text and
DataFrame plans return identical results for representative queries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..functions import register_all
from ..sources.fhir import FIXTURES_DIR, load_fhir_tables
from ..sources.tables import TABLES, load_tables

FHIR_TABLES = [
    "patients",
    "conditions",
    "observations",
    "observation_value_quantity",
    "organizations",
    "practitioners",
    "practitioner_roles",
    "tasks",
    "compositions",
    "encounter_bundles",
    "media",
    "resources",
]


# session-id -> sf_dir CURRENTLY registered (views are named globals, so
# a different sf_dir must re-register; a set of past keys would wrongly
# skip re-pointing views after an sf switch)
_REGISTERED: dict[int, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create temp views for every table + register the L2 functions.

    Fails fast with the missing names if any fixture is absent —
    ``load_fhir_tables`` silently drops missing files, which would
    otherwise surface much later as a confusing TABLE_OR_VIEW_NOT_FOUND
    inside user SQL.

    Memoized per (session, sf_dir): each registration eagerly reads ~20
    parquet footers for view schemas — a fixed ~2 s that an interactive
    SQL session should pay once, not on every statement. Views registered
    here point at immutable fixture/testdata files, so re-registration
    has nothing to refresh."""
    if _REGISTERED.get(id(spark)) == sf_dir:
        return
    register_all(spark)
    registered: set[str] = set()
    for name, df in load_tables(spark, sf_dir, TABLES).items():
        df.createOrReplaceTempView(name)
        registered.add(name)
    for name, df in load_fhir_tables(spark, FHIR_TABLES).items():
        df.createOrReplaceTempView(name)
        registered.add(name)
    missing = (set(TABLES) | set(FHIR_TABLES)) - registered
    if missing:
        raise FileNotFoundError(
            f"fixtures missing for views: {sorted(missing)} (fixtures dir: {FIXTURES_DIR})"
        )
    _REGISTERED[id(spark)] = sf_dir
