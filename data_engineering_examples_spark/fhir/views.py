"""L3 — silver search-projection views derived from the bronze resource
store (SURVEY §1.1, §7.1 L3).

The reference's ``HSFHIR_X0001_S.<ResourceType>`` tables are the FHIR
server's search index: one row per resource, one column per search
parameter, maintained by the server as documents arrive. Here each view
is a *derivation*: filter bronze on ``resource_type`` (partition pruning
at scale) + JSON field extraction with ``get_json_object`` — JVM-side,
codegen, no Python.

Multi-value search columns (``identifier``, ``code``) reproduce the IRIS
index encoding exactly — comma-joined ``sys|val`` entries /
``code,sys|code,sys|`` — so the IRIS contains operator ``[``
(``fhir_contains``) behaves identically over derived and server-built
projections (evidence for the encoding:
``OlderExamples/SQLConnections.ipynb`` cell 3 output;
``dags/ODSImport.py:129-134`` parses the same shape back).

At 100 TB these views are materialized incrementally (foreachBatch over
the bronze ingest stream writing partitioned parquet/Delta), but the
DERIVATION is this same expression set either way; tests assert the
derived views are row-identical to the fixture projections, i.e. bronze
and silver agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_IDENT_ARR = T.ArrayType(
    T.StructType(
        [T.StructField("system", T.StringType()), T.StructField("value", T.StringType())]
    )
)
_CODING = T.StructType(
    [
        T.StructField(
            "coding",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("system", T.StringType()),
                        T.StructField("code", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def _rs(path: str) -> Column:
    return F.get_json_object("resource_string", path)


def _identifier_index(js: Column | str = "resource_string") -> Column:
    """identifier[] → the IRIS multi-value index encoding
    ``sys|val,sys|val``."""
    col = F.col(js) if isinstance(js, str) else js
    idents = F.from_json(F.get_json_object(col, "$.identifier"), _IDENT_ARR)
    return F.array_join(
        F.transform(idents, lambda i: F.concat_ws("|", i.system, i.value)), ","
    )


def _code_index(path: str = "$.code") -> Column:
    """code.coding[] → ``code,sys|code,sys|`` (duplicated-delimited form
    seen in SQLConnections cell 3 output)."""
    parsed = F.from_json(_rs(path), _CODING)
    first = F.get(parsed.getField("coding"), 0)
    return F.when(
        first.isNotNull(),
        F.concat_ws(
            "",
            first.getField("code"),
            F.lit(","),
            first.getField("system"),
            F.lit("|"),
            first.getField("code"),
            F.lit(","),
            first.getField("system"),
            F.lit("|"),
        ),
    )


def _of_type(resources: DataFrame, rtype: str) -> DataFrame:
    return resources.filter(resources.resource_type == rtype)


def patient_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S.Patient analog (notebooks/DiabetesSQL.ipynb cell 3)."""
    p = _of_type(resources, "Patient")
    return p.select(
        _rs("$.id").alias("_id"),
        F.col("key"),
        _identifier_index().alias("identifier"),
        F.to_date(_rs("$.birthDate")).alias("birthdate"),
        _rs("$.gender").alias("gender"),
        _rs("$.address[0].country").alias("address_country"),
        F.col("last_updated").alias("_last_updated"),
        F.col("resource_string"),
    )


def condition_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S.Condition analog (same cell: patient FK + code index
    + onsetDateStart)."""
    c = _of_type(resources, "Condition")
    return c.select(
        _rs("$.id").alias("_id"),
        F.col("key"),
        _rs("$.subject.reference").alias("patient"),
        _code_index().alias("code"),
        _rs("$.onsetDateTime").alias("onset_date_start"),
    )


def observation_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S.Observation analog (SQLConnections cell 3)."""
    o = _of_type(resources, "Observation")
    return o.select(
        _rs("$.id").alias("_id"),
        F.col("key"),
        _rs("$.subject.reference").alias("patient"),
        _code_index().alias("code"),
        _rs("$.effectiveDateTime").alias("date_start"),
        _rs("$.valueQuantity.value").cast("double").alias("vq_value"),
        _rs("$.valueQuantity.unit").alias("vq_unit"),
    )


def observation_value_quantity_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S_Observation.valueQuantity child table analog
    (DiabetesSQL cell 23): the repeating-element child view keyed back to
    the parent (J4)."""
    o = _of_type(resources, "Observation")
    return o.select(
        F.col("key"),
        _rs("$.valueQuantity.value").cast("double").alias("value"),
        _rs("$.valueQuantity.unit").alias("unit"),
    ).filter(F.col("value").isNotNull())


def organization_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S.Organization analog (dags/ODSImport.py:119-123)."""
    o = _of_type(resources, "Organization")
    first_type = F.get(
        F.from_json(_rs("$.type"), T.ArrayType(_CODING)), 0
    ).getField("coding")
    t0 = F.get(first_type, 0)
    type_index = F.when(
        t0.isNotNull(),
        F.concat_ws(
            "",
            t0.getField("system"), F.lit("|"), t0.getField("code"),
            F.lit(","), t0.getField("system"), F.lit("|"),
        ),
    )
    return o.select(
        _rs("$.id").alias("_id"),
        F.col("key"),
        _identifier_index().alias("identifier"),
        type_index.alias("type"),
        _rs("$.address[0].country").alias("address_country"),
        F.col("last_updated").alias("_last_updated"),
        F.col("resource_string"),
    )


def practitioner_view(resources: DataFrame) -> DataFrame:
    """HSFHIR_X0001_S.Practitioner analog (dags/ODSImport.py:356-360)."""
    p = _of_type(resources, "Practitioner")
    return p.select(
        _rs("$.id").alias("_id"),
        F.col("key"),
        _identifier_index().alias("identifier"),
        F.col("last_updated").alias("_last_updated"),
        F.col("resource_string"),
    )


def task_view(resources: DataFrame) -> DataFrame:
    """Task queue projection (dags/ConsultationNoteWritebackX.py:63-96)."""
    t = _of_type(resources, "Task")
    return t.select(
        _rs("$.id").alias("id"),
        _rs("$.status").alias("status"),
        F.to_timestamp(_rs("$.authoredOn")).alias("authored_on"),
        _rs("$.meta.versionId").cast("int").alias("version_id"),
        _rs("$.focus.identifier.system").alias("focus_identifier_system"),
        _rs("$.focus.identifier.value").alias("focus_identifier_value"),
        F.col("resource_string"),
    )
