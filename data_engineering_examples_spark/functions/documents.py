"""Document-level transforms for the writeback workflow (SURVEY §2 U5, U6,
U8, §2.10 X2/X3).

* ``legacy_qr_convert`` — ``LegacyQuestionnaireResponseConversion``
  (``dags/ConsultationNoteWritebackX.py:336-399``): restructures a legacy
  flat QuestionnaireResponse into the nested Comments-and-advice /
  Problem-list shape. Recursive array surgery over arbitrary JSON — the
  one place SURVEY §2.8 concedes a Python UDF (higher-order functions
  can't build this shape); exposed as an Arrow-batched pandas UDF.
* ``bundle_to_message`` — ``convert_to_HL7_FHIR_Message_A04``
  (``dags/ConsultationNoteWritebackX.py:546-601``): collection Bundle →
  FHIR message: type='message', urn:uuid identifier, MessageHeader (event
  A04) prepended whose focus[] references every Encounter entry's
  fullUrl. The message uuid is an ARGUMENT (column), not generated
  inside, so runs are replayable/idempotent — at-least-once delivery
  must not mint a new identity per retry (T2).
* ``operation_outcome_failed`` — OperationOutcome triage
  (``dags/ConsultationNoteWritebackX.py:434-468``): pure Column
  expression — an error-severity issue fails validation unless its
  details.text carries the allowlisted code.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

CMP_QUESTIONNAIRE = "https://fhir.virtually.healthcare/Questionnaire/ClinicalManagementPlan"
ALLOWLISTED_ERROR_CODE = "307321000000107"
_PROBLEM_SUBITEMS = {
    "problemStatus",
    "problemSignificance",
    "problemType",
    "problemExpectedDuration",
}


def convert_legacy_qr(qr_json: str | None) -> str | None:
    """Pure-python core of U5 (unit-testable without Spark). Mirrors the
    reference's restructuring: flat Q&A items → nested under
    LOINC/61149-1; linkId-less problem sub-items → problem list under
    LOINC/11450-4."""
    if qr_json is None:
        return None
    try:
        qr = json.loads(qr_json)
    except ValueError:
        return None

    new_qr = {k: v for k, v in qr.items() if k != "item"}
    new_qr["questionnaire"] = CMP_QUESTIONNAIRE
    comments = {"linkId": "LOINC/61149-1", "text": "Comments and advice", "item": []}
    new_qr["item"] = [comments]
    problems = {"linkId": "LOINC/11450-4", "text": "Problem list", "item": []}
    problems_found = False

    for item in qr.get("item", []):
        if "answer" in item:
            text = item.get("text", item.get("linkId"))
            comments["item"].append(
                {
                    "linkId": "questions",
                    "item": [
                        {"linkId": "question", "answer": [{"valueString": text}]},
                        {"linkId": "answer", "answer": list(item["answer"])},
                    ],
                }
            )
        if "item" in item:
            problem = {"linkId": "problem", "text": "Problem", "item": []}
            problem_found = False
            for problemitem in item.get("item", []):
                if "linkId" not in problemitem:
                    problem["item"].append(
                        {
                            "linkId": "problemCode",
                            "text": "Problem Code",
                            "answer": problemitem.get("answer", []),
                        }
                    )
                if "item" in problemitem:
                    for subitem in problemitem.get("item", []):
                        if subitem.get("linkId") in _PROBLEM_SUBITEMS:
                            problem["item"].append(subitem)
                            problem_found = True
            if problem_found:
                problems["item"].append(problem)
                problems_found = True

    if problems_found:
        new_qr["item"].append(problems)
    return json.dumps(new_qr, separators=(",", ":"))


def convert_bundle_to_message(
    bundle_json: str | None,
    msg_uuid: str,
    sender_ods: str = "F83004",
    endpoint: str = "https://example.invalid/emis",
) -> str | None:
    """Pure-python core of U6. ``msg_uuid`` is supplied by the caller."""
    if bundle_json is None:
        return None
    try:
        bundle = json.loads(bundle_json)
    except ValueError:
        return None

    bundle["type"] = "message"
    bundle["identifier"] = {"system": "urn:ietf:rfc:3986", "value": f"urn:uuid:{msg_uuid}"}
    header = {
        "resourceType": "MessageHeader",
        "eventCoding": {
            "system": "http://terminology.hl7.org/CodeSystem/v2-0003",
            "code": "A04",
        },
        "destination": [
            {
                "endpoint": endpoint,
                "receiver": {
                    "identifier": {
                        "system": "https://fhir.nhs.uk/Id/ods-organization-code",
                        "value": sender_ods,
                    }
                },
            }
        ],
        "sender": {
            "identifier": {
                "system": "https://fhir.nhs.uk/Id/ods-organization-code",
                "value": sender_ods,
            }
        },
        "source": {"endpoint": endpoint},
        "focus": [
            {"reference": e["fullUrl"], "type": "Encounter"}
            for e in bundle.get("entry", [])
            if e.get("resource", {}).get("resourceType") == "Encounter"
        ],
    }
    bundle.setdefault("entry", []).insert(
        0, {"fullUrl": f"urn:uuid:{msg_uuid}", "resource": header}
    )
    return json.dumps(bundle, separators=(",", ":"))


_OUTCOME_ISSUES = T.ArrayType(
    T.StructType(
        [
            T.StructField("severity", T.StringType()),
            T.StructField(
                "details", T.StructType([T.StructField("text", T.StringType())])
            ),
        ]
    )
)


def operation_outcome_failed(outcome_json: Column | str) -> Column:
    """U8 triage as a pure expression: TRUE iff any issue has
    severity='error' whose details.text does NOT contain the allowlisted
    code (``dags/ConsultationNoteWritebackX.py:434-468``). Warnings never
    fail."""
    col = F.col(outcome_json) if isinstance(outcome_json, str) else outcome_json
    issues = F.from_json(F.get_json_object(col, "$.issue"), _OUTCOME_ISSUES)
    return F.exists(
        issues,
        lambda i: (i.severity == "error")
        & ~F.coalesce(i.details.text, F.lit("")).contains(ALLOWLISTED_ERROR_CODE),
    )


def register_document_udfs(spark: SparkSession) -> None:
    """Arrow-batched pandas UDFs: ``legacy_qr_convert(json)`` and
    ``bundle_to_message(json, uuid)``."""

    @pandas_udf("string")
    def legacy_qr_convert_udf(js: pd.Series) -> pd.Series:
        return js.map(convert_legacy_qr)

    @pandas_udf("string")
    def bundle_to_message_udf(js: pd.Series, uid: pd.Series) -> pd.Series:
        return pd.Series(
            [convert_bundle_to_message(j, u) for j, u in zip(js, uid)], dtype="object"
        )

    spark.udf.register("legacy_qr_convert", legacy_qr_convert_udf)
    spark.udf.register("bundle_to_message", bundle_to_message_udf)
