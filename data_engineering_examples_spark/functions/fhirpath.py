"""FHIRPath subset evaluator — ``GetFHIRPath`` / ``GetFHIRPathOne``
(SURVEY.md §2.7 F3/F4, §7.4 risk #1).

Covers exactly the grammar the reference exercises
(``notebooks/RaceAndEthnicCategorySQL.ipynb`` cells 5/7/9,
``notebooks/DeleteDuplicatesinIRISFHIRServer.ipynb`` cell 0,
``notebooks/DiabetesSQL.ipynb`` cell 12):

* dotted child navigation                      ``Patient.gender``
* extension filter by url (nestable)           ``extension('http://u').extension('text')``
* zero-based indexer                           ``identifier[0].value``
* leading resource-type segment (optional)     ``Patient.…`` — checked
  against the document's ``resourceType``; mismatch → no result.

Collection semantics follow FHIRPath: each step maps over the current
node collection and flattens arrays. ``fhirpath_one`` returns the first
match as a string (IRIS GetFHIRPathOne returns a scalar), ``fhirpath``
returns the JSON array of all matches (IRIS GetFHIRPath).

Execution: Arrow-batched pandas UDFs — the documented slow path (SURVEY
§7.3). Filters written against their output do NOT push down to the
parquet scan: Catalyst treats the UDF as opaque, so place cheap native
predicates (``resource_type = 'Patient'``) *before* the UDF projection —
all queries in ``plans/fhir_queries.py`` do. At 100 TB the UDF runs
scan-local (no shuffle), scaling linearly with executor count.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_SEGMENT = re.compile(
    r"""
    (?P<name>[A-Za-z_][A-Za-z0-9_]*)          # child name
    (?:\(\s*'(?P<arg>[^']*)'\s*\))?           # optional ('url') filter arg
    (?P<idx>(?:\[\d+\])*)                     # optional [n] indexer(s)
    (?:\.|$)                                  # '.' separator or end
    """,
    re.VERBOSE,
)

_RESOURCE_TYPES = {
    "Patient",
    "Observation",
    "Condition",
    "Organization",
    "Practitioner",
    "PractitionerRole",
    "Task",
    "Encounter",
    "Bundle",
    "Composition",
    "QuestionnaireResponse",
    "MessageHeader",
    "OperationOutcome",
    "Parameters",
}


@lru_cache(maxsize=256)
def parse_path(path: str) -> tuple:
    """Parse a FHIRPath subset expression into ((name, arg, (idx,...)), ...).

    Split on '.' is NOT possible naively — extension URLs contain dots —
    so segments are consumed left-to-right with a single anchored regex.
    """
    out = []
    pos = 0
    while pos < len(path):
        m = _SEGMENT.match(path, pos)
        if m is None or m.start() != pos:
            raise ValueError(f"unparseable FHIRPath at offset {pos}: {path!r}")
        idxs = tuple(int(i) for i in re.findall(r"\[(\d+)\]", m.group("idx") or ""))
        out.append((m.group("name"), m.group("arg"), idxs))
        pos = m.end()
    return tuple(out)


def _step(nodes: list, name: str, arg: str | None, idxs: tuple) -> list:
    nxt: list = []
    if name == "extension" and arg is not None:
        # extension('url') — filter the extension array by url equality
        for n in nodes:
            if isinstance(n, dict):
                for ext in n.get("extension") or []:
                    if isinstance(ext, dict) and ext.get("url") == arg:
                        nxt.append(ext)
    else:
        for n in nodes:
            if not isinstance(n, dict):
                continue
            v = n.get(name)
            if v is None:
                continue
            if isinstance(v, list):
                nxt.extend(v)  # FHIRPath flattens collections
            else:
                nxt.append(v)
    for i in idxs:
        nxt = [nxt[i]] if i < len(nxt) else []
    return nxt


def _eval_doc(doc, segments: tuple) -> list:
    """All matches of pre-parsed ``segments`` against a pre-parsed doc."""
    if not isinstance(doc, dict):
        return []
    # optional leading resource-type segment: 'Patient.gender'
    if segments and segments[0][1] is None and not segments[0][2] and segments[0][0] in _RESOURCE_TYPES:
        if doc.get("resourceType") != segments[0][0]:
            return []
        segments = segments[1:]
    nodes = [doc]
    for name, arg, idxs in segments:
        nodes = _step(nodes, name, arg, idxs)
        if not nodes:
            return []
    return nodes


def eval_fhirpath(resource_json: str | None, path: str) -> list:
    """All matches of ``path`` against one resource JSON string."""
    if resource_json is None:
        return []
    try:
        doc = json.loads(resource_json)
    except (ValueError, TypeError):
        return []
    return _eval_doc(doc, parse_path(path))


def eval_fhirpath_one(resource_json: str | None, path: str) -> str | None:
    """First match as a string scalar (GetFHIRPathOne semantics); complex
    nodes are serialized to compact JSON like IRIS returns subtrees."""
    matches = eval_fhirpath(resource_json, path)
    if not matches:
        return None
    v = matches[0]
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def register_fhirpath_udfs(spark: SparkSession) -> None:
    """Register ``fhirpath_one(json, path)`` and ``fhirpath(json, path)``
    as Arrow-batched pandas UDFs (~10-100x a row-at-a-time Python UDF)."""

    @pandas_udf("string")
    def fhirpath_one_udf(js: pd.Series, path: pd.Series) -> pd.Series:
        # path is a literal in every real call — pre-parse once per batch
        paths = path.unique()
        for p in paths:
            parse_path(p)  # warm the lru_cache
        return pd.Series(
            [eval_fhirpath_one(j, p) for j, p in zip(js, path)], dtype="object"
        )

    @pandas_udf("string")
    def fhirpath_udf(js: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [json.dumps(eval_fhirpath(j, p), separators=(",", ":")) for j, p in zip(js, path)],
            dtype="object",
        )

    # NOTE(perf): a combined multi-path UDF returning array<string> (parse
    # the doc once, walk N paths) was tried and measured ~3x SLOWER than N
    # separate fhirpath_one columns: Spark folds all N calls into one
    # ArrowEvalPython node anyway (one Arrow round trip), and flat string
    # columns serialize far cheaper than per-row Python lists.
    spark.udf.register("fhirpath_one", fhirpath_one_udf)
    spark.udf.register("fhirpath", fhirpath_udf)
