"""FHIR REST search-param → DataFrame-plan compiler (SURVEY §2 S4, §3.2).

The reference queries the FHIR server with parameter dicts
(``{'_sort': '-authored-on', 'authored-on': 'gt2025-07-01', '_count': '5',
'status': 'accepted'}`` — ``dags/ConsultationNoteWritebackX.py:65-68``;
``{'patient': id, 'code': loinc}`` — ``notebooks/VitalSignsREST.ipynb``
cell 3) and lets the server translate them to its search index. Here the
same dict compiles onto the silver projection DataFrame:

* plain param            → equality, or token-contains for multi-value
                           index columns (``identifier``, ``code``, ``type``)
* value prefixes         → ``gt/ge/lt/le/ne`` comparisons (FHIR date math)
* comma in value         → OR across the alternatives
* ``_sort``              → ``orderBy`` (``-`` prefix = desc), with a
                           deterministic id tie-break appended
* ``_count``             → ``limit`` (top-k, TakeOrderedAndProject)

Everything lands in the WHERE/ORDER/LIMIT of one declarative plan, so
Catalyst pushes the filters to the scan — the REST front-end becomes a
thin façade over the same engine.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# columns that hold comma/pipe-delimited multi-value search index entries
# (SURVEY §1.1) — FHIR token search = element membership → contains
TOKEN_COLUMNS = {"identifier", "code", "type"}

_PREFIX_OPS = {
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "ne": lambda c, v: c != v,
}


def _one_predicate(df: DataFrame, col_name: str, value: str) -> Column:
    col = df[col_name]
    prefix = value[:2]
    if prefix in _PREFIX_OPS and len(value) > 2:
        lit: Column = F.lit(value[2:])
        # date/timestamp params compare on the column's own type
        dt = dict(df.dtypes)[col_name]
        if dt.startswith(("timestamp", "date")):
            lit = lit.cast(dt)
        return _PREFIX_OPS[prefix](col, lit)
    if col_name in TOKEN_COLUMNS:
        return col.contains(value)  # IRIS `[` over the delimited index col
    return col == value


def compile_search(df: DataFrame, params: dict, field_map: dict | None = None) -> DataFrame:
    """Compile a FHIR search-param dict into filter+sort+limit over ``df``.
    ``field_map`` renames REST params to DataFrame columns (defaults to
    dash→underscore)."""
    field_map = field_map or {}

    def to_col(p: str) -> str:
        return field_map.get(p, p.replace("-", "_"))

    out = df
    for param, value in params.items():
        if param.startswith("_"):
            continue
        alts = [
            _one_predicate(out, to_col(param), v) for v in str(value).split(",")
        ]
        out = out.filter(functools.reduce(lambda a, b: a | b, alts))

    if "_sort" in params:
        keys = []
        for k in str(params["_sort"]).split(","):
            k = k.strip()
            keys.append(
                F.desc(to_col(k[1:])) if k.startswith("-") else F.asc(to_col(k))
            )
        # deterministic tie-break so _count pagination is stable
        if "id" in out.columns:
            keys.append(F.asc("id"))
        out = out.orderBy(*keys)

    if "_count" in params:
        out = out.limit(int(params["_count"]))
    return out
