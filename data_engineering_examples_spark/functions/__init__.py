"""L2 — custom function surface (SURVEY.md §2.7, §7.1 L2).

Re-expresses the reference's IRIS SQL built-ins and pandas idioms as
Spark-native functions. Everything here except the FHIRPath UDFs is a pure
Column expression — inlined by Catalyst, eligible for codegen, and (for
deterministic comparisons against literals) pushdown-friendly. Each is also
registered as a SQL scalar UDF (``CREATE TEMPORARY FUNCTION ... RETURN``)
so the ``spark.sql`` text surface matches the reference's embedded-SQL
style (e.g. ``notebooks/DiabetesSQL.ipynb`` cell 3).

Function ↔ reference mapping:

* ``fhir_contains``  — IRIS contains operator ``[`` (P3;
  ``notebooks/DiabetesSQL.ipynb`` cell 3 uses ``code [ '44054006'`` 4x;
  ``dags/ODSImport.py:122``). IRIS ``A [ B`` is a case-sensitive substring
  test, applied to comma/pipe-delimited multi-value index columns.
* ``ifnull3``        — IRIS 3-arg ``IFNULL(a,b,c)`` = ``a IS NULL ? b : c``
  (F8; presence flags ``IFNULL(x._id,0,1)`` in the same cell).
* ``isnull2``        — IRIS 2-arg ``IsNull`` = coalesce (F10;
  ``dags/ODSImport.py:122``).
* ``piece``          — IRIS ``$piece(s,d,n)``, 1-based, '' when absent
  (F5; ``OlderExamples/SQLConnections.ipynb`` cell 6).
* ``age_years``      — IRIS ``DATEDIFF('year', birthdate, now)`` counts
  calendar-year boundaries, i.e. ``year(b) - year(a)`` — NOT
  floor(months/12) (F6; ``notebooks/DiabetesSQL.ipynb`` cell 3).
* ``yyyymmdd_to_date`` — compact NHS-ODS date ints ``YYYYMMDD`` → DATE
  (F14; ``dags/ODSImport.py:573-580`` reslices by substring).
* ``fhirpath_one`` / ``fhirpath`` — ``GetFHIRPathOne``/``GetFHIRPath``
  (F3/F4), the only non-expression functions; see ``fhirpath.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "fhir_contains",
    "ifnull3",
    "isnull2",
    "piece",
    "age_years",
    "yyyymmdd_to_date",
    "register_all",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fhir_contains(col: Column | str, value: str) -> Column:
    """IRIS contains operator ``[``: case-sensitive substring match against
    a (possibly comma/pipe-delimited multi-value) string column.

    NULL column → false (IRIS WHERE semantics: unknown never selects).
    At scale this is a scan-local predicate — no shuffle, and Catalyst
    evaluates it inside whole-stage codegen via ``Contains``.
    """
    return _col(col).contains(value)


def ifnull3(a: Column | str, b: Column, c: Column) -> Column:
    """IRIS 3-arg ``IFNULL(a,b,c)``: ``a IS NULL ? b : c`` (not coalesce)."""
    a = _col(a)
    return F.when(a.isNull(), b).otherwise(c)


def isnull2(a: Column | str, b: Column | str) -> Column:
    """IRIS 2-arg ``IsNull(a,b)`` = ``coalesce(a,b)``."""
    return F.coalesce(_col(a), _col(b) if isinstance(b, str) else b)


def piece(s: Column | str, delim: str, n: int | Column) -> Column:
    """IRIS ``$piece(s, delim, n)``: n-th (1-based) piece of a delimited
    string; '' when the piece does not exist (IRIS returns empty string,
    not NULL). ``delim`` is a literal, not a regex — quoted with \\Q..\\E
    before hitting Spark's regex-based ``split``."""
    quoted = "\\Q" + delim + "\\E"
    idx = F.lit(n - 1) if isinstance(n, int) else (n - F.lit(1))
    # F.get (not getItem): out-of-range -> NULL instead of an ANSI-mode error
    got = F.get(F.split(_col(s), quoted), idx)
    return F.coalesce(got, F.lit(""))


def age_years(birthdate: Column | str, asof: Column | None = None) -> Column:
    """IRIS ``DATEDIFF('year', birthdate, asof)``: calendar-year boundary
    count = ``year(asof) - year(birthdate)`` (a person born 1999-12-31 is
    "1" on 2000-01-01). Distinct from Spark's ``floor(months_between/12)``."""
    asof_col = F.current_date() if asof is None else asof
    return (F.year(asof_col) - F.year(_col(birthdate))).cast("int")


def yyyymmdd_to_date(s: Column | str) -> Column:
    """NHS-ODS compact date (``YYYYMMDD`` int or string) → DATE; NULL in →
    NULL out. Mirrors the reference's substring reslice
    (``dags/ODSImport.py:573-575``) without string surgery."""
    return F.to_date(_col(s).cast("string"), "yyyyMMdd")


# ---------------------------------------------------------------------------
# SQL registration — the spark.sql text surface.

_SQL_UDFS = [
    # IRIS `[` : substring contains. contains() is null-safe-ish: null -> null,
    # which a WHERE treats as false, matching IRIS.
    """CREATE OR REPLACE TEMPORARY FUNCTION fhir_contains(col STRING, v STRING)
       RETURNS BOOLEAN RETURN contains(col, v)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION ifnull3(a STRING, b STRING, c STRING)
       RETURNS STRING RETURN CASE WHEN a IS NULL THEN b ELSE c END""",
    # numeric variant used for presence flags IFNULL(x._id, 0, 1)
    """CREATE OR REPLACE TEMPORARY FUNCTION ifnull3_int(a STRING, b INT, c INT)
       RETURNS INT RETURN CASE WHEN a IS NULL THEN b ELSE c END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION isnull2(a STRING, b STRING)
       RETURNS STRING RETURN coalesce(a, b)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION piece(s STRING, d STRING, n INT)
       RETURNS STRING RETURN coalesce(get(split(s, concat('\\\\Q', d, '\\\\E')), n-1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION age_years(birthdate DATE, asof DATE)
       RETURNS INT RETURN year(asof) - year(birthdate)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION yyyymmdd_to_date(s STRING)
       RETURNS DATE RETURN to_date(s, 'yyyyMMdd')""",
]


def register_all(spark: SparkSession) -> None:
    """Register the whole L2 surface on a session: SQL scalar UDFs
    (Catalyst-inlined — they cost nothing at run time) plus the FHIRPath
    pandas UDFs (Arrow-batched Python; the one deliberate slow path,
    documented no-pushdown in ``fhirpath.py``)."""
    for ddl in _SQL_UDFS:
        spark.sql(ddl)
    from .fhirpath import register_fhirpath_udfs

    register_fhirpath_udfs(spark)
