"""PySpark-native analytics engine re-expressing the capabilities of
Virtually-Healthcare/data-engineering-examples (reference read-only at
/root/reference) on Spark DataFrames / Spark SQL / Structured Streaming.

Layers (SURVEY.md §7.1):
  L0 session       -> .session
  L1 bronze/source -> .sources
  L2 functions     -> .functions
  L3 silver views  -> .fhir.views
  L4 queries       -> .plans
  L5 ETL           -> .operators.merge, .sources.ods
  L6 streaming     -> .streaming
"""

__version__ = "0.1.0"
