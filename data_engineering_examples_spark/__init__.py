"""PySpark-native analytics engine re-expressing the capabilities of
Virtually-Healthcare/data-engineering-examples (reference read-only at
/root/reference) on Spark DataFrames / Spark SQL / Structured Streaming.

Layers (SURVEY.md §7.1):
  L0 session        -> .session
  L1 bronze/sources -> .sources (generic tables, FHIR store, ODS CSV,
                       physical layout: partitioned/bucketed, compaction)
  L2 functions      -> .functions (IRIS SQL fns, FHIRPath, doc transforms)
  L3 silver views   -> .fhir.views (bronze -> search projections)
  L4 queries        -> .plans (67 registered, DuckDB-oracle-checked)
  L5 ETL            -> .operators (merge changesets, skew-robust joins),
                       .sources.ods, .sinks.external
  L6 streaming      -> .streaming.tasks (poll, state machine, stateful
                       operators, bounded-state dedup, watermark)
  search façade     -> .search.params (FHIR search dict -> plan)
"""

__version__ = "0.1.0"
