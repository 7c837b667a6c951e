"""Transactional-shaped merge sink interface (SURVEY §2.1 S6-S8).

The reference applies creates/updates/deletes one HTTP call at a time
(``dags/ODSImport.py:237-305``, ``:609-659``); ``operators/merge.py``
re-expresses the semantics as a set-based changeset (insert / update /
delete / noop per business key). This module is the WRITER seam those
changesets flow through: one interface, two implementations —

* :class:`ParquetSwapMergeWriter` — the sandbox/plain-filesystem impl:
  ``apply_changeset`` rebuilds the table and ``swap_write`` replaces the
  live directory with the crash-recoverable rename swap. Honest limit:
  readers can observe the instant between the two renames.
* :class:`DeltaMergeWriter` — the transactional impl: compiles the same
  changeset to a single ``MERGE INTO`` statement. Verb mapping:

  ====================  ==============================================
  changeset ``action``  Delta ``MERGE INTO`` clause
  ====================  ==============================================
  ``insert`` (S6)       ``WHEN NOT MATCHED THEN INSERT (cols…)``
  ``update`` (S7)       ``WHEN MATCHED AND s.action = 'update'
                        THEN UPDATE SET col = s.incoming.col …``
  ``delete`` (S8)       ``WHEN MATCHED AND s.action = 'delete'
                        THEN DELETE``
  ``noop``              filtered out of the source frame (never ships)
  ====================  ==============================================

  SQL generation is dependency-free (unit-tested in this sandbox);
  EXECUTION needs the delta-spark package on the session, so ``merge``
  raises a clear error when the catalog lacks Delta support. A future
  Iceberg writer drops into the same seam — ``MERGE INTO`` is ANSI.

Scale: either impl shuffles once on the business key (the changeset
join); Delta additionally prunes touched files by the key's min/max
stats, so a merge over 100 TB rewrites only the files holding matched
keys instead of the whole table — the reason the interface exists.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import ACTION, apply_changeset


class MergeWriter(ABC):
    """Applies an ``operators.merge.changeset`` frame to a target table."""

    @abstractmethod
    def read(self) -> DataFrame:
        """Current table contents (lazy)."""

    @abstractmethod
    def merge(self, changes: DataFrame, key: list[str] | str) -> None:
        """Apply insert/update/delete actions of ``changes`` to the target."""


class ParquetSwapMergeWriter(MergeWriter):
    """Plain-parquet target: changeset algebra + rename-swap rewrite.

    ``apply_changeset`` derives the post-merge table while the live
    directory is still readable; ``swap_write`` materializes it to a
    side dir and swaps. Crash at any point is recoverable
    (``sources/layout.py:recover_swap``, exercised by the chaos tests in
    ``tests/test_storage_layout.py``)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        from ..sources.layout import recover_swap

        recover_swap(self.path)
        return self.spark.read.parquet(self.path)

    def merge(self, changes: DataFrame, key: list[str] | str) -> None:
        from ..sources.layout import swap_write

        swap_write(apply_changeset(self.read(), changes, key), self.path)

    def merge_incoming(
        self,
        incoming: DataFrame,
        key: list[str] | str,
        evolve_schema: bool = False,
        full_sync: bool = True,
    ) -> None:
        """Derive the changeset AND apply it in one step.

        ``full_sync`` (default) treats ``incoming`` as a complete
        snapshot: keys absent from it are DELETED from the target — the
        ODS-import semantics (the master file IS the world). Pass
        ``full_sync=False`` for an INCREMENTAL feed (a micro-batch, a
        CDC slice, an aggregation delta): absent keys are left alone and
        only insert/update actions apply. On Delta the distinction is
        exactly whether the ``WHEN MATCHED ... THEN DELETE`` clause is
        compiled (see :meth:`DeltaMergeWriter.merge_sql`). Conflating
        the two corrupts either way — a snapshot merged as an upsert
        resurrects deleted rows; a delta merged as a snapshot wipes
        everything it didn't mention.

        With ``evolve_schema`` the target first gains any columns the
        incoming frame carries that it lacks (existing rows
        null-backfilled) — the plain-parquet analog of Delta's
        ``mergeSchema`` on MERGE. The evolution must precede changeset
        derivation: only then does the new column join the compared set,
        so a row whose only change is the new column's value classifies
        as an update, not a noop. Off by default: silent widening hides
        producer mistakes — a pipeline should opt in per contract."""
        from ..operators.merge import changeset
        from ..sources.layout import swap_write

        current = self.read()
        if evolve_schema:
            have = set(current.columns)
            for f in incoming.schema.fields:
                if f.name not in have:
                    current = current.withColumn(
                        f.name, F.lit(None).cast(f.dataType)
                    )
        cs = changeset(current, incoming, key)
        if not full_sync:
            cs = cs.filter(F.col(ACTION) != "delete")
        swap_write(apply_changeset(current, cs, key), self.path)


class DeltaMergeWriter(MergeWriter):
    """Delta-table target: the changeset ships as one ``MERGE INTO``.

    ``merge_sql`` (pure string building) is the documented S6-S8 →
    ``MERGE INTO`` mapping and is unit-tested without the delta-spark
    package; ``merge`` registers the changeset as a temp view and runs
    the statement, which requires a Delta-enabled session catalog."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    @staticmethod
    def merge_sql(target: str, source_view: str, key: list[str] | str,
                  payload_cols: list[str], full_sync: bool = True) -> str:
        """One MERGE INTO statement for a changeset frame.

        ``source_view`` must hold the changeset schema (key cols,
        ``action``, ``incoming`` struct); noop rows are excluded by the
        action predicates, so pre-filtering them is an optimization, not
        a correctness requirement. ``full_sync=False`` compiles the
        incremental-upsert form: the DELETE clause is omitted, so keys
        absent from the source survive (see
        :meth:`ParquetSwapMergeWriter.merge_incoming` for when each is
        correct)."""
        keys = [key] if isinstance(key, str) else list(key)
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        set_clause = ", ".join(f"t.{c} = s.incoming.{c}" for c in payload_cols)
        ins_cols = ", ".join(payload_cols)
        ins_vals = ", ".join(f"s.incoming.{c}" for c in payload_cols)
        delete_clause = (
            f"WHEN MATCHED AND s.{ACTION} = 'delete' THEN DELETE\n"
            if full_sync
            else ""
        )
        return (
            f"MERGE INTO {target} t USING {source_view} s ON {on}\n"
            f"{delete_clause}"
            f"WHEN MATCHED AND s.{ACTION} = 'update' THEN UPDATE SET {set_clause}\n"
            f"WHEN NOT MATCHED AND s.{ACTION} = 'insert' "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    def merge(self, changes: DataFrame, key: list[str] | str) -> None:
        if self.spark.conf.get(
            "spark.sql.catalog.spark_catalog", ""
        ) != "org.apache.spark.sql.delta.catalog.DeltaCatalog":
            raise RuntimeError(
                "DeltaMergeWriter.merge requires a Delta-enabled session "
                "(delta-spark catalog extension); use ParquetSwapMergeWriter "
                "on plain filesystems"
            )
        payload_cols = [
            f.name for f in changes.schema["incoming"].dataType.fields
        ]
        view = "merge_changes_src"
        changes.filter(F.col(ACTION) != "noop").createOrReplaceTempView(view)
        self.spark.sql(self.merge_sql(self.table, view, key, payload_cols))
