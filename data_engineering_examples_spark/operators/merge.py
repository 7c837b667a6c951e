"""L5 — set-based merge/changeset operators (SURVEY §2 S6-S8, U4; §2.6).

The reference loops row-by-row over a pandas frame, POSTing creates and
field-diffing updates one HTTP call at a time
(``dags/ODSImport.py:237-305``, ``:609-659``) — its documented throughput
bottleneck. Here the same semantics are one full-outer join + expression
diff, producing an insert/update/delete/noop changeset that a MERGE-
capable sink applies set-based:

* ``diff_fields``    — generic column-wise null-safe diff → array of
  changed field names (the reference's isUpdate flags, U4).
* ``changeset``      — full outer join on the business key, classify each
  row: insert (incoming only), delete (current only), update (both +
  any compared field differs), noop.
* ``apply_changeset``— apply a changeset to the current table and return
  the new table (anti-join + union). On a Delta/Iceberg sink this is
  literally ``MERGE INTO ... WHEN [NOT] MATCHED``; on plain parquet the
  same dataframe algebra rewrites the table. Idempotent: re-deriving a
  changeset after applying yields only noops (pytest-enforced).
* ``dedup_deletes``  — the delete-duplicates flow (S8,
  ``notebooks/DeleteDuplicatesinIRISFHIRServer.ipynb``): keep-first per
  group key, emit the rest as delete actions.

Scale: one shuffle on the business key (both sides), AQE handles skew;
the diff itself is pure expression work. No driver-side loops, no
``collect()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ACTION = "action"  # insert | update | delete | noop


def diff_fields(left_prefix: str, right_prefix: str, cols: list[str]) -> Column:
    """Array of field names whose values differ (null-safe) between
    ``<left_prefix>.<col>`` and ``<right_prefix>.<col>``."""
    return F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}")),
                    F.lit(c),
                )
                for c in cols
            ]
        )
    )


def changeset(
    current: DataFrame,
    incoming: DataFrame,
    key: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer-join changeset. Output: key columns, ``action``,
    ``changed_fields`` (array, update rows only), plus every incoming and
    current column under ``incoming.*`` / ``current.*`` struct columns so
    the caller can build the upsert payload without re-joining."""
    keys = [key] if isinstance(key, str) else list(key)
    compare_cols = compare_cols or [
        c for c in incoming.columns if c in set(current.columns) and c not in keys
    ]

    cur = current.alias("cur")
    inc = incoming.alias("inc")
    cond = None
    for k in keys:
        eq = F.col(f"cur.{k}").eqNullSafe(F.col(f"inc.{k}"))
        cond = eq if cond is None else cond & eq
    j = cur.join(inc, cond, "full_outer")

    in_cur = F.col(f"cur.{keys[0]}").isNotNull()
    in_inc = F.col(f"inc.{keys[0]}").isNotNull()
    changed = diff_fields("cur", "inc", compare_cols)

    action = (
        F.when(in_inc & ~in_cur, F.lit("insert"))
        .when(~in_inc & in_cur, F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
        .otherwise(F.lit("noop"))
    )
    key_cols = [
        F.coalesce(F.col(f"inc.{k}"), F.col(f"cur.{k}")).alias(k) for k in keys
    ]
    return j.select(
        *key_cols,
        action.alias(ACTION),
        F.when(F.size(changed) > 0, changed).alias("changed_fields"),
        F.struct(*[F.col(f"inc.{c}").alias(c) for c in incoming.columns]).alias("incoming"),
        F.struct(*[F.col(f"cur.{c}").alias(c) for c in current.columns]).alias("current"),
    )


def apply_changeset(
    current: DataFrame, changes: DataFrame, key: list[str] | str
) -> DataFrame:
    """Materialize the post-merge table: drop deleted/updated keys from
    ``current`` (left-anti), add insert/update payloads from ``changes``.
    Equivalent to ``MERGE INTO current USING changes ON key WHEN MATCHED
    [AND delete] THEN DELETE / THEN UPDATE SET * WHEN NOT MATCHED THEN
    INSERT *`` on a Delta sink."""
    keys = [key] if isinstance(key, str) else list(key)
    touched = changes.filter(F.col(ACTION).isin("update", "delete", "insert"))
    removed = current.join(
        touched.filter(F.col(ACTION).isin("update", "delete")).select(*keys),
        keys,
        "left_anti",
    )
    upserts = (
        touched.filter(F.col(ACTION).isin("insert", "update"))
        .select("incoming.*")
        .select(*current.columns)
    )
    return removed.unionByName(upserts)


def dedup_deletes(
    df: DataFrame, group_key: str, order_col: str, id_cols: list[str]
) -> DataFrame:
    """Delete-duplicates plan (S8): within each ``group_key`` keep the
    first row by ``order_col`` (desc), emit every other row as a delete
    action — the set-based form of the reference's per-row DELETE loop
    (``DeleteDuplicatesinIRISFHIRServer.ipynb`` cell 1)."""
    w = Window.partitionBy(group_key).orderBy(F.desc(order_col), *id_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(*id_cols, F.col(group_key), F.lit("delete").alias(ACTION))
    )
