"""Skew-robust join/aggregate operators.

At 100 TB a single hot key (one mega-user, one default/null code, one
popular document) turns a shuffle join or aggregation into a one-task
straggler. Spark's AQE skew-join split handles sort-merge joins whose
skew is visible at runtime, but (a) it only splits the PROBE side of a
join, and (b) windows/aggregations get no AQE help. Salting is the
explicit, always-works form:

* ``salted_equi_join(big, small, keys, n_salts)`` — the big side gets a
  deterministic salt in [0, n_salts); the small side is replicated
  n_salts times (an ``explode`` of a literal range — NOT a cartesian
  join). The join key becomes (key, salt), splitting each hot key's rows
  across ``n_salts`` shuffle partitions. Result rows are EXACTLY those of
  the plain equi-join — verified by the q54 oracle, which runs the plain
  join in DuckDB.

* ``two_stage_agg(df, keys, aggs, n_salts)`` — pre-aggregate on
  (key, salt), then finish on key. For algebraic aggregates Spark's own
  partial aggregation already does this map-side; the explicit form
  exists for the cases partial agg can't collapse (e.g. exact
  count-distinct on a hot key via the two-level expansion).

The reference has no skew handling anywhere (single-node pandas); this is
engine-level capability the brief's 100 TB target requires.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with the big side salted and the small side
    replicated ``n_salts``×. Semantics identical to
    ``big.join(small, keys, how)`` for how in {inner, left}.

    The salt hashes all big-side columns PLUS a row-local id, so even
    byte-identical duplicate rows of a hot key spread across salts (a
    values-only hash would send identical rows to one partition — the
    exact straggler this operator exists to break). The id is
    nondeterministic across retries, but the salt is dropped after the
    join, so results are unaffected. Replication multiplies the small
    side by ``n_salts`` — pick it so small × n_salts still fits the
    shuffle comfortably (at 1000 executors, 8-32 is typical).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    salt: Column = F.pmod(
        F.hash(*[F.col(c) for c in big.columns], F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*keys, SALT_COL], how).drop(SALT_COL)


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    count_distinct_col: str | None = None,
) -> DataFrame:
    """Exact count / count-distinct per key via salted two-stage
    aggregation: stage 1 groups on (keys, salt) — hot keys split across
    ``n_salts`` reducers — stage 2 merges the partials on keys alone.

    Returns columns: ``*keys, n_rows`` (+ ``n_distinct`` when
    ``count_distinct_col`` is given). The distinct count NEVER gathers a
    key's values into one buffer (a collect_set merge would re-create the
    hot-key concentration on the stage-2 reducer): it deduplicates on the
    (keys, value) COMPOSITE — the value being part of the grouping key is
    itself the salt — then counts per key.
    """
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    stage1_keys = [*keys, SALT_COL]
    s1 = df.withColumn(SALT_COL, salt)
    partial = s1.groupBy(*stage1_keys).agg(F.count(F.lit(1)).alias("__n"))
    n_rows = partial.groupBy(*keys).agg(F.sum("__n").alias("n_rows"))
    if count_distinct_col is None:
        return n_rows
    # COUNT(DISTINCT col) semantics: NULL is not a value, so drop it
    # before the composite dedup (otherwise NULL would count as one
    # extra distinct per key)
    pairs = (
        df.filter(F.col(count_distinct_col).isNotNull())
        .select(*keys, count_distinct_col)
        .distinct()
    )
    n_distinct = pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))
    return n_rows.join(n_distinct, list(keys), "left").na.fill({"n_distinct": 0})
