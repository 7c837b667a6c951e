"""ML helpers on pyspark.ml (SURVEY §2.10 X4).

The reference's notebook runs sklearn DecisionTree / RandomForest with a
permutation-importance pass (``notebooks/DiabetesSQL.ipynb`` cells 27/32/
36). Model fitting maps 1:1 onto ``pyspark.ml`` (exercised in
``tests/test_search_sinks_ml.py``); the piece without a built-in is
**permutation importance**, provided here distributed-style:

for each feature column, break its association with the label by a
DETERMINISTIC cyclic shift of the column (each row takes the value of the
row ``k`` positions later in a fixed ordering — a derangement for any
0 < k < n), re-evaluate, and report the metric drop. A cyclic shift is
the distributed-friendly permutation: one window function over a fixed
order, no random state to synchronize across executors, reproducible
across runs.

At scale this is |features| evaluation passes over the eval set — each a
scan + model transform (map-only) + metric aggregation; nothing shuffles
except the one window ordering per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_rank(df: DataFrame, order_col: str, out_col: str = "__rn") -> DataFrame:
    """1-based global rank over a UNIQUE ``order_col`` WITHOUT moving the
    dataset to one partition: distributed range sort + per-partition
    offsets (the zipWithIndex decomposition). The only unpartitioned
    window runs over the per-partition COUNTS — one row per partition,
    bounded by the partition count, never by the data. Ranks are
    plan-deterministic even though range boundaries are sampled: with a
    unique key, offset + within-partition row_number is the key's global
    position regardless of where the boundaries fell."""
    part = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    pid = part.withColumn("__pid", F.spark_partition_id())
    offsets = (
        pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    w_in = Window.partitionBy("__pid").orderBy(order_col)
    return (
        pid.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.row_number().over(w_in)).cast("long"))
        .drop("__pid", "__offset")
    )


def cyclic_shift_column(
    df: DataFrame, col: str, order_col: str, k: int = 1
) -> DataFrame:
    """Replace ``col`` with the value ``k`` positions later, wrapping, in
    the deterministic ordering of ``order_col`` — a reproducible
    derangement (for 0 < k < n) that breaks the feature↔label pairing.
    Implemented as rank → modular-target self-join on the single shifted
    column; every other column rides along unchanged. Ranks come from
    ``_global_rank`` (range sort + partition offsets), so no stage ever
    gathers the eval set onto a single partition — the pass scales with
    the eval set like any other shuffle.

    ``order_col`` MUST be unique: with ties, rank tie order is not
    stable across the two computations feeding the self-join, so a row
    could silently receive its own value back (no permutation).
    Enforced with an explicit check rather than corrupted importances."""
    n = df.count()
    n_keys = df.select(order_col).distinct().count()
    if n_keys != n:
        raise ValueError(
            f"order_col {order_col!r} must be unique: {n} rows, {n_keys} distinct"
        )
    if n > 0 and k % n == 0:
        # k ≡ 0 (mod n) is the identity mapping — every feature would
        # silently score zero importance instead of being permuted
        raise ValueError(f"shift k={k} is a no-op for n={n} rows (k % n == 0)")
    ranked = _global_rank(df, order_col)
    donor = ranked.select(
        ((F.col("__rn") - 1 - k) % n + n) % n + 1,  # receiver rank
        F.col(col),
    ).toDF("__rn", "__shifted")
    return (
        ranked.join(donor, "__rn")
        .withColumn(col, F.col("__shifted"))
        .drop("__rn", "__shifted")
    )


def permutation_importance(
    model,
    eval_df: DataFrame,
    feature_cols: list[str],
    assembler,
    evaluator,
    order_col: str,
    k: int = 1,
) -> dict[str, float]:
    """Metric drop per feature under a cyclic-shift permutation.

    ``model`` is a fitted pyspark.ml model, ``assembler`` the
    VectorAssembler producing its ``features`` column, ``evaluator`` a
    pyspark.ml evaluator (higher-is-better metrics give positive
    importance for useful features; for loss metrics like MAE the sign
    flips — callers interpret accordingly).
    """
    base = evaluator.evaluate(model.transform(assembler.transform(eval_df)))
    out: dict[str, float] = {}
    for c in feature_cols:
        permuted = cyclic_shift_column(eval_df, c, order_col, k)
        score = evaluator.evaluate(model.transform(assembler.transform(permuted)))
        out[c] = base - score
    return out
