"""Airflow-style trigger-rule gates, set-based (SURVEY §2 T4).

The reference's child DAG joins branched task flows with trigger rules:
``check_task_status`` runs with ``trigger_rule='one_success'`` after the
skip/write branches, and the default ``all_success`` gates every linear
edge (``dags/ConsultationNoteWritebackX.py:256-262``). Airflow evaluates
those rules per DAG-run over the upstream task states; here the same
decision is ONE aggregation over (key, branch, state) outcome rows —
per-key upstream state counts — from which every rule is a boolean
column. 100 TB shape: a single partial+final agg shuffle on the key; the
rules themselves are free codegen expressions over the counts.

States follow Airflow's vocabulary: 'success', 'failed', 'skipped'
(anything else counts only toward ``n_upstream``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rule name -> builder over the count columns (n_upstream, n_success,
#: n_failed, n_skipped). Mirrors Airflow's TriggerRule semantics for
#: settled upstreams (evaluation happens once all upstreams are terminal,
#: which is what a batch of outcome rows represents).
TRIGGER_RULES = {
    "all_success": lambda: F.col("n_success") == F.col("n_upstream"),
    "all_failed": lambda: F.col("n_failed") == F.col("n_upstream"),
    "all_done": lambda: F.lit(True),
    "one_success": lambda: F.col("n_success") >= 1,
    "one_failed": lambda: F.col("n_failed") >= 1,
    "none_failed": lambda: F.col("n_failed") == 0,
    "none_skipped": lambda: F.col("n_skipped") == 0,
}


def gate_decisions(
    outcomes: DataFrame,
    keys: Sequence[str],
    state_col: str = "state",
    rules: Sequence[str] = ("all_success", "one_success", "none_failed"),
) -> DataFrame:
    """Per-key trigger-rule decisions from upstream branch outcomes.

    ``outcomes`` holds one row per (key, upstream branch) with the
    branch's terminal state in ``state_col``. Returns one row per key
    with the state counts and one boolean column per requested rule.
    """
    unknown = [r for r in rules if r not in TRIGGER_RULES]
    if unknown:
        raise ValueError(f"unknown trigger rules: {unknown}")
    st = F.col(state_col)
    counted = outcomes.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_upstream"),
        F.sum(F.when(st == "success", 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(st == "failed", 1).otherwise(0)).alias("n_failed"),
        F.sum(F.when(st == "skipped", 1).otherwise(0)).alias("n_skipped"),
    )
    return counted.select(
        *keys,
        "n_upstream",
        "n_success",
        "n_failed",
        "n_skipped",
        *[TRIGGER_RULES[r]().alias(r) for r in rules],
    )
