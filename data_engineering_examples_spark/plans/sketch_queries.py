"""L4 — deterministic sketch operators (builder brief: "a novel sketch"
as a custom-operator category).

* q85 — KMV (k-minimum-values) distinct-count sketch per group: keep the
  K smallest 60-bit hashes of the distinct members and estimate
  cardinality as ``(K-1) * 2^60 / h_K``. Unlike HLL++
  (``approx_count_distinct``), KMV over a fixed hash is bit-identical
  across engines, so the estimate itself passes the DuckDB hash gate.

Scale notes (100 TB):
* Production Spark would normally reach for ``approx_count_distinct``
  (HLL++: bounded sketch buffers, map-side partial aggregation). q85
  exists because the oracle gate needs engine-independent estimates —
  and its plan is still skew-proof: the min-k selection runs TWO level
  windows, first per (group, salt) shard, then over the ≤ SALTS*K
  survivors per group. No window partition ever exceeds
  max(shard_distinct, SALTS*K) rows, regardless of how hot a group key
  is. The DuckDB oracle computes the single-level global min-k, which
  the two-level form equals exactly.
* The distinct() before hashing is the one full shuffle, keyed by
  (group, member) — the same shape COUNT(DISTINCT) needs anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .dedup_queries import _duck_md5_int, _md5_int
from .registry import register

KMV_K = 64       # sketch size: k smallest hashes kept per group
KMV_SALTS = 8    # level-1 shards per group (skew bound: SALTS*K rows max)
_POW2_60 = float(1 << 60)  # md5-15-hex hash space


@register(
    "q85_kmv_distinct",
    oracle=f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             {_duck_md5_int("'kmv:' || CAST(user_id AS VARCHAR)")} AS h
      FROM pairs
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
      FROM h
    ),
    k AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS h_k
      FROM r WHERE rn <= {KMV_K} GROUP BY event_type
    )
    SELECT event_type, n_kept,
           CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                     ELSE floor(({KMV_K} - 1) * {_POW2_60} / h_k) END
                AS BIGINT) AS est_distinct_users
    FROM k
    """,
    doc=f"KMV distinct-user sketch per event_type (k={KMV_K}): "
        "engine-deterministic cardinality estimate; two-level min-k keeps "
        "every window partition bounded",
    tags=("sketch", "agg", "llm"),
)
def q85_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    pairs = events.select("event_type", "user_id").distinct()
    h = _md5_int(F.concat_ws("", F.lit("kmv:"), F.col("user_id").cast("string")))
    hashed = pairs.select("event_type", "user_id", h.alias("h"))

    # level 1: k smallest per (group, salt) shard — partitions are
    # shard-sized even for a group holding every user in the corpus
    lvl1 = Window.partitionBy("event_type", F.col("h") % KMV_SALTS).orderBy(
        "h", "user_id"
    )
    survivors = (
        hashed.withColumn("_rn", F.row_number().over(lvl1))
        .filter(F.col("_rn") <= KMV_K)
        .drop("_rn")
    )
    # level 2: global k smallest among ≤ SALTS*K survivors per group —
    # exactly equal to the single-level min-k the oracle computes
    lvl2 = Window.partitionBy("event_type").orderBy("h", "user_id")
    kept = (
        survivors.withColumn("_rn", F.row_number().over(lvl2))
        .filter(F.col("_rn") <= KMV_K)
    )
    agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.floor(F.lit(float(KMV_K - 1)) * F.lit(_POW2_60) / F.col("h_k"))
    )
    return agg.select(
        "event_type", "n_kept", est.cast("bigint").alias("est_distinct_users")
    )
