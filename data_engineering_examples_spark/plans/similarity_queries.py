"""L4 — similarity search over the ``embeddings`` table (LLM-pipeline
surface; builder brief "Similarity search").

* **q31 brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) probe set against every candidate, rank per probe. O(P·N)
  by design; at 100 TB this is the plan you use when P is small (the
  probe side broadcasts, the big side streams through scan-local math —
  no shuffle of the candidate table at all; the only exchange is the
  final per-probe top-k, which TakeOrdered-style combines partial top-ks).
* **q32 LSH-bucketed ANN** — the scale path: 16 fixed random hyperplanes →
  sign bits → 4 bands × 4 bits; candidates are only vectors sharing a
  band bucket with the probe (never all-pairs), then exact cosine re-rank
  within candidates. Work scales with bucket occupancy, not N².

Float determinism: all dot products fold LEFT-TO-RIGHT IN DOUBLE
(``transform(cast to double)`` then ``aggregate``), which DuckDB's
``list_inner_product`` over double-cast lists reproduces bit-exactly
(verified: 1494/1494 pairwise cosines identical). DuckDB's own
``list_cosine_similarity`` accumulates in float and does NOT match — the
oracles below use the explicit double form.

Everything is built-in higher-order Column expressions — no UDFs; the
vector math runs inside codegen on the JVM.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .registry import register

N_PROBES = 10
TOP_K = 10
DIM = 64
N_PLANES = 16
N_BANDS, BITS_PER_BAND = 4, 4

# deterministic random hyperplanes, embedded as literals in BOTH engines
_rng = random.Random(7)
PLANES = [[_rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_PLANES)]


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(u, v):
    """Sequential left-fold dot product in double — the cross-engine-stable
    form (see module docstring)."""
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def _plane_lit(p: list[float]):
    return F.array(*[F.lit(v) for v in p])


def _duck_vec(col: str) -> str:
    return f"list_transform({col}, x -> CAST(x AS DOUBLE))"


def _duck_dot(u: str, v: str) -> str:
    return f"list_inner_product({u}, {v})"


def _duck_plane(p: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in p) + "]"


# ---------------------------------------------------------------------------
# q31 — brute-force cosine top-k for the first N_PROBES vectors.


@register(
    "q31_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, {_duck_vec('embedding')} AS e FROM embeddings),
    pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             {_duck_dot('p.e', 'c.e')} /
               (sqrt({_duck_dot('p.e', 'p.e')}) * sqrt({_duck_dot('c.e', 'c.e')})) AS cosine
      FROM v p JOIN v c ON p.vec_id < {N_PROBES} AND c.vec_id <> p.vec_id
    )
    SELECT probe_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
    """,
    doc="brute-force cosine top-k (broadcast probes, scan-local math)",
    tags=("similarity", "llm"),
)
def q31_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    v = emb.select("vec_id", _to_double("embedding").alias("e"))
    probes = F.broadcast(
        v.filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"))
    )
    pairs = probes.join(v, F.col("vec_id") != F.col("probe_id"))
    cosine = _dot(F.col("pe"), F.col("e")) / (
        F.sqrt(_dot(F.col("pe"), F.col("pe"))) * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    scored = pairs.select(
        "probe_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# q32 — LSH-bucketed ANN: candidates share >= 1 band bucket, then exact
# cosine re-rank. The oracle reproduces planes, signs, buckets, and
# ranking exactly.


def _duck_ann_oracle() -> str:
    bits = ", ".join(
        f"(CASE WHEN {_duck_dot('e', _duck_plane(PLANES[h]))} > 0 THEN 1 ELSE 0 END) AS bit{h}"
        for h in range(N_PLANES)
    )
    band_rows = " UNION ALL ".join(
        "SELECT vec_id, e, {j} AS band, concat_ws('', {bits}) AS bkey FROM sig".format(
            j=j,
            bits=", ".join(f"bit{j * BITS_PER_BAND + k}" for k in range(BITS_PER_BAND)),
        )
        for j in range(N_BANDS)
    )
    return f"""
    WITH v AS (SELECT vec_id, {_duck_vec('embedding')} AS e FROM embeddings),
    sig AS (SELECT vec_id, e, {bits} FROM v),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
      FROM bands p JOIN bands c
        ON p.band = c.band AND p.bkey = c.bkey
       AND p.vec_id < {N_PROBES} AND c.vec_id <> p.vec_id
    ),
    scored AS (
      SELECT cand.probe_id, cand.neighbor_id,
             {_duck_dot('p.e', 'c.e')} /
               (sqrt({_duck_dot('p.e', 'p.e')}) * sqrt({_duck_dot('c.e', 'c.e')})) AS cosine
      FROM cand
      JOIN v p ON p.vec_id = cand.probe_id
      JOIN v c ON c.vec_id = cand.neighbor_id
    )
    SELECT probe_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {TOP_K}
    """


def _signatures(v: DataFrame) -> DataFrame:
    """vec_id, e, band, bkey — one row per (vector, band)."""
    sig = v.select(
        "vec_id",
        "e",
        *[
            (_dot(F.col("e"), _plane_lit(PLANES[h])) > 0).cast("int").alias(f"bit{h}")
            for h in range(N_PLANES)
        ],
    )
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("band"),
                    F.concat_ws(
                        "",
                        *[
                            F.col(f"bit{j * BITS_PER_BAND + k}").cast("string")
                            for k in range(BITS_PER_BAND)
                        ],
                    ).alias("bkey"),
                )
                for j in range(N_BANDS)
            ]
        )
    ).alias("bb")
    return sig.select("vec_id", "e", bands).select("vec_id", "e", "bb.band", "bb.bkey")


@register(
    "q32_ann_lsh_topk",
    oracle=_duck_ann_oracle(),
    doc="LSH(16 hyperplanes, 4x4 bands) ANN + exact re-rank; bucket-join only",
    tags=("similarity", "llm"),
)
def q32_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    v = emb.select("vec_id", _to_double("embedding").alias("e"))
    bands = _signatures(v)

    probes = bands.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        "band",
        "bkey",
    )
    cands = (
        F.broadcast(probes)
        .join(
            bands,
            (probes.band == bands.band)
            & (probes.bkey == bands.bkey)
            & (F.col("vec_id") != F.col("probe_id")),
        )
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # re-attach vectors for the exact re-rank (bucket join dropped no info,
    # but distinct() must run on slim (probe, neighbor) pairs first)
    pv = v.select(F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"))
    cv = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"))
    scored = (
        cands.join(F.broadcast(pv), "probe_id")
        .join(cv, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            (
                _dot(F.col("pe"), F.col("ce"))
                / (
                    F.sqrt(_dot(F.col("pe"), F.col("pe")))
                    * F.sqrt(_dot(F.col("ce"), F.col("ce")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )
