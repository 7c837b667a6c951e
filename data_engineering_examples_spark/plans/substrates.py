"""Registry of the session-shared substrate builds (memo_substrate
consumers' common tables), so the bench can time each build as its own
named entry instead of folding the cost into whichever consumer query
happens to run first (r13 verdict ask #1).

A production corpus pipeline materializes these tables once per corpus
snapshot — dedup clusters, LSH candidate pairs, perceptual hashes, the
quantized embedding fact, ANN index structures — and every consumer
serves from them.  The bench mirrors that: one timed build per session
up front, consumers measured substrate-warm (and tagged as such in the
bench record via ``scratch.drain_substrate_hits``).

Order matters: entries are listed DEPENDENCIES FIRST so each timed
build measures only its own work (``q24_lsh_pairs`` reads the already-
built ``hashed_shingles``; ``q72_membership`` reads ``q24_lsh_pairs``;
``semdedup_coarse_pairs`` reads ``semdedup_coarse_assign``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def substrate_builders() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name -> trigger; each trigger forces the named substrate's
    memo_substrate build for (session, sf_dir) and returns the
    read-back frame (imports deferred: plan modules are heavy)."""
    from . import dedup_queries as d
    from . import multimodal_queries as m
    from . import similarity_queries as s

    return {
        "hashed_shingles": d._hashed_shingles,
        "q24_lsh_pairs": d.q24_minhash_lsh_pairs,
        "q72_membership": d.q72_dedup_clusters,
        # keyed on the fixtures dir internally (media is fixture-fed)
        "image_dhash": lambda spark, sf_dir: m._image_dhash(spark),
        "lsh_bands": s._lsh_bands_substrate,
        "ivf_ranked": s._ivf_ranked_substrate,
        "kmeans_xq": s._xq_substrate,
        "semdedup_coarse_assign": s._coarse_semdedup_assign,
        "semdedup_coarse_pairs": s._coarse_semdedup_pairs,
    }
