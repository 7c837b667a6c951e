"""Behavioral tests for the round-10 additions — properties the
value-hash oracle can't see:

* q238 (exact-dedup-first near-dup) must emit EXACTLY the naive-order
  q49 pair set on a corpus WITH verbatim-duplicate vectors (the base
  testdata has none, so the expansion path needs its own fixture), with
  canonical ids matching a plain-Python keeper map;
* the N-relative shingle-df cap must reproduce the r9-measured constants
  at the fixture corpus sizes.
"""

from __future__ import annotations

import pandas as pd

from data_engineering_examples_spark.plans.registry import all_specs


def _dup_embeddings(tmp_path):
    from data_engineering_examples_spark.plans.similarity_queries import DIM

    def vec(seed: int) -> list[float]:
        # deterministic, integer-valued doubles (float-parity convention)
        return [float((seed * 31 + i * 7) % 13 - 6) for i in range(DIM)]

    rows = [
        (0, vec(1)), (1, vec(1)), (2, vec(1)),          # dup group A
        (3, vec(2)), (4, vec(2)),                        # dup group B
        (5, vec(9)),                                     # singleton
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    d = tmp_path / "dupvecs"
    d.mkdir()
    return pdf, str(d)


def test_canonical_neardup_matches_naive_order_with_dups(spark, tmp_path):
    pdf, sf = _dup_embeddings(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/embeddings.parquet"
    )
    naive = all_specs()["q49_embedding_neardup"].fn(spark, sf).collect()
    composed = all_specs()["q238_canonical_neardup"].fn(spark, sf).collect()

    # pair-for-pair, cosine bit-exact against the naive order
    naive_pairs = {(r.vec_a, r.vec_b): r.cosine for r in naive}
    comp_pairs = {(r.vec_a, r.vec_b): r.cosine for r in composed}
    assert comp_pairs == naive_pairs
    # the dup groups MUST pair among themselves (within-group path)
    for a, b in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert (a, b) in comp_pairs

    # canonical ids follow the min-id keeper map
    canon = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
    for r in composed:
        assert r.canon_a == canon[r.vec_a], r
        assert r.canon_b == canon[r.vec_b], r


def test_shingle_df_cap_is_n_relative():
    from data_engineering_examples_spark.plans.dedup_queries import (
        SHINGLE_DF_MIN_CAP,
        _shingle_df_cap,
    )

    assert _shingle_df_cap(0) == SHINGLE_DF_MIN_CAP
    assert _shingle_df_cap(5_000) == 64        # sf0.1: floor binds (no-op)
    assert _shingle_df_cap(50_000) == 64       # sf1: the measured-good dial
    assert _shingle_df_cap(500_000) == 640     # ppm regime: 1280 ppm of N
    assert _shingle_df_cap(1_000_001) == 1281  # exact integer ceil
