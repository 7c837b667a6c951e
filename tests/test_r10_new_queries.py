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


# ---------------------------------------------------------------------------
# q239 — BPE trainer: the oracle proves Spark==DuckDB; these prove both
# match BPE itself (an independent plain-Python trainer) and the
# monotonicity BPE guarantees (each merged symbol can only appear as
# often as the pair that built it, so the winning count never rises).


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE trainer: greedy argmax with (count desc, left asc,
    right asc) tie-break, leftmost non-overlapping merge application."""
    forms = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple, int] = {}
        for syms, n in forms.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = counts.get((syms[i], syms[i + 1]), 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, c))
        new_forms: dict[tuple, int] = {}
        for syms, n in forms.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_forms[tuple(out)] = new_forms.get(tuple(out), 0) + n
        forms = new_forms
    return merges


def test_bpe_trainer_matches_python_reference(spark):
    from collections import Counter

    from data_engineering_examples_spark.plans.text_queries import BPE_TRAIN_ROUNDS
    from data_engineering_examples_spark.sources.tables import load_tables

    sf = "/root/testdata/sf0.001"
    spec = all_specs()["q239_bpe_train_rounds"]
    got = {
        row["round"]: (row["left_sym"], row["right_sym"], row["pair_count"])
        for row in spec.fn(spark, sf).collect()
    }
    docs = load_tables(spark, sf, ["documents"])["documents"]
    wc = Counter(
        w
        for row in docs.select("text").collect()
        for w in row["text"].split(" ")
        if w
    )
    want = _python_bpe(dict(wc), BPE_TRAIN_ROUNDS)
    assert len(got) == len(want) == BPE_TRAIN_ROUNDS
    for rnd, (l, r, c) in enumerate(want):
        assert got[rnd] == (l, r, c), f"round {rnd}: {got[rnd]} != {(l, r, c)}"


def test_bpe_winning_counts_never_rise(spark):
    spec = all_specs()["q239_bpe_train_rounds"]
    rows = sorted(spec.fn(spark, "/root/testdata/sf0.001").collect(),
                  key=lambda r: r["round"])
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------------------------
# q240 — linear-probe GD: both engines agree by the oracle; these prove
# the trajectory is the TRUE fixed-point GD (arbitrary-precision Python
# replica, including the trunc-toward-zero division) and that training
# actually trains (exact SSE strictly decreases along the trajectory).


def _q240_feats(spark, sf):
    from data_engineering_examples_spark.sources.tables import load_tables

    docs = load_tables(spark, sf, ["documents"])["documents"]
    rows = docs.select("text", "n_chars").collect()
    feats = []
    for r in rows:
        toks = r["text"].split(" ")
        feats.append(
            (min(len(toks), 256), min(len(set(toks)), 256), min(r["n_chars"], 4096))
        )
    return feats


def test_linear_probe_gd_matches_python_replica(spark):
    from data_engineering_examples_spark.plans.training_queries import (
        Q240_LRDEN,
        Q240_ROUNDS,
        Q240_SCALE,
    )

    sf = "/root/testdata/sf0.001"
    feats = _q240_feats(spark, sf)
    n = len(feats)
    s1 = sum(x1 for x1, _, _ in feats)
    s2 = sum(x2 for _, x2, _ in feats)
    s11 = sum(x1 * x1 for x1, _, _ in feats)
    s12 = sum(x1 * x2 for x1, x2, _ in feats)
    s22 = sum(x2 * x2 for _, x2, _ in feats)
    b0 = sum(y for _, _, y in feats)
    b1 = sum(x1 * y for x1, _, y in feats)
    b2 = sum(x2 * y for _, x2, y in feats)
    d = n * Q240_LRDEN

    def tdiv(a: int, b: int) -> int:  # trunc toward zero, like div / //
        return -((-a) // b) if a < 0 else a // b

    w0 = w1 = w2 = 0
    want = []
    for _ in range(Q240_ROUNDS):
        g0 = n * w0 + s1 * w1 + s2 * w2 - b0 * Q240_SCALE
        g1 = s1 * w0 + s11 * w1 + s12 * w2 - b1 * Q240_SCALE
        g2 = s2 * w0 + s12 * w1 + s22 * w2 - b2 * Q240_SCALE
        w0, w1, w2 = w0 - tdiv(g0, d), w1 - tdiv(g1, d), w2 - tdiv(g2, d)
        want.append((w0, w1, w2))
    spec = all_specs()["q240_linear_probe_gd"]
    got = sorted(spec.fn(spark, sf).collect(), key=lambda r: r["round"])
    assert [(r["w0_fp"], r["w1_fp"], r["w2_fp"]) for r in got] == want


def test_linear_probe_gd_reduces_exact_sse(spark):
    from fractions import Fraction

    from data_engineering_examples_spark.plans.training_queries import Q240_SCALE

    sf = "/root/testdata/sf0.001"
    feats = _q240_feats(spark, sf)
    spec = all_specs()["q240_linear_probe_gd"]
    got = sorted(spec.fn(spark, sf).collect(), key=lambda r: r["round"])

    def sse(w):
        w0, w1, w2 = (Fraction(v, Q240_SCALE) for v in w)
        return sum(
            (w0 + w1 * x1 + w2 * x2 - y) ** 2 for x1, x2, y in feats
        )

    losses = [sse((0, 0, 0))] + [
        sse((r["w0_fp"], r["w1_fp"], r["w2_fp"])) for r in got
    ]
    assert all(a > b for a, b in zip(losses, losses[1:])), losses


# ---------------------------------------------------------------------------
# q241 — GBDT stumps: pin the full boosting trajectory (splits, leaf
# values, side counts) to an arbitrary-precision Python replica of the
# histogram method, and assert the selected split is the true exact
# variance-reduction argmax each round.


def test_gbdt_stumps_match_python_replica(spark):
    from data_engineering_examples_spark.plans.training_queries import (
        Q241_FEATURES,
        Q241_ROUNDS,
        Q241_RSCALE,
        Q241_THRESHOLDS,
    )

    sf = "/root/testdata/sf0.001"
    feats = _q240_feats(spark, sf)  # (x1, x2, y) triples, same capping

    def tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    rows = [(x1, x2, y * Q241_RSCALE) for x1, x2, y in feats]
    want = []
    for _ in range(Q241_ROUNDS):
        n = len(rows)
        s = sum(r for _, _, r in rows)
        best = None
        for f in Q241_FEATURES:
            for t in Q241_THRESHOLDS:
                side = [
                    (x1 if f == "x1" else x2) <= t for x1, x2, _ in rows
                ]
                nl = sum(side)
                if nl == 0 or nl == n:
                    continue
                sl = sum(r for (_, _, r), m in zip(rows, side) if m)
                nr, sr = n - nl, s - sl
                gain = ((sl * sl * nr + sr * sr * nl) * n - s * s * nl * nr) // (
                    nl * nr * n
                )
                key = (-gain, f, t)
                if best is None or key < best[0]:
                    best = (key, f, t, nl, nr, tdiv(sl, 2 * nl), tdiv(sr, 2 * nr))
        _, f, t, nl, nr, vl, vr = best
        want.append((f, t, nl, nr, vl, vr))
        rows = [
            (x1, x2, r - (vl if (x1 if f == "x1" else x2) <= t else vr))
            for x1, x2, r in rows
        ]
    spec = all_specs()["q241_gbdt_stumps"]
    got = sorted(spec.fn(spark, sf).collect(), key=lambda r: r["round"])
    assert [
        (
            r["feature"],
            r["threshold"],
            r["n_left"],
            r["n_right"],
            r["left_value_fp"],
            r["right_value_fp"],
        )
        for r in got
    ] == want


def test_bpe_trainer_is_greedy_on_repeated_pair_runs(spark, tmp_path):
    """The shapes the single-space replace chain gets WRONG: self-pair
    runs ('a a a a') and back-to-back repeats ('b a b a') lose alternate
    merges when the pattern consumes the shared separator.  The
    double-space representation must match the greedy reference trainer
    exactly on these."""
    import pandas as pd

    texts = ["aaaa ababab aaaa", "ababab aaaa", "aaaa"]
    sf = tmp_path / "runcorpus"
    sf.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    from collections import Counter

    from data_engineering_examples_spark.plans.text_queries import BPE_TRAIN_ROUNDS

    wc = Counter(w for t in texts for w in t.split() if w)
    want = _python_bpe(dict(wc), BPE_TRAIN_ROUNDS)
    spec = all_specs()["q239_bpe_train_rounds"]
    got = sorted(spec.fn(spark, str(sf)).collect(), key=lambda r: r["round"])
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in got] == want
    # the decisive rows: the self-pair run merges twice per 'aaaa', and
    # 'ababab' compresses through (ab,ab) -> (abab,ab)
    assert (got[2]["left_sym"], got[2]["right_sym"]) == ("aa", "aa")
    assert (got[4]["left_sym"], got[4]["right_sym"]) == ("abab", "ab")


def test_double_space_replace_is_greedy_for_all_corpora():
    """Property test of the core q239 trick with zero Spark cost:
    Python's str.replace has the same leftmost-non-overlapping,
    resume-after-replacement semantics as Spark's and DuckDB's replace,
    so the double-space representation can be validated exhaustively —
    for every symbol sequence and every merge pair, the literal replace
    must produce exactly the greedy scan's output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.sampled_from(["a", "b", "ab", "ba", "aa"])
    seqs = st.lists(sym, min_size=2, max_size=12)

    def greedy(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    @settings(max_examples=500, deadline=None)
    @given(seqs=seqs, pair=st.tuples(sym, sym))
    def check(seqs, pair):
        l, r = pair
        form = "  ".join(seqs)
        padded = " " + form + " "
        replaced = padded.replace(f" {l}  {r} ", f" {l}{r} ").strip()
        got = [s for s in replaced.split("  ") if s]
        assert got == greedy(seqs, l, r), (seqs, pair, got)

    check()


# ---------------------------------------------------------------------------
# q242 — stream-stream LEFT OUTER join: the oracle proves the drained
# output equals the batch LEFT JOIN; these pin the two properties that
# make the query a real eviction test rather than a vacuous one.


def test_stream_outer_join_emits_unmatched_clicks(spark):
    sf = "/root/testdata/sf0.001"
    spec = all_specs()["q242_stream_attribution_outer"]
    rows = spec.fn(spark, sf).collect()
    unmatched = [r for r in rows if r["purchase_id"] is None]
    matched = [r for r in rows if r["purchase_id"] is not None]
    # the corpus must exercise BOTH paths, else the oracle parity says
    # nothing about NULL emission
    assert unmatched and matched, (len(unmatched), len(matched))
    # every unmatched row is NULL-padded consistently
    assert all(r["lag_us"] is None for r in unmatched)
    # the regression shape: the LATEST click gates the click-side
    # watermark, so its own eviction only happens via the sentinel
    # batches — it must be present (matched or NULL-emitted)
    from data_engineering_examples_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    ev = load_tables(spark, sf, ["events"])["events"]
    last_click = (
        ev.filter(F.col("event_type") == "click")
        .orderBy(F.desc("ts"))
        .limit(1)
        .collect()[0]["event_id"]
    )
    assert any(r["click_id"] == last_click for r in rows), (
        "max-ts click missing: its eviction depends on the sentinel "
        "watermark advance (the in-plan-filter pushdown regression)"
    )
    # no sentinel leakage
    assert all(r["user_id"] >= 0 for r in rows)
