"""r12 additions: independent Python recomputes at sf0.001 for the
matryoshka-prefix recall audit (q258) and the Jaccard threshold
sensitivity sweep (q259)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from data_engineering_examples_spark.plans import all_specs

SF = "/root/testdata/sf0.001"


def test_matryoshka_recall_matches_python_replica(spark):
    from data_engineering_examples_spark.plans.similarity_queries import (
        MATRYOSHKA_PREFIXES,
        N_PROBES,
        TOP_K,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def cos(u, v, length):
        acc = na = nb = 0.0
        for a, b in zip(u[:length], v[:length]):
            acc += a * b
            na += a * a
            nb += b * b
        return acc / (math.sqrt(na) * math.sqrt(nb))

    topk = {}
    for length in MATRYOSHKA_PREFIXES:
        for p in range(N_PROBES):
            scored = sorted(
                ((cos(emb[p], emb[c], length), c) for c in emb if c != p),
                key=lambda t: (-t[0], t[1]),
            )
            topk[(length, p)] = {c for _, c in scored[:TOP_K]}
    want = {}
    for length in MATRYOSHKA_PREFIXES:
        hits = sum(
            len(topk[(length, p)] & topk[(64, p)]) for p in range(N_PROBES)
        )
        want[length] = (
            hits,
            N_PROBES,
            hits * 1_000_000 // (TOP_K * N_PROBES),
        )

    rows = all_specs()["q258_matryoshka_recall"].fn(spark, SF).collect()
    got = {r.prefix_len: (r.n_hits, r.n_probes, r.recall_ppm) for r in rows}
    assert got == want
    # the full prefix is its own reference: recall@full == 1
    assert got[64][2] == 1_000_000
    # recall is measured over every probe at every prefix
    assert set(got) == set(MATRYOSHKA_PREFIXES)


def test_jaccard_threshold_sweep_matches_python_replica(spark):
    from data_engineering_examples_spark.plans.dedup_queries import (
        JACCARD_SWEEP_PPM,
        _shingle_df_cap,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sh = {
        did: {h(" ".join(t[i : i + 3])) for i in range(len(t) - 2)}
        for did, t in docs.items()
        if len(t) >= 3
    }
    cap = _shingle_df_cap(len(docs))
    df = defaultdict(int)
    for s in sh.values():
        for g in s:
            df[g] += 1
    shf = {did: {g for g in s if df[g] <= cap} for did, s in sh.items()}
    by_gram = defaultdict(list)
    for did, s in shf.items():
        for g in s:
            by_gram[g].append(did)
    shared = defaultdict(int)
    for dids in by_gram.values():
        dids.sort()
        for i in range(len(dids)):
            for j in range(i + 1, len(dids)):
                shared[(dids[i], dids[j])] += 1
    want = {}
    for t in JACCARD_SWEEP_PPM:
        pairs = [
            (a, b)
            for (a, b), sh_n in shared.items()
            if sh_n >= 2
            and 1_000_000 * sh_n >= t * (len(shf[a]) + len(shf[b]) - sh_n)
        ]
        if pairs:
            want[t] = (len(pairs), len({b for _, b in pairs}))

    rows = all_specs()["q259_jaccard_threshold_sweep"].fn(spark, SF).collect()
    got = {r.threshold_ppm: (r.n_pairs, r.n_docs_flagged) for r in rows}
    assert got == want
    # monotone: a stricter cut never passes more pairs
    ts = sorted(got)
    for lo, hi in zip(ts, ts[1:]):
        assert got[lo][0] >= got[hi][0]


def test_semdedup_threshold_sweep_is_consistent_with_pairs(spark):
    """q260's counts must agree with an independent fold over q231's
    pair universe: recompute the coarse pairs in Python (seed rule,
    argmax assignment, within-cluster cosine) and apply each cut."""
    from data_engineering_examples_spark.plans.similarity_queries import (
        SEMDEDUP_COS,
        SEMDEDUP_SWEEP_MICROS,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    nrm = {i: math.sqrt(sum(x * x for x in v)) for i, v in emb.items()}

    def cos(a, b):
        return sum(x * y for x, y in zip(emb[a], emb[b])) / (nrm[a] * nrm[b])

    k = math.ceil(math.sqrt(len(emb)))
    seeds = sorted(
        emb, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:k]
    assign = {i: max(seeds, key=lambda c: (cos(i, c), -c)) for i in emb}
    clusters = defaultdict(list)
    for i, c in assign.items():
        clusters[c].append(i)
    pairs = []
    for members in clusters.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cs = cos(ms[i], ms[j])
                if cs >= SEMDEDUP_COS:
                    pairs.append((ms[i], ms[j], cs))
    want = {}
    for t in SEMDEDUP_SWEEP_MICROS:
        cut = t / 1_000_000
        passing = [(u, v) for u, v, cs in pairs if cs >= cut]
        if passing:
            want[t] = (len(passing), len({v for _, v in passing}))

    rows = all_specs()["q260_semdedup_threshold_sweep"].fn(spark, SF).collect()
    got = {r.threshold_micro: (r.n_pairs, r.n_docs_flagged) for r in rows}
    assert got == want
