"""Behavioral tests for the round-8 additions: properties the
value-hash oracle can't see —

* q234 must return EXACTLY q233's rows (salting is a physical rewrite,
  not a semantic one), checked row-for-row here on top of the shared
  oracle;
* q235's learned-centroid SemDeDup is recomputed in plain Python
  (quantize → 2 Lloyd rounds with the n²-scaled exact argmin →
  within-cluster cosine closure via union-find → farthest-kept rule)
  and compared field-for-field.
"""

from __future__ import annotations

import math

from data_engineering_examples_spark.plans.registry import all_specs
from data_engineering_examples_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_salted_interval_join_matches_unsalted_rows(spark):
    base = all_specs()["q233_concurrent_sessions"].fn(spark, SF).collect()
    salted = all_specs()["q234_concurrent_sessions_salted"].fn(spark, SF).collect()
    key = lambda r: (r.user_id, r.session_start)  # noqa: E731
    assert sorted(map(tuple, base), key=None) == sorted(map(tuple, salted), key=None)
    assert len({key(r) for r in base}) == len(base)  # sessions unique


def _python_semdedup_learned(vecs: dict[int, list[float]]):
    import hashlib

    from data_engineering_examples_spark.plans.similarity_queries import (
        KMEANS_SCALE,
        Q235_ITERS,
        SEMDEDUP_COS,
    )

    xq = {
        vid: [math.floor(x * KMEANS_SCALE) for x in v] for vid, v in vecs.items()
    }
    # seed centroids: the K = ceil(sqrt(N)) vec_ids ranked by
    # (md5(vec_id), vec_id) — the r10 corpus-size-wired rule
    k = max(1, math.ceil(math.sqrt(float(len(vecs)))))
    seed_ids = sorted(
        vecs, key=lambda vid: (hashlib.md5(str(vid).encode()).hexdigest(), vid)
    )[:k]
    cents = {vid: (list(xq[vid]), 1) for vid in seed_ids}

    def assign_all():
        out = {}
        for vid, q in xq.items():
            best = None
            for cid in sorted(cents):
                cs, n = cents[cid]
                d = sum((n * q[i] - cs[i]) ** 2 for i in range(len(q)))
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            out[vid] = (best[1], best[0])  # cluster, scaled dist
        return out

    for _ in range(Q235_ITERS - 1):
        a = assign_all()
        nxt: dict[int, tuple[list[int], int]] = {}
        for vid, (cid, _d) in a.items():
            cs, n = nxt.get(cid, ([0] * len(xq[vid]), 0))
            nxt[cid] = ([c + x for c, x in zip(cs, xq[vid])], n + 1)
        cents = nxt
    final = assign_all()

    # within-cluster cosine closure on the ORIGINAL doubles (left-fold
    # order does not matter for the python recompute's tolerance-free
    # comparison because we only THRESHOLD here, same as the engines)
    def cos(u, v):
        du = math.sqrt(sum(a * a for a in u))
        dv = math.sqrt(sum(a * a for a in v))
        return sum(a * b for a, b in zip(u, v)) / (du * dv)

    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    edges = []
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            if final[u][0] == final[v][0] and cos(vecs[u], vecs[v]) >= SEMDEDUP_COS:
                edges.append((u, v))
    members = sorted({x for e in edges for x in e})
    parent = {x: x for x in members}
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {x: find(x) for x in members}
    # keep = farthest scaled distance, tie lower vec_id
    out = {}
    by_comp: dict[int, list[int]] = {}
    for x in members:
        by_comp.setdefault(comp[x], []).append(x)
    for c, xs in by_comp.items():
        keeper = min(xs, key=lambda x: (-final[x][1], x))
        for x in xs:
            out[x] = (final[x][0], c, x == keeper)
    return out


def test_semdedup_learned_matches_python_recompute(spark):
    emb = load_tables(spark, SF, ["embeddings"])["embeddings"]
    vecs = {
        r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()
    }
    truth = _python_semdedup_learned(vecs)
    rows = all_specs()["q235_semantic_dedup_learned"].fn(spark, SF).collect()
    got = {r.vec_id: (r.cluster_id, r.component, r.keep) for r in rows}
    assert got == truth
    # exactly one keeper per component
    comps = {}
    for vid, (_c, comp, keep) in got.items():
        comps.setdefault(comp, 0)
        comps[comp] += int(keep)
    assert comps and all(v == 1 for v in comps.values())
