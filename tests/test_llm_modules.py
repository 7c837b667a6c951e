"""Behavioral tests for the LLM-pipeline modules (dedup / similarity /
text) beyond the DuckDB hash-parity gate: do the approximate operators
actually FIND near-duplicates and neighbors?
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_examples_spark.plans.registry import all_specs


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    """A corpus with known exact and near duplicates, written in the
    documents.parquet layout so the dedup queries run on it unchanged."""
    base = "key agg row scan slow fast table value part hash merge batch spark window sort line group order column stream filter big small the a data query join"
    near = base.replace("slow", "quick")  # 1-token edit → high jaccard
    docs = [
        (0, base, "en", "src0"),
        (1, base, "en", "src1"),          # exact duplicate of 0
        (2, "  " + base.upper() + " ", "en", "src2"),  # normalizes to dup of 0
        (3, near, "en", "src0"),          # near duplicate of 0
        (4, "completely different tiny text", "en", "src3"),
    ]
    d = tmp_path_factory.mktemp("dupsf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": [r[1] for r in docs],
                "lang": [r[2] for r in docs],
                "source": [r[3] for r in docs],
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return str(d)


def test_exact_dedup_finds_duplicates(spark, dup_corpus):
    rows = all_specs()["q22_exact_dedup"].fn(spark, dup_corpus).collect()
    by_keeper = {r.keeper_doc_id: r.n_copies for r in rows}
    # doc 0, 1 and the case/whitespace variant 2 normalize to one group
    assert by_keeper[0] == 3
    assert by_keeper[3] == 1


def test_minhash_lsh_finds_near_duplicate(spark, dup_corpus):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in all_specs()["q24_minhash_lsh_pairs"].fn(spark, dup_corpus).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides in every band
    assert (0, 3) in pairs  # 1-token edit shares most shingles
    assert not any(4 in p for p in pairs)  # unrelated doc stays unpaired


def test_jaccard_ranks_near_dup_high(spark, dup_corpus):
    rows = all_specs()["q23_ngram_jaccard_pairs"].fn(spark, dup_corpus).collect()
    j = {(r.doc_a, r.doc_b): r.jaccard for r in rows}
    assert j[(0, 1)] == 1.0
    assert j[(0, 3)] > 0.7


def test_eval_contamination_flags_planted_leak(spark, tmp_path_factory):
    """q236: an eval doc whose text reappears (verbatim and lightly
    edited) in training docs must surface with high containment; a
    clean eval doc must not pair with anything.  Eval membership is
    doc_id % 97 == 0, so ids 0 and 97 are eval, everything else is
    training."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    edited = base.replace("echo", "exxo")  # keeps most shingles
    docs = [
        (0, base, "en", "eval"),            # eval doc, leaked
        (97, "totally unrelated words only here nothing shared at all",
         "en", "eval"),                      # eval doc, clean
        (1, base, "en", "train"),            # verbatim leak
        (2, edited, "en", "train"),          # near-verbatim leak
        (3, "unshared training content goes here entirely", "en", "train"),
    ]
    d = tmp_path_factory.mktemp("contamsf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": [r[1] for r in docs],
                "lang": [r[2] for r in docs],
                "source": [r[3] for r in docs],
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = all_specs()["q236_eval_contamination"].fn(spark, str(d)).collect()
    c = {(r.eval_doc, r.train_doc): r.containment for r in rows}
    assert c[(0, 1)] == 1.0                      # verbatim: full containment
    assert 0.5 < c[(0, 2)] < 1.0                 # edited: high but partial
    assert not any(e == 97 for e, _ in c)        # clean eval doc stays clean
    shared = {(r.eval_doc, r.train_doc): r.shared for r in rows}
    n_shingles = len(base.split()) - 2
    assert shared[(0, 1)] == n_shingles          # exact shingle arithmetic


def test_repeated_span_cuts_exact_boundaries(spark, tmp_path_factory):
    """q237: a 10-token span shared by two docs must be cut in both with
    EXACT token boundaries (maximal run of duplicated 8-token windows);
    a within-doc repetition also cuts (Lee et al. semantics: any window
    occurring twice anywhere); a unique doc emits nothing."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"  # 10 tokens
    docs = [
        # shared span at token positions 3..12 of doc 0
        (0, "a1 a2 " + shared + " a3 a4 a5", "en", "w"),
        # same span at positions 1..10 of doc 1
        (1, shared + " b1 b2 b3 b4 b5 b6", "en", "w"),
        # within-doc repetition: the same 8 tokens twice in doc 2
        (2, "r1 r2 r3 r4 r5 r6 r7 r8 zzz r1 r2 r3 r4 r5 r6 r7 r8", "en", "w"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", "en", "w"),  # unique
    ]
    d = tmp_path_factory.mktemp("spansf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": [r[1] for r in docs],
                "lang": [r[2] for r in docs],
                "source": [r[3] for r in docs],
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = all_specs()["q237_repeated_span_cuts"].fn(spark, str(d)).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r.doc_id, set()).add(
            (r.span_start, r.span_end, r.n_tokens)
        )
    # doc 0: windows at positions 3..5 are duplicated (10-token span =
    # 3 overlapping 8-token windows), merged span covers tokens 3..12
    assert spans[0] == {(3, 12, 10)}
    assert spans[1] == {(1, 10, 10)}
    # doc 2: only the windows at p=1 and p=10 match (those crossing the
    # 'zzz' separator are unique) — two NON-adjacent islands, two cuts
    assert spans[2] == {(1, 8, 8), (10, 17, 8)}
    assert 3 not in spans
    assert sum(len(s) for s in spans.values()) == 4


def test_ann_recall_vs_brute_force(spark):
    """LSH ANN must recover a reasonable fraction of the true top-10."""
    sf = "/root/testdata/sf0.001"
    truth = all_specs()["q31_cosine_topk"].fn(spark, sf).collect()
    approx = all_specs()["q32_ann_lsh_topk"].fn(spark, sf).collect()
    t = {(r.probe_id, r.neighbor_id) for r in truth}
    a = {(r.probe_id, r.neighbor_id) for r in approx}
    recall = len(t & a) / len(t)
    assert recall >= 0.3, f"ANN recall collapsed: {recall:.2f}"


def test_simhash_close_for_near_dup(spark, dup_corpus):
    rows = {r.doc_id: r.simhash for r in all_specs()["q25_simhash_fingerprint"].fn(spark, dup_corpus).collect()}
    assert rows[0] == rows[1]  # identical text → identical fingerprint
    ham_near = bin(rows[0] ^ rows[3]).count("1")
    ham_far = bin(rows[0] ^ rows[4]).count("1")
    assert ham_near < ham_far


def test_short_docs_do_not_crash_shingle_paths(spark, tmp_path):
    """Docs with <3 (or <2) tokens must yield no shingles/bigrams, not an
    INVALID_INDEX_OF_ZERO crash from sequence() descending through -1."""
    import pyspark.sql.functions as F
    from data_engineering_examples_spark.plans.registry import all_specs

    rows = [
        (1, "", "en", "web", 0),
        (2, "one", "en", "web", 3),
        (3, "two words", "en", "web", 9),
        (4, "three words here", "en", "web", 16),
        (5, "a longer document with several words in it", "en", "web", 42),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    specs = all_specs()
    # q23/q24: only docs 4,5 produce trigram shingles; no pairs expected
    assert specs["q23_ngram_jaccard_pairs"].fn(spark, sf).count() == 0
    assert specs["q24_minhash_lsh_pairs"].fn(spark, sf).count() == 0
    # q28: bigrams only from docs 3,4,5
    bigrams = {r.bigram for r in specs["q28_top_bigrams"].fn(spark, sf).collect()}
    assert "two words" in bigrams and "three words" in bigrams
    # q51: all 5 docs present, short ones with zero fingerprints
    fps = {r.doc_id: r.n_fps for r in specs["q51_winnow_fingerprint"].fn(spark, sf).collect()}
    assert fps[1] == 0 and fps[2] == 0 and fps[5] > 0


def test_hot_shingle_df_cap_prunes_boilerplate_pairs(spark, tmp_path):
    """q23's shingle-df-cap guard: a shingle shared by more docs than the
    cap contributes NO candidate pairs (the O(d²) blowup guard), while
    genuinely similar docs still pair. Verified by lowering the cap via
    monkeypatched constant semantics — here we build a corpus where one
    boilerplate trigram spans every doc and check it alone never creates
    a pair once its df exceeds the cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from unittest import mock

    from data_engineering_examples_spark.plans import dedup_queries

    # 6 docs all sharing ONE boilerplate trigram ("shared boiler plate"),
    # plus doc 0/1 being real near-dups with their own shingles.
    boiler = "shared boiler plate"
    docs = [
        (0, f"{boiler} alpha beta gamma delta epsilon zeta"),
        (1, f"{boiler} alpha beta gamma delta epsilon eta"),
        (2, f"{boiler} one two three four"),
        (3, f"{boiler} five six seven eight"),
        (4, f"{boiler} nine ten eleven twelve"),
        (5, f"{boiler} thirteen fourteen fifteen sixteen"),
    ]
    d = tmp_path / "hotdf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": [r[1] for r in docs],
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )

    # force the computed cap to 4 (the r10 cap is N-relative with a
    # floor; the tiny fixture would otherwise get the floor of 64)
    with mock.patch.object(dedup_queries, "_shingle_df_cap", lambda n: 4):
        rows = dedup_queries.q23_ngram_jaccard_pairs(spark, str(d)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    # boilerplate df=6 > cap=4: it cannot be the pair generator, so the
    # docs related ONLY through it never pair...
    assert not {p for p in pairs if p[0] >= 2 or p[1] >= 2}
    # ...but 0/1 still pair through their 4 shared non-boilerplate shingles
    assert (0, 1) in pairs


def test_dedup_clusters_are_transitive(spark, dup_corpus):
    """q72: exact edges (0-1, 0-2) and the LSH edge (0-3) must merge into
    ONE cluster keyed by the min doc_id, even though 1~3 / 2~3 never
    collide directly; the unrelated doc stays a singleton keeper."""
    rows = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_keeper)
        for r in all_specs()["q72_dedup_clusters"].fn(spark, dup_corpus).collect()
    }
    assert rows[0] == (0, 4, True)
    assert rows[1] == (0, 4, False)
    assert rows[2] == (0, 4, False)
    assert rows[3] == (0, 4, False)
    assert rows[4] == (4, 1, True)
