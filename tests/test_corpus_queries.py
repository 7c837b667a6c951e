"""Behavioral tests for the corpus-preparation queries (q77-q80): does
segment dedup actually drop repeated segments, does PII scrubbing redact,
does decontamination flag eval overlap, do chunks tile correctly?
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.corpus_queries import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    DECON_MOD,
    PII_PATTERNS,
)
from data_engineering_examples_spark.plans.registry import all_specs


def _write_documents(path, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": [d[1] for d in docs],
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )
    return str(path)


def test_segment_dedup_drops_repeated_segments(spark, tmp_path):
    # SEG_LEN=4: docs 0 and 1 share their first 4-word segment verbatim;
    # each doc's tail segment is unique. Doc 2 is entirely unique.
    shared = "alpha beta gamma delta"
    docs = [
        (0, f"{shared} one two three four"),
        (1, f"{shared} five six seven eight"),
        (2, "nine ten eleven twelve"),
    ]
    sf = _write_documents(tmp_path, docs)
    rows = {
        r.doc_id: r for r in all_specs()["q77_segment_dedup"].fn(spark, sf).collect()
    }
    assert rows[0].n_segments == 2 and rows[0].n_kept == 1
    assert rows[0].clean_text == "one two three four"
    assert rows[1].clean_text == "five six seven eight"
    # fully-unique doc survives intact
    assert rows[2].n_kept == 1 and rows[2].clean_text == "nine ten eleven twelve"


def test_segment_dedup_null_clean_text_when_all_dropped(spark, tmp_path):
    docs = [(0, "same four word text"), (1, "same four word text")]
    sf = _write_documents(tmp_path, docs)
    rows = {
        r.doc_id: r for r in all_specs()["q77_segment_dedup"].fn(spark, sf).collect()
    }
    assert rows[0].n_kept == 0 and rows[0].clean_text is None


def test_pii_scrub_redacts_all_categories(spark):
    rows = all_specs()["q78_pii_scrub"].fn(spark, "unused").collect()
    assert len(rows) == 800
    raw_pats = [re.compile(p) for _, p, _ in PII_PATTERNS]
    n_redacted = 0
    for r in rows:
        # no raw PII survives in clean_text (email pattern would also
        # match nothing post-replace since '[EMAIL]' has no '@')
        for pat in raw_pats:
            assert not pat.search(r.clean_text), (r.note_id, r.clean_text)
        assert r.has_pii == (r.n_nhs + r.n_phones + r.n_emails > 0)
        n_redacted += int(r.has_pii)
    # fixture embeds PII in a majority-free mix; both classes must exist
    assert 0 < n_redacted < 800


def test_decontamination_flags_eval_overlap(spark, tmp_path):
    # doc 0 is the eval member (0 % DECON_MOD == 0); doc 1 copies its text
    # (full trigram overlap), doc 2 shares nothing.
    eval_text = "the quick brown fox jumps over the lazy dog"
    docs = [
        (0, eval_text),
        (1, eval_text),
        (2 * DECON_MOD + 1, "completely unrelated words with zero shared trigrams here"),
    ]
    sf = _write_documents(tmp_path, docs)
    rows = {
        r.doc_id: r for r in all_specs()["q79_decontamination"].fn(spark, sf).collect()
    }
    assert 0 not in rows  # eval members are excluded from the output
    assert rows[1].contaminated and rows[1].n_contaminated == rows[1].n_shingles
    assert not rows[2 * DECON_MOD + 1].contaminated


def test_chunks_tile_with_overlap(spark, tmp_path):
    n_tokens = CHUNK_LEN + CHUNK_STRIDE + 5  # 61 => 3 chunks at stride 24
    words = [f"w{i}" for i in range(n_tokens)]
    sf = _write_documents(tmp_path, [(0, " ".join(words))])
    rows = sorted(
        all_specs()["q80_doc_chunks"].fn(spark, sf).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert len(rows) == (n_tokens - 1) // CHUNK_STRIDE + 1
    # first chunk is the first CHUNK_LEN tokens
    assert rows[0].chunk_text.split(" ") == words[:CHUNK_LEN]
    # consecutive chunks overlap by CHUNK_LEN - CHUNK_STRIDE tokens
    overlap = rows[0].chunk_text.split(" ")[CHUNK_STRIDE:]
    assert rows[1].chunk_text.split(" ")[: CHUNK_LEN - CHUNK_STRIDE] == overlap
    # final partial chunk carries the tail and its true length
    assert rows[-1].n_chunk_tokens == n_tokens - 2 * CHUNK_STRIDE
    assert rows[-1].chunk_text.split(" ")[-1] == words[-1]
    # every chunk respects the window cap
    assert all(r.n_chunk_tokens <= CHUNK_LEN for r in rows)


@pytest.mark.parametrize("name", ["q77_segment_dedup", "q80_doc_chunks"])
def test_empty_and_single_word_docs_survive(spark, tmp_path, name):
    sf = _write_documents(tmp_path, [(0, "solo"), (1, "two words")])
    rows = all_specs()[name].fn(spark, sf).collect()
    assert {r.doc_id for r in rows} == {0, 1}


def test_source_mix_hits_target_proportions(spark, tmp_path):
    # sources src0..src3 get raw weights 1,2,3,4 (suffix % 4 + 1).
    # With 400 docs each: T = min(n / w_norm) = 1000, so expected kept
    # counts are 100/200/300/400 and src3 is kept in full (rate == 1.0).
    docs = []
    for s in range(4):
        for i in range(400):
            docs.append((s * 1000 + i, f"doc text {s} {i}"))
    sf = _write_documents_with_sources(
        tmp_path, docs, [f"src{d[0] // 1000}" for d in docs]
    )
    rows = all_specs()["q81_source_mix"].fn(spark, sf).collect()
    kept = {}
    for r in rows:
        kept[r.source] = kept.get(r.source, 0) + 1
    assert kept["src3"] == 400  # rate exactly 1.0 keeps everything
    # hash sampling is binomial: allow ~5 sigma around the expectation
    assert abs(kept["src0"] - 100) < 45
    assert abs(kept["src1"] - 200) < 55
    assert abs(kept["src2"] - 300) < 60
    # deterministic: the same call yields the identical sample
    again = {r.doc_id for r in all_specs()["q81_source_mix"].fn(spark, sf).collect()}
    assert again == {r.doc_id for r in rows}


def _write_documents_with_sources(path, docs, sources):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": [d[1] for d in docs],
                "lang": ["en"] * len(docs),
                "source": sources,
                "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )
    return str(path)


def test_sequence_pack_tiles_each_bucket(spark, tmp_path):
    from data_engineering_examples_spark.plans.corpus_queries import PACK_SEQ_LEN

    docs = [(i, " ".join(f"w{j}" for j in range(7 + (i * 13) % 400))) for i in range(60)]
    sf = _write_documents(tmp_path, docs)
    rows = all_specs()["q82_sequence_pack"].fn(spark, sf).collect()
    assert {r.doc_id for r in rows} == {d[0] for d in docs}
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.start_tok)
        # the packed stream tiles: first doc at offset 0, no gaps/overlaps
        assert rs[0].start_tok == 0
        for a, b in zip(rs, rs[1:]):
            assert a.start_tok + a.n_tokens == b.start_tok
        for r in rs:
            assert r.first_seq == r.start_tok // PACK_SEQ_LEN
            assert r.last_seq == (r.start_tok + r.n_tokens - 1) // PACK_SEQ_LEN
            assert r.n_seqs == r.last_seq - r.first_seq + 1
    # long docs must span multiple sequences
    assert any(r.n_seqs > 1 for r in rows)


def test_kmv_estimate_tracks_exact_distinct(spark):
    """KMV with k=64 has ~12.7% standard error; every group estimate at
    sf0.01 (150 true distinct users per type) must land well inside 3σ."""
    sf = "/root/testdata/sf0.01"
    from data_engineering_examples_spark.sources.tables import load_tables

    events = load_tables(spark, sf, ["events"])["events"]
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    rows = all_specs()["q85_kmv_distinct"].fn(spark, sf).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        rel_err = abs(r.est_distinct_users - exact[r.event_type]) / exact[r.event_type]
        assert rel_err < 0.4, (r.event_type, r.est_distinct_users, exact[r.event_type])


def test_kmv_is_exact_below_k(spark, tmp_path):
    """Fewer distinct members than the sketch size => the estimate IS the
    exact count (the KMV small-cardinality rule)."""
    # ts is nanos-since-epoch long, matching the testdata events layout
    # that load_tables() converts (sources/tables.py)
    rows = [
        (i, 1_700_000_000_000_000_000 + i, i % 10, "click", 1.0, "{}")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = all_specs()["q85_kmv_distinct"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_kept == 10 and out[0].est_distinct_users == 10


def test_source_mix_feasibility_bound_by_scarce_source(spark, tmp_path):
    """T = min(n_s / w_norm_s): a source that is scarce relative to its
    weight caps the whole sample, and that scarce source is kept whole."""
    # src3 wants 40% of the mix but has only 40 docs => T = 100:
    # expected kept ≈ 10 / 20 / 30 / 40
    docs, sources = [], []
    for s, n in ((0, 400), (1, 400), (2, 400), (3, 40)):
        for i in range(n):
            docs.append((s * 1000 + i, f"text {s} {i}"))
            sources.append(f"src{s}")
    sf = _write_documents_with_sources(tmp_path, docs, sources)
    kept = {}
    for r in all_specs()["q81_source_mix"].fn(spark, sf).collect():
        kept[r.source] = kept.get(r.source, 0) + 1
    assert kept["src3"] == 40  # the binding source is never subsampled
    assert abs(kept.get("src0", 0) - 10) <= 12
    assert abs(kept.get("src1", 0) - 20) <= 18
    assert abs(kept.get("src2", 0) - 30) <= 22


def test_pii_patterns_edge_shapes():
    """Pin the redaction regex semantics engine-independently (plain re):
    what matches, what near-misses don't."""
    pats = {name: re.compile(p) for name, p, _ in PII_PATTERNS}
    # NHS: exactly 3-3-4 digit groups with single spaces
    assert pats["nhs"].search("nhs number 485 777 3456")
    assert not pats["nhs"].search("ref 4857 77 3456")
    assert not pats["nhs"].search("485 777 34567")  # 5-digit tail: \b fails
    # phone: UK mobile, optional space after the first five digits
    assert pats["phone"].search("call 07700 900123 now")
    assert pats["phone"].search("call 07700900123 now")
    assert not pats["phone"].search("call 0870 0900123 now")  # not 07xxx
    # email: plus-addressing and subdomains match; bare @ does not
    assert pats["email"].search("x test+tag@sub.example.org y")
    assert not pats["email"].search("meet @ 5pm")


def test_pii_scrub_spark_matches_plain_re(spark, tmp_path):
    """The Spark regexp_replace cascade must equal Python re.sub applied
    in the same pattern order, including adjacent/overlapping hits."""
    notes = [
        (0, "a@b.co 07700 900123 485 777 3456"),
        (1, "no pii here at all"),
        (2, "double email one@example.org two@example.org"),
        (3, "nhs 485 777 3456 nhs 490 123 9876"),
        (4, "edge07700 900123 still redacts the number"),
    ]
    import data_engineering_examples_spark.plans.corpus_queries as cq

    pq.write_table(
        pa.table(
            {
                "note_id": pa.array([n[0] for n in notes], pa.int64()),
                "patient_ref": ["Patient/1"] * len(notes),
                "note_text": [n[1] for n in notes],
            }
        ),
        str(tmp_path / "clinical_notes.parquet"),
    )
    from unittest import mock

    with mock.patch.object(cq, "_FX_NOTES", str(tmp_path / "clinical_notes.parquet")):
        rows = {r.note_id: r.clean_text for r in cq.q78_pii_scrub(spark, "unused").collect()}

    for nid, text in notes:
        expected = text
        for _, pat, repl in PII_PATTERNS:
            expected = re.sub(pat, repl, expected)
        assert rows[nid] == expected, (nid, rows[nid], expected)


# ---------------------------------------------------------------------------
# q87 ranked retrieval / q88 vocab build


def test_retrieval_two_stage_topk_equals_naive(spark, tmp_path):
    """The salted local-window prune must be EXACT: same rows and ranks as
    one flat window per query over all candidates."""
    from pyspark.sql import Window

    from data_engineering_examples_spark.plans.text_queries import (
        RETRIEVAL_TOPK,
    )

    # 60 docs mixing the query terms so every query has > TOPK candidates
    docs = [
        (i, " ".join((["hash", "join"] * (i % 5 + 1)) + ["filler"] * (i % 7)))
        for i in range(30)
    ] + [
        (30 + i, " ".join(["spark", "stream", "window", "merge", "dup"][: i % 5 + 1] * 3))
        for i in range(30)
    ]
    sf = _write_documents(tmp_path, docs)
    got = all_specs()["q87_ranked_retrieval"].fn(spark, sf)

    naive_w = Window.partitionBy("query_id").orderBy(
        F.desc("n_match"), F.desc("sum_tf"), F.asc("dl"), F.asc("doc_id")
    )
    # rebuild candidates from the two-stage output's own inputs is circular;
    # instead rank ALL candidates flat by dropping the rnk filter: recompute
    # candidates from scratch with a plain window
    from data_engineering_examples_spark.plans.text_queries import (
        RETRIEVAL_QUERIES,
        _RETRIEVAL_TERMS,
    )

    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in sorted(RETRIEVAL_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    toks = F.split(d.text, " ")
    tok = d.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
    tf = (
        tok.filter(F.col("term").isin(_RETRIEVAL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    naive = (
        tf.join(qdf, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_match"),
            F.sum("tf").alias("sum_tf"),
            F.max("dl").alias("dl"),
        )
        .withColumn("rnk", F.row_number().over(naive_w))
        .filter(F.col("rnk") <= RETRIEVAL_TOPK)
        .select("query_id", "doc_id", "n_match", "sum_tf", "dl", "rnk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # and every query actually has a full page of results in this fixture
    per_q = {r["query_id"]: r["n"] for r in got.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_q[1] == RETRIEVAL_TOPK and per_q[2] == RETRIEVAL_TOPK


def test_vocab_ids_contiguous_and_frequency_ordered(spark, tmp_path):
    from data_engineering_examples_spark.plans.corpus_queries import (
        VOCAB_MIN_COUNT,
        VOCAB_SPECIALS,
    )

    docs = [
        (0, "apple apple apple banana banana cherry"),
        (1, "apple banana date date elder"),
        (2, "apple fig"),  # fig occurs once -> below MIN_COUNT, dropped
    ]
    sf = _write_documents(tmp_path, docs)
    rows = sorted(
        all_specs()["q88_vocab_build"].fn(spark, sf).collect(),
        key=lambda r: r["vocab_id"],
    )
    # specials occupy the first ids, in declaration order
    assert [r["term"] for r in rows[: len(VOCAB_SPECIALS)]] == list(VOCAB_SPECIALS)
    # ids are contiguous 0..N-1
    assert [r["vocab_id"] for r in rows] == list(range(len(rows)))
    # corpus terms ranked by (count desc, term asc); fig/cherry/elder occur
    # once each -> below VOCAB_MIN_COUNT=2, dropped
    assert VOCAB_MIN_COUNT == 2
    terms = [(r["term"], r["n_occurrences"], r["doc_freq"]) for r in rows[len(VOCAB_SPECIALS):]]
    assert terms == [("apple", 5, 3), ("banana", 3, 2), ("date", 2, 1)]
