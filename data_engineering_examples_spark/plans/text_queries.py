"""L4 — text-analysis operators over the ``documents`` table (LLM-pipeline
surface; builder brief "Text analysis").

Token counting, corpus statistics, n-gram frequency, quality scoring, and
an n-gram-profile language-ID heuristic — every one a pure Column
expression (split/explode/length/replace/aggregates), zero Python UDFs,
so the hot path stays inside whole-stage codegen.

Scale notes:
* q26/q29/q30 are map-only — no shuffle at all; they scale with scan
  bandwidth.
* q27 aggregates on (lang, source) — tiny key space, partial aggregation
  does almost all the work map-side; the final exchange moves ~|groups|
  rows.
* q28's explode multiplies rows by ~tokens-per-doc before the count
  shuffle; partial aggregation collapses that map-side too, so the
  exchange carries one row per distinct bigram per partition, not one per
  occurrence. Top-k uses orderBy+limit → TakeOrderedAndProject (no global
  sort materialization).

Substring-occurrence counting uses the length-difference idiom
``(len(s) - len(replace(s, sub, ''))) / len(sub)`` — identical semantics
in Spark and DuckDB, and cheaper than regex extraction at scale.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables, scale_out
from .registry import register

STOPWORDS = ["the", "a", "of", "and", "in"]

# char-bigram profiles for the language-ID heuristic: weights per bigram
# per language (deterministic toy profiles — the synthetic corpus shares
# one vocabulary across lang labels, so this tests the machinery, not
# linguistics).
LANG_PROFILES = {
    "en": ["th", "he", "er"],
    "de": ["ch", "ei", "en"],
    "es": ["os", "ar", "la"],
    "fr": ["le", "ou", "re"],
    "zh": ["zh", "ng", "sh"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _count_sub(col, sub: str):
    """Occurrences of ``sub`` in ``col`` via the length-difference idiom."""
    return (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit("")))) / len(sub)


# ---------------------------------------------------------------------------
# q26 — per-document token statistics (map-only).


@register(
    "q26_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(text) AS text_len,
           n_chars
    FROM documents
    """,
    doc="per-doc token counts (whitespace tokenizer); map-only, no shuffle",
    tags=("text", "llm"),
)
def q26_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tokens = F.split(d.text, " ")
    return d.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct_tokens"),
        F.length(d.text).cast("long").alias("text_len"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# q27 — corpus statistics by (lang, source): the partial-agg sweet spot.


@register(
    "q27_corpus_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
    doc="corpus stats by (lang, source); map-side partial agg does the work",
    tags=("text", "llm"),
)
def q27_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(F.split(d.text, " "))).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# q28 — top-20 word bigrams (explode → count → top-k with deterministic
# tie-break so the LIMIT boundary is stable for the oracle compare).


@register(
    "q28_top_bigrams",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM tok
    )
    SELECT bigram, count(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 20
    """,
    doc="top-20 word bigrams; partial agg collapses occurrences map-side",
    tags=("text", "llm", "J4"),
)
def q28_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Positions exploded first, bigram string built ROW-WISE: stays in
    # whole-stage codegen (a transform() lambda building the bigram array
    # evaluates interpreted — measurably slower on this hot path).
    d = _docs(spark, sf_dir)
    tk = d.select(F.split(d.text, " ").alias("t"))
    # single-token docs must not reach sequence(): sequence(0, -1) yields
    # [0,-1] and element_at(t, 0) throws — filter keeps null-tolerant
    # "no bigrams" semantics
    pos = tk.filter(F.size("t") >= 2).select(
        "t", F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i")
    )
    bigram = F.concat_ws(
        " ", F.element_at("t", F.col("i") + 1), F.element_at("t", F.col("i") + 2)
    )
    return (
        pos.select(bigram.alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q29 — quality scoring: stopword ratio, mean token length, length gates.
# The keep/drop heuristic shape used by LLM data pipelines; all arithmetic
# over ints → bit-identical across engines.


@register(
    "q29_quality_score",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({STOPWORDS!r}, w))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_stop,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS mean_token_len,
           (n_tokens >= 10 AND n_tokens <= 200
            AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5) AS keep
    FROM s
    """,
    doc="doc quality gates: stopword ratio + mean token length + bounds",
    tags=("text", "llm"),
)
def q29_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.split(d.text, " ")
    n_tokens = F.size(t)
    n_stop = F.size(F.filter(t, lambda w: w.isin(STOPWORDS)))
    base = d.select(
        "doc_id",
        "n_chars",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
    )
    ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    # single-space-joined text: sum(len(token)) == n_chars - (n_tokens - 1)
    mean_len = (F.col("n_chars") - F.col("n_tokens") + 1).cast("double") / F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        (
            (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 200) & (ratio < 0.5)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# q30 — n-gram-profile language ID: score each language's char-bigram
# profile by occurrence counts, pick the argmax (deterministic tie order =
# profile declaration order via the CASE chain).


def _duck_lang_score(lang: str) -> str:
    return " + ".join(
        f"(length(text) - length(replace(text, '{bg}', ''))) / 2"
        for bg in LANG_PROFILES[lang]
    )


@register(
    "q30_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
        {", ".join(f"CAST({_duck_lang_score(lg)} AS DOUBLE) AS sc_{lg}" for lg in LANG_PROFILES)}
      FROM documents
    )
    SELECT doc_id, lang,
      {", ".join(f"sc_{lg}" for lg in LANG_PROFILES)},
      CASE {" ".join(f"WHEN sc_{lg} = greatest({', '.join('sc_' + l for l in LANG_PROFILES)}) THEN '{lg}'" for lg in LANG_PROFILES)}
      END AS lang_guess
    FROM s
    """,
    doc="char-bigram-profile language ID heuristic; map-only, deterministic argmax",
    tags=("text", "llm"),
)
def q30_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    scores = {
        lg: sum(_count_sub(d.text, bg) for bg in LANG_PROFILES[lg]).cast("double")
        for lg in LANG_PROFILES
    }
    base = d.select(
        "doc_id", "lang", *[c.alias(f"sc_{lg}") for lg, c in scores.items()]
    )
    best = F.greatest(*[F.col(f"sc_{lg}") for lg in LANG_PROFILES])
    expr = None
    for lg in LANG_PROFILES:
        cond = F.col(f"sc_{lg}") == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return base.select(
        "doc_id",
        "lang",
        *[f"sc_{lg}" for lg in LANG_PROFILES],
        expr.alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# q48 — BPE-ish regex tokenization: word pieces + punctuation as separate
# tokens (the pre-tokenizer split most BPE vocabularies assume),
# vs the whitespace count — both via regexp_extract_all, JVM-side.

_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "q48_regex_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(list_distinct(regexp_extract_all(text, '{_TOKEN_RE}'))) AS n_distinct_bpe
    FROM documents
    """,
    doc="BPE-ish regex pre-tokenizer counts vs whitespace tokens; map-only",
    tags=("text", "llm", "F11"),
)
def q48_regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(d.text, F.lit(_TOKEN_RE), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.split(d.text, " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe"),
    )


# ---------------------------------------------------------------------------
# q51 — document fingerprinting via rolling k-gram hashes + winnowing
# (builder brief "document fingerprinting (rolling hash)"; the winnowing
# scheme of Schleimer/Wilkerson/Aiken, SIGMOD'03). For every k-char window
# we take an md5-derived 60-bit hash (cross-engine-stable, same trick as
# the dedup module), then keep the minimum hash of each w consecutive
# k-grams — the classic fingerprint set that is robust to insertions.
#
# Scale shape: map-only (per-document array math inside codegen, no
# explode, no shuffle) — scales with scan bandwidth exactly like q26/q29.
# The per-doc fingerprint SET is summarised (count/min/max) rather than
# exploded so the result stays O(rows), not O(chars).

FP_K = 8  # k-gram length in chars
FP_W = 4  # winnowing window (w consecutive k-grams)


def _md5_int_col(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


@register(
    "q51_winnow_fingerprint",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             CASE WHEN length(text) >= {FP_K}
                  THEN list_transform(range(1, length(text) - {FP_K} + 2),
                         i -> CAST(('0x' || substr(md5(substr(text, i, {FP_K})), 1, 15))::UBIGINT AS BIGINT))
                  ELSE []::BIGINT[] END AS hs
      FROM documents),
    f AS (
      SELECT doc_id, hs,
             CASE WHEN len(hs) >= {FP_W}
                  THEN list_transform(range(1, len(hs) - {FP_W} + 2),
                         j -> list_min(hs[j:j + {FP_W} - 1]))
                  ELSE []::BIGINT[] END AS fps
      FROM h)
    SELECT doc_id,
           CAST(len(hs) AS INT) AS n_kgrams,
           CAST(len(list_distinct(fps)) AS INT) AS n_fps,
           list_min(fps) AS min_fp,
           list_max(fps) AS max_fp
    FROM f
    """,
    doc="rolling-hash k-gram + winnowing fingerprint summary (map-only)",
    tags=("text", "dedup", "llm"),
)
def q51_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-character-position hashing is by far the heaviest map work
    # in the repo; never let it inherit a one-row-group scan's parallelism
    docs = scale_out(_docs(spark, sf_dir))
    t = docs.text
    empty = F.array().cast("array<bigint>")
    hs = F.when(
        F.length(t) >= FP_K,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - FP_K + 1),
            lambda i: _md5_int_col(t.substr(i, F.lit(FP_K))),
        ),
    ).otherwise(empty)
    with_h = docs.select("doc_id", hs.alias("hs"))
    fps = F.when(
        F.size("hs") >= FP_W,
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - FP_W + 1),
            lambda j: F.array_min(F.slice("hs", j, FP_W)),
        ),
    ).otherwise(empty)
    with_f = with_h.select("doc_id", "hs", fps.alias("fps"))
    return with_f.select(
        "doc_id",
        F.size("hs").alias("n_kgrams"),
        F.size(F.array_distinct("fps")).alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# q62 — repetition / diversity quality signals (the Gopher-rules family
# of quality filters): distinct-token ratio, top-token share, top-bigram
# share per document. All ratios are bigint/bigint single divisions —
# deterministic across engines. Two shuffles keyed on doc-scoped keys
# ((doc, token) then doc), both with map-side partial aggregation; at
# 100 TB this is the standard two-level word-count shape.


@register(
    "q62_repetition_signals",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    tstats AS (
      SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_c
      FROM tc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 2
    ),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
    bstats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bc FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_distinct AS DOUBLE) / t.n_tokens AS distinct_ratio,
           CAST(t.top_c AS DOUBLE) / t.n_tokens AS top_token_share,
           CAST(b.top_bc AS DOUBLE) / b.n_bigrams AS top_bigram_share
    FROM tstats t LEFT JOIN bstats b ON b.doc_id = t.doc_id
    """,
    doc="Gopher-style repetition signals: distinct ratio, top token/bigram share",
    tags=("text", "llm", "quality"),
)
def q62_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scale_out(_docs(spark, sf_dir))
    tok = d.select("doc_id", F.explode(F.split(d.text, " ")).alias("w"))
    tc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    tstats = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )

    tk = d.select("doc_id", F.split(d.text, " ").alias("t"))
    pos = tk.filter(F.size("t") >= 2).select(
        "doc_id", "t", F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i")
    )
    bigram = F.concat_ws(
        " ", F.element_at("t", F.col("i") + 1), F.element_at("t", F.col("i") + 2)
    )
    bc = (
        pos.select("doc_id", bigram.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bstats = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc")
    )
    return (
        tstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("distinct_ratio"),
            (F.col("top_c").cast("double") / F.col("n_tokens")).alias("top_token_share"),
            (F.col("top_bc").cast("double") / F.col("n_bigrams")).alias("top_bigram_share"),
        )
    )


# ---------------------------------------------------------------------------
# q67 — the CLEAN CORPUS: what a training-data pipeline actually emits.
# Composes three oracle-checked stages — the q29 quality gate (length
# bounds + stopword ratio), the q61 dedup verdict (exact keep-first +
# LSH near-dup drop), and per-doc token stats — into the final kept
# document set with corpus summary columns. Every stage reuses the
# registered query function (and the shared DuckDB CTE helpers), so the
# composite can never drift from its components. Plan shape: the
# verdict's drop-set broadcasts and the quality gate is map-only, so
# the composition adds no new wide shuffle over the component queries.


@register(
    "q67_clean_corpus",
    oracle=None,  # composed below at import time
    doc="end-to-end clean corpus: quality gate ∘ dedup verdict ∘ token stats",
    tags=("text", "dedup", "llm", "pipeline"),
)
def q67_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_queries import q61_dedup_verdict

    d = _docs(spark, sf_dir)
    quality = q29_quality_score(spark, sf_dir).select("doc_id", "n_tokens", "keep")
    verdict = q61_dedup_verdict(spark, sf_dir)
    return (
        d.select("doc_id", "lang", "source")
        .join(quality, "doc_id")
        .join(verdict, "doc_id")
        .filter(F.col("keep") & (F.col("verdict") == "keep"))
        .select("doc_id", "lang", "source", "n_tokens")
    )


def _q67_oracle() -> str:
    from .dedup_queries import _duck_minhash_bands_cte

    return f"""
    WITH {_duck_minhash_bands_cte()},
    near_drop AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    exact_drop AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               min(doc_id) OVER (
                 PARTITION BY sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               ) AS keeper
        FROM documents
      ) WHERE doc_id <> keeper
    ),
    q AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({STOPWORDS!r}, w))) AS n_stop
      FROM documents
    )
    SELECT q.doc_id, q.lang, q.source, q.n_tokens
    FROM q
    LEFT JOIN exact_drop e ON e.doc_id = q.doc_id
    LEFT JOIN near_drop n ON n.doc_id = q.doc_id
    WHERE e.doc_id IS NULL AND n.doc_id IS NULL
      AND q.n_tokens >= 10 AND q.n_tokens <= 200
      AND CAST(q.n_stop AS DOUBLE) / q.n_tokens < 0.5
    """


# attach the composed oracle (needs the dedup module import at call time)
from .registry import _REGISTRY as _R  # noqa: E402

_R["q67_clean_corpus"].oracle = _q67_oracle()


# ---------------------------------------------------------------------------
# q73 — top terms per document (the TF-IDF keyword surface). Classic
# two-level shape: tf per (doc, term), df per term (one extra shuffle on
# the term key), corpus size broadcast, per-doc top-k via partitioned
# window. The emitted columns are the RAW integer components (tf, df,
# n_docs) and a rank on (tf DESC, df ASC, term ASC).
#
# Why no ln(N/df) in the hashed surface: transcendental libm results are
# NOT bit-identical across engines — measured Spark (JVM Math.log) vs
# DuckDB (libm log) disagreeing by 1 ulp on 393 of 5000 ln(N/df) inputs —
# so a float idf would make the cross-engine hash flaky by construction.
# The integer ordering (most frequent, then rarest, then lexical) is a
# deterministic keyword heuristic, and consumers can apply any idf
# flavour to (tf, df, n_docs) without re-scanning the corpus.

TOPK_TERMS = 5


@register(
    "q73_tfidf_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ranked AS (
      SELECT t.doc_id, t.term, t.tf, d.df, n.n_docs,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rnk
      FROM tf t JOIN df d ON d.term = t.term, n
    )
    SELECT doc_id, term, tf, df, n_docs, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {TOPK_TERMS}
    """,
    doc="per-doc top-k terms by (tf desc, df asc): the TF-IDF keyword surface",
    tags=("text", "llm"),
)
def q73_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scale_out(_docs(spark, sf_dir))
    tok = d.select("doc_id", F.explode(F.split(d.text, " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK_TERMS)
        .select("doc_id", "term", "tf", "df", "n_docs", "rnk")
    )


# ---------------------------------------------------------------------------
# q87 — ranked retrieval: top-k documents per query over an inverted-index
# probe (the BM25-shaped retrieval step used for corpus curation:
# decontamination lookups, quality-by-retrieval, eval-set mining).
#
# Scale design:
# * The term filter (`isin` over the union of query terms) runs BEFORE any
#   shuffle — the scan only surfaces postings for query terms, so the
#   groupBy moves |matching tokens| rows, not the corpus.
# * Document length (dl) rides along the exploded tokens and collapses in
#   the same partial aggregate — no second join against the corpus.
# * Top-k per query is TWO-STAGE: a salted local window (query_id,
#   doc_id % NSALT) keeps k survivors per salt bucket, then the global
#   window ranks <= k*NSALT rows per query. A single window partitioned
#   only by query_id would funnel every candidate for a query through one
#   task — the classic top-k skew at 100 TB. The order key
#   (n_match DESC, sum_tf DESC, dl ASC, doc_id ASC) is total (doc_id is
#   unique), so the two-stage reduction is EXACT, not approximate.
# * The hashed surface emits the integer BM25 components (n_match,
#   sum_tf, dl; per-term df is q73's surface) rather than a float score:
#   transcendental idf terms are not bit-identical across engines (see
#   q73's ulp note), and any BM25/TF-IDF weighting is a deterministic
#   function of the emitted integers.

RETRIEVAL_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("hash", "join"),
    2: ("spark", "stream", "window"),
    3: ("dup", "merge"),
}
RETRIEVAL_TOPK = 10
_RETRIEVAL_NSALT = 8

_RETRIEVAL_TERMS = sorted({t for ts in RETRIEVAL_QUERIES.values() for t in ts})


def _retrieval_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts in sorted(RETRIEVAL_QUERIES.items())
        for t in ts
    )
    in_list = ", ".join(f"'{t}'" for t in _RETRIEVAL_TERMS)
    return f"""
    WITH q AS (SELECT * FROM (VALUES {values}) AS v(query_id, term)),
    tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
      FROM tok WHERE term IN ({in_list})
      GROUP BY doc_id, term
    ),
    cand AS (
      SELECT q.query_id, t.doc_id, count(*) AS n_match,
             CAST(sum(t.tf) AS BIGINT) AS sum_tf,
             CAST(max(t.dl) AS INT) AS dl
      FROM tf t JOIN q USING (term)
      GROUP BY q.query_id, t.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY n_match DESC, sum_tf DESC, dl ASC, doc_id ASC) AS rnk
      FROM cand
    )
    SELECT query_id, doc_id, n_match, sum_tf, dl, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {RETRIEVAL_TOPK}
    """


@register(
    "q87_ranked_retrieval",
    oracle=_retrieval_oracle(),
    doc="top-k docs per query via inverted-index probe + exact two-stage top-k",
    tags=("text", "llm", "retrieval"),
)
def q87_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scale_out(_docs(spark, sf_dir))
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, ts in sorted(RETRIEVAL_QUERIES.items())
            for t in ts
        ],
        "query_id int, term string",
    )
    toks = F.split(d.text, " ")
    tok = d.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
    tf = (
        tok.filter(F.col("term").isin(_RETRIEVAL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf"))
    )
    cand = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_match"),
            F.sum("tf").alias("sum_tf"),
            F.max("dl").alias("dl"),
        )
    )
    order = [F.desc("n_match"), F.desc("sum_tf"), F.asc("dl"), F.asc("doc_id")]
    w_local = Window.partitionBy(
        "query_id", F.pmod(F.col("doc_id"), F.lit(_RETRIEVAL_NSALT))
    ).orderBy(*order)
    pruned = (
        cand.withColumn("lrnk", F.row_number().over(w_local))
        .filter(F.col("lrnk") <= RETRIEVAL_TOPK)
        .drop("lrnk")
    )
    w_glob = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rnk", F.row_number().over(w_glob))
        .filter(F.col("rnk") <= RETRIEVAL_TOPK)
        .select("query_id", "doc_id", "n_match", "sum_tf", "dl", "rnk")
    )


# ---------------------------------------------------------------------------
# q108 — PMI collocation mining: rank bigrams by how much more often the
# pair occurs than independence predicts — the phrase-extraction signal
# feeding tokenizer merge rules and multi-word-expression lists. Raw
# top-count bigrams (q28) surface "of the"; PMI surfaces "new york".
#
# Determinism: instead of log-PMI (whose transcendental evaluation may
# differ across engines in the last ulp), the score is the exact lift
# ratio n_ab·N / (n_a·n_b) — both products fit double's exact-integer
# range (< 2^53), so one double division gives bit-identical scores.
# Monotone in PMI, so the ranking is the PMI ranking.
#
# Scale shape: three partial-combined counts (bigrams, left unigrams,
# right unigrams — unigram table computed once and joined twice), two
# broadcast joins of the (small, min-count-pruned) unigram side, then
# sort+limit = TakeOrderedAndProject. No global window anywhere.

PMI_MIN_PAIR = 5   # n_ab floor: kills noise pairs before scoring
PMI_TOP = 20


@register(
    "q108_pmi_bigrams",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (
      SELECT term, count(*) AS n FROM (
        SELECT unnest(t) AS term FROM tok)
      WHERE term <> '' GROUP BY term
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM uni),
    bg AS (
      SELECT w1, w2, count(*) AS n_ab FROM (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
        FROM tok)
      WHERE w1 <> '' AND w2 <> ''
      GROUP BY w1, w2 HAVING count(*) >= {PMI_MIN_PAIR}
    )
    SELECT b.w1 || ' ' || b.w2 AS bigram,
           CAST(b.n_ab AS BIGINT) AS n_ab,
           CAST(a.n AS BIGINT) AS n_left,
           CAST(c.n AS BIGINT) AS n_right,
           CAST(b.n_ab * t.big_n AS DOUBLE) / CAST(a.n * c.n AS DOUBLE) AS lift
    FROM bg b
    JOIN uni a ON a.term = b.w1
    JOIN uni c ON c.term = b.w2
    CROSS JOIN tot t
    ORDER BY lift DESC, bigram LIMIT {PMI_TOP}
    """,
    doc=f"PMI collocation mining: top-{PMI_TOP} bigrams by exact lift "
    "ratio (integer-exact score, monotone in PMI)",
    tags=("text", "llm", "vocab"),
)
def q108_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    tk = d.select(F.split(d.text, " ").alias("t"))
    uni = (
        tk.select(F.explode("t").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    big_n = uni.agg(F.sum("n").cast("bigint").alias("big_n"))
    pos = tk.filter(F.size("t") >= 2).select(
        "t", F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i")
    )
    pairs = pos.select(
        F.element_at("t", F.col("i") + 1).alias("w1"),
        F.element_at("t", F.col("i") + 2).alias("w2"),
    ).filter((F.col("w1") != "") & (F.col("w2") != ""))
    bg = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_PAIR)
    )
    left = F.broadcast(uni.select(F.col("term").alias("w1"), F.col("n").alias("n_left")))
    right = F.broadcast(uni.select(F.col("term").alias("w2"), F.col("n").alias("n_right")))
    scored = (
        bg.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(big_n))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
            (
                (F.col("n_ab") * F.col("big_n")).cast("double")
                / (F.col("n_left") * F.col("n_right")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(PMI_TOP)


# ---------------------------------------------------------------------------
# q170 — distributed BPE merge-step: the first iteration of byte-pair-
# encoding tokenizer training (count adjacent symbol pairs across the
# corpus, weighted by word frequency; the argmax pair becomes the next
# merge).  The canonical distributed formulation: collapse the corpus to
# a WORD FREQUENCY table first (vocabulary-sized, not corpus-sized),
# then explode each distinct word's adjacent character pairs ONCE and
# weight by its count — pair-extraction work is O(vocab × word_len),
# independent of corpus row count.  All counts integer; top-k via
# TakeOrderedAndProject with a full deterministic tie-break.


BPE_TOP = 20


@register(
    "q170_bpe_merge_pairs",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY word
    ),
    p AS (
      SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, n
      FROM wc, unnest(range(1, length(word))) AS t(i)
      WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count,
           CAST(count(*) AS BIGINT) AS n_words
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT {BPE_TOP}
    """,
    doc=f"BPE tokenizer merge-step: top-{BPE_TOP} adjacent char pairs "
    "weighted by word frequency; pair work is vocab-sized, not "
    "corpus-sized",
    tags=("text", "llm", "vocab"),
)
def q170_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # corpus → word-frequency table: the only corpus-sized shuffle.
    wc = (
        d.select(F.explode(F.split(d.text, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # vocabulary-sized pair explosion: positions exploded, pair built
    # row-wise with substr so it stays in whole-stage codegen.
    pos = wc.filter(F.length("word") >= 2).select(
        "word", "n", F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i")
    )
    pairs = pos.select(
        F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"), "n"
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("n").cast("bigint").alias("pair_count"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_TOP)
    )


# ---------------------------------------------------------------------------
# q173 — per-source token concentration (Herfindahl index): how
# head-heavy each source's token distribution is — a diversity signal
# LLM pipelines use next to entropy, but exactly computable in integer
# arithmetic (entropy needs log(); HHI is Σcᵢ²/N², one rational).  The
# Spark shape is a two-level aggregate: (source, term) counts — partial
# agg collapses occurrences map-side — then one bounded |source|-sized
# rollup.  hhi_micros = Σcᵢ² × 1e6 div N² stays in BIGINT: Σcᵢ² is
# capped by N·max(cᵢ) and the ×1e6 happens after the division's
# numerator is reduced per-source.


@register(
    "q173_source_token_hhi",
    oracle="""
    WITH tc AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, count(*) AS c
      FROM tc WHERE term <> '' GROUP BY source, term
    )
    SELECT source, n_tokens, n_terms, top_term_count,
           CAST(sum_c2 * 1000000 // (n_tokens * n_tokens) AS BIGINT)
             AS hhi_micros
    FROM (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(max(c) AS BIGINT) AS top_term_count,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM counts GROUP BY source
    )
    """,
    doc="per-source token Herfindahl concentration in exact integer "
    "micro-units: two-level agg (map-side partial on (source, term)), "
    "bounded |source| rollup, no log()",
    tags=("text", "llm", "A4"),
)
def q173_source_token_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    counts = (
        d.select("source", F.explode(F.split(d.text, " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.max("c").cast("bigint").alias("top_term_count"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    return per.select(
        "source",
        "n_tokens",
        "n_terms",
        "top_term_count",
        F.expr("sum_c2 * 1000000 div (n_tokens * n_tokens)")
        .cast("bigint")
        .alias("hhi_micros"),
    )


# ---------------------------------------------------------------------------
# q181 — sparse TF-vector cosine pair mining via the inverted index:
# exact document-document cosine over term-frequency vectors, the
# lexical complement to q49's dense-embedding near-dup.  The posting
# join is df-capped (terms appearing in more than DF_CAP docs are
# dropped from PAIR GENERATION — the q23 hot-shingle rule: ubiquitous
# terms produce quadratic pair blowup and near-zero discrimination),
# while norms are computed over the FULL vector so the cosine is the
# true capped-numerator bound.  All numerators and squared norms are
# exact integers; the only floats are two correctly-rounded sqrts and
# one division per surviving pair.

SPARSE_DF_CAP = 64
SPARSE_TOP = 50


@register(
    "q181_sparse_cosine_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    norms AS (
      SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS ss FROM tf GROUP BY doc_id
    ),
    keep AS (
      SELECT term FROM tf GROUP BY term
      HAVING count(*) BETWEEN 2 AND {SPARSE_DF_CAP}
    ),
    num AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot,
             CAST(count(*) AS BIGINT) AS shared_terms
      FROM tf a
      JOIN tf b ON b.term = a.term AND a.doc_id < b.doc_id
      JOIN keep k ON k.term = a.term
      GROUP BY 1, 2
    )
    SELECT n.doc_a, n.doc_b, n.dot, n.shared_terms,
           CAST(n.dot AS DOUBLE)
             / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE)))
             AS cosine
    FROM num n
    JOIN norms na ON na.doc_id = n.doc_a
    JOIN norms nb ON nb.doc_id = n.doc_b
    ORDER BY cosine DESC, doc_a, doc_b LIMIT {SPARSE_TOP}
    """,
    doc=f"sparse tf-vector cosine pairs via df-capped (<= {SPARSE_DF_CAP}) "
    "inverted-index join; integer dot/norms, full-vector normalization, "
    f"top-{SPARSE_TOP}",
    tags=("text", "llm", "dedup"),
)
def q181_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    d = _docs(spark, sf_dir)
    tf = materialize(
        d.select("doc_id", F.explode(F.split(d.text, " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf")),
        "q181_tf",  # feeds norms, the df filter, and both join sides
    )
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("ss")
    )
    keep = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= SPARSE_DF_CAP))
        .select("term")
    )
    posting = tf.join(keep, "term")
    a = posting.select(
        "term", F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a")
    )
    b = posting.select(
        "term", F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b")
    )
    num = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"),
            F.count(F.lit(1)).cast("bigint").alias("shared_terms"),
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("ss_a").cast("double")) * F.sqrt(F.col("ss_b").cast("double"))
    )
    return (
        num.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "dot", "shared_terms", cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(SPARSE_TOP)
    )


# ---------------------------------------------------------------------------
# q204 — tokenizer merge application (the encode-side twin of q170's
# merge LEARNING step): apply a FIXED ordered merge table to the
# whitespace token stream and account for the compression it buys.
# Each rule glues one adjacent pair into a single token (' a b ' →
# ' a_b '), applied as a chain of literal (non-regex) replaces in rule
# order over the space-padded text — left-to-right, non-overlapping,
# byte-identical in both engines because `replace` carries no regex
# dialect.  One precise caveat: the pattern consumes the separator it
# shares with an immediately following occurrence, so a back-to-back
# repeat of one rule's pair ('a b a b') merges alternate occurrences
# only — a deliberate contract for this fixed-rule compression metric
# (both engines agree by construction).  q239's trainer, where true
# greedy application matters, uses the double-space representation
# instead.  Token counts fall out of the split length.
#
# Scale shape: map-only string work inside whole-stage codegen — no
# explode, no shuffle; scales with scan bandwidth like q26/q48.  The
# merge table is a broadcast-sized constant (real vocabularies ship
# thousands of rules; the chain stays map-only — rules become a
# generated expression, not a join).

Q204_MERGES = (
    ("table", "hash"),
    ("part", "filter"),
    ("customer", "join"),
    ("slow", "key"),
    ("merge", "group"),
    ("vector", "small"),
    ("big", "order"),
    ("filter", "small"),
)


def _q204_duck_chain() -> str:
    expr = "' ' || text || ' '"
    for a, b in Q204_MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}_{b} ')"
    return expr


@register(
    "q204_bpe_apply_merges",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_before,
           CAST(len(string_split(trim({_q204_duck_chain()}), ' ')) AS INT)
             AS n_tokens_after,
           CAST(len(string_split(text, ' '))
                - len(string_split(trim({_q204_duck_chain()}), ' ')) AS INT)
             AS n_merged
    FROM documents
    """,
    doc=f"apply {len(Q204_MERGES)} fixed tokenizer merge rules as a "
    "literal-replace chain (map-only, codegen); per-doc token counts "
    "before/after — the encode-side twin of q170's merge learning",
    tags=("text", "llm", "vocab"),
)
def q204_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    merged = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    for a, b in Q204_MERGES:
        merged = F.replace(merged, F.lit(f" {a} {b} "), F.lit(f" {a}_{b} "))
    before = F.size(F.split(F.col("text"), " "))
    after = F.size(F.split(F.trim(merged), " "))
    return d.select(
        "doc_id",
        before.alias("n_tokens_before"),
        after.alias("n_tokens_after"),
        (before - after).alias("n_merged"),
    )


# ---------------------------------------------------------------------------
# q212 — periodic-repetition audit: the degenerate-loop pathology
# ("foo bar foo bar foo bar ...") that share-based signals (q62's
# top-token / top-bigram shares) under-detect when the loop body is
# long.  For each candidate period p, the token stream is compared
# against itself shifted by p — match fraction ≈ 1 means the document
# IS a p-periodic loop.  Reported per doc: the best (smallest-winning)
# period and its match fraction in integer micro-units.
#
# Scale shape: map-only — per-row array zip_with + aggregate inside
# codegen, no explode, no shuffle; scales with scan bandwidth like
# q26/q51.  Short docs (n <= p) score 0 for that period.

Q212_PERIODS = (1, 2, 3, 4, 8)


def _q212_duck_match(p: int) -> str:
    return f"""CASE WHEN len(t) > {p} THEN
        CAST(len(list_filter(range(1, len(t) - {p} + 1),
                             i -> t[i] = t[i + {p}])) AS BIGINT)
        ELSE 0 END"""


@register(
    "q212_periodicity_audit",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    m AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             {", ".join(f"{_q212_duck_match(p)} AS m{p}" for p in Q212_PERIODS)}
      FROM tok
    ),
    scored AS (
      SELECT doc_id, n_tokens, u.p AS period,
             CASE WHEN n_tokens > u.p
                  THEN u.m * 1000000 // (n_tokens - u.p) ELSE 0 END AS micros
      FROM m, unnest([{", ".join(f"{{'p': {p}, 'm': m{p}}}" for p in Q212_PERIODS)}])
             AS _(u)
    )
    SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           -- (micros desc, period asc) as one integer key: micros*16
           -- strictly dominates the <=15 period spread
           CAST(max_by(period, micros * 16 - period) AS BIGINT) AS best_period,
           CAST(max(micros) AS BIGINT) AS best_match_micros
    FROM scored GROUP BY doc_id
    """,
    doc=f"periodic-repetition audit over periods {Q212_PERIODS}: token "
    "stream vs itself shifted by p (map-only zip_with, no shuffle); "
    "best period by match fraction in integer micro-units — the "
    "copy-paste-loop pathology share-based signals miss",
    tags=("text", "llm", "quality"),
)
def q212_periodicity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale_out: the per-period zip_with folds are interpreted
    # higher-order expressions trapped in the one-row-group scan task
    # (profiled 1 job / 1 task / 1.1 executor-sec at sf0.1); no-op on a
    # multi-file corpus at scale
    d = scale_out(_docs(spark, sf_dir))
    t = F.split(d.text, " ")
    n = F.size(t)

    def match_count(p: int):
        # tokens[0 : n-p] vs tokens[p : n] — count equal positions
        a = F.slice(t, 1, F.greatest(n - p, F.lit(0)))
        b = F.slice(t, p + 1, F.greatest(n - p, F.lit(0)))
        return F.when(
            n > p,
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x == y).cast("long")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    base = d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        *[match_count(p).alias(f"m{p}") for p in Q212_PERIODS],
    )
    micros = [
        F.when(
            F.col("n_tokens") > p,
            F.expr(f"m{p} * 1000000 div (n_tokens - {p})"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias(f"u{p}")
        for p in Q212_PERIODS
    ]
    scored = base.select("doc_id", "n_tokens", *micros)
    # best = max micros, ties toward the SMALLEST period (struct max on
    # (micros, -period) mirrors the oracle's max_by ROW tie-break)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"u{p}").alias("micros"),
                F.lit(-p).cast("bigint").alias("neg_p"),
            )
            for p in Q212_PERIODS
        ]
    )
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        "n_tokens",
        (-best.getField("neg_p")).cast("bigint").alias("best_period"),
        best.getField("micros").cast("bigint").alias("best_match_micros"),
    )


# ---------------------------------------------------------------------------
# q214 — boilerplate n-gram mining (the C4/CCNet "remove boilerplate
# lines" prep pass, surfaced as data): which token 5-grams recur across
# MANY documents and MULTIPLE sources?  q206 measures how much of each
# document sits inside cross-doc duplicated grams; this query surfaces
# the offending gram STRINGS themselves with their document frequency
# and source spread — the lexicon a cleaning pass would strip.
#
# Scale shape: gram building is map-only Column work (transform over
# sequence, no explode until the gram list is built); the single
# exchange is the distinct on (gram, doc) — within-doc repeats collapse
# BEFORE the shuffle, so a pathological doc repeating one gram 10⁶
# times ships it once.  The per-gram aggregate is key-partitioned with
# one count-distinct (sources), and the final top-K compiles to
# TakeOrderedAndProject — no global sort.  At 100 TB the gram strings
# would shuffle as 64-bit hashes with a representative join-back; at
# audit scale the strings themselves are the deliverable, so they ride
# the exchange directly.

Q214_N = 5  # gram length (tokens)
Q214_MIN_DF = 3  # a gram must appear in >= this many documents
Q214_TOP_K = 50


@register(
    "q214_boilerplate_ngrams",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t
                 FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, g.gram
      FROM tok, unnest(CASE WHEN len(t) >= {Q214_N}
                            THEN list_transform(range(1, len(t) - {Q214_N} + 2),
                                  i -> array_to_string(t[i:i + {Q214_N} - 1], ' '))
                            ELSE [] END) AS g(gram)
    ),
    agg AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS df,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM grams GROUP BY gram
    )
    SELECT gram, df, n_sources FROM agg
    WHERE df >= {Q214_MIN_DF} AND n_sources >= 2
    ORDER BY df DESC, gram LIMIT {Q214_TOP_K}
    """,
    doc=f"boilerplate lexicon mining: token {Q214_N}-grams by document "
    f"frequency (>= {Q214_MIN_DF} docs, >= 2 sources), top "
    f"{Q214_TOP_K} — within-doc repeats collapse before the shuffle, "
    "final top-K is TakeOrdered",
    tags=("text", "llm", "quality", "dedup"),
)
def q214_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scale_out(_docs(spark, sf_dir).select("doc_id", "source", "text"))
    grams = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text, ' ')) >= {Q214_N} THEN "
                f"transform(sequence(1, size(split(text, ' ')) - {Q214_N - 1}), "
                f"i -> array_join(slice(split(text, ' '), i, {Q214_N}), ' ')) "
                "ELSE array() END"
            )
        ).alias("gram"),
    ).dropDuplicates(["doc_id", "gram"])
    agg = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return (
        agg.filter((F.col("df") >= Q214_MIN_DF) & (F.col("n_sources") >= 2))
        .orderBy(F.desc("df"), "gram")
        .limit(Q214_TOP_K)
    )


# ---------------------------------------------------------------------------
# q216 — Gopher-style repetition signals, map-only.  The Gopher/MassiveText
# quality rules flag documents where a single token or a single bigram
# accounts for an outsized fraction of the text (chatbot loops, scraped
# nav bars, keyword stuffing).  Both signals reduce to "largest
# equal-element run in a SORTED copy of the token / bigram array", which
# an aggregate() fold computes per row — so the whole query is map-only
# Column work except the final per-source rollup (20-ish groups, partial
# agg collapses it map-side).  Fractions are exact integer micro-units.
#
# Scale shape: zero data-sized shuffle.  At 100 TB this scans, folds,
# and emits |sources| rows; the per-doc flag path (uncapped) would emit
# one row per doc and still never shuffle.  Contrast with the relational
# formulation (explode + groupBy(doc, token)) whose exchange carries the
# full token stream — the fold keeps that entirely inside codegen.

Q216_TOP_TOKEN_MILLI = 100  # flag if top token > 10.0% of tokens
Q216_TOP_BIGRAM_MILLI = 80  # flag if top bigram > 8.0% of bigrams


def _max_sorted_run(arr) -> F.Column:
    """Largest run of equal adjacent elements in a sorted array (== the
    max element multiplicity), as a pure aggregate() fold."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc.getField("prev")), acc.getField("run") + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc.getField("best"))


@register(
    "q216_repetition_signals",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source, len(t) AS n_tokens,
             CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)),
                         i -> t[i] || ' ' || t[i+1])
                  ELSE [] END AS bg,
             t
      FROM tok
    ),
    uf AS (
      SELECT doc_id, source, n_tokens,
             (SELECT max(c) FROM (
                SELECT count(*) AS c FROM unnest(t) AS u(w) GROUP BY w)) AS top_tok,
             CASE WHEN len(bg) > 0 THEN
               (SELECT max(c) FROM (
                  SELECT count(*) AS c FROM unnest(bg) AS u(w) GROUP BY w))
             ELSE 0 END AS top_bg,
             len(bg) AS n_bigrams
      FROM grams
    ),
    per AS (
      SELECT source,
             CASE WHEN n_tokens > 0
                  THEN top_tok * 1000000 // n_tokens ELSE 0 END AS tok_micros,
             CASE WHEN n_bigrams > 0
                  THEN top_bg * 1000000 // n_bigrams ELSE 0 END AS bg_micros
      FROM uf
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN tok_micros > {Q216_TOP_TOKEN_MILLI} * 1000
                         THEN 1 ELSE 0 END) AS BIGINT) AS flagged_token,
           CAST(sum(CASE WHEN bg_micros > {Q216_TOP_BIGRAM_MILLI} * 1000
                         THEN 1 ELSE 0 END) AS BIGINT) AS flagged_bigram,
           CAST(max(tok_micros) AS BIGINT) AS max_tok_micros,
           CAST(max(bg_micros) AS BIGINT) AS max_bg_micros
    FROM per GROUP BY source
    """,
    doc="Gopher repetition quality signals (top-token / top-bigram mass) "
    "via sorted-run aggregate() folds — map-only, no data-sized shuffle; "
    "per-source flag counts in exact integer micro-units",
    tags=("text", "llm", "quality"),
)
def q216_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scale_out(_docs(spark, sf_dir).select("source", "text"))
    toks = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per = d.select(
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        _max_sorted_run(toks).alias("top_tok"),
        F.size(bigrams).cast("bigint").alias("n_bigrams"),
        F.coalesce(_max_sorted_run(bigrams), F.lit(0)).cast("bigint").alias("top_bg"),
    ).select(
        "source",
        F.when(F.col("n_tokens") > 0, F.expr("top_tok * 1000000 div n_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("tok_micros"),
        F.when(F.col("n_bigrams") > 0, F.expr("top_bg * 1000000 div n_bigrams"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("bg_micros"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("tok_micros") > Q216_TOP_TOKEN_MILLI * 1000).cast("bigint"))
        .cast("bigint")
        .alias("flagged_token"),
        F.sum((F.col("bg_micros") > Q216_TOP_BIGRAM_MILLI * 1000).cast("bigint"))
        .cast("bigint")
        .alias("flagged_bigram"),
        F.max("tok_micros").cast("bigint").alias("max_tok_micros"),
        F.max("bg_micros").cast("bigint").alias("max_bg_micros"),
    )


# ---------------------------------------------------------------------------
# q232 — classifier-based quality filtering: the fastText-style hashed
# linear scorer (the CCNet / GPT-3 / LLaMA curation step: a binary
# "looks-like-reference-corpus" classifier gates every document). At
# inference the model is nothing but w · phi(doc): hash each token into
# B weight buckets, sum the bucket weights, threshold. The weights here
# are deterministic fixture literals (seeded at module import, embedded
# in BOTH engines) — training happens offline; the engine's job is the
# distributed inference pass, and that shape is exactly what a real
# 176-dim fastText head needs.
#
# Scale shape: tokenize map-side, hash to buckets map-side, join the
# B-row weight table BROADCAST (never a shuffle of the corpus), then one
# partial-aggregated groupBy on doc_id — the only exchange carries one
# row per (partition, doc) after map-side combine. Integer micro-unit
# weights keep the score surface exact (no float sum-order wobble).

Q232_BUCKETS = 64
Q232_KEEP_MICROS = 0  # keep docs the linear head scores positive

_q232_rng = random.Random(11)
Q232_WEIGHTS = [
    _q232_rng.randrange(-50000, 50001) for _ in range(Q232_BUCKETS)
]


def _duck_q232_oracle() -> str:
    values = ", ".join(
        f"({b}, {w})" for b, w in enumerate(Q232_WEIGHTS)
    )
    return f"""
    WITH w AS (SELECT * FROM (VALUES {values}) AS v(bucket, weight)),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(term), 1, 15))::UBIGINT AS BIGINT)
               % {Q232_BUCKETS} AS bucket
      FROM tok
    )
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.weight) AS BIGINT) AS score_micros,
           sum(w.weight) >= {Q232_KEEP_MICROS} AS keep
    FROM feat f JOIN w USING (bucket)
    GROUP BY f.doc_id
    """


@register(
    "q232_quality_classifier",
    oracle=_duck_q232_oracle(),
    doc="fastText-style hashed linear quality classifier inference: "
    "md5-bucket features x broadcast weight table, integer micro-unit "
    "scores, threshold keep verdict",
    tags=("text", "llm"),
)
def q232_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_queries import _md5_int

    d = scale_out(_docs(spark, sf_dir))
    wdf = F.broadcast(
        spark.createDataFrame(
            list(enumerate(Q232_WEIGHTS)), "bucket bigint, weight bigint"
        )
    )
    tok = d.select("doc_id", F.explode(F.split(d.text, " ")).alias("term"))
    feat = tok.select(
        "doc_id",
        F.pmod(_md5_int(F.col("term")), F.lit(Q232_BUCKETS))
        .cast("bigint")
        .alias("bucket"),
    )
    return (
        feat.join(wdf, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("weight").cast("bigint").alias("score_micros"),
        )
        .withColumn("keep", F.col("score_micros") >= Q232_KEEP_MICROS)
    )


# ---------------------------------------------------------------------------
# q239 — multi-round BPE tokenizer TRAINING (the full iterative loop
# q170 takes one step of): R rounds of (count adjacent symbol pairs
# weighted by word frequency -> argmax pair with a full deterministic
# tie-break -> merge that pair in every word form), returning the
# learned merge table.  This is the tokenizer-training job an LLM data
# pipeline runs before anything else touches tokens; the reference has
# no tokenizer surface (its per-cell pandas would collect the corpus),
# so this extends the engine the same way q94's Lloyd loop does.
#
# Scale shape (the reason BPE training is feasible at 100 TB): the
# corpus collapses to a WORD-FREQUENCY table first — the only
# corpus-sized shuffle, map-side combinable — and every round after
# that is vocabulary-sized: pair explosion is O(vocab x word_len),
# the argmax is orderBy+limit(1) (TakeOrderedAndProject, one-row
# result), and the merge application is one broadcast nested-loop of
# the 1-row winner against the vocab table (literal replace, leftmost
# non-overlapping — identical semantics both engines, q204 precedent).
# Word forms are materialized per round through the durable scratch
# seam (Lloyd precedent, q94/q235): without it round r's plan would
# re-derive every earlier round's replace chain once per consumer and
# the logical tree doubles per round.
#
# Symbols are separated by TWO spaces, not one.  A single-space
# pattern ' L R ' consumes the separator it shares with the next
# occurrence, so back-to-back repeats of the winning pair (the 'b a b a'
# and self-pair 'a a a a' shapes) merge only alternate occurrences —
# the scan resumes after the replacement and the next occurrence has
# lost its leading space.  Classic BPE sidesteps this with lookaround
# regex ((?<!\S)L R(?!\S)), which DuckDB's RE2 doesn't support.  With
# doubled separators the pattern ' L  R ' takes exactly ONE space from
# each boundary pair and the replacement ' LR ' puts both back, so
# adjacency survives the substitution and literal replace IS greedy
# leftmost non-overlapping BPE application — pinned against a plain
# Python reference trainer (incl. the run shapes) in
# tests/test_r10_new_queries.py.
#
# All counts integer; symbol strings never leave the JVM.  The oracle
# unrolls the same R rounds as chained CTEs with scalar-subquery merge
# patterns, so every round's argmax — and therefore the whole merge
# table — is bit-identical in Spark and DuckDB.

BPE_TRAIN_ROUNDS = 6


def _q239_oracle() -> str:
    ctes = [
        "w AS MATERIALIZED (SELECT unnest(string_split(text, ' ')) AS word FROM documents)",
        "wc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w "
        "WHERE word <> '' GROUP BY word)",
        "f0 AS MATERIALIZED (SELECT trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS form, n "
        "FROM wc)",
    ]
    for r in range(BPE_TRAIN_ROUNDS):
        ctes.append(
            f"""p{r} AS MATERIALIZED (
      SELECT syms[CAST(i AS INT)] AS left_sym,
             syms[CAST(i AS INT) + 1] AS right_sym, n
      FROM (SELECT string_split(form, '  ') AS syms, n FROM f{r}),
           unnest(range(1, len(syms))) AS t(i)
    )"""
        )
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT left_sym, right_sym, "
            f"CAST(sum(n) AS BIGINT) AS pair_count FROM p{r} "
            "GROUP BY left_sym, right_sym "
            "ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"
        )
        if r < BPE_TRAIN_ROUNDS - 1:
            ctes.append(
                f"""f{r + 1} AS MATERIALIZED (
      SELECT trim(replace(' ' || form || ' ',
                  ' ' || (SELECT left_sym FROM m{r}) || '  '
                      || (SELECT right_sym FROM m{r}) || ' ',
                  ' ' || (SELECT left_sym FROM m{r})
                      || (SELECT right_sym FROM m{r}) || ' ')) AS form, n
      FROM f{r}
    )"""
            )
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, left_sym, right_sym, "
        f"left_sym || right_sym AS new_sym, pair_count FROM m{r}"
        for r in range(BPE_TRAIN_ROUNDS)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


@register(
    "q239_bpe_train_rounds",
    oracle=_q239_oracle(),
    doc=f"BPE tokenizer training, {BPE_TRAIN_ROUNDS} full merge rounds: "
    "corpus collapses to a word-frequency table once, then each round is "
    "vocab-sized (pair argmax via TakeOrdered, broadcast 1-row merge "
    "application, per-round materialized forms — the Lloyd pattern)",
    tags=("text", "llm", "vocab", "iterative"),
)
def q239_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    d = _docs(spark, sf_dir)
    wc = (
        d.select(F.explode(F.split(d.text, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # initial symbolization: one symbol per character, DOUBLE-space
    # separated (the adjacency-preserving representation — see the
    # module comment above).  This is the ONLY materialization: the
    # corpus collapses to the word-frequency vocab here, once.
    forms0 = materialize(
        wc.select(
            F.trim(F.regexp_replace("word", "(.)", "$1  ")).alias("form"), "n"
        ),
        "q239_forms_r0",
    )
    # Each round: ONE vocab-sized aggregate whose argmax row (the merge
    # winner) is fetched to the driver (whitelisted one-row seam — the
    # q240/q241 sufficient-statistics treatment, r13 verdict ask #7),
    # and the merge application becomes a LITERAL replace layered onto
    # the form expression.  This removes the per-round winner
    # materialization, the per-round forms rewrite, and the 1-row
    # broadcast crossJoin: round r's aggregate evaluates r literal
    # replaces over the round-0 vocab in a single map stage — string
    # work linear in rounds x vocab, against K-1 full vocab-table
    # writes + reads before.  ' L  R ' -> ' LR ' literal semantics are
    # IDENTICAL to the previous broadcast form (same engine function,
    # now with constant arguments); the oracle unrolls the same rounds.
    form_col = F.col("form")
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(BPE_TRAIN_ROUNDS):
        # adjacent-pair extraction: vocab-sized explode (guard size >= 2:
        # Spark's sequence(1, 0) would count DOWN and element_at(_, 0)
        # raises under ANSI; DuckDB's range(1, 1) is just empty)
        syms = forms0.select(
            F.split(form_col, "  ").alias("syms"), "n"
        ).filter(F.size("syms") >= 2)
        pairs = syms.select(
            "n",
            "syms",
            F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
        ).select(
            F.element_at("syms", F.col("i")).alias("left_sym"),
            F.element_at("syms", F.col("i") + 1).alias("right_sym"),
            "n",
        )
        best = (
            pairs.groupBy("left_sym", "right_sym")
            .agg(F.sum("n").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .first()  # TakeOrdered: same (count DESC, l, r) tie-break
        )
        if best is None:
            break  # degenerate corpus: no adjacent pair left to merge
        left, right = best["left_sym"], best["right_sym"]
        merges.append((rnd, left, right, int(best["pair_count"])))
        if rnd < BPE_TRAIN_ROUNDS - 1:
            padded = F.concat(F.lit(" "), form_col, F.lit(" "))
            form_col = F.trim(
                F.replace(
                    padded,
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {left}{right} "),
                )
            )
    if not merges:
        return spark.range(0).select(
            F.lit(0).cast("int").alias("round"),
            F.lit("").alias("left_sym"),
            F.lit("").alias("right_sym"),
            F.lit("").alias("new_sym"),
            F.lit(0).cast("bigint").alias("pair_count"),
        )
    # JVM-side literal rows (range(1) + explode) — the q240/q241 output
    # convention; no Python-serialized local relation
    rows = F.array(
        *[
            F.struct(
                F.lit(rnd).cast("int").alias("round"),
                F.lit(left).alias("left_sym"),
                F.lit(right).alias("right_sym"),
                F.lit(left + right).alias("new_sym"),
                F.lit(cnt).cast("bigint").alias("pair_count"),
            )
            for rnd, left, right, cnt in merges
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(rows).alias("s"))
        .select("s.round", "s.left_sym", "s.right_sym", "s.new_sym", "s.pair_count")
    )


# ---------------------------------------------------------------------------
# q245 — Gopher quality-rule funnel (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A "quality filtering"): the standard
# pre-training corpus gate applies an ORDERED list of document rules and
# drops a doc at its FIRST violation; the operational artifact is the
# per-rule attrition report (how many docs reached rule k, how many it
# killed) — that is what this query emits, one row per rule.
#
# Rules (integer-exact renderings of the Gopher thresholds):
#   1 min_words           n >= 5
#   2 max_words           n <= 2000
#   3 mean_word_len       3 <= mean chars/word <= 10, tested as the
#                         cross-multiplied 3n <= chars <= 10n (no floats)
#   4 stopword_presence   >= 2 distinct stop words occur
#   5 top_token_share     most frequent token <= 20% of tokens (5*max <= n)
#
# Scale shape: per-doc rule evaluation is MAP-ONLY — every rule is a
# Column expression over the split-token array (the top-token count uses
# distinct x filter inside codegen: O(k^2) per doc on k ~ doc tokens,
# never a shuffle).  The funnel aggregate is a groupBy over the 6-value
# first-fail domain; the rule report is a broadcast nested-loop of the
# 5-row rule dimension against that <= 6-row count table.  Total
# exchanges: one 6-row partial-agg — scan-bandwidth bound at 100 TB.

GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 2000
GOPHER_MEAN_WLEN = (3, 10)
GOPHER_MIN_STOPWORDS = 2
GOPHER_RULES = (
    (1, "min_words"),
    (2, "max_words"),
    (3, "mean_word_len"),
    (4, "stopword_presence"),
    (5, "top_token_share"),
)

_Q245_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "q245_gopher_rule_funnel",
    oracle=f"""
    WITH per_doc AS (
      SELECT len(string_split(text, ' ')) AS n,
             length(text) - (len(string_split(text, ' ')) - 1) AS chars,
             len(list_filter({_Q245_STOPLIST_SQL},
                             s -> list_contains(string_split(text, ' '), s)))
               AS n_stop,
             list_max(list_transform(
               list_distinct(string_split(text, ' ')),
               w -> len(list_filter(string_split(text, ' '), x -> x = w))))
               AS maxcnt
      FROM documents
    ),
    ff AS (
      SELECT CASE
               WHEN NOT (n >= {GOPHER_MIN_WORDS}) THEN 1
               WHEN NOT (n <= {GOPHER_MAX_WORDS}) THEN 2
               WHEN NOT (chars >= {GOPHER_MEAN_WLEN[0]} * n
                         AND chars <= {GOPHER_MEAN_WLEN[1]} * n) THEN 3
               WHEN NOT (n_stop >= {GOPHER_MIN_STOPWORDS}) THEN 4
               WHEN NOT (5 * maxcnt <= n) THEN 5
               ELSE 0
             END AS ff
      FROM per_doc
    ),
    rules(rule_id, rule_name) AS (
      VALUES {", ".join(f"({i}, '{nm}')" for i, nm in GOPHER_RULES)}
    )
    SELECT CAST(r.rule_id AS BIGINT) AS rule_id, r.rule_name,
           CAST(coalesce(sum(CASE WHEN f.ff = 0 OR f.ff >= r.rule_id
                                  THEN 1 END), 0) AS BIGINT) AS n_reached,
           CAST(coalesce(sum(CASE WHEN f.ff = r.rule_id THEN 1 END), 0)
                AS BIGINT) AS n_failed,
           CAST(coalesce(sum(CASE WHEN f.ff = 0 OR f.ff > r.rule_id
                                  THEN 1 END), 0) AS BIGINT) AS n_passed
    FROM rules r CROSS JOIN ff f
    GROUP BY r.rule_id, r.rule_name
    """,
    doc="Gopher-style ordered quality-rule funnel: first-fail attribution "
    "per doc (map-only Column rules), per-rule reached/failed/passed "
    "attrition report; one 6-row exchange total",
    tags=("text", "llm", "quality"),
)
def q245_gopher_rule_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    n = F.size(t).cast("bigint")
    chars = F.length("text").cast("bigint") - (n - 1)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(stop_arr, lambda s: F.array_contains(t, s)))
    maxcnt = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda w: F.size(F.filter(t, lambda x: x == w)),
        )
    ).cast("bigint")
    lo, hi = GOPHER_MEAN_WLEN
    ff = (
        F.when(~(n >= GOPHER_MIN_WORDS), 1)
        .when(~(n <= GOPHER_MAX_WORDS), 2)
        .when(~((chars >= lo * n) & (chars <= hi * n)), 3)
        .when(~(n_stop >= GOPHER_MIN_STOPWORDS), 4)
        .when(~(5 * maxcnt <= n), 5)
        .otherwise(0)
    )
    cnts = d.select(ff.alias("ff")).groupBy("ff").agg(
        F.count(F.lit(1)).alias("c")
    )
    rules = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("bigint").alias("rule_id"),
                            F.lit(nm).alias("rule_name"),
                        )
                        for i, nm in GOPHER_RULES
                    ]
                )
            ).alias("r")
        )
        .select("r.rule_id", "r.rule_name")
    )
    reached = F.when(
        (F.col("ff") == 0) | (F.col("ff") >= F.col("rule_id")), F.col("c")
    )
    failed = F.when(F.col("ff") == F.col("rule_id"), F.col("c"))
    passed = F.when(
        (F.col("ff") == 0) | (F.col("ff") > F.col("rule_id")), F.col("c")
    )
    return (
        rules.crossJoin(F.broadcast(cnts))
        .groupBy("rule_id", "rule_name")
        .agg(
            F.coalesce(F.sum(reached), F.lit(0)).cast("bigint").alias("n_reached"),
            F.coalesce(F.sum(failed), F.lit(0)).cast("bigint").alias("n_failed"),
            F.coalesce(F.sum(passed), F.lit(0)).cast("bigint").alias("n_passed"),
        )
    )


# ---------------------------------------------------------------------------
# q249 — tokenizer fertility evaluation per (lang, source): THE standard
# tokenizer-quality table (fertility = subword tokens per whitespace
# word; chars-per-token = compression the vocabulary buys), computed
# after applying q204's fixed merge table.  Languages/domains a
# tokenizer serves poorly show fertility >> 1 relative to the corpus
# mean — the signal multilingual-vocab papers (e.g. the XLM-R and
# BLOOM tokenizer analyses) report before re-balancing training data.
#
# Scale shape: q204's merge chain is map-only codegen string work; this
# adds one partial-agg groupBy on the tiny (lang, source) key space —
# the exchange carries |langs x sources| rows.  All aggregates are
# exact int64; the two ratio columns are each ONE IEEE division of two
# exact ints (q135's float-parity convention).

@register(
    "q249_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang, source,
             len(string_split(text, ' ')) AS words,
             len(string_split(trim({_q204_duck_chain()}), ' ')) AS toks,
             length(text) - (len(string_split(text, ' ')) - 1) AS chars
      FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           CAST(sum(toks) AS DOUBLE) / sum(words) AS fertility,
           CAST(sum(chars) AS DOUBLE) / sum(toks) AS chars_per_token
    FROM per_doc
    GROUP BY lang, source
    """,
    doc="tokenizer fertility table per (lang, source) after the fixed "
    "merge chain: subword-per-word and chars-per-token ratios; map-only "
    "encode + one tiny-key partial agg",
    tags=("text", "llm", "vocab", "quality"),
)
def q249_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    merged = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    for a, b in Q204_MERGES:
        merged = F.replace(merged, F.lit(f" {a} {b} "), F.lit(f" {a}_{b} "))
    words = F.size(F.split(F.col("text"), " ")).cast("bigint")
    toks = F.size(F.split(F.trim(merged), " ")).cast("bigint")
    chars = F.length("text").cast("bigint") - (words - 1)
    per_doc = d.select(
        "lang", "source", words.alias("words"), toks.alias("toks"), chars.alias("chars")
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("n_words"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        (F.sum("toks").cast("double") / F.sum("words")).alias("fertility"),
        (F.sum("chars").cast("double") / F.sum("toks")).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# q251 — language-ID confusion matrix with per-label precision/recall:
# the standard evaluation table for any classifier in the curation
# stack, here over q30's char-bigram language-ID against the labeled
# lang column.  Corpus pipelines run exactly this before trusting a
# lang filter (mislabeling a language family shifts its mixture weight
# downstream).  Counts are exact ints; precision/recall ship in ppm
# (integer micro-fractions, q205's convention) so the row is
# hash-stable.
#
# Scale shape: q30 is map-only; the matrix is a groupBy on the
# |langs|^2 key space (map-side partials collapse the corpus), and the
# per-label margins re-aggregate the matrix itself (<= |langs|^2 rows)
# — two tiny exchanges after a scan-bandwidth pass.


def _q251_oracle() -> str:
    from .registry import _REGISTRY

    q30 = _REGISTRY["q30_lang_id"].oracle
    return f"""
    WITH pred AS (SELECT lang, lang_guess FROM ({q30}) p),
    m AS (
      SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    actual AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_actual FROM m GROUP BY 1),
    guessed AS (
      SELECT lang_guess, CAST(sum(n) AS BIGINT) AS n_guessed FROM m GROUP BY 1
    )
    SELECT m.lang, m.lang_guess, m.n,
           a.n_actual, g.n_guessed,
           (m.n * 1000000) // a.n_actual AS recall_ppm,
           (m.n * 1000000) // g.n_guessed AS precision_ppm,
           m.lang = m.lang_guess AS is_diagonal
    FROM m JOIN actual a USING (lang)
    JOIN guessed g USING (lang_guess)
    """


@register(
    "q251_langid_confusion",
    oracle=_q251_oracle(),
    doc="language-ID confusion matrix over q30's classifier vs labels: "
    "exact cell counts + per-label ppm precision/recall margins; two "
    "tiny-key exchanges after a map-only scan",
    tags=("text", "llm", "quality"),
)
def q251_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    pred = q30_lang_id(spark, sf_dir).select("lang", "lang_guess")
    # the |langs|^2 matrix feeds both margins and the final join —
    # materialize it so q30's substring-scoring corpus scan runs once,
    # not three times (the scratch write is a few dozen rows)
    m = materialize(
        pred.groupBy("lang", "lang_guess").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ),
        "q251_matrix",
    )
    actual = m.groupBy("lang").agg(F.sum("n").cast("bigint").alias("n_actual"))
    guessed = m.groupBy("lang_guess").agg(
        F.sum("n").cast("bigint").alias("n_guessed")
    )
    return (
        m.join(F.broadcast(actual), "lang")
        .join(F.broadcast(guessed), "lang_guess")
        .select(
            "lang",
            "lang_guess",
            "n",
            "n_actual",
            "n_guessed",
            F.expr("(n * 1000000) div n_actual").alias("recall_ppm"),
            F.expr("(n * 1000000) div n_guessed").alias("precision_ppm"),
            (F.col("lang") == F.col("lang_guess")).alias("is_diagonal"),
        )
    )


# ---------------------------------------------------------------------------
# q252 — Zipf slope per source, in EXACT integer least squares: the
# rank-frequency log-log slope is the corpus-health statistic behind
# "natural text has s ~ -1" (Zipf 1949; Piantadosi 2014 reviews why
# deviations flag boilerplate floods or synthetic/templated text).  A
# source whose slope collapses toward 0 is dominated by a flat
# template vocabulary; one diving far below -1 is a few-token loop.
#
# Exactness design (the engine's bitlength-log2 policy, q135/q243):
# x = floor(log2 rank), y = floor(log2 count), slope = the exact
# rational (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) emitted as numerator /
# denominator int64s plus ONE IEEE division.  No per-term rank is ever
# materialized: terms sharing a count occupy a CONTIGUOUS rank block
# [r0, r0+k), and within a block y is constant while the x-multiset
# depends only on the interval — so every regression sum folds from
# per-(source,count) closed forms.  The dyadic overlap count
#   m_j = |[2^j, 2^(j+1)) ∩ [r0, r0+k)|
# turns Sx = sum_j j*m_j and Sxx = sum_j j^2*m_j into a 46-way
# bounded explode per block — never a vocab-wide window (the count=1
# tail block alone would be half the vocabulary).
#
# Scale shape: term counts = one (source, term) partial agg; blocks =
# one (source, count) agg (distinct frequencies per source are
# O(sqrt(tokens)) — bounded); the rank-offset cumulative runs over
# those bounded per-source block lists; the j-explode multiplies block
# rows by 46.  int64 headroom: n*Sxy ~ n_terms * 46^2 * n_blocks-sums
# stays under 2^63 to ~1e13 tokens (decimal lift past that, q248's
# note).

ZIPF_MAX_LOG2 = 45  # dyadic buckets 2^0 .. 2^45 cover int64-sized vocab ranks


@register(
    "q252_zipf_slope",
    oracle=f"""
    WITH tc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1, 2
    ),
    blocks AS (
      SELECT source, c, CAST(count(*) AS BIGINT) AS k,
             length(bin(c)) - 1 AS y
      FROM tc GROUP BY source, c
    ),
    offs AS (
      SELECT source, c, k, y,
             1 + coalesce(sum(k) OVER (PARTITION BY source ORDER BY c DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS r0
      FROM blocks
    ),
    dy AS (
      SELECT o.source, o.c, o.k, o.y, o.r0, j.j,
             greatest(0, least(o.r0 + o.k - 1, (1::BIGINT << (j.j + 1)) - 1)
                         - greatest(o.r0, 1::BIGINT << j.j) + 1) AS m
      FROM offs o CROSS JOIN (SELECT unnest(range(0, {ZIPF_MAX_LOG2 + 1})) AS j) j
    ),
    per_block AS (
      SELECT source, c, y,
             CAST(sum(m * j) AS BIGINT) AS sx,
             CAST(sum(m * j * j) AS BIGINT) AS sxx,
             CAST(max(k) AS BIGINT) AS k
      FROM dy GROUP BY source, c, y
    ),
    fit AS (
      SELECT source,
             CAST(sum(k) AS BIGINT) AS n_terms,
             CAST(sum(k * y) AS BIGINT) AS sy,
             CAST(sum(sx) AS BIGINT) AS sx,
             CAST(sum(sxx) AS BIGINT) AS sxx,
             CAST(sum(y * sx) AS BIGINT) AS sxy
      FROM per_block GROUP BY source
    )
    SELECT source, n_terms,
           n_terms * sxy - sx * sy AS slope_num,
           n_terms * sxx - sx * sx AS slope_den,
           CASE WHEN n_terms * sxx - sx * sx <> 0
                THEN CAST(n_terms * sxy - sx * sy AS DOUBLE)
                       / (n_terms * sxx - sx * sx) END AS zipf_slope
    FROM fit
    """,
    doc="exact-integer Zipf rank-frequency slope per source: bitlength "
    "log2s, contiguous-rank frequency blocks, dyadic overlap counts (46-"
    "way bounded explode) — no vocab-wide rank window anywhere",
    tags=("text", "llm", "quality"),
)
def q252_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tc = (
        d.select("source", F.explode(F.split(d.text, " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    blocks = tc.groupBy("source", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    ).withColumn("y", (F.length(F.bin(F.col("c"))) - 1).cast("bigint"))
    w_off = (
        Window.partitionBy("source")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = blocks.withColumn(
        "r0", F.lit(1) + F.coalesce(F.sum("k").over(w_off), F.lit(0))
    )
    dy = offs.select(
        "source",
        "c",
        "k",
        "y",
        "r0",
        F.explode(F.sequence(F.lit(0), F.lit(ZIPF_MAX_LOG2))).alias("j"),
    ).withColumn(
        "m",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("r0") + F.col("k") - 1,
                F.expr("(CAST(1 AS BIGINT) << (j + 1)) - 1"),
            )
            - F.greatest(F.col("r0"), F.expr("CAST(1 AS BIGINT) << j"))
            + 1,
        ),
    )
    per_block = dy.groupBy("source", "c", "y").agg(
        F.sum(F.col("m") * F.col("j")).cast("bigint").alias("sx"),
        F.sum(F.col("m") * F.col("j") * F.col("j")).cast("bigint").alias("sxx"),
        F.max("k").cast("bigint").alias("k"),
    )
    fit = per_block.groupBy("source").agg(
        F.sum("k").cast("bigint").alias("n_terms"),
        F.sum(F.col("k") * F.col("y")).cast("bigint").alias("sy"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("sx")).cast("bigint").alias("sxy"),
    )
    num = F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    # slope_den = 0 when a source has exactly one distinct dyadic rank
    # bucket (e.g. a single distinct term): the regression is undefined,
    # so emit NULL — mirrored by the oracle's CASE — instead of letting
    # ANSI mode throw DIVIDE_BY_ZERO where DuckDB would yield NULL
    return fit.select(
        "source",
        "n_terms",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den != 0, num.cast("double") / den).alias("zipf_slope"),
    )
