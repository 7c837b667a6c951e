"""L4 — corpus-preparation operators for LLM training pipelines (builder
brief: dedup / text analysis beyond the reference's own surface).

Pipeline stages every large-scale pretraining corpus pass needs, each
expressed as pure Column expressions (codegen, zero Python UDFs):

* q77 — CCNet-style segment-level dedup: drop word segments that repeat
  anywhere in the corpus, reassemble the surviving text per document.
* q78 — PII scrubbing: redact emails / phone numbers / NHS numbers from
  free-text clinical notes (fixture ``clinical_notes.parquet``) and count
  redactions per category. The note text is the same shape as the
  reference's consultation notes (dags/ConsultationNoteWritebackX.py:336-399).
* q79 — benchmark decontamination: flag corpus documents sharing word
  n-grams with a held-out eval set (the standard pretraining hygiene
  pass; eval membership here is ``doc_id % 97 == 0``).
* q80 — chunk packing: split documents into fixed-length overlapping
  token windows (training-sequence preparation).
* q81 — source mixing / domain reweighting: deterministic hash
  down-sample to target per-source proportions.
* q82 — sequence packing: GPT-style concat-and-chop of the shuffled
  token stream into fixed-length training sequences.
* q88 — tokenizer vocabulary build: frequency-ranked contiguous term
  ids with special tokens and a min-count cutoff, assigned via a
  distributed rank decomposition (no global single-partition window).

Scale notes (100 TB):
* q77 shuffles segments ONCE by their 60-bit hash for the corpus-wide
  occurrence count (window over the hash key — group sizes are bounded
  by the duplication factor, so no skew risk), then once by doc_id for
  reassembly. The alternative count-table + join shape adds a third
  exchange for no narrower shuffle; at extreme duplication (one segment
  in 10^6 docs) the window partition is still just that segment's
  occurrence list.
* q78 and q80 are map-only — no shuffle at all; they scale with scan
  bandwidth.
* q79 broadcasts the eval-set shingle index: a benchmark suite is small
  by construction (thousands of documents), so the corpus side never
  shuffles — the contamination join is a scan-local hash probe, then one
  partial-aggregated exchange on doc_id.
* q81 computes acceptance rates from a per-source count aggregate (one
  tiny shuffle: the source dimension is low-cardinality by construction),
  broadcasts the 1-row-per-source rate table back, and samples map-side
  with a salted deterministic hash — the corpus never shuffles.
* q82 shuffles ONCE into pack buckets; packing is sequential WITHIN a
  bucket by nature (a running token offset), so the bucket count is the
  parallelism knob — in production one bucket ≈ one output shard
  (1-4 GB), i.e. tens of thousands of buckets at 100 TB, and the window
  partition stays shard-sized.
* Segment/shingle/chunk construction everywhere follows the measured
  dedup_queries.py pattern: explode positions first and build strings
  row-wise inside whole-stage codegen (interpreted higher-order
  ``transform`` lambdas were 4-8x slower at sf0.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fhir import FIXTURES_DIR
from ..sources.tables import load_tables, read_immutable_parquet, scale_out
from .dedup_queries import _duck_md5_int, _hashed_shingles, _md5_int
from .registry import register

MIX_MOD = 1_000_000  # resolution of the deterministic sampling hash
PACK_SEQ_LEN = 256   # tokens per packed training sequence
PACK_BUCKETS = 16    # pack shards (≈ output files; thousands at 100 TB)
SEG_LEN = 4          # words per dedup segment (CCNet uses lines; the
                     # synthetic corpus has no newlines, so fixed word
                     # windows stand in — same machinery)
DECON_MOD = 97       # doc_id % DECON_MOD == 0 => held-out eval member
CHUNK_LEN = 32       # tokens per training chunk
CHUNK_STRIDE = 24    # chunk start stride (=> CHUNK_LEN-CHUNK_STRIDE overlap)

# PII patterns — identical RE2/Java-regex subset, applied in a fixed
# order on both engines (NHS first: its two-space shape cannot overlap
# the single-space mobile pattern, but a fixed order keeps the composed
# rewrite bit-identical regardless).
PII_PATTERNS = (
    ("nhs", r"\b\d{3} \d{3} \d{4}\b", "[NHS]"),
    ("phone", r"\b07\d{3} ?\d{6}\b", "[PHONE]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
)


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scale_out(load_tables(spark, sf_dir, ["documents"])["documents"])
    return docs.select("doc_id", F.split(docs.text, " ").alias("t"))


# ---------------------------------------------------------------------------
# q77 — segment-level corpus dedup (CCNet-style).


@register(
    "q77_segment_dedup",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    idx AS (
      SELECT doc_id, t,
             unnest(generate_series(0, CAST(ceil(len(t) / {SEG_LEN}.0) AS BIGINT) - 1)) AS s
      FROM words
    ),
    seg AS (
      SELECT doc_id, s,
             array_to_string(t[(s * {SEG_LEN}) + 1 : (s + 1) * {SEG_LEN}], ' ') AS seg
      FROM idx
    ),
    counted AS (
      SELECT doc_id, s, seg,
             count(*) OVER (PARTITION BY {_duck_md5_int('seg')}) AS n
      FROM seg
    )
    SELECT doc_id,
           count(*) AS n_segments,
           count(*) FILTER (n = 1) AS n_kept,
           string_agg(seg, ' ' ORDER BY s) FILTER (n = 1) AS clean_text
    FROM counted
    GROUP BY doc_id
    """,
    doc="CCNet-style segment dedup: drop corpus-repeated word segments, "
        "reassemble per doc; 2 shuffles (segment-hash window + doc_id)",
    tags=("text", "dedup", "llm"),
)
def q77_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = _doc_tokens(spark, sf_dir)
    seg = tk.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.size("t") / F.lit(float(SEG_LEN))) - 1,
            )
        ).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.concat_ws(
            " ", F.slice("t", (F.col("s") * SEG_LEN + 1).cast("int"), SEG_LEN)
        ).alias("seg"),
    )
    # corpus-wide occurrence count: one shuffle on the 60-bit segment hash
    counted = seg.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy(_md5_int(F.col("seg"))))
    )
    kept = F.col("n") == 1
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("s", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("_ct"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            # DuckDB's filtered string_agg is NULL when nothing survives
            F.when(F.col("n_kept") > 0, F.col("_ct")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# q78 — PII scrubbing over clinical notes (map-only).

_FX_NOTES = os.path.join(FIXTURES_DIR, "clinical_notes.parquet")


def _scrubbed_sql() -> str:
    expr = "note_text"
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


@register(
    "q78_pii_scrub",
    oracle=f"""
    SELECT note_id,
           {_scrubbed_sql()} AS clean_text,
           len(regexp_extract_all(note_text, '{PII_PATTERNS[0][1]}')) AS n_nhs,
           len(regexp_extract_all(note_text, '{PII_PATTERNS[1][1]}')) AS n_phones,
           len(regexp_extract_all(note_text, '{PII_PATTERNS[2][1]}')) AS n_emails,
           (len(regexp_extract_all(note_text, '{PII_PATTERNS[0][1]}'))
            + len(regexp_extract_all(note_text, '{PII_PATTERNS[1][1]}'))
            + len(regexp_extract_all(note_text, '{PII_PATTERNS[2][1]}'))) > 0 AS has_pii
    FROM read_parquet('{_FX_NOTES}')
    """,
    doc="PII redaction (email/phone/NHS) + per-category counts over "
        "clinical notes; map-only, scales with scan bandwidth",
    tags=("text", "pii", "llm"),
)
def q78_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    notes = read_immutable_parquet(spark, _FX_NOTES)
    clean = F.col("note_text")
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    counts = {
        name: F.regexp_count("note_text", F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }
    return notes.select(
        "note_id",
        clean.alias("clean_text"),
        counts["nhs"].cast("long").alias("n_nhs"),
        counts["phone"].cast("long").alias("n_phones"),
        counts["email"].cast("long").alias("n_emails"),
        ((counts["nhs"] + counts["phone"] + counts["email"]) > 0).alias("has_pii"),
    )


# ---------------------------------------------------------------------------
# q79 — benchmark decontamination (n-gram overlap vs a held-out eval set).


@register(
    "q79_decontamination",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(
                    list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                    s -> {_duck_md5_int('s')})) AS sh
           FROM tok),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {DECON_MOD} = 0)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           count(e.sh) AS n_contaminated,
           count(e.sh) > 0 AS contaminated
    FROM sh s LEFT JOIN ev e ON s.sh = e.sh
    WHERE s.doc_id % {DECON_MOD} <> 0
    GROUP BY s.doc_id
    """,
    doc="eval-set n-gram decontamination: corpus docs sharing word "
        "trigrams with the held-out set; eval index broadcast, corpus "
        "side never shuffles before the doc_id rollup",
    tags=("text", "dedup", "llm"),
)
def q79_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Production would use 8-13-gram shingles; the shared trigram
    # substrate keeps the synthetic corpus's overlap rate testable and
    # reuses dedup_queries' measured codegen shingle builder.
    sh = _hashed_shingles(spark, sf_dir)
    is_eval = F.col("doc_id") % DECON_MOD == 0
    eval_sh = sh.filter(is_eval).select("sh").distinct().withColumn("hit", F.lit(1))
    return (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


# ---------------------------------------------------------------------------
# q80 — training-chunk packing (fixed-length overlapping token windows).


@register(
    "q80_doc_chunks",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    idx AS (
      SELECT doc_id, t,
             unnest(generate_series(0, (len(t) - 1) // {CHUNK_STRIDE})) AS s
      FROM words
    )
    SELECT doc_id,
           s AS chunk_idx,
           s * {CHUNK_STRIDE} + 1 AS first_token,
           array_to_string(t[(s * {CHUNK_STRIDE}) + 1 : (s * {CHUNK_STRIDE}) + {CHUNK_LEN}], ' ')
             AS chunk_text,
           len(t[(s * {CHUNK_STRIDE}) + 1 : (s * {CHUNK_STRIDE}) + {CHUNK_LEN}])
             AS n_chunk_tokens
    FROM idx
    """,
    doc=f"split docs into {CHUNK_LEN}-token chunks at stride {CHUNK_STRIDE} "
        "(training-sequence prep); map-only, no shuffle",
    tags=("text", "llm"),
)
def q80_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = _doc_tokens(spark, sf_dir)
    start = F.col("s") * CHUNK_STRIDE + 1
    chunk = F.slice("t", start.cast("int"), CHUNK_LEN)
    return tk.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.size("t") - 1) / F.lit(CHUNK_STRIDE)),
            )
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s").alias("chunk_idx"),
        start.alias("first_token"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# q81 — source mixing / domain reweighting (deterministic hash sampling).
#
# Standard pretraining corpus op: given target mix weights per source,
# find the largest total T the corpus can supply at that mix
# (T = min over sources of n_s / w_s) and down-sample each source to
# w_s * T documents. Sampling is a salted md5 threshold, so the result
# is reproducible, engine-independent, and requires no global sort.
# Target weights here derive from the source name ((numeric suffix % 4)
# + 1, normalized) so both engines compute them from the data alone.
#
# Float determinism: both engines evaluate the identical IEEE-double
# expression tree (cast → divide → multiply), so rates are bit-equal.


@register(
    "q81_source_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS n,
             (COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT), 0)
              % 4) + 1 AS w
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n,
             CAST(w AS DOUBLE) / CAST(sum(w) OVER () AS BIGINT) AS wn
      FROM counts
    ),
    feasible AS (
      SELECT source, n, wn,
             floor(min(n / wn) OVER ()) AS t
      FROM rates
    ),
    r AS (
      SELECT source, LEAST(1.0, wn * t / n) AS rate FROM feasible
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST({_duck_md5_int("'mix:' || CAST(d.doc_id AS VARCHAR)")} % {MIX_MOD}
               AS DOUBLE) / {MIX_MOD} < r.rate
    """,
    doc="domain reweighting: deterministic hash down-sample to a target "
        "source mix; tiny count agg + broadcast rates, map-side filter",
    tags=("text", "sampling", "llm"),
)
def q81_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    w = (
        F.coalesce(
            F.regexp_extract("source", r"([0-9]+)$", 1).cast("int"), F.lit(0)
        )
        % 4
        + 1
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"), F.max(w).alias("w"))
    # source is low-cardinality by construction => the unpartitioned
    # window runs on a handful of rows, never the corpus
    everything = Window.partitionBy()
    wn = F.col("w").cast("double") / F.sum("w").over(everything).cast("bigint")
    rates = (
        counts.withColumn("wn", wn)
        .withColumn("t", F.floor(F.min(F.col("n") / F.col("wn")).over(everything)))
        .select(
            "source",
            F.least(F.lit(1.0), F.col("wn") * F.col("t") / F.col("n")).alias("rate"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("", F.lit("mix:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % MIX_MOD
    ).cast("double") / MIX_MOD
    return (
        docs.join(F.broadcast(rates), "source")
        .where(u < F.col("rate"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# q82 — training-sequence packing (GPT-style concat-and-chop).
#
# Documents are shuffled deterministically (salted md5 order) into
# PACK_BUCKETS shards; within a shard the token streams concatenate and
# split at PACK_SEQ_LEN boundaries. Emits each document's span in the
# packed stream: which sequences it lands in and at what offset.


@register(
    "q82_sequence_pack",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             {_duck_md5_int("'pack:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens, h % {PACK_BUCKETS} AS bucket,
             CAST(sum(n_tokens) OVER (
                PARTITION BY h % {PACK_BUCKETS} ORDER BY h, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM tok
    )
    SELECT doc_id, bucket, cum - n_tokens AS start_tok, n_tokens,
           CAST(floor((cum - n_tokens) / {PACK_SEQ_LEN}.0) AS BIGINT) AS first_seq,
           CAST(floor((cum - 1) / {PACK_SEQ_LEN}.0) AS BIGINT) AS last_seq,
           CAST(floor((cum - 1) / {PACK_SEQ_LEN}.0)
                - floor((cum - n_tokens) / {PACK_SEQ_LEN}.0) + 1 AS BIGINT) AS n_seqs
    FROM pos
    """,
    doc=f"pack docs into {PACK_SEQ_LEN}-token training sequences within "
        f"{PACK_BUCKETS} hash shards (concat-and-chop); one bucket shuffle",
    tags=("text", "llm"),
)
def q82_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    h = _md5_int(F.concat_ws("", F.lit("pack:"), F.col("doc_id").cast("string")))
    tok = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        h.alias("h"),
    ).withColumn("bucket", F.col("h") % PACK_BUCKETS)
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    first_seq = F.floor((cum - F.col("n_tokens")) / F.lit(float(PACK_SEQ_LEN)))
    last_seq = F.floor((cum - 1) / F.lit(float(PACK_SEQ_LEN)))
    return tok.select(
        "doc_id",
        "bucket",
        (cum - F.col("n_tokens")).alias("start_tok"),
        "n_tokens",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


# ---------------------------------------------------------------------------
# q88 — tokenizer vocabulary build: frequency-ranked contiguous term ids
# (the vocab-init step of any tokenizer training run; special tokens take
# the first ids, then corpus terms by (count DESC, term ASC) with a
# min-count OOV cutoff).
#
# Scale design:
# * Two-level word count (per-doc tf, then per-term sum + doc_freq) —
#   the second shuffle moves pre-aggregated (doc, term) rows, never raw
#   occurrences, and yields both n_occurrences and doc_freq without a
#   distinct-aggregate expansion.
# * Contiguous id assignment does NOT use a global single-partition
#   window over the vocab. Ranks decompose as
#   id = |terms with higher count| + rank-within-own-count(term ASC):
#   the within-count window partitions by n_occurrences (parallel, and
#   count groups are Zipf-bounded), and the cross-count offsets come
#   from a running sum over the DISTINCT count values — a table that is
#   orders of magnitude smaller than the vocab (counts collapse onto few
#   distinct values by Zipf's law), so its one-partition window is a
#   driver-sized footnote, and it broadcasts back.
# * DuckDB expresses the same ids as one flat
#   row_number() OVER (ORDER BY count DESC, term ASC) — the decomposition
#   is exactly that rank, so the hash gate proves the distributed
#   assignment equals the naive global sort.

VOCAB_MIN_COUNT = 2
VOCAB_SPECIALS = ("<pad>", "<unk>", "<bos>", "<eos>")


def _vocab_oracle() -> str:
    specials = ", ".join(
        f"('{t}', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST({i} AS BIGINT))"
        for i, t in enumerate(VOCAB_SPECIALS)
    )
    return f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    counts AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences,
             count(*) AS doc_freq
      FROM tf GROUP BY term
      HAVING CAST(sum(tf) AS BIGINT) >= {VOCAB_MIN_COUNT}
    )
    SELECT term, n_occurrences, doc_freq,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, term ASC)
                + {len(VOCAB_SPECIALS) - 1} AS BIGINT) AS vocab_id
    FROM counts
    UNION ALL
    SELECT * FROM (VALUES {specials}) AS v(term, n_occurrences, doc_freq, vocab_id)
    """


@register(
    "q88_vocab_build",
    oracle=_vocab_oracle(),
    doc="frequency-ranked contiguous vocab ids via distributed rank decomposition",
    tags=("text", "llm", "vocab"),
)
def q88_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _doc_tokens(spark, sf_dir).select(
        "doc_id", F.explode("t").alias("term")
    )
    per_doc = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # materialize the vocab-sized counts table ONCE: it feeds both the
    # within-count ranking and the offsets branch, and without this each
    # branch re-runs the whole corpus word-count pipeline (runtime
    # exchange reuse only dedupes identical exchanges, and the offset
    # branch re-aggregates before its first one). Same query-scoped
    # checkpoint pattern as q23's shingle substrate.
    from ..scratch import materialize

    counts = materialize(
        per_doc.groupBy("term")
        .agg(
            F.sum("tf").alias("n_occurrences"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .filter(F.col("n_occurrences") >= VOCAB_MIN_COUNT),
        "q88_vocab_counts",
    )
    w_in = Window.partitionBy("n_occurrences").orderBy(F.asc("term"))
    within = counts.withColumn("r_in", F.row_number().over(w_in))
    per_n = counts.groupBy("n_occurrences").agg(F.count(F.lit(1)).alias("n_terms"))
    w_off = Window.orderBy(F.desc("n_occurrences")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_n.select(
        "n_occurrences",
        F.coalesce(F.sum("n_terms").over(w_off), F.lit(0)).alias("id_offset"),
    )
    vocab = within.join(F.broadcast(offsets), "n_occurrences").select(
        "term",
        "n_occurrences",
        "doc_freq",
        (F.col("id_offset") + F.col("r_in") + len(VOCAB_SPECIALS) - 1)
        .cast("bigint")
        .alias("vocab_id"),
    )
    specials = spark.createDataFrame(
        [(t, 0, 0, i) for i, t in enumerate(VOCAB_SPECIALS)],
        "term string, n_occurrences bigint, doc_freq bigint, vocab_id bigint",
    )
    return specials.unionByName(vocab)


# ---------------------------------------------------------------------------
# q98 — leakage-safe train/val/test split. The naive split (hash the
# doc_id) leaks: exact duplicates of a training document land in the
# eval split and inflate benchmark scores. Hashing the NORMALIZED TEXT
# instead pins every member of an exact-dup family to the same split by
# construction — no group-by, no join, the guarantee falls out of the
# key choice. Map-only + one tiny aggregation; scales with scan
# bandwidth like q81.

SPLIT_MOD = 100
SPLIT_TRAIN_LT = 80   # [0,80) train
SPLIT_VAL_LT = 90     # [80,90) val; [90,100) test


@register(
    "q98_train_split",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15))::UBIGINT
                  AS BIGINT) % {SPLIT_MOD} AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM d GROUP BY 1, 2
    """,
    doc="leakage-safe train/val/test split: bucket by normalized-text hash "
    "so exact-dup families cannot straddle splits; map-only + one agg",
    tags=("corpus", "llm", "A6"),
)
def q98_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    bucket = (
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")
        % SPLIT_MOD
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, "train")
        .when(bucket < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q99 — token-budget curriculum selection: spend a fixed token budget on
# the highest-quality documents first (the data-mixing step after
# quality scoring, before packing). Quality here is the q29 signal
# family reduced to an integer milli-score so the ordering — and
# therefore the greedy cutoff — is exact in both engines.
#
# Shape: a naive global window (ORDER BY score DESC with no partition)
# drags the whole corpus into ONE partition — the classic serial trap.
# The milli-score domain is BOUNDED (integer, ~0..1100), so the global
# running sum decomposes exactly (q88's rank-decomposition trick):
# (1) per-score token totals — a bounded-cardinality aggregate whose
#     running sum is a window over ~1000 rows, trivially safe;
# (2) a within-score prefix sum — partitioned BY score, parallel;
# (3) keep iff tokens-of-strictly-better-scores + within-score prefix
#     fits the budget. Identical result to the global ordering
#     (score desc, doc_id), no single-partition stage anywhere.

CURRICULUM_BUDGET = 100_000  # tokens


@register(
    "q99_token_curriculum",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             (1000 * len(string_split(text, ' '))) // (10 + length(text))
             + CASE WHEN lang = 'en' THEN 100 ELSE 0 END AS mscore
      FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens, mscore,
             sum(n_tokens) OVER (ORDER BY mscore DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM scored
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
           CAST(min(mscore) AS BIGINT) AS min_score
    FROM cum WHERE cum_tokens <= {CURRICULUM_BUDGET}
    GROUP BY lang
    """,
    doc="token-budget curriculum: greedy quality-ordered selection to a "
    "fixed token budget (integer milli-scores; cumulative-window cutoff)",
    tags=("corpus", "llm", "A5"),
)
def q99_token_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_tokens = F.size(F.split("text", " "))
    # integer milli-score: tokens-per-char density plus an en bonus —
    # deterministic integer arithmetic (floats would make the DESC
    # ordering engine-dependent at ties)
    # integer div on BOTH sides: Spark's cast(double) truncates where
    # DuckDB's rounds, so float division + cast would disagree at .5
    mscore = F.expr(
        "(1000 * CAST(size(split(text, ' ')) AS BIGINT)) div (10 + length(text))"
    ) + F.when(F.col("lang") == "en", 100).otherwise(0)
    scored = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), mscore.alias("mscore")
    )
    # (1) bounded-domain per-score totals; the only unpartitioned window
    # runs over ≤ score-domain rows, never over documents
    per_score = scored.groupBy("mscore").agg(F.sum("n_tokens").alias("st"))
    w_sc = Window.orderBy(F.desc("mscore")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.broadcast(
        per_score.withColumn("prev_tokens", F.sum("st").over(w_sc) - F.col("st"))
        .select("mscore", "prev_tokens")
    )
    # (2) within-score prefix sums, partition-parallel across scores
    w_in = (
        Window.partitionBy("mscore")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        scored.withColumn("wcum", F.sum("n_tokens").over(w_in))
        .join(prev, "mscore")
        .withColumn("cum_tokens", F.col("prev_tokens") + F.col("wcum"))
    )
    return (
        cum.filter(F.col("cum_tokens") <= CURRICULUM_BUDGET)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
            F.min("mscore").cast("bigint").alias("min_score"),
        )
    )


# ---------------------------------------------------------------------------
# q100 — JSONL corpus ingestion round-trip. Web-scale text corpora
# arrive as JSON-lines (Common-Crawl WET/WARC derivatives, HF datasets
# exports), not parquet; this is the ingest leg: render → newline-JSON →
# schema-directed ``spark.read.json`` (explicit schema: at 100 TB,
# schema inference is a full extra pass over the data) → per-source
# accounting. The per-group text CHECKSUM (sum of 60-bit text hashes)
# rides through the round-trip, and the oracle computes the same
# accounting directly on the parquet table — parity therefore proves the
# JSON encode/decode is byte-lossless on content, not merely row-count
# preserving. Scale: both legs are map-only over splittable line files.


@register(
    "q100_jsonl_roundtrip",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           bit_xor(CAST(('0x' || substr(md5(text), 1, 15))::UBIGINT AS BIGINT))
             AS text_checksum
    FROM documents
    GROUP BY 1, 2
    """,
    doc="JSONL ingest round-trip: to_json -> line files -> schema-directed "
    "read.json -> per-source accounting with a content checksum",
    tags=("corpus", "llm", "S1"),
)
def q100_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = scratch_dir("q100_jsonl")
    # render: one JSON object per line, partition-parallel text files
    docs.select(
        F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value")
    ).write.text(f"{base}/docs.jsonl")

    parsed = spark.read.schema(
        "doc_id long, text string, lang string, source string"
    ).json(f"{base}/docs.jsonl")
    checksum = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return parsed.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        # XOR fold: order-independent like sum but cannot overflow
        F.bit_xor(checksum).alias("text_checksum"),
    )


# ---------------------------------------------------------------------------
# q102 — the composed pretraining-corpus pipeline, end to end: exact
# dedup (keep-first) → quality gate → eval-set decontamination → the
# leakage-safe train split → chunk accounting. Each stage is an operator
# that already has its own oracle-checked query (q22/q29-family/q79/q98/
# q80); THIS query pins the composition — the order of gates and the
# row-set handed from stage to stage — which is where real pipelines
# break (e.g. decontaminating before dedup wastes a shingle join on rows
# dedup would drop anyway).
#
# Scale shape: one shuffle on the text hash (dedup window), one
# broadcast probe against the eval shingle index (small by
# construction), one anti-join on doc_id for the contaminated set, one
# final partial-combined aggregation. The quality and split gates are
# free map-side predicates on already-computed columns.

PIPE_MIN_TOKENS = 10
PIPE_MIN_DENSITY = 100  # (1000·tokens) div (10+chars) floor


@register(
    "q102_pretrain_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
             len(string_split(text, ' ')) AS n_tokens,
             (1000 * len(string_split(text, ' '))) // (10 + length(text)) AS density,
             text
      FROM documents
    ),
    keep AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS keeper
        FROM base)
      WHERE doc_id = keeper
    ),
    qual AS (
      SELECT * FROM keep
      WHERE n_tokens >= {PIPE_MIN_TOKENS} AND density >= {PIPE_MIN_DENSITY}
        AND doc_id % {DECON_MOD} <> 0
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(
                    list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                    s -> {_duck_md5_int('s')})) AS sh
           FROM tok),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {DECON_MOD} = 0),
    contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev e ON s.sh = e.sh),
    clean AS (
      SELECT q.* FROM qual q LEFT JOIN contam c ON c.doc_id = q.doc_id
      WHERE c.doc_id IS NULL
    ),
    train AS (
      SELECT * FROM clean
      WHERE CAST(('0x' || substr(md5(norm), 1, 15))::UBIGINT AS BIGINT)
            % {SPLIT_MOD} < {SPLIT_TRAIN_LT}
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum((n_tokens - 1) // {CHUNK_STRIDE} + 1) AS BIGINT) AS total_chunks
    FROM train GROUP BY 1, 2
    """,
    doc="composed pretraining pipeline: exact-dedup -> quality gate -> "
    "decontamination -> train split -> chunk accounting (stage order pinned)",
    tags=("corpus", "llm", "pipeline"),
)
def q102_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    density = F.expr(
        "(1000 * CAST(size(split(text, ' ')) AS BIGINT)) div (10 + length(text))"
    )
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        norm.alias("norm"),
        n_tokens.alias("n_tokens"),
        density.alias("density"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("norm")))
    keep = base.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    qual = keep.filter(
        (F.col("n_tokens") >= PIPE_MIN_TOKENS)
        & (F.col("density") >= PIPE_MIN_DENSITY)
        & (F.col("doc_id") % DECON_MOD != 0)
    )
    sh = _hashed_shingles(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("doc_id") % DECON_MOD == 0).select("sh").distinct()
    )
    contam = (
        sh.filter(F.col("doc_id") % DECON_MOD != 0)
        .join(F.broadcast(eval_sh), "sh")
        .select("doc_id")
        .distinct()
    )
    clean = qual.join(contam, "doc_id", "left_anti")
    bucket = (
        F.conv(F.substring(F.md5("norm"), 1, 15), 16, 10).cast("bigint") % SPLIT_MOD
    )
    train = clean.filter(bucket < SPLIT_TRAIN_LT)
    return train.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.expr(f"(n_tokens - 1) div {CHUNK_STRIDE} + 1"))
        .cast("bigint")
        .alias("total_chunks"),
    )


# ---------------------------------------------------------------------------
# q103 — count-min sketch term frequencies: the bounded-memory sibling
# of q85's KMV distinct sketch. The sketch is CMS_DEPTH hash rows ×
# CMS_WIDTH buckets (256 cells total — broadcastable at any corpus
# size); a term's estimate is the MIN over its CMS_DEPTH cells, an upper
# bound on the true count that tightens as width grows. The query
# reports estimate vs truth for the top-CMS_REPORT terms so the
# overestimation bias is visible — exactly what an engineer sizing a
# sketch wants to see.
#
# Determinism: bucket indices derive from the same md5→60-bit-int the
# dedup family uses, seeded per depth row; counts are integers. The
# oracle rebuilds every cell. Scale: building the sketch is ONE
# partial-combined aggregation to 256 cells (the map-side combine does
# nearly all the work); the truth side is the standard word-count
# shuffle, present here only to report the bias.

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_REPORT = 20


@register(
    "q103_countmin_terms",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    terms AS (SELECT term FROM words WHERE term <> ''),
    cells AS (
      SELECT d.d AS d,
             CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || term), 1, 15))::UBIGINT
                  AS BIGINT) % {CMS_WIDTH} AS bucket,
             count(*) AS c
      FROM terms, (SELECT unnest(range(0, {CMS_DEPTH})) AS d) d
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT term, count(*) AS true_count FROM terms GROUP BY term
    ),
    top AS (
      SELECT term, true_count FROM (
        SELECT term, true_count,
               row_number() OVER (ORDER BY true_count DESC, term) AS rn
        FROM truth) WHERE rn <= {CMS_REPORT}
    )
    SELECT t.term, CAST(t.true_count AS BIGINT) AS true_count,
           CAST(min(c.c) AS BIGINT) AS cms_estimate
    FROM top t
    JOIN cells c
      ON c.bucket = CAST(('0x' || substr(md5(CAST(c.d AS VARCHAR) || ':' || t.term), 1, 15))::UBIGINT
                         AS BIGINT) % {CMS_WIDTH}
    GROUP BY 1, 2
    """,
    doc="count-min sketch (4x64 cells) term-frequency estimates vs truth "
    "for the top terms; sketch build is one partial-combined agg",
    tags=("corpus", "llm", "sketch"),
)
def q103_countmin_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    terms = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    depths = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("d"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("term"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )
    truth = terms.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    # Build the sketch from the TERM-COUNT aggregate, not per occurrence:
    # sum(true_count) per cell == count of occurrences per cell, but the
    # md5 work drops from 4x per token to 4x per DISTINCT term (~100x at
    # corpus scale), and Catalyst reuses the word-count Exchange between
    # this branch and the top-k branch (one shuffle feeds both).
    cells = (
        truth.crossJoin(F.broadcast(depths))  # DEPTH-way fanout, map-side
        .select("d", bucket.alias("bucket"), "true_count")
        .groupBy("d", "bucket")
        .agg(F.sum("true_count").alias("c"))
    )
    # sort+limit compiles to TakeOrderedAndProject — distributed partial
    # top-k per partition, no single-partition global window
    top = truth.orderBy(F.desc("true_count"), F.asc("term")).limit(CMS_REPORT)
    probe = top.crossJoin(F.broadcast(depths)).select(
        "term", "true_count", "d", bucket.alias("bucket")
    )
    return (
        probe.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# q104 — tokenizer coverage / OOV-rate report: apply the q88 vocabulary
# back to the corpus and measure, per (lang, source), how much of the
# token stream falls out of vocabulary (would map to <unk>). This is the
# acceptance test a tokenizer build ships with — a vocab whose OOV rate
# spikes on one source is mis-trained for it.
#
# Scale shape: the vocab TERM SET (not the id table) broadcasts — it is
# min-count-pruned and orders of magnitude smaller than the token
# stream; the corpus side is one map-side probe (left join against the
# broadcast) followed by one partial-combined aggregation. The token
# stream itself never shuffles.


@register(
    "q104_oov_rate",
    oracle=f"""
    WITH vocab AS (
      SELECT term FROM (
        SELECT term, CAST(sum(tf) AS BIGINT) AS n
        FROM (SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents)
              GROUP BY doc_id, term)
        GROUP BY term)
      WHERE n >= {VOCAB_MIN_COUNT}
    ),
    stream AS (
      SELECT lang, source, unnest(string_split(text, ' ')) AS term
      FROM documents
    )
    SELECT s.lang, s.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (v.term IS NULL) AS BIGINT) AS n_oov,
           CAST(count(*) FILTER (v.term IS NULL) AS DOUBLE) / count(*)
             AS oov_rate
    FROM stream s LEFT JOIN vocab v ON v.term = s.term
    GROUP BY 1, 2
    """,
    doc="tokenizer OOV-rate report per (lang, source): broadcast vocab "
    "probe over the token stream, one partial-combined agg",
    tags=("corpus", "llm", "vocab"),
)
def q104_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    stream = docs.select(
        "lang", "source", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = (
        stream.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= VOCAB_MIN_COUNT)
        .select("term")
        .withColumn("in_vocab", F.lit(1))
    )
    return (
        stream.join(F.broadcast(vocab), "term", "left")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
            (
                F.count(F.when(F.col("in_vocab").isNull(), 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q105 — split leakage audit: q98's hash-of-normalized-text split keeps
# EXACT duplicates together, but near-duplicates (shared shingles, not
# identical text) can still straddle the boundary and inflate eval
# scores. This query measures that residual: for every val/test
# document, does it share any word trigram with ANY train document?
# The honest answer to "how clean is our eval set really".
#
# Scale shape: the probe is a LEFT SEMI join on the 60-bit shingle key —
# val/test shingles against train shingles, both hash-partitioned on
# the shingle; no pair explosion (semi-join short-circuits per key), and
# the df-cap question doesn't arise because nothing is enumerated per
# pair. One extra shuffle rolls leaky doc_ids up to per-split rates.


@register(
    "q105_split_leakage_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
                  WHEN b < {SPLIT_VAL_LT} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15))::UBIGINT
                    AS BIGINT) % {SPLIT_MOD} AS b
        FROM documents)
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(
                    list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                    s -> {_duck_md5_int('s')})) AS sh
           FROM tok),
    train_sh AS (
      SELECT DISTINCT s.sh FROM sh s JOIN base b USING (doc_id)
      WHERE b.split = 'train'
    ),
    leaky AS (
      SELECT DISTINCT s.doc_id FROM sh s
      JOIN base b USING (doc_id)
      WHERE b.split <> 'train'
        AND EXISTS (SELECT 1 FROM train_sh t WHERE t.sh = s.sh)
    )
    SELECT b.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(l.doc_id) AS BIGINT) AS n_leaky,
           CAST(count(l.doc_id) AS DOUBLE) / count(*) AS leak_rate
    FROM base b LEFT JOIN leaky l ON l.doc_id = b.doc_id
    WHERE b.split <> 'train'
    GROUP BY b.split
    """,
    doc="near-dup leakage across the train/val/test boundary: semi-join "
    "of held-out shingles against the train shingle set, per-split rates",
    tags=("corpus", "llm", "dedup"),
)
def q105_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    bucket = (
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint") % SPLIT_MOD
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, "train")
        .when(bucket < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    base = docs.select("doc_id", split.alias("split"))
    sh = _hashed_shingles(spark, sf_dir).join(base, "doc_id")
    train_sh = sh.filter(F.col("split") == "train").select("sh").distinct()
    held = sh.filter(F.col("split") != "train")
    leaky = (
        held.join(train_sh, "sh", "left_semi").select("doc_id").distinct()
        .withColumn("leak", F.lit(1))
    )
    return (
        base.filter(F.col("split") != "train")
        .join(leaky, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("leak").alias("n_leaky"),
            (F.count("leak").cast("double") / F.count(F.lit(1))).alias("leak_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q110 — schema-drift-tolerant ingestion: a corpus landed in batches
# whose schema EVOLVED (an early batch without the ``source`` column, a
# later batch with it). ``spark.read.option("mergeSchema", true)``
# unifies the footers at plan time; rows from the pre-evolution batch
# surface the new column as NULL, and accounting buckets them under a
# sentinel. The oracle reproduces the same union semantics directly
# from the documents table, so parity proves no rows were lost or
# mis-bucketed across the schema boundary.
#
# Scale note: mergeSchema unions FOOTER metadata (one small task per
# file), not data; the scan itself stays columnar and pruned. The
# batch split here is doc_id parity — deterministic and
# oracle-reproducible.


@register(
    "q110_schema_evolution",
    oracle="""
    WITH unified AS (
      -- batch 0 (doc_id even): landed BEFORE the source column existed
      SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           coalesce(source, '<pre-evolution>') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM unified GROUP BY 1, 2
    """,
    doc="schema-evolution ingestion: mergeSchema over batches with and "
    "without the source column; pre-evolution rows bucket to a sentinel",
    tags=("corpus", "S1", "llm"),
)
def q110_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = scratch_dir("q110_evolve")
    # batch 0: the old layout — no source column yet
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang").write.parquet(
        f"{base}/batch=0"
    )
    # batch 1: the evolved layout
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang", "source"
    ).write.parquet(f"{base}/batch=1")

    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/batch=0", f"{base}/batch=1"
    )
    return (
        merged.select(
            "lang",
            F.coalesce("source", F.lit("<pre-evolution>")).alias("source"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q124 — dirty-CSV ingestion with corrupt-row quarantine (S1's unhappy
# path): a landing CSV is staged with deterministically injected garbage
# lines (every doc_id % 97 == 0 becomes an unparseable single-field
# line), read back in PERMISSIVE mode with a _corrupt_record column, and
# accounted: quarantined rows counted, clean rows checksummed. The
# oracle computes the SAME accounting from the original table + the
# injection rule, so parity proves the reader's malformed-row handling
# quarantines exactly the injected lines — no silent drops, no
# misparses. At 100 TB ingest, this accounting (clean vs quarantined,
# with a content checksum) is the gate between a landing zone and the
# bronze layer; FAILFAST aborts the world and DROPMALFORMED lies —
# PERMISSIVE + quarantine count is the production posture.

CSV_BAD_MOD = 97


@register(
    "q124_dirty_csv_ingest",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % {CSV_BAD_MOD} <> 0
    )
    SELECT CAST((SELECT count(*) FROM g) AS BIGINT) AS n_good,
           CAST((SELECT count(*) FROM documents
                 WHERE doc_id % {CSV_BAD_MOD} = 0) AS BIGINT) AS n_quarantined,
           CAST((SELECT count(DISTINCT lang) FROM g) AS BIGINT) AS n_langs,
           CAST((SELECT sum(n_chars) FROM g) AS BIGINT) AS chars_total,
           CAST((SELECT bit_xor(doc_id) FROM g) AS BIGINT) AS id_checksum
    """,
    doc="PERMISSIVE CSV ingest with corrupt-record quarantine accounting "
    "(injected garbage lines; clean-vs-quarantined gate for a landing zone)",
    tags=("corpus", "S1", "llm"),
)
def q124_dirty_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = scratch_dir("q124_csv")
    good = docs.filter(F.col("doc_id") % CSV_BAD_MOD != 0).select(
        F.concat_ws(
            ",", F.col("doc_id"), F.col("lang"), F.col("n_chars")
        ).alias("value")
    )
    bad = docs.filter(F.col("doc_id") % CSV_BAD_MOD == 0).select(
        # single unparseable field: no delimiters, non-numeric first col
        F.concat(F.lit("GARBAGE<"), F.col("doc_id"), F.lit(">")).alias("value")
    )
    good.unionAll(bad).write.text(f"{base}/landing")

    landed = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(f"{base}/landing")
    )
    clean = F.col("_corrupt_record").isNull()
    return landed.agg(
        F.count(F.when(clean, 1)).alias("n_good"),
        F.count(F.when(~clean, 1)).alias("n_quarantined"),
        F.countDistinct(F.when(clean, F.col("lang"))).alias("n_langs"),
        F.sum(F.when(clean, F.col("n_chars"))).cast("bigint").alias("chars_total"),
        F.bit_xor(F.when(clean, F.col("doc_id"))).cast("bigint").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# q146 — canonical-document selection: the step AFTER clustering that
# dedup pipelines actually ship — each near-dup cluster keeps ONE
# representative, chosen by quality, not by accident of doc_id. Composes
# q72's connected-component clusters with q29's quality gates; the
# representative is argmax (keep, n_tokens, -doc_id) within the cluster
# — all-integer ranking, deterministic tie-breaks, no float synthesis.
# Scale: the cluster assignment is q72 (bounded pointer-jumping rounds);
# the rank window partitions BY CLUSTER (cluster sizes are near-dup
# group sizes — bounded by the LSH threshold, never corpus-sized).


def _q146_oracle() -> str:
    from .dedup_queries import _duck_minhash_bands_cte
    from .text_queries import STOPWORDS

    return f"""
    WITH RECURSIVE
    {_duck_minhash_bands_cte()},
    exact_e AS (
      SELECT keeper AS u, doc_id AS v FROM (
        SELECT doc_id, min(doc_id) OVER (
          PARTITION BY sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS keeper
        FROM documents)
      WHERE doc_id <> keeper
    ),
    near_e AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    e AS (SELECT u, v FROM exact_e UNION SELECT u, v FROM near_e),
    bidir AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.u, r.label FROM bidir b JOIN reach r ON r.id = b.v
    ),
    cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
    q AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             (len(string_split(text, ' ')) BETWEEN 10 AND 200
              AND CAST(len(list_filter(string_split(text, ' '),
                    w -> list_contains({STOPWORDS!r}, w))) AS DOUBLE)
                  / len(string_split(text, ' ')) < 0.5) AS keep
      FROM documents
    ),
    j AS (SELECT cc.cluster_id, q.doc_id, q.n_tokens, q.keep
          FROM cc JOIN q USING (doc_id)),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY keep DESC, n_tokens DESC, doc_id) AS rk
      FROM j
    )
    SELECT j.cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN j.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(max(r.doc_id) AS BIGINT) AS rep_doc_id,
           CAST(max(r.n_tokens) AS BIGINT) AS rep_tokens
    FROM j JOIN ranked r ON r.cluster_id = j.cluster_id AND r.rk = 1
    GROUP BY j.cluster_id
    """


@register(
    "q146_canonical_docs",
    oracle=_q146_oracle(),
    doc="canonical-doc selection per near-dup cluster: q72 components x "
    "q29 quality, argmax(keep, n_tokens, -doc_id) representative — "
    "all-integer ranking, cluster-bounded windows",
    tags=("dedup", "llm", "text"),
)
def q146_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_queries import q72_dedup_clusters
    from .text_queries import q29_quality_score

    cc = q72_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    qual = q29_quality_score(spark, sf_dir).select("doc_id", "n_tokens", "keep")
    j = cc.join(qual, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("keep"), F.desc("n_tokens"), F.asc("doc_id")
    )
    rep = (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_tokens").alias("rep_tokens"),
        )
    )
    per = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
    )
    return per.join(rep, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_keep",
        F.col("rep_doc_id").cast("bigint"),
        F.col("rep_tokens").cast("bigint"),
    )


# ---------------------------------------------------------------------------
# q152 — temperature-scaled source mixing at α = 0.5: the multilingual/
# multi-source sampling scheme (share_s ∝ n_s^α) that upweights small
# sources without letting one giant source dominate. α = 0.5 is chosen
# deliberately: n^0.5 = sqrt(n), and IEEE-754 sqrt is CORRECTLY ROUNDED
# — bit-identical across engines — where a general pow() is not. The
# share is one double division per source (deterministic); the
# normalizer folds a value-sorted list sequentially so the float sum
# has ONE cross-engine accumulation order; the sampling
# budget per source is floored to an integer quota. One bounded-domain
# aggregate (|source| rows), everything else map-side.

MIX_BUDGET = 10_000  # total docs the mixed corpus draws


@register(
    "q152_temperature_mix",
    oracle=f"""
    WITH per AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT list_reduce(list_sort(list(sqrt(CAST(n AS DOUBLE)))),
                               (a, b) -> a + b) AS z FROM per)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           sqrt(CAST(n AS DOUBLE)) / z AS share,
           CAST(floor({MIX_BUDGET} * sqrt(CAST(n AS DOUBLE)) / z) AS BIGINT)
             AS quota
    FROM per CROSS JOIN tot
    """,
    doc="sqrt-temperature source mixing (alpha=0.5): IEEE-exact sqrt "
    "shares + floored integer quotas; bounded-domain aggregate",
    tags=("corpus", "llm", "sampling"),
)
def q152_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # the normalizer is a float SUM — order-dependent if left to the
    # engines' own accumulation order. Fold a VALUE-SORTED list
    # sequentially instead (same trick as the similarity dot products):
    # both engines add the identical doubles in the identical order.
    tot = per.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.sqrt(F.col("n").cast("double")))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z")
    )
    share = F.sqrt(F.col("n").cast("double")) / F.col("z")
    return per.join(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        share.alias("share"),
        F.floor(F.lit(MIX_BUDGET) * share).cast("bigint").alias("quota"),
    )


from .text_queries import STOPWORDS  # noqa: E402  (q200 oracle text)


# ---------------------------------------------------------------------------
# q200 — corpus release manifest: the one-page verdict a data-release
# process signs — row inventory, order-insensitive content checksum,
# quality-gate pass share, exact-duplicate rate, source and language
# fan-out — each computed in a single pass over ``documents`` and
# emitted as (metric, value) rows in exact integers (shares in
# micro-units).  Composes the q22 hash, q29 gates, and q161's xor
# checksum discipline into the artifact that actually ships with a
# training-corpus release.  At 100 TB: two scans (raw + normalized-
# hash distinct), everything map-side combined.

@register(
    "q200_release_manifest",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({STOPWORDS!r}, w))) AS n_stop,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS norm_hash
      FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT norm_hash) AS BIGINT) AS n_distinct,
             CAST(bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                  || ':' || norm_hash), 1, 15))::UBIGINT AS BIGINT))
               AS BIGINT) AS checksum,
             CAST(sum(CASE WHEN n_tokens BETWEEN 10 AND 200
                            AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      FROM base
    )
    SELECT metric, CAST(value AS BIGINT) AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM agg
      UNION ALL SELECT 'n_tokens', n_tokens FROM agg
      UNION ALL SELECT 'n_chars', n_chars FROM agg
      UNION ALL SELECT 'n_langs', n_langs FROM agg
      UNION ALL SELECT 'n_sources', n_sources FROM agg
      UNION ALL SELECT 'content_checksum', checksum FROM agg
      UNION ALL SELECT 'dup_rate_micros',
        (n_docs - n_distinct) * 1000000 // n_docs FROM agg
      UNION ALL SELECT 'quality_keep_micros',
        n_keep * 1000000 // n_docs FROM agg
    )
    """,
    doc="corpus release manifest: inventory, xor content checksum, "
    "quality-keep and exact-dup shares in integer micro-units — one "
    "(metric, value) verdict table, map-side combined",
    tags=("corpus", "llm", "governance"),
)
def q200_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_queries import STOPWORDS as _SW

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    tokens = F.split(F.col("text"), " ")
    norm_hash = F.sha2(
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), 256
    )
    base = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(tokens).alias("n_tokens"),
        F.size(F.filter(tokens, lambda w: w.isin(_SW))).alias("n_stop"),
        norm_hash.alias("norm_hash"),
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 200)
        & (F.col("n_stop").cast("double") / F.col("n_tokens") < 0.5)
    )
    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "norm_hash")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("norm_hash").cast("bigint").alias("n_distinct"),
        F.bit_xor(row_hash).cast("bigint").alias("checksum"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_keep"),
    )
    rows = F.array(
        F.struct(F.lit("n_docs").alias("metric"), F.col("n_docs").alias("value")),
        F.struct(F.lit("n_tokens").alias("metric"), F.col("n_tokens").alias("value")),
        F.struct(F.lit("n_chars").alias("metric"), F.col("n_chars").alias("value")),
        F.struct(F.lit("n_langs").alias("metric"), F.col("n_langs").alias("value")),
        F.struct(
            F.lit("n_sources").alias("metric"), F.col("n_sources").alias("value")
        ),
        F.struct(
            F.lit("content_checksum").alias("metric"),
            F.col("checksum").alias("value"),
        ),
        F.struct(
            F.lit("dup_rate_micros").alias("metric"),
            F.expr("(n_docs - n_distinct) * 1000000 div n_docs").alias("value"),
        ),
        F.struct(
            F.lit("quality_keep_micros").alias("metric"),
            F.expr("n_keep * 1000000 div n_docs").alias("value"),
        ),
    )
    return agg.select(F.inline(rows)).select(
        "metric", F.col("value").cast("bigint")
    )
