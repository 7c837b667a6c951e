"""Training-pipeline operators beyond the reference's surface (round 5).

The corpus/dedup/similarity modules cover cleaning and dedup; these five
queries cover what happens NEXT in a large-scale training-data pipeline —
the read-side and planning operators a 100 TB corpus needs before any
token reaches a trainer:

* q115 — deterministic shuffled training order, sharded. A trainer never
  does a global sort of the corpus; it hash-assigns docs to shards and
  reads each shard in a locally-shuffled order. Hash-partitioned,
  shard-local ranks only.
* q116 — exact-k per-group eval sample: deterministic hash-ranked top-k
  per language (eval/holdout sets want exact sizes, not Bernoulli
  fractions — q52/q98 cover the fraction form).
* q117 — bigram continuation counts (the Kneser-Ney smoothing statistic):
  for each word, how many DISTINCT left contexts precede it. Two-level
  aggregation, partial-agg friendly.
* q118 — sequence-length bucketing with padding-waste accounting: the
  planner for fixed-capacity batch buckets (padding efficiency is a
  first-order training-cost factor).
* q119 — runtime-bloom-pruned selective join: a narrow dimension slice
  prunes the fact scan via Spark's injected bloom filter BEFORE the
  shuffle — at 100 TB this is the difference between shuffling the whole
  fact table and shuffling the matching fraction. Plan-asserted in
  ``tests/test_training_queries.py``.

All five are oracle-backed (integer/exact arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from .dedup_queries import _duck_md5_int, _md5_int
from .registry import register

N_SHARDS = 64
EVAL_K = 20
BUCKET_TOKENS = 64  # bucket width; capacity = (bucket+1) * width
MAX_BUCKET = 15


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


# ---------------------------------------------------------------------------
# q115 — deterministic training order: hash-sharded, shard-local shuffle.
# Scale: one hash-partition shuffle on shard id; ranks are per-shard
# windows (each shard is one partition's worth of work, never a global
# sort). N_SHARDS is the parallelism/file-granularity knob: one shard ≈
# one output file a trainer streams, so production uses thousands
# (100 TB / ~1-4 GB files), keeping every rank window file-sized — the
# 64 here is scaled to bench SF. Epoch re-shuffles change the salt
# ('order:'), nothing else.


@register(
    "q115_training_order_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_duck_md5_int("'order:' || CAST(doc_id AS VARCHAR)")} AS hv
      FROM documents
    )
    SELECT doc_id,
           CAST(hv % {N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % {N_SHARDS}
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    doc="deterministic shuffled training order: hash-assigned shards, "
    "shard-local positions (no global sort anywhere)",
    tags=("training", "llm", "sampling"),
)
def q115_training_order_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    hv = _md5_int(F.concat(F.lit("order:"), F.col("doc_id").cast("string")))
    shard = (hv % N_SHARDS).alias("shard")
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        d.select("doc_id", hv.alias("hv"), shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", F.col("shard").cast("bigint").alias("shard"), "pos")
    )


# ---------------------------------------------------------------------------
# q116 — exact-k per-group sample: hash-rank inside each language, keep
# the first k. Compiles to a partitioned WindowGroupLimit (rank state is
# k rows per group per partition, merged) — never a per-group collect.


@register(
    "q116_eval_group_sample",
    oracle=f"""
    WITH h AS (
      SELECT lang, doc_id,
             {_duck_md5_int("'eval:' || CAST(doc_id AS VARCHAR)")} AS hv
      FROM documents
    ),
    r AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
      FROM h
    )
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {EVAL_K}
    """,
    doc=f"exact-{EVAL_K} deterministic eval sample per language "
    "(hash-ranked WindowGroupLimit; fraction-free holdout construction)",
    tags=("training", "llm", "sampling"),
)
def q116_eval_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    hv = _md5_int(F.concat(F.lit("eval:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        d.select("lang", "doc_id", hv.alias("hv"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= EVAL_K)
        .select("lang", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# q117 — bigram continuation counts (Kneser-Ney's N1+(•w)): per word,
# the number of DISTINCT left contexts and total bigram occurrences.
# Shape: explode positions (codegen, same as q28) → two-level aggregate.
# The distinct-count dedups on (w2, w1) first — partial aggregation
# collapses repeats map-side; no word ever gathers its contexts into a
# single buffer. HAVING >= 3 bounds the output to words with real
# context diversity (the ones smoothing actually redistributes mass to).


@register(
    "q117_bigram_continuation",
    oracle="""
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM tok WHERE len(t) >= 2
    )
    SELECT w2 AS word,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(DISTINCT w1) AS BIGINT) AS n_contexts
    FROM bg GROUP BY w2
    HAVING count(DISTINCT w1) >= 3
    """,
    doc="Kneser-Ney continuation counts: distinct left contexts per word "
    "(two-level aggregate, map-side partials)",
    tags=("training", "llm", "text"),
)
def q117_bigram_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tk = d.select(F.split(d.text, " ").alias("t"))
    pos = tk.filter(F.size("t") >= 2).select(
        "t", F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i")
    )
    pairs = pos.select(
        F.element_at("t", F.col("i") + 1).alias("w1"),
        F.element_at("t", F.col("i") + 2).alias("w2"),
    )
    return (
        pairs.groupBy("w2")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("w1").alias("n_contexts"),
        )
        .filter(F.col("n_contexts") >= 3)
        .select(F.col("w2").alias("word"), "n_total", "n_contexts")
    )


# ---------------------------------------------------------------------------
# q118 — sequence-length bucketing: fixed-width capacity buckets with
# padding-waste accounting. Map-only scoring + one bounded-domain
# groupBy (16 buckets); the waste column is what a batch planner
# minimizes when it picks bucket boundaries.


@register(
    "q118_seq_length_buckets",
    oracle=f"""
    WITH s AS (
      SELECT least(len(string_split(text, ' ')),
                   {(MAX_BUCKET + 1) * BUCKET_TOKENS}) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT n_tok,
             least((n_tok - 1) // {BUCKET_TOKENS}, {MAX_BUCKET}) AS bucket
      FROM s
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST((bucket + 1) * {BUCKET_TOKENS} AS BIGINT) AS capacity,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum((bucket + 1) * {BUCKET_TOKENS} - n_tok) AS BIGINT) AS pad_waste
    FROM b GROUP BY bucket
    """,
    doc="sequence-length capacity buckets + padding-waste accounting "
    "(map-only scoring, 16-row bounded-domain aggregate)",
    tags=("training", "llm", "A4"),
)
def q118_seq_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    clip = (MAX_BUCKET + 1) * BUCKET_TOKENS
    n_tok = F.least(F.size(F.split(d.text, " ")), F.lit(clip))
    # (n_tok - 1) div width: a doc of exactly one capacity fits that
    # bucket (64 tokens -> bucket 0, capacity 64, zero waste)
    bucket = F.least(
        F.expr(f"(n_tok - 1) div {BUCKET_TOKENS}"), F.lit(MAX_BUCKET)
    )
    return (
        d.select(n_tok.alias("n_tok"))
        .select("n_tok", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum((F.col("bucket") + 1) * BUCKET_TOKENS - F.col("n_tok"))
            .cast("bigint")
            .alias("pad_waste"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            ((F.col("bucket") + 1) * BUCKET_TOKENS).cast("bigint").alias("capacity"),
            "n_docs",
            "total_tokens",
            "pad_waste",
        )
    )


# ---------------------------------------------------------------------------
# q119 — runtime-bloom-pruned selective join: a one-priority slice of
# orders joins lineitem; Spark injects a bloom filter built from the
# slice into the lineitem scan, so non-matching fact rows die BEFORE the
# shuffle. At 100 TB fact scale this is the semi-join reduction that
# keeps a selective dim⋈fact join from shuffling the whole fact table.
#
# The application-side threshold (default 10 GB) is lowered only for
# THIS query's execution and restored after the result materializes —
# the materialize-then-restore pattern keeps the session conf clean for
# every other query (same discipline as the streaming fixtures).
# ``tests/test_training_queries.py`` asserts BloomFilterMightContain in
# the executed plan.


@register(
    "q119_bloom_pruned_join",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    doc="selective dim-slice join with runtime bloom-filter fact pruning "
    "(non-matching rows die before the shuffle)",
    tags=("training", "layout", "J1"),
)
def q119_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    joined = (
        t["lineitem"]
        .join(urgent, t["lineitem"].l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "price_cents"
            ),
        )
    )
    out = scratch_dir("q119_bloom") + "/out"
    conf = spark.conf
    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bc = "spark.sql.autoBroadcastJoinThreshold"
    prev, prev_bc = conf.get(key), conf.get(bc)
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(key, "0")
    # broadcast off: bloom injection targets the SHUFFLE-join regime —
    # exactly the 100 TB case where the dim slice has outgrown the
    # broadcast threshold but its key set still fits a bloom filter.
    # (When the slice IS broadcast-able, BHJ already prunes at the join
    # and Spark rightly skips the bloom.)
    conf.set(bc, "-1")
    try:
        joined.write.parquet(out)  # materialize under the bloom conf
    finally:
        conf.set(key, prev)
        conf.set(bc, prev_bc)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# q135 — bigram-LM surprisal quality filter (the CCNet/KenLM "perplexity
# filter" reshaped for cross-engine exactness): score every document by
# its mean per-bigram surprisal under an add-one-smoothed bigram model
# trained on the corpus itself; low-surprisal docs read like the corpus,
# high-surprisal docs are noise/garble candidates.
#
# Determinism design: float log-probs are NOT bit-identical across
# engines (measured for idf in text_queries.py — JVM Math.log vs
# DuckDB's libm differ in final bits), and float SUMs are
# order-dependent. So surprisal is kept in exact integer "bits":
#   bits(w1,w2) = floor(log2((c1 + V) / (c12 + 1)))
#               = length(bin((c1 + V) div (c12 + 1))) - 1
# using the identity floor(log2(d/n)) = bitlength(d div n) - 1 for
# d >= n >= 1 (both engines have bin(); no transcendental touches the
# data). The only float is the final mean = total_bits / n_bigrams —
# one IEEE division of two int64s, bit-identical everywhere.
#
# Scale: bigram model = one explode + groupBy(w1,w2) with map-side
# partials; c1 re-aggregates the (much smaller) model; V and the scoring
# join broadcast/shuffle exactly like q87's tf-idf. The scoring join on
# (w1,w2) is skewed by stopword bigrams — AQE skew-join territory, same
# as q23's hot shingles.

SURPRISAL_KEEP_BITS = 12.0  # keep docs whose mean bigram surprisal <= 12 bits

# Shared DuckDB CTE chain for the bigram-surprisal substrate: q135 (the
# keep/drop filter) and q244 (the CCNet head/middle/tail bucketing) both
# read ``perdoc (doc_id, n_bigrams, total_bits)``.
_SURPRISAL_CTES = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    v AS (
      SELECT count(DISTINCT w) AS vsz
      FROM (SELECT unnest(t) AS w FROM tok)
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM tok WHERE len(t) >= 2
    ),
    m AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM m GROUP BY 1),
    scored AS (
      SELECT b.doc_id,
             length(bin((ctx.c1 + v.vsz) // (m.c12 + 1))) - 1 AS bits
      FROM bg b
      JOIN m USING (w1, w2)
      JOIN ctx USING (w1)
      CROSS JOIN v
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(bits) AS BIGINT) AS total_bits
      FROM scored GROUP BY doc_id
    )
"""


def _surprisal_per_doc(d: DataFrame) -> DataFrame:
    """Per-document exact-integer surprisal totals (doc_id, n_bigrams,
    total_bits) under the corpus-trained add-one bigram model — the shared
    substrate of q135 (filter) and q244 (per-language buckets).  Bit-exact
    mirror of ``_SURPRISAL_CTES``; see the q135 block comment for the
    floor(log2) = bitlength identity that keeps it transcendental-free."""
    tk = d.select("doc_id", F.split(d.text, " ").alias("t"))

    vsz = (
        tk.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").alias("vsz"))
    )

    bg = (
        tk.filter(F.size("t") >= 2)
        .select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i"), "t"
        )
        .select(
            "doc_id",
            F.element_at("t", F.col("i") + 1).alias("w1"),
            F.element_at("t", F.col("i") + 2).alias("w2"),
        )
    )

    m = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = m.groupBy("w1").agg(F.sum("c12").alias("c1"))

    scored = (
        bg.join(m, ["w1", "w2"])
        .join(ctx, "w1")
        .join(F.broadcast(vsz))
        .select(
            "doc_id",
            (
                F.length(F.bin(F.expr("(c1 + vsz) div (c12 + 1)"))) - 1
            ).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").cast("bigint").alias("total_bits"),
    )


@register(
    "q135_lm_surprisal_filter",
    oracle=f"""
    WITH {_SURPRISAL_CTES}
    SELECT doc_id, n_bigrams, total_bits,
           CAST(total_bits AS DOUBLE) / n_bigrams AS mean_bits,
           CAST(total_bits AS DOUBLE) / n_bigrams <= {SURPRISAL_KEEP_BITS} AS keep
    FROM perdoc
    """,
    doc="bigram-LM mean-surprisal quality filter (CCNet-style perplexity "
    "gate) in exact integer bits — floor(log2((c1+V)/(c12+1))) via "
    "bitlength, zero transcendentals, cross-engine bit parity",
    tags=("training", "llm", "text", "A5"),
)
def q135_lm_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = _surprisal_per_doc(_docs(spark, sf_dir))
    mean_bits = F.col("total_bits").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        mean_bits.alias("mean_bits"),
        (mean_bits <= SURPRISAL_KEEP_BITS).alias("keep"),
    )


# ---------------------------------------------------------------------------
# q143 — probability-proportional-to-size (PPS) document sampling: the
# corpus-mixing primitive "sample documents proportional to their token
# count" (token-budget sampling favors long docs exactly as a token-
# level uniform draw would). Deterministic: the per-doc draw is an
# md5-derived integer mod W compared against the doc's clamped token
# count — inclusion probability min(tokens, W)/W with zero RNG state,
# reproducible across engines, epochs re-salt the hash. Map-only over
# the corpus (the draw needs only the row), no shuffle at all; the
# importance weight ships as an exact integer pair (W, n_tokens) so
# downstream reweighting never sees synthesized floats.

PPS_W = 512  # draw window: docs with >= W tokens are always kept


@register(
    "q143_pps_token_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_duck_md5_int("'pps:' || CAST(doc_id AS VARCHAR)")} % {PPS_W} AS draw
      FROM documents
    )
    SELECT doc_id, n_tokens, CAST(draw AS BIGINT) AS draw,
           CAST({PPS_W} AS BIGINT) AS weight_den
    FROM t
    WHERE draw < least(n_tokens, {PPS_W})
    """,
    doc="deterministic PPS sampling by token count: hash-draw mod W vs "
    "clamped tokens (inclusion prob min(tok,W)/W), map-only, re-saltable "
    "per epoch, exact integer importance weights",
    tags=("training", "llm", "sampling"),
)
def q143_pps_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(d.text, " ")).cast("bigint")
    draw = _md5_int(F.concat(F.lit("pps:"), F.col("doc_id").cast("string"))) % PPS_W
    return (
        d.select("doc_id", n_tokens.alias("n_tokens"), draw.alias("draw"))
        .filter(F.col("draw") < F.least(F.col("n_tokens"), F.lit(PPS_W)))
        .select(
            "doc_id",
            "n_tokens",
            F.col("draw").cast("bigint").alias("draw"),
            F.lit(PPS_W).cast("bigint").alias("weight_den"),
        )
    )


# ---------------------------------------------------------------------------
# q159 — span-corruption mask planning (T5/UL2 denoising): each doc gets
# ~15% of its tokens masked in 3-token spans. Spans are placed ONE PER
# STRATUM — the doc is cut into n_spans equal token segments and the
# span lands at a hash-derived offset inside its segment — so spans are
# disjoint BY CONSTRUCTION (no rejection sampling, no RNG state, same
# mask plan on every engine and every epoch salt). Map-only: explode is
# bounded by n_spans ≈ tokens/20 per doc; at 100 TB the mask table
# partitions with the docs and nothing shuffles.

SPAN_LEN = 3
CORRUPT_PCT = 15  # target corrupted-token percentage


@register(
    "q159_span_corruption_plan",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    k AS (
      SELECT doc_id, n_tokens,
             (n_tokens * {CORRUPT_PCT}) // (100 * {SPAN_LEN}) AS n_spans
      FROM t WHERE (n_tokens * {CORRUPT_PCT}) // (100 * {SPAN_LEN}) >= 1
    ),
    s AS (
      SELECT doc_id, n_tokens, n_spans,
             unnest(range(0, n_spans)) AS span_idx,
             n_tokens // n_spans AS seg_len
      FROM k
    )
    SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
           CAST(span_idx * seg_len +
                {_duck_md5_int("'span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(span_idx AS VARCHAR)")}
                  % (seg_len - {SPAN_LEN} + 1) AS BIGINT) AS start_tok,
           CAST({SPAN_LEN} AS BIGINT) AS span_len,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM s WHERE seg_len >= {SPAN_LEN}
    """,
    doc="T5-style span-corruption mask plan: one hash-placed 3-token "
    "span per equal stratum (disjoint by construction, no RNG state), "
    "map-only bounded explode",
    tags=("training", "llm", "sampling"),
)
def q159_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(d.text, " ")).cast("bigint")
    k = (
        d.select("doc_id", n_tokens.alias("n_tokens"))
        .withColumn(
            "n_spans", F.expr(f"(n_tokens * {CORRUPT_PCT}) div (100 * {SPAN_LEN})")
        )
        .filter(F.col("n_spans") >= 1)
        .withColumn("seg_len", F.expr("n_tokens div n_spans"))
        .filter(F.col("seg_len") >= SPAN_LEN)
    )
    s = k.select(
        "doc_id",
        "n_tokens",
        "seg_len",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("span_idx"),
    )
    h = _md5_int(
        F.concat(
            F.lit("span:"),
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("span_idx").cast("string"),
        )
    )
    return s.select(
        "doc_id",
        F.col("span_idx").cast("bigint"),
        (
            F.col("span_idx") * F.col("seg_len")
            + h % (F.col("seg_len") - SPAN_LEN + 1)
        )
        .cast("bigint")
        .alias("start_tok"),
        F.lit(SPAN_LEN).cast("bigint").alias("span_len"),
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# q240 — linear-probe training via exact sufficient statistics +
# fixed-point batch gradient descent.  The quality-probe job an LLM
# pipeline runs constantly (fit a tiny linear model over cheap document
# features to predict a target signal) — and the canonical demonstration
# that ITERATIVE training needs only ONE pass over the data when the
# loss is quadratic: the gradient of ||Xw - y||^2 is A·w - b with
# A = X^T X (d×d) and b = X^T y (d), so the corpus-sized work is a
# single map-side-combinable aggregate producing 9 numbers, and every
# GD round after that is arithmetic on a ONE-ROW frame.  At 100 TB the
# data pass is one scan+agg; rounds cost nothing regardless of count.
#
# Exactness contract (the CUPED/q94 discipline): features are small
# integers (capped token counts), sufficient statistics accumulate in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), weights live in 1e-6
# fixed point, and the learning rate is 1/(n·2^18) — 2^18 bounds
# trace(A)/n = 1 + x1² + x2² ≤ 1 + 2·256², so lr·λmax ≤ 0.5 and the
# iteration contracts monotonically (no overflow; headroom ~1e17).
# The update's only division is an integral `div`/`//`, verified
# truncation-toward-zero in BOTH engines (including negatives), so
# every round's weights — and therefore the whole trajectory — are
# bit-identical.  Per-round weights are materialized through the
# scratch seam (Lloyd precedent): an unbroken 1-row projection chain
# would nest each round's expressions inside the next's ~4× per round.

Q240_ROUNDS = 8
Q240_SCALE = 1_000_000  # weight fixed-point denominator
Q240_LRDEN = 262_144  # lr = 1 / (n * 2^18); 2^18 >= 1 + 2*256^2
Q240_XCAP = 256
Q240_YCAP = 4096


def _q240_oracle() -> str:
    ctes = [
        """feats AS (
      SELECT least(len(string_split(text, ' ')), 256) AS x1,
             least(len(list_distinct(string_split(text, ' '))), 256) AS x2,
             least(n_chars, 4096) AS y
      FROM documents
    )""",
        """st AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
             CAST(sum(y) AS HUGEINT) AS b0,
             CAST(sum(x1 * y) AS HUGEINT) AS b1,
             CAST(sum(x2 * y) AS HUGEINT) AS b2
      FROM feats
    )""",
        "w0_ AS (SELECT *, CAST(0 AS HUGEINT) AS w0, CAST(0 AS HUGEINT) AS w1, "
        "CAST(0 AS HUGEINT) AS w2 FROM st)",
    ]
    for r in range(1, Q240_ROUNDS + 1):
        ctes.append(
            f"""w{r}_ AS (
      SELECT n, s1, s2, s11, s12, s22, b0, b1, b2,
             w0 - (g0 // d) AS w0, w1 - (g1 // d) AS w1, w2 - (g2 // d) AS w2
      FROM (
        SELECT *, n * {Q240_LRDEN} AS d,
               n * w0 + s1 * w1 + s2 * w2 - b0 * {Q240_SCALE} AS g0,
               s1 * w0 + s11 * w1 + s12 * w2 - b1 * {Q240_SCALE} AS g1,
               s2 * w0 + s12 * w1 + s22 * w2 - b2 * {Q240_SCALE} AS g2
        FROM w{r - 1}_
      )
    )"""
        )
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, CAST(w0 AS BIGINT) AS w0_fp, "
        f"CAST(w1 AS BIGINT) AS w1_fp, CAST(w2 AS BIGINT) AS w2_fp FROM w{r}_"
        for r in range(1, Q240_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


_Q240_STATS = ("n", "s1", "s2", "s11", "s12", "s22", "b0", "b1", "b2")


def _tdiv(a: int, b: int) -> int:
    """Integral division TRUNCATING TOWARD ZERO — the semantics of both
    Spark's ``div`` on DECIMAL and DuckDB's ``//`` on HUGEINT (verified
    on negatives; the engines' shared contract the q240/q241 fixed-point
    updates are pinned to).  Python's ``//`` floors instead, so negative
    quotients must be corrected."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _chk38(*vals: int) -> None:
    """Fail LOUDLY if a fixed-point intermediate leaves the
    DECIMAL(38,0)/HUGEINT envelope.  The driver-side Python ints that
    replaced the ANSI DECIMAL expressions are unbounded, while the
    engines raise on overflow — at extreme corpus magnitudes the Python
    trajectory must diverge with an error exactly like the plan it
    replaced, never with silently wider integers the oracle cannot
    represent."""
    for v in vals:
        if abs(v) >= 10**38:
            raise OverflowError(
                f"fixed-point intermediate exceeds DECIMAL(38,0): {v!r}"
            )


@register(
    "q240_linear_probe_gd",
    oracle=_q240_oracle(),
    doc=f"linear-probe training: ONE data pass builds exact X^T X / X^T y "
    f"sufficient statistics, then {Q240_ROUNDS} fixed-point GD rounds on a "
    "one-row frame — bit-identical weight trajectory in both engines",
    tags=("training", "llm", "iterative"),
)
def q240_linear_probe_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    dec = "decimal(38,0)"
    feats = d.select(
        F.least(F.size(toks), F.lit(Q240_XCAP)).cast(dec).alias("x1"),
        F.least(F.size(F.array_distinct(toks)), F.lit(Q240_XCAP))
        .cast(dec)
        .alias("x2"),
        F.least(F.col("n_chars"), F.lit(Q240_YCAP)).cast(dec).alias("y"),
    )
    # the ONLY corpus-sized stage: one scan, map-side-combinable
    # aggregate producing NINE integers.  Fetching that one row to the
    # driver (whitelisted seam, test_action_lint) and running the GD
    # trajectory as exact Python-int arithmetic replaces the previous
    # 8 per-round one-row materializations (r13: 2.4s -> one job + a
    # literal projection; the rounds cost nothing at ANY scale, which
    # is the whole point of the sufficient-statistics decomposition).
    st = feats.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("b0"),
        F.sum(F.col("x1") * F.col("y")).alias("b1"),
        F.sum(F.col("x2") * F.col("y")).alias("b2"),
    ).first()
    n, s1, s2, s11, s12, s22, b0, b1, b2 = (int(st[k]) for k in _Q240_STATS)
    _chk38(n, s1, s2, s11, s12, s22, b0, b1, b2)
    # Python ints are exact like DECIMAL(38,0)/HUGEINT; the only division
    # is the engines' integral `div`/`//` = truncation toward zero,
    # which Python's floor-`//` must be corrected for on negatives.
    w0 = w1 = w2 = 0
    lrden = n * Q240_LRDEN
    traj: list[tuple[int, int, int]] = []
    for _ in range(Q240_ROUNDS):
        g0 = n * w0 + s1 * w1 + s2 * w2 - b0 * Q240_SCALE
        g1 = s1 * w0 + s11 * w1 + s12 * w2 - b1 * Q240_SCALE
        g2 = s2 * w0 + s12 * w1 + s22 * w2 - b2 * Q240_SCALE
        w0 -= _tdiv(g0, lrden)
        w1 -= _tdiv(g1, lrden)
        w2 -= _tdiv(g2, lrden)
        _chk38(g0, g1, g2, w0, w1, w2)
        traj.append((w0, w1, w2))
    # JVM-side literal rows (range(1) + explode), not createDataFrame:
    # a Python-serialized local relation pays several seconds of encoder
    # setup on first use (the q120 sentinel note)
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("round"),
                F.lit(t[0]).cast("bigint").alias("w0_fp"),
                F.lit(t[1]).cast("bigint").alias("w1_fp"),
                F.lit(t[2]).cast("bigint").alias("w2_fp"),
            )
            for r, t in enumerate(traj, 1)
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(rows).alias("s"))
        .select("s.round", "s.w0_fp", "s.w1_fp", "s.w2_fp")
    )


# ---------------------------------------------------------------------------
# q241 — gradient-boosted decision STUMPS (squared loss, shrinkage 1/2),
# the nonlinear sibling of q240's linear probe: the quality-model family
# LLM pipelines actually deploy when a linear probe under-fits.  Each
# boosting round is the histogram method every distributed GBDT
# implementation uses: ONE corpus pass computes (count, residual-sum)
# for every (feature, threshold) candidate as conditional aggregates —
# 4 expressions per candidate inside a single map-side-combinable
# aggregate, NO row amplification — then split selection, leaf values,
# and the residual update are arithmetic on broadcast-sized frames.
# K rounds = K corpus passes + K residual materializations: the honest
# GBDT cost model, and exactly how it runs at 100 TB.
#
# Exactness: residuals live in 1e-3 fixed point; split gain is compared
# as the exact integer  ((SL²·nR + SR²·nL)·n − S²·nL·nR) // (nL·nR·n)
# (variance reduction over the common denominator, floor-quantized —
# both engines floor positives identically, and gain ≥ 0 by Cauchy-
# Schwarz so the quotient is never negative); leaf values are
# trunc(S_side / (2·n_side)), the trunc-toward-zero integral division
# verified identical in both engines including negatives.  Ties break
# (feature, threshold) ascending.  Magnitude audit at synthetic sf1
# (N = 5e4, |r| ≤ ~5·4.1e6 after 4 rounds): gain numerator ≤ ~2.5e33,
# within DECIMAL(38,0) and HUGEINT with 4+ digits of headroom.

Q241_ROUNDS = 4
Q241_RSCALE = 1_000  # residual fixed-point denominator (milli-units)
Q241_THRESHOLDS = (32, 64, 96, 128, 160, 192, 224)
Q241_FEATURES = ("x1", "x2")


def _q241_oracle() -> str:
    cand_rows = ", ".join(
        f"('{f}', {t})" for f in Q241_FEATURES for t in Q241_THRESHOLDS
    )
    ctes = [
        """feats AS MATERIALIZED (
      SELECT least(len(string_split(text, ' ')), 256) AS x1,
             least(len(list_distinct(string_split(text, ' '))), 256) AS x2,
             least(n_chars, 4096) AS y
      FROM documents
    )""",
        f"cand AS MATERIALIZED (SELECT f, t FROM (VALUES {cand_rows}) c(f, t))",
        f"r0 AS MATERIALIZED (SELECT x1, x2, "
        f"CAST(y * {Q241_RSCALE} AS HUGEINT) AS r FROM feats)",
    ]
    for k in range(1, Q241_ROUNDS + 1):
        p = k - 1
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT c.f, c.t,
             CAST(coalesce(sum(CASE WHEN (CASE WHEN c.f = 'x1' THEN d.x1
                                            ELSE d.x2 END) <= c.t
                                    THEN 1 END), 0) AS HUGEINT) AS nl,
             CAST(coalesce(sum(CASE WHEN (CASE WHEN c.f = 'x1' THEN d.x1
                                            ELSE d.x2 END) <= c.t
                                    THEN d.r END), 0) AS HUGEINT) AS sl,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(d.r) AS HUGEINT) AS s
      FROM r{p} d, cand c GROUP BY c.f, c.t
    )"""
        )
        ctes.append(
            f"""b{k} AS MATERIALIZED (
      SELECT f, t, nl, n - nl AS nr, sl, s - sl AS sr,
             ((sl * sl * (n - nl) + (s - sl) * (s - sl) * nl) * n
              - s * s * nl * (n - nl)) // (nl * (n - nl) * n) AS gain,
             sl // (2 * nl) AS vl, (s - sl) // (2 * (n - nl)) AS vr
      FROM s{k} WHERE nl > 0 AND n - nl > 0
      ORDER BY gain DESC, f, t LIMIT 1
    )"""
        )
        if k < Q241_ROUNDS:
            ctes.append(
                f"""r{k} AS MATERIALIZED (
      SELECT d.x1, d.x2,
             d.r - (CASE WHEN (CASE WHEN b.f = 'x1' THEN d.x1 ELSE d.x2 END)
                              <= b.t THEN b.vl ELSE b.vr END) AS r
      FROM r{p} d, b{k} b
    )"""
            )
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS round, f AS feature, CAST(t AS INT) "
        f"AS threshold, CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) "
        f"AS n_right, CAST(vl AS BIGINT) AS left_value_fp, "
        f"CAST(vr AS BIGINT) AS right_value_fp FROM b{k}"
        for k in range(1, Q241_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


@register(
    "q241_gbdt_stumps",
    oracle=_q241_oracle(),
    doc=f"gradient-boosted stump training ({Q241_ROUNDS} rounds, shrinkage "
    "1/2): per round ONE histogram pass (conditional aggregates per "
    "(feature, threshold) candidate, no row amplification), exact integer "
    "variance-reduction argmax, trunc-division leaf values, materialized "
    "residual update — the honest K-pass GBDT cost model",
    tags=("training", "llm", "iterative"),
)
def q241_gbdt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    dec = "decimal(38,0)"
    # feature extraction runs ONCE (tokenization is the expensive map);
    # residuals stay a per-round LITERAL expression over this substrate
    feats = materialize(
        d.select(
            F.least(F.size(toks), F.lit(Q240_XCAP)).cast("long").alias("x1"),
            F.least(F.size(F.array_distinct(toks)), F.lit(Q240_XCAP))
            .cast("long")
            .alias("x2"),
            (F.least(F.col("n_chars"), F.lit(Q240_YCAP)) * Q241_RSCALE)
            .cast(dec)
            .alias("r"),
        ),
        "q241_feats",
    )
    cands = [(f, t) for f in Q241_FEATURES for t in Q241_THRESHOLDS]
    # each round: ONE histogram aggregate (map-side-combinable, the
    # exchange carries one row) fetched to the driver (whitelisted
    # one-row seam), split selection + leaf values as exact Python-int
    # arithmetic, and the residual re-expressed as a literal CASE over
    # the feature substrate — no per-round materialization, no 1-row
    # broadcast joins (r13: 17 jobs -> 5; at scale this drops K-1 full
    # residual-table rewrites, keeping the honest K histogram passes)
    resid_col = F.col("r")
    splits: list[tuple[str, int, int, int, int, int]] = []
    for k in range(1, Q241_ROUNDS + 1):
        aggs = [
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum(resid_col).alias("s"),
        ]
        for i, (f, t) in enumerate(cands):
            side = F.col(f) <= F.lit(t)
            aggs.append(
                F.coalesce(F.sum(F.when(side, F.lit(1))), F.lit(0))
                .cast(dec)
                .alias(f"nl_{i}")
            )
            aggs.append(
                F.coalesce(F.sum(F.when(side, resid_col)), F.lit(0).cast(dec))
                .alias(f"sl_{i}")
            )
        hist = feats.agg(*aggs).first()
        n, s = int(hist["n"]), int(hist["s"])
        _chk38(n, s)
        # exact integer argmax, ties (gain DESC, f ASC, t ASC) — the
        # same ordering the previous TakeOrdered(1) plan used
        best = None
        for i, (f, t) in enumerate(cands):
            nl, sl = int(hist[f"nl_{i}"]), int(hist[f"sl_{i}"])
            nr, sr = n - nl, s - sl
            if nl <= 0 or nr <= 0:
                continue
            num = (sl * sl * nr + sr * sr * nl) * n - s * s * nl * nr
            _chk38(num)
            gain = _tdiv(num, nl * nr * n)
            vl, vr = _tdiv(sl, 2 * nl), _tdiv(sr, 2 * nr)
            key = (-gain, f, t)
            if best is None or key < best[0]:
                best = (key, f, t, nl, nr, vl, vr)
        assert best is not None, "no admissible split (degenerate corpus)"
        _, f, t, nl, nr, vl, vr = best
        splits.append((f, t, nl, nr, vl, vr))
        if k < Q241_ROUNDS:
            feat_val = F.col("x1") if f == "x1" else F.col("x2")
            step = F.when(feat_val <= F.lit(t), F.lit(vl)).otherwise(
                F.lit(vr)
            )
            resid_col = (resid_col - step).cast(dec)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("round"),
                F.lit(f).alias("feature"),
                F.lit(t).cast("int").alias("threshold"),
                F.lit(nl).cast("bigint").alias("n_left"),
                F.lit(nr).cast("bigint").alias("n_right"),
                F.lit(vl).cast("bigint").alias("left_value_fp"),
                F.lit(vr).cast("bigint").alias("right_value_fp"),
            )
            for k, (f, t, nl, nr, vl, vr) in enumerate(splits, 1)
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(rows).alias("s"))
        .select(
            "s.round",
            "s.feature",
            "s.threshold",
            "s.n_left",
            "s.n_right",
            "s.left_value_fp",
            "s.right_value_fp",
        )
    )


# ---------------------------------------------------------------------------
# q243 — DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document
# by the log-likelihood ratio of a hashed-unigram bag-of-words model of
# the TARGET domain (here: lang = 'en', the paper's "formal text" slot)
# against the model of the RAW corpus.  Docs whose hashed-feature
# profile looks more target-like than corpus-average get positive
# weight; importance RESAMPLING then draws keep-set docs with
# probability ∝ exp(weight) (the draw itself is the q143 PPS shape —
# this query emits the weights, which is the DSIR-specific computation).
#
# Determinism design (same policy as q135): per-bucket log-ratios are
# quantized to exact integer bits via the signed bitlength identity
#   lam(b) = ±(bitlength(max_ratio div min_ratio) - 1)
# over the integer cross-products (ct+1)(tr+B) vs (cr+1)(tt+B) — add-one
# smoothing over B buckets, zero transcendentals, bit-identical in both
# engines.  A doc's score is then sum(c_doc[b] * lam[b]) in exact int64.
#
# Scale shape (100 TB):
# * Feature hashing is map-only (md5 mod B per token).
# * The two models are B-row aggregates (B = 256) — partial aggregation
#   collapses them map-side; totals are 1-row aggs.
# * Per-doc bucket counts shuffle ONCE on (doc_id, b) — partial-agg
#   friendly since docs repeat buckets heavily.
# * The scoring join broadcasts the B-row model — the corpus-sized side
#   never shuffles for the join; the final per-doc sum reuses the
#   (doc_id, b) partials' doc_id clustering.
# * The paper estimates its models on a SAMPLE of the corpus; at 100 TB
#   the model CTEs read a hash-sampled slice (counts scaled into int64
#   range) — the bucket products here stay < 2^63 up to ~1e9 tokens per
#   model cell, far past bench SF.

DSIR_B = 256  # hashed feature buckets (paper uses 10^4; scaled to bench vocab)
DSIR_TARGET_LANG = "en"


@register(
    "q243_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             {_duck_md5_int("'dsir:' || w")} % {DSIR_B} AS b
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    doc_feat AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ),
    raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY 1),
    tgt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS ct
      FROM tok WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1
    ),
    tots AS (
      SELECT CAST(sum(cr) AS BIGINT) AS tr,
             (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS tt
      FROM raw
    ),
    model AS (
      SELECT r.b,
             CASE WHEN (coalesce(t.ct, 0) + 1) * (s.tr + {DSIR_B})
                       >= (r.cr + 1) * (s.tt + {DSIR_B})
                  THEN length(bin(((coalesce(t.ct, 0) + 1) * (s.tr + {DSIR_B}))
                                  // ((r.cr + 1) * (s.tt + {DSIR_B})))) - 1
                  ELSE -(length(bin(((r.cr + 1) * (s.tt + {DSIR_B}))
                                    // ((coalesce(t.ct, 0) + 1) * (s.tr + {DSIR_B})))) - 1)
             END AS lam
      FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tots s
    )
    SELECT f.doc_id,
           CAST(sum(f.c) AS BIGINT) AS n_tokens,
           CAST(sum(f.c * m.lam) AS BIGINT) AS score_bits,
           CAST(sum(f.c * m.lam) AS BIGINT) > 0 AS keep
    FROM doc_feat f JOIN model m USING (b)
    GROUP BY f.doc_id
    """,
    doc="DSIR hashed-unigram importance weights: signed integer-bits "
    "log-ratio of target-domain vs raw-corpus hashed bag-of-words "
    "models; B-row models broadcast, corpus never shuffles for scoring",
    tags=("training", "llm", "sampling", "text"),
)
def q243_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(d.text, " ")).alias("w")
    ).select(
        "doc_id",
        "lang",
        (_md5_int(F.concat(F.lit("dsir:"), F.col("w"))) % DSIR_B).alias("b"),
    )
    # deliberately THREE map-side passes over the token stream rather
    # than one materialized per-doc-bucket substrate: the model groupBys
    # collapse to B rows per partition map-side (their exchanges are
    # negligible), so each pass is pure scan bandwidth, while the
    # materialize alternative writes+reads a |docs| x B table and
    # measured 1.1s -> 2.0s at sf0.1.  Only doc_feat's exchange carries
    # real volume, and it is the scoring substrate itself.
    doc_feat = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tots = raw.agg(F.sum("cr").cast("bigint").alias("tr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("bigint").alias("tt"))
    )
    num = f"(coalesce(ct, 0) + 1) * (tr + {DSIR_B})"
    den = f"(cr + 1) * (tt + {DSIR_B})"
    model = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.expr(
                f"CASE WHEN {num} >= {den}"
                f" THEN length(bin(({num}) div ({den}))) - 1"
                f" ELSE -(length(bin(({den}) div ({num}))) - 1) END"
            )
            .cast("bigint")
            .alias("lam"),
        )
    )
    return (
        doc_feat.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lam")).cast("bigint").alias("score_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_bits",
            (F.col("score_bits") > 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# q244 — CCNet per-language perplexity buckets (Wenzek et al. 2020,
# "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
# Data"): split each language's documents into head/middle/tail thirds
# by LM perplexity — CCNet's released corpora ship exactly these three
# buckets per language, cut at the 33rd/67th percentile of the
# perplexity distribution.  Perplexity here is q135's exact-integer mean
# bigram surprisal, quantized to MILLI-BITS (total_bits*1000 div
# n_bigrams) so the value domain is a bounded integer grid.
#
# Scale shape — NOT an ntile over the corpus: ntile(3) OVER (PARTITION
# BY lang) would sort every document of a language in one reducer.
# Instead the cutoffs are computed CCNet-style from a per-language
# histogram and broadcast back:
# * histogram = groupBy(lang, mb_milli) — bounded at |langs| x ~20001
#   rows regardless of corpus size (mean surprisal lives in [0, ~20]
#   bits => [0, 20000] milli-bits), partial-agg collapses it map-side;
# * the cumulative runs over that bounded grid (same justification as
#   q99's distinct-score window — partitioned by lang, <= 20001 rows
#   per partition BY CONSTRUCTION of the quantization);
# * cut rule: c_k = min milli-bits value whose cumulative count reaches
#   ceil(k*n/3) — ties share a bucket (threshold semantics, which is
#   what CCNet's cutoff file does), so the assignment is a map-side
#   broadcast join, and the corpus never sorts.

PPL_BUCKETS = ("head", "middle", "tail")


@register(
    "q244_ccnet_ppl_buckets",
    oracle=f"""
    WITH {_SURPRISAL_CTES},
    mb AS (
      SELECT p.doc_id, d.lang,
             (p.total_bits * 1000) // p.n_bigrams AS mb_milli
      FROM perdoc p JOIN documents d USING (doc_id)
    ),
    hist AS (
      SELECT lang, mb_milli, CAST(count(*) AS BIGINT) AS c
      FROM mb GROUP BY 1, 2
    ),
    cum AS (
      SELECT lang, mb_milli, c,
             CAST(sum(c) OVER (PARTITION BY lang ORDER BY mb_milli) AS BIGINT)
               AS cum
      FROM hist
    ),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1),
    cuts AS (
      SELECT cum.lang,
             min(CASE WHEN cum >= (n + 2) // 3 THEN mb_milli END) AS c1,
             min(CASE WHEN cum >= (2 * n + 2) // 3 THEN mb_milli END) AS c2
      FROM cum JOIN tot USING (lang)
      GROUP BY cum.lang
    )
    SELECT m.doc_id, m.lang, CAST(m.mb_milli AS BIGINT) AS mb_milli,
           CASE WHEN m.mb_milli <= c.c1 THEN 'head'
                WHEN m.mb_milli <= c.c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM mb m JOIN cuts c USING (lang)
    """,
    doc="CCNet-style head/middle/tail perplexity thirds per language: "
    "exact milli-bit surprisal histogram (bounded grid) -> cumulative "
    "cutoffs -> broadcast threshold assignment; no corpus-wide sort",
    tags=("training", "llm", "text", "sampling"),
)
def q244_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    d = _docs(spark, sf_dir)
    per_doc = _surprisal_per_doc(d)
    # the milli-bit table feeds the histogram/cutoff derivation AND the
    # final assignment join — materialize once, or the whole surprisal
    # substrate (bigram model joins + two aggregations) runs per branch
    # (plan-audited: 19 exchanges unmaterialized vs 7 materialized)
    mb = materialize(
        per_doc.join(d.select("doc_id", "lang"), "doc_id").select(
            "doc_id",
            "lang",
            F.expr("(total_bits * 1000) div n_bigrams").alias("mb_milli"),
        ),
        "q244_mb",
    )
    hist = mb.groupBy("lang", "mb_milli").agg(F.count(F.lit(1)).alias("c"))
    # bounded-grid cumulative: <= 20001 distinct milli-bit values per
    # language by construction (see block comment)
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("lang").orderBy("mb_milli"))
    )
    tot = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    cuts = (
        cum.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 2) div 3"), F.col("mb_milli"))
            ).alias("c1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(2 * n + 2) div 3"), F.col("mb_milli")
                )
            ).alias("c2"),
        )
    )
    return mb.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        F.col("mb_milli").cast("bigint").alias("mb_milli"),
        F.when(F.col("mb_milli") <= F.col("c1"), PPL_BUCKETS[0])
        .when(F.col("mb_milli") <= F.col("c2"), PPL_BUCKETS[1])
        .otherwise(PPL_BUCKETS[2])
        .alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# q248 — data-constrained epoch-repetition planner (Muennighoff et al.
# 2023, "Scaling Data-Constrained Language Models"): when the token
# budget exceeds the unique corpus, the paper's answer is to REPEAT
# data — with returns decaying to ~zero past ~4 epochs.  The planner:
# give each source an equal slice of the total budget (the uniform-
# mixture baseline; q81/q152 cover non-uniform reweighting) and convert
# the slice into an epoch multiplier over that source's unique tokens,
# capped at MAX_REPEAT_EPOCHS.  Under-average sources hit the cap
# (their slice buys many epochs), over-average sources run fractional
# epochs — exactly the tension the paper's allocation curves show.
#
# All arithmetic is exact int64: epochs ship in integer MICRO-epochs
# ((alloc * 10^6) div tokens).  The micro multiply bounds the planner
# at ~9e12 corpus tokens in int64 — past that (true 100 TB corpora) the
# same expressions lift to DECIMAL(38,0) unchanged (q230's convention);
# bench SFs stay far under the bound.
#
# Scale shape: one partial-agg groupBy(source) (|sources| rows), a
# 1-row totals broadcast, map-side planning arithmetic.  Scan-bandwidth
# bound at any scale.

REPEAT_BUDGET_MULT = 2  # token budget = 2x the unique corpus
MAX_REPEAT_EPOCHS = 4   # the paper's ~4-epoch useful-repetition ceiling


@register(
    "q248_epoch_repetition_plan",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS corpus_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(corpus_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS k
      FROM per_src
    )
    SELECT p.source, p.n_docs, p.corpus_tokens,
           ({REPEAT_BUDGET_MULT} * t.total) // t.k AS alloc_tokens,
           least({MAX_REPEAT_EPOCHS} * 1000000,
                 ((({REPEAT_BUDGET_MULT} * t.total) // t.k) * 1000000)
                   // p.corpus_tokens) AS epochs_micro,
           ((({REPEAT_BUDGET_MULT} * t.total) // t.k) * 1000000)
             // p.corpus_tokens > {MAX_REPEAT_EPOCHS} * 1000000 AS capped,
           least(({REPEAT_BUDGET_MULT} * t.total) // t.k,
                 {MAX_REPEAT_EPOCHS} * p.corpus_tokens) AS planned_tokens
    FROM per_src p CROSS JOIN tot t
    """,
    doc="data-constrained repetition planner: equal-slice token budget "
    "per source -> capped micro-epoch multipliers (<=4 epochs useful "
    "repetition); one small agg + 1-row broadcast, map-side plan",
    tags=("training", "llm", "sampling"),
)
def q248_epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(d.text, " "))).cast("bigint").alias("corpus_tokens"),
    )
    tot = per_src.agg(
        F.sum("corpus_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    alloc = f"({REPEAT_BUDGET_MULT} * total) div k"
    micro = f"(({alloc}) * 1000000) div corpus_tokens"
    cap = MAX_REPEAT_EPOCHS * 1000000
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "corpus_tokens",
        F.expr(alloc).alias("alloc_tokens"),
        F.expr(f"least({cap}, {micro})").cast("bigint").alias("epochs_micro"),
        F.expr(f"{micro} > {cap}").alias("capped"),
        F.expr(
            f"least({alloc}, {MAX_REPEAT_EPOCHS} * corpus_tokens)"
        ).alias("planned_tokens"),
    )
