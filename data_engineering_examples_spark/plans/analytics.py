"""Core analytic queries over the generic star schema.

Each query re-expresses an operator pattern from the reference
(SURVEY.md §2, citations inline) on the driver's TPC-H-ish tables, with a
DuckDB oracle. Numeric-parity rules:

* Raw column values (no arithmetic) are emitted as-is — parquet doubles are
  bit-identical in both engines.
* Sums/products of doubles go through exact DECIMAL arithmetic (the input
  data carries <=2 decimal places) and only the final result is cast back to
  DOUBLE, so the value is deterministic regardless of partitioning/order —
  a double sum would wobble in the last ulp across 32-thread runs.
* DECIMAL->DOUBLE on the oracle side goes through a VARCHAR round-trip
  (``CAST(CAST(x AS VARCHAR) AS DOUBLE)``): DuckDB's direct decimal cast
  double-rounds (exact int128 -> double, then / 10^scale) and diverges from
  Spark's single-rounded BigDecimal cast by 1 ulp once the scaled integer
  exceeds 2^53 — reachable for corpus-level revenue sums beyond ~sf1.
  The string parse is correctly rounded in one step, identical to Spark at
  every scale (round-7 finding from the 10x key-shifted stress sweep,
  tools/gen_scale_synth.py).
* Averages are computed as exact-decimal-sum cast to double, divided by the
  bigint count: one IEEE division of identical operands on both sides.
* Timestamps are emitted as formatted strings (Spark session TZ is UTC;
  DuckDB is UTC-naive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_tables, scale_out
from .registry import register

# ---------------------------------------------------------------------------
# helpers

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def dec(col: str, prec: int = 12, scale: int = 2) -> F.Column:
    """Exact-decimal view of a <=2-dp double column."""
    return F.col(col).cast(f"decimal({prec},{scale})")


def d(col_expr: F.Column) -> F.Column:
    return col_expr.cast("double")


def one() -> F.Column:
    """lit(1) as decimal(3,2); built lazily — F.lit needs an active session."""
    return F.lit(1).cast("decimal(3,2)")


# ---------------------------------------------------------------------------
# q01 — pricing summary (flagship). Group-by + 8 aggregates.
# Reference pattern: group-by + max/agg analytics (SURVEY §2.4 A1/A2,
# notebooks/DiabetesSQL.ipynb cell 23); shape follows public TPC-H Q1.
# Scale notes: single shuffle on two low-cardinality keys; partial
# aggregation (map-side combine) reduces 100 TB of lineitem to ~6 groups
# per partition before the exchange — the plan is scan→partial agg→
# exchange(6 groups)→final agg, optimal at any SF.


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE)
        AS sum_disc_price,
      CAST(CAST(SUM((CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
               * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE)
        AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Group-by aggregate summary; TPC-H Q1 shape (SURVEY §2.4 A1).",
    tags=("agg", "S2", "S3"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    charge = disc_price * (one() + dec("l_tax", 4))
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            d(F.sum(dec("l_quantity"))).alias("sum_qty"),
            d(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            d(F.sum(disc_price)).alias("sum_disc_price"),
            d(F.sum(charge)).alias("sum_charge"),
            (d(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
            (d(F.sum(dec("l_extendedprice"))) / cnt).alias("avg_price"),
            (d(F.sum(dec("l_discount", 4))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — revenue by nation: 5-way join + agg.
# Reference pattern: SQL equi-joins J1 (ODSImport.py:120-121) and pandas
# merges J5-J7 (ODSImport.py:150,461,517), generalised to a star join.
# Scale notes: region(5)/nation(25) are broadcast (no shuffle);
# lineitem⋈orders and orders⋈customer are the only exchanges, both on
# their natural keys. AQE picks broadcast for customer at small SF.


@register(
    "q02_revenue_by_nation",
    oracle="""
    SELECT
      n.n_name,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="Star join (broadcast dims) + agg (SURVEY §2.3 J1/J5).",
    tags=("join", "agg", "P5", "J7"),
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation", "region"])
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    return (
        t["lineitem"]
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name").isin("ASIA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(d(F.sum(revenue)).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# q03 — top-k recent/largest: ORDER BY ... DESC LIMIT k.
# Reference pattern: FHIR `_sort=-authored-on&_count=5` task poll (SURVEY
# §2.5 W1, ConsultationNoteWritebackX.py:65-68) and `select top 10` (W2).
# Unique tie-break key keeps the LIMIT set deterministic.
# Scale notes: Spark executes this as TakeOrderedAndProject — per-partition
# top-k then a k-row merge on the driver; no global sort of 100 TB.


@register(
    "q03_top_orders",
    oracle=f"""
    SELECT
      o_orderkey,
      o_custkey,
      o_totalprice,
      strftime(o_orderdate, '{TS_FMT_DUCK}') AS order_ts,
      o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k by sort+limit (SURVEY §2.5 W1/W2).",
    tags=("topk", "W2", "A7", "F18"),
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_ts"),
            "o_orderpriority",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — cohort wide table with presence flags.
# Reference pattern: the diabetes cohort query (DiabetesSQL.ipynb cell 3) —
# 4 left joins with theta residuals producing IFNULL(x._id,0,1) presence
# flags + CASE recode + date math (SURVEY §2.3 J2, §2.7 F6/F8/F9).
# Spark-first: a single conditional aggregation replaces the 4 self-joins
# (SURVEY J2 note "better: conditional agg pivot") — one shuffle instead of
# four, no fan-out on duplicate matches.


@register(
    "q04_customer_cohort",
    oracle="""
    SELECT
      c.c_custkey,
      CASE c.c_mktsegment
        WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2 WHEN 'FURNITURE' THEN 3
        WHEN 'HOUSEHOLD' THEN 4 WHEN 'MACHINERY' THEN 5 ELSE 9 END AS segment_code,
      COALESCE(o.has_urgent, 0)     AS has_urgent,
      COALESCE(o.has_high_value, 0) AS has_high_value,
      COALESCE(o.has_open, 0)       AS has_open,
      COALESCE(o.has_fulfilled, 0)  AS has_fulfilled,
      COALESCE(o.n_orders, 0)       AS n_orders,
      CASE WHEN o.first_order_year IS NULL THEN NULL
           ELSE 2026 - o.first_order_year END AS years_since_first_order
    FROM customer c
    LEFT JOIN (
      SELECT
        o_custkey,
        MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS has_urgent,
        MAX(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS has_high_value,
        MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS has_open,
        MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS has_fulfilled,
        COUNT(*) AS n_orders,
        MIN(EXTRACT(year FROM o_orderdate)) AS first_order_year
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
    doc="Presence-flag cohort wide table (SURVEY §2.3 J2 + §2.7 F6/F8/F9).",
    tags=("join", "agg", "cohort", "F15"),
)
def q04_customer_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bench-shape note (profiled r4): one shuffle (orders partial+final agg)
    # then a customer⋈per_cust join with NO explicit broadcast hint — at
    # test SF the aggregated side is a few thousand rows so AQE picks a
    # broadcast join (~+0.3 s of fixed broadcast/stage overhead vs the
    # r1 shape, the "regression" in BENCH history); at 100 TB that side is
    # customer-cardinality, far beyond any broadcast threshold, and the
    # same plan degrades gracefully to a shuffled join on c_custkey.
    # Hard-coding either strategy would be wrong at one of the two scales.
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    flag = lambda cond: F.max(F.when(cond, 1).otherwise(0))  # noqa: E731
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            flag(F.col("o_orderpriority") == "1-URGENT").alias("has_urgent"),
            flag(F.col("o_totalprice") > 150000).alias("has_high_value"),
            flag(F.col("o_orderstatus") == "O").alias("has_open"),
            flag(F.col("o_orderstatus") == "F").alias("has_fulfilled"),
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.year("o_orderdate")).alias("first_order_year"),
        )
    )
    segment_code = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
        .when(F.col("c_mktsegment") == "BUILDING", 2)
        .when(F.col("c_mktsegment") == "FURNITURE", 3)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 4)
        .when(F.col("c_mktsegment") == "MACHINERY", 5)
        .otherwise(9)
    )
    # ifnull3 semantics (IRIS 3-arg IFNULL, SURVEY F8): a IS NULL ? b : c
    ifnull3 = lambda a, b, c: F.when(a.isNull(), b).otherwise(c)  # noqa: E731
    return (
        t["customer"]
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            segment_code.alias("segment_code"),
            F.coalesce("has_urgent", F.lit(0)).alias("has_urgent"),
            F.coalesce("has_high_value", F.lit(0)).alias("has_high_value"),
            F.coalesce("has_open", F.lit(0)).alias("has_open"),
            F.coalesce("has_fulfilled", F.lit(0)).alias("has_fulfilled"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            ifnull3(
                F.col("first_order_year"),
                F.lit(None).cast("long"),
                F.lit(2026) - F.col("first_order_year"),
            ).alias("years_since_first_order"),
        )
        # no terminal sort: the correctness compare is order-insensitive and
        # a global sort of a full-cohort result is a wasted exchange at scale
    )


# ---------------------------------------------------------------------------
# q05 — per-entity panel pivot.
# Reference pattern: the lipid-panel triple self-join (DiabetesSQL.ipynb
# cell 23, SURVEY §2.3 J3 / §2.4 A1) — idiomatic Spark is one pass with
# max(when(...)) per panel member instead of 3 self-joins: 1 shuffle vs 3.


@register(
    "q05_priority_panel",
    oracle="""
    SELECT
      o_custkey,
      MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) AS urgent_max,
      MAX(CASE WHEN o_orderpriority = '2-HIGH'   THEN o_totalprice END) AS high_max,
      MAX(CASE WHEN o_orderpriority = '5-LOW'    THEN o_totalprice END) AS low_max
    FROM orders
    GROUP BY o_custkey
    HAVING MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) IS NOT NULL
    ORDER BY o_custkey
    """,
    doc="Self-join panel → single-pass conditional-agg pivot (SURVEY J3/A1).",
    tags=("agg", "pivot", "P6"),
)
def q05_priority_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    pick = lambda p: F.max(F.when(F.col("o_orderpriority") == p, F.col("o_totalprice")))  # noqa: E731
    return (
        orders.groupBy("o_custkey")
        .agg(
            pick("1-URGENT").alias("urgent_max"),
            pick("2-HIGH").alias("high_max"),
            pick("5-LOW").alias("low_max"),
        )
        .where(F.col("urgent_max").isNotNull())
    )


# ---------------------------------------------------------------------------
# q06 — duplicate detection by key: GROUP BY ... HAVING count(*) > 1.
# Reference pattern: duplicate-GMP practitioners
# (DeleteDuplicatesinIRISFHIRServer.ipynb cell 0, SURVEY §2.4 A3).


@register(
    "q06_dup_groups",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > 1
    ORDER BY user_id, event_type
    """,
    doc="Dup-group detection via HAVING count>1 (SURVEY §2.4 A3).",
    tags=("agg", "dedup", "P7", "A4"),
)
def q06_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# q07 — keep-newest dedup via row_number window.
# Reference pattern: "keep one, delete the rest" (SURVEY §2.5 note:
# row_number() over (partition by GMP order by _lastUpdated desc)).
# Scale notes: one shuffle on user_id; no global sort. At skewed keys AQE
# skew-join/agg splitting applies; tie-break on event_id keeps it
# deterministic.


@register(
    "q07_latest_event_per_user",
    oracle=f"""
    SELECT user_id, event_id, event_type,
           strftime(CAST(ts AS TIMESTAMP), '{TS_FMT_DUCK}') AS ts_str, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Keep-newest-per-key dedup via row_number (SURVEY §2.5 note / A3+S8).",
    tags=("window", "dedup"),
)
def q07_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
            "value",
        )
    )


# ---------------------------------------------------------------------------
# q08 — anti join (set difference by key).
# Reference pattern: the duplicate-Composition existence check
# (ConsultationNoteWritebackX.py:297-333) is a semi/anti join (SURVEY §2.3
# note). Spark left_anti avoids materialising the NOT EXISTS subquery.


@register(
    "q08_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Anti join / NOT EXISTS (SURVEY §2.3 semi/anti note).",
    tags=("join", "J_anti"),
)
def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
    )


# ---------------------------------------------------------------------------
# q09 — semi join counterpart of q08.


@register(
    "q09_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    doc="Semi join / EXISTS with pushed residual predicate.",
    tags=("join", "P2"),
)
def q09_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q10 — JSON property extraction + aggregation.
# Reference pattern: GetJSON/GetProp over ResourceString (SURVEY §2.7
# F1/F2) and join-key derivation via JSON (J9, ODSImport.py:500-515).


@register(
    "q10_json_props",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      COUNT(*) AS n,
      CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY k
    """,
    doc="JSON scalar extraction → group key (SURVEY §2.7 F1/F2, §2.3 J9).",
    tags=("json", "agg", "A4"),
)
def q10_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            d(F.sum(dec("value"))).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q52 — deterministic stratified sample (SURVEY §2 A6; mirrors
# DiabetesSQL.ipynb cell 31's groupby-frac train/test split /
# ``df.sampleBy``). ``sampleBy`` itself is seed-stable only within one
# Spark version, so the ORACLE-CHECKED form uses an md5-derived uniform
# hash per row: keep iff md5int(key) mod 10000 < frac*10000 per stratum —
# identical rows selected in any engine, and exactly the technique used
# for reproducible train/test splits in large-scale pipeline practice.
# Map-only scan + tiny agg: no sort, no wide shuffle at any scale.


@register(
    "q52_stratified_sample",
    oracle="""
    WITH keyed AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT)
               % 10000 AS u,
             CASE o_orderpriority WHEN '1-URGENT' THEN 7000
                                  WHEN '2-HIGH' THEN 5000
                                  ELSE 2000 END AS cut
      FROM orders)
    SELECT o_orderpriority,
           count(*) AS n_total,
           count(*) FILTER (u < cut) AS n_sampled,
           CAST(CAST(sum(CASE WHEN u < cut THEN CAST(o_totalprice AS DECIMAL(14,2)) END)
                AS VARCHAR) AS DOUBLE) AS sampled_total
    FROM keyed
    GROUP BY o_orderpriority
    """,
    doc="deterministic md5-hash stratified sample per priority (A6, sampleBy analog)",
    tags=("agg", "A6", "sample"),
)
def q52_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10000
    )
    cut = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 7000)
        .when(F.col("o_orderpriority") == "2-HIGH", 5000)
        .otherwise(2000)
    )
    keyed = orders.select(
        "o_orderpriority",
        "o_totalprice",
        u.alias("u"),
        cut.alias("cut"),
    )
    return keyed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("u") < F.col("cut"), 1)).alias("n_sampled"),
        F.sum(
            F.when(
                F.col("u") < F.col("cut"),
                F.col("o_totalprice").cast("decimal(14,2)"),
            )
        )
        .cast("double")
        .alias("sampled_total"),
    )


# ---------------------------------------------------------------------------
# q53 — ROLLUP with GROUPING id (SURVEY §2.4's "grouping sets / rollup —
# include as Spark built-ins": subtotal + grand-total rows in ONE pass;
# Spark expands the rollup into a single Expand + hash aggregate, so the
# lineitem scan happens once, not once per grouping set).


@register(
    "q53_rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           count(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="single-pass ROLLUP subtotals + grand total with GROUPING id",
    tags=("agg", "rollup"),
)
def q53_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale_out: the ROLLUP's Expand (3x row fan-out) + decimal hash agg
    # run inside the scan stage, and a single-row-group parquet file
    # cannot split — profiled 2.0s single-task at sf0.1. At real scale
    # the scan arrives as many row groups and this is a no-op.
    li = scale_out(load_tables(spark, sf_dir, ["lineitem"])["lineitem"])
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# q54 — skew-robust salted equi-join (operators/skew.py). The plain join
# and the salted join are RESULT-IDENTICAL — the oracle runs the plain
# join in DuckDB, proving the salt+replicate rewrite changes only the
# physical key distribution (each hot key spreads over n_salts shuffle
# partitions), never the semantics. Aggregates use floor(value*1000)
# sums: order-independent integer math, bit-stable in both engines.


@register(
    "q54_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           CAST(sum(CAST(floor(e.value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1
    """,
    doc="salted equi-join (hot-key splitting) with plain-join oracle parity",
    tags=("join", "skew", "scale"),
)
def q54_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_equi_join

    t = load_tables(spark, sf_dir, ["events", "customer"])
    ev = t["events"].select(F.col("user_id"), F.col("value"))
    cust = t["customer"].select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
    )
    joined = salted_equi_join(ev, cust, ["user_id"], n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
    )


# ---------------------------------------------------------------------------
# q56 — top supplier by revenue (TPC-H Q15 shape): aggregate lineitem
# revenue per supplier, keep the max-revenue supplier(s) via a rank over
# the ALREADY-AGGREGATED (tiny) result — the 100 TB scan collapses to
# |suppliers| rows before any window/sort runs. The revenue comparison
# for the tie-rank happens in exact DECIMAL (doubles would make "equals
# max" partition-order-dependent).


@register(
    "q56_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(CAST(r.total AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
    doc="top supplier by revenue (Q15 shape): agg -> tiny rank -> broadcast join",
    tags=("join", "agg", "window", "A1"),
)
def q56_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("total"))
    )
    # top-1 with ties via max-agg + broadcast join-back (the oracle's
    # correlated max, and TPC-H Q15's official shape). A rank() over a
    # GLOBAL ordering would move the whole supplier-cardinality aggregate
    # to one partition (WindowExec warns exactly this) — the max is a
    # 1-row broadcast instead, and the rev subtree's shuffle is reused
    # across both consumers.
    mx = rev.agg(F.max("total").alias("total"))
    top = rev.join(F.broadcast(mx), "total")
    return (
        top.join(F.broadcast(t["supplier"]), top.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# q57 — promo revenue share (TPC-H Q14 shape): lineitem ⋈ part with the
# dimension broadcast, conditional aggregation for the share — one scan,
# one broadcast, one single-row result; no shuffle of lineitem at all.


@register(
    "q57_promo_revenue_share",
    oracle="""
    SELECT
      CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END)
           AS VARCHAR) AS DOUBLE) AS promo_revenue,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
           AS VARCHAR) AS DOUBLE) AS total_revenue,
      CAST(100.0 AS DOUBLE)
        * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END)
               AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS VARCHAR) AS DOUBLE) AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="promo revenue share (Q14 shape): broadcast dim + conditional agg",
    tags=("join", "agg", "F19"),
)
def q57_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", revenue))
    total = F.sum(revenue)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            d(promo).alias("promo_revenue"),
            d(total).alias("total_revenue"),
            (F.lit(100.0).cast("double") * d(promo) / d(total)).alias("promo_share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# q58 — small-quantity order revenue (TPC-H Q17 shape): the correlated
# "below 20% of this part's average quantity" subquery becomes a per-part
# aggregate joined back to lineitem — two shuffles on l_partkey (one
# collapses to co-located if lineitem is bucketed by partkey), never a
# per-row subquery.


@register(
    "q58_small_qty_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           count(*) AS n_small,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS small_revenue
    FROM lineitem l
    JOIN avgq a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    GROUP BY p.p_brand
    """,
    doc="small-qty revenue (Q17 shape): correlated subquery -> per-part agg join",
    tags=("join", "agg", "A2"),
)
def q58_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"]
    avgq = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (d(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avgq, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .join(F.broadcast(t["part"]), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            d(F.sum(dec("l_extendedprice"))).alias("small_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q59 — sessionization via session_window (beyond-reference engine
# surface; the canonical large-scale event-stream op). Spark computes
# sessions with a single groupBy(user, session_window(ts, gap)) — state
# merges map-side, one shuffle on user_id; the same operator runs
# unchanged under Structured Streaming with a watermark. The DuckDB
# oracle derives identical sessions with the gaps-and-islands idiom
# (lag → new-session flag → running sum → group), proving the
# session-merge semantics (new session iff gap >= 30 min; end = last
# event + gap) match exactly.


@register(
    "q59_user_sessions",
    oracle=f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flag AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sid AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s
      FROM flag
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}') AS session_end,
           count(*) AS n_events
    FROM sid
    GROUP BY user_id, s
    """,
    doc="sessionization: session_window vs gaps-and-islands oracle (30 min gap)",
    tags=("window", "agg", "session", "T5"),
)
def q59_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("w.end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# q60 — set operations (SURVEY §2.6: none in the reference; included as
# engine surface via Spark built-ins). INTERSECT/EXCEPT compile to
# left-semi/left-anti joins over distinct inputs — same shuffle shape as
# q08/q09, no extra machinery. Customers who placed BOTH an urgent and a
# low-priority order, minus those in ASIA nations.


@register(
    "q60_set_ops",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    EXCEPT
    SELECT c.c_custkey FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    """,
    doc="INTERSECT + EXCEPT via built-ins (compile to semi/anti joins)",
    tags=("setop", "join"),
)
def q60_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer", "nation", "region"])
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    low = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("o_custkey").alias("custkey"))
    )
    asia = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("c_custkey").alias("custkey"))
    )
    # subtract == SQL EXCEPT (distinct) and compiles to the LeftAnti join
    # the doc claims (exceptAll would rewrite to a union + vcol aggregate)
    return urgent.intersect(low).subtract(asia)


# ---------------------------------------------------------------------------
# q64 — window FRAMES: 30-day range-frame moving revenue per customer +
# previous-order gap via lag (SURVEY §2.5 notes the reference has no
# true window functions; rank/lag/frames are included as engine
# surface). One shuffle on o_custkey; the range frame slides over the
# date-ordered partition without re-sorting per row. Decimal sums keep
# the moving aggregate bit-stable; the frame is inclusive on both
# engines (RANGE BETWEEN 30 days PRECEDING AND CURRENT ROW == Spark
# rangeBetween(-30 days, 0) over epoch seconds).


@register(
    "q64_rolling_revenue",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '{TS_FMT_DUCK}') AS order_ts,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
                ) AS VARCHAR) AS DOUBLE) AS revenue_30d,
           CAST(date_diff('day', lag(o_orderdate) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ), o_orderdate) AS INT) AS days_since_prev
    FROM orders
    """,
    doc="30-day range-frame moving revenue + lag gap (window frames)",
    tags=("window", "frames", "W3"),
)
def q64_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    # Frame ordering by DAY NUMBER, not unix_timestamp: epoch seconds are
    # timezone-independent only when the column reads as TIMESTAMP_NTZ —
    # under an LTZ read on a DST-observing host, a 30-day calendar gap
    # crossing a fall-back transition is 30d+1h of epoch and silently
    # falls out of the frame (diverging from the oracle's calendar
    # INTERVAL). datediff from a fixed origin is tz-proof either way.
    daynum = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w_range = Window.partitionBy("o_custkey").orderBy(daynum).rangeBetween(-30, 0)
    # same ordering prefix as w_range (daynum is monotone in o_orderdate)
    # so EnsureRequirements reuses ONE partition sort for both windows
    w_lag = Window.partitionBy("o_custkey").orderBy(daynum, F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_ts"),
        F.sum(dec("o_totalprice", 14))
        .over(w_range)
        .cast("double")
        .alias("revenue_30d"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w_lag))
        .cast("int")
        .alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# q65 — AS-OF JOIN (builder brief §custom operators: "as-of join"): for
# every event, the customer's latest order at-or-before the event time.
# Spark has no asof operator; the scale-correct construction is the
# union+window trick — tag both streams, union, and carry the last
# non-null order key forward over (user, time) — ONE shuffle on the
# user key, no inequality-join explosion, no per-row subquery. The
# right side is first deduplicated to unique (user, t) (keep max
# orderkey) so the as-of pick is deterministic in both engines; the
# DuckDB oracle uses its NATIVE ASOF LEFT JOIN.


@register(
    "q65_asof_join",
    oracle="""
    WITH vw AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(event_id) AS okey
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    pur AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, v.okey AS asof_view_event
    FROM pur p ASOF LEFT JOIN vw v
      ON p.user_id = v.user_id AND p.t >= v.t
    """,
    doc="as-of join via union+window (one shuffle); DuckDB native ASOF oracle",
    tags=("join", "asof", "window"),
)
def q65_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # attribution as-of: each purchase event joined to the same user's
    # latest PRECEDING view event — both sides interleave through the
    # whole 30-day window, so the as-of pick genuinely varies per row
    # (purchases before any view get NULL: the left-asof miss path).
    events = load_tables(spark, sf_dir, ["events"])["events"]
    od = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").cast("timestamp_ntz").alias("t"))
        .agg(F.max("event_id").alias("okey"))
    )
    ev = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("t")
    )
    u = od.select(
        "user_id",
        "t",
        "okey",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_event"),
    ).unionByName(
        ev.select(
            "user_id",
            "t",
            F.lit(None).cast("long").alias("okey"),
            "event_id",
            F.lit(1).alias("is_event"),
        )
    )
    # orders sort before same-timestamp events (at-or-before includes ties)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("asof_view_event", F.last("okey", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "asof_view_event")
    )


# ---------------------------------------------------------------------------
# q66 — RANGE JOIN (builder brief §custom operators: "range join"):
# for each event, how many same-user events follow within 6 hours. A
# naive inequality self-join degenerates to per-user cross products; the
# scale form BINS time into band-width buckets — each anchor event
# probes its own and the next bin (exploded), each candidate lands in
# exactly one — so the join is an EQUI-join on (user, bin) with a cheap
# residual filter, and the shuffle is keyed and bounded. Bin seconds are
# derived from NTZ field extraction (day-number*86400 + hh/mm/ss) —
# tz-proof regardless of how the column is read (cf. q64).


BAND_S = 6 * 3600  # 6-hour band


def _ntz_secs(col):
    """Seconds from a fixed origin via field extraction — identical no
    matter what timezone the session would assign the column."""
    return (
        F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("bigint") * 86400
        + F.hour(col).cast("bigint") * 3600
        + F.minute(col).cast("bigint") * 60
        + F.second(col).cast("bigint")
    )


@register(
    "q66_range_join",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS et FROM events)
    SELECT a.event_id, count(b.event_id) AS n_followups_6h
    FROM e a LEFT JOIN e b
      ON b.user_id = a.user_id
     AND b.et > a.et
     AND b.et <= a.et + INTERVAL 6 HOUR
    GROUP BY a.event_id
    """,
    doc="range self-join via band-binned equi-join + residual (never per-key cross)",
    tags=("join", "range", "T5"),
)
def q66_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "user_id", F.col("ts").alias("et")
    )
    secs = _ntz_secs(F.col("et"))
    anchors = ev.select(
        "event_id",
        "user_id",
        "et",
        F.explode(
            F.array(F.floor(secs / BAND_S), F.floor(secs / BAND_S) + 1)
        ).alias("bin"),
    )
    cands = ev.select(
        F.col("event_id").alias("cand_id"),
        F.col("user_id"),
        F.col("et").alias("cet"),
        F.floor(_ntz_secs(F.col("et")) / BAND_S).alias("bin"),
    )
    hits = (
        anchors.join(cands, ["user_id", "bin"])
        .filter(
            (F.col("cet") > F.col("et"))
            & (F.col("cet") <= F.expr("et + INTERVAL 6 HOURS"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_followups_6h"))
    )
    # left join back so zero-followup events appear (matching the oracle's
    # LEFT JOIN + count(b...) = 0 rows)
    return (
        ev.select("event_id")
        .join(hits, "event_id", "left")
        .na.fill({"n_followups_6h": 0})
    )


# ---------------------------------------------------------------------------
# q76 — the spark.sql TEXT surface as a driver-gated query (SURVEY §3.1:
# users submit SQL strings; Catalyst parses/analyzes against the views
# registered by plans/sql_text.py). The statement is a TPC-H Q12-flavored
# late-shipment count: same string shape a reference user would write,
# no DataFrame API in the query body at all.

_Q76_SQL = """
SELECT year(o.o_orderdate) AS order_year,
       o.o_orderpriority,
       count(*) AS n_late_lines
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
GROUP BY year(o.o_orderdate), o.o_orderpriority
"""


@register(
    "q76_sql_text_late_lines",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_late_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY year(o.o_orderdate), o.o_orderpriority
    """,
    doc="SQL-text entry (spark.sql): late-shipment counts, Q12 flavor",
    tags=("sql_text", "join", "agg"),
)
def q76_sql_text_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sql_text import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q76_SQL)


# ---------------------------------------------------------------------------
# q90 — incremental aggregate maintenance: merge a pre-aggregated state
# (events before the cutoff) with a fresh delta partition (events after),
# and let the oracle recompute the rollup from ALL events in one pass —
# the hash gate therefore PROVES the incremental merge is exact, not an
# approximation. This is the materialized-rollup maintenance pattern: at
# 100 TB the state side is a stored agg table (|event_type × day| rows,
# not raw events), the delta is one new partition, and the merge shuffles
# only aggregated keys. count/sum are commutative monoids, so
# agg(state) ⊎ agg(delta) == agg(full); the cutoff falls mid-day so the
# boundary day exists on BOTH sides and the additive path is exercised,
# not just the disjoint union.

_INC_CUTOFF = "2024-01-21 12:00:00"


@register(
    "q90_incremental_rollup",
    oracle="""
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, day
    """,
    doc="incremental rollup maintenance: agg(state) merged with agg(delta) == agg(full)",
    tags=("agg", "incremental", "T2"),
)
def q90_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp_ntz")
    base = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        dec("value").alias("v"),
        (F.col("ts") < cutoff).alias("is_state"),
    )

    def rollup(side: DataFrame, n: str, s: str) -> DataFrame:
        return side.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias(n), F.sum("v").alias(s)
        )

    state = rollup(base.filter(F.col("is_state")), "n1", "s1")
    delta = rollup(base.filter(~F.col("is_state")), "n2", "s2")
    zero = F.lit(0).cast("decimal(22,2)")
    return state.join(delta, ["event_type", "day"], "full_outer").select(
        "event_type",
        "day",
        (F.coalesce("n1", F.lit(0)) + F.coalesce("n2", F.lit(0))).alias("n_events"),
        d(F.coalesce("s1", zero) + F.coalesce("s2", zero)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# q91 — ordered funnel analysis (view → click → purchase, each step within
# one hour of the previous): the sequential-pattern operator event
# platforms run at petabyte scale. Expressed as a min-chain of
# stage aggregates — each stage is a groupBy(user_id) min over the
# previous stage's anchor — rather than per-user collect_list folding:
# the join chain keeps per-task state bounded (a power user with 10^7
# events would OOM a collected-array approach), every join keys on
# user_id so AQE/exchange reuse co-partitions the whole chain, and the
# stage filters prune event types at the scan.

_FUNNEL_WINDOW = "INTERVAL 1 HOUR"


@register(
    "q91_funnel_stages",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
    s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(t) AS t2
           FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND t > t1 AND t <= t1 + {_FUNNEL_WINDOW}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(t) AS t3
           FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND t > t2 AND t <= t2 + {_FUNNEL_WINDOW}
           GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
           strftime(t1, '{TS_FMT_DUCK}') AS view_ts,
           strftime(t2, '{TS_FMT_DUCK}') AS click_ts,
           strftime(t3, '{TS_FMT_DUCK}') AS purchase_ts
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    """,
    doc="ordered 3-stage funnel via min-chain joins; per-task state bounded",
    tags=("events", "funnel", "W3"),
)
def q91_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    e = ev.select("user_id", "event_type", "ts")
    win = F.expr(_FUNNEL_WINDOW)
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = e.select("user_id").distinct()
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            stage.alias("stage_reached"),
            F.date_format("t1", TS_FMT_SPARK).alias("view_ts"),
            F.date_format("t2", TS_FMT_SPARK).alias("click_ts"),
            F.date_format("t3", TS_FMT_SPARK).alias("purchase_ts"),
        )
    )


# ---------------------------------------------------------------------------
# q92 — weekly retention cohorts: users grouped by the week of their
# first event, activity bucketed by whole weeks since that first event —
# the (cohort × offset) engagement matrix. Two-level distinct (distinct
# (cohort, offset, user) rows first, then a plain count) instead of
# COUNT(DISTINCT user): the dedup collapses map-side and the final
# exchange moves one row per (cohort, offset, user-partition), never a
# distinct-aggregate expansion. The first-event table joins back on
# user_id — the same key as its own groupBy, so the exchange is reused.


@register(
    "q92_retention_cohorts",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
    firsts AS (SELECT user_id, min(t) AS f FROM e GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', f) AS DATE) AS cohort_week,
             CAST(datediff('day', CAST(f AS DATE), CAST(t AS DATE)) // 7 AS INT)
               AS week_offset
      FROM e JOIN firsts USING (user_id)
    )
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM act GROUP BY cohort_week, week_offset
    """,
    doc="weekly retention cohort matrix via two-level distinct",
    tags=("events", "retention", "A4"),
)
def q92_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    e = ev.select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("f"))
    act = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "f").cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("f").cast("date")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q93 — data-quality / integrity audit (Deequ-/dbt-test-style constraint
# report; the scale-grade form of the reference's row-model validation,
# sources/ods.py validate_epraccur / U9): referential integrity via
# left-join null probes, cross-table ordering sanity, range and null
# checks, and PK uniqueness — one report row per rule.
#
# Scale design: rules sharing a join pass are computed in that ONE pass
# (the lineitem⟕orders probe answers orphans, ship-before-order AND the
# map-side range check together, then inline() stacks the report rows),
# so the audit costs two shuffle joins and three scans regardless of rule
# count. Each agg is a full partial-aggregated reduction to one row — no
# distinct-expansion, no window. The lineitem-side rules read the orders
# side as a PK table; the PK-uniqueness rule audits exactly that
# assumption rather than silently relying on it.


@register(
    "q93_integrity_audit",
    oracle="""
    SELECT 'lineitem_orphaned_order' AS rule,
           count(*) FILTER (o.o_orderkey IS NULL) AS n_violations,
           count(*) AS n_checked
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_ship_before_order',
           count(*) FILTER (l.l_shipdate < o.o_orderdate), count(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_nonpositive_amounts',
           count(*) FILTER (l.l_quantity <= 0 OR l.l_extendedprice <= 0), count(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'order_orphaned_customer',
           count(*) FILTER (c.c_custkey IS NULL), count(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'customer_null_name', count(*) FILTER (c_name IS NULL), count(*)
    FROM customer
    UNION ALL
    SELECT 'orders_duplicate_pk',
           count(*) FILTER (cnt > 1), count(*)
    FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY o_orderkey)
    """,
    doc="constraint-audit report: FK orphans, date sanity, ranges, nulls, PK dups",
    tags=("quality", "U9", "A4"),
)
def q93_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer"])
    li, o, c = t["lineitem"], t["orders"], t["customer"]

    def report(name: str, viol, checked):
        return F.struct(
            F.lit(name).alias("rule"),
            viol.alias("n_violations"),
            checked.alias("n_checked"),
        )

    lo = li.select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    )
    li_rules = lo.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("orphan"),
        F.count(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)).alias("shipbad"),
        F.count(
            F.when((F.col("l_quantity") <= 0) | (F.col("l_extendedprice") <= 0), 1)
        ).alias("rangebad"),
    ).select(
        F.inline(
            F.array(
                report("lineitem_orphaned_order", F.col("orphan"), F.col("n")),
                report("lineitem_ship_before_order", F.col("shipbad"), F.col("n")),
                report("lineitem_nonpositive_amounts", F.col("rangebad"), F.col("n")),
            )
        )
    )
    oc = o.select("o_custkey").join(
        c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    o_rule = oc.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("orphan"),
    ).select(F.inline(F.array(report("order_orphaned_customer", F.col("orphan"), F.col("n")))))
    c_rule = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("c_name").isNull(), 1)).alias("nullname"),
    ).select(F.inline(F.array(report("customer_null_name", F.col("nullname"), F.col("n")))))
    pk_rule = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("cnt") > 1, 1)).alias("dups"),
        )
        .select(F.inline(F.array(report("orders_duplicate_pk", F.col("dups"), F.col("n")))))
    )
    return li_rules.unionByName(o_rule).unionByName(c_rule).unionByName(pk_rule)


# ---------------------------------------------------------------------------
# q96 — exact per-group discrete quantiles, the distributed-selection way.
#
# The naive plan (row_number over every row per group) full-sorts each
# group on 5 reducers — a serialization point at 100 TB. This is the
# scale-correct two-stage shape instead: (1) count per (group, value) —
# a partial-aggregating shuffle where map-side combine collapses the
# fact table to |distinct values| rows; (2) a cumulative window over the
# DISTINCT values only, selecting the first value whose running count
# reaches ceil(q·n). Everything is counting + selection — no float
# arithmetic on the data — so Spark and DuckDB agree bit-exactly on
# doubles. (percentile_disc semantics; the interpolating percentile_cont
# would average two doubles and still match, but selection needs no
# cross-engine float argument at all.)

QUANTILES = (0.25, 0.50, 0.75, 0.95)


def _duck_quantile_oracle() -> str:
    sel = ",\n           ".join(
        f"min(CASE WHEN cum >= CAST(ceil({q} * n) AS BIGINT) THEN o_totalprice END)"
        f" AS p{int(q * 100)}"
        for q in QUANTILES
    )
    return f"""
    WITH cnt AS (
      SELECT o_orderpriority, o_totalprice, count(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT o_orderpriority, o_totalprice,
             sum(c) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY o_orderpriority) AS n
      FROM cnt
    )
    SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_orders,
           {sel}
    FROM cum GROUP BY 1
    """


@register(
    "q96_price_quantiles",
    oracle=_duck_quantile_oracle(),
    doc="exact discrete quantiles per priority via count-per-value + "
    "cumulative selection (map-side combine; window over distinct values only)",
    tags=("analytics", "A4", "W3"),
)
def q96_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    cnt = orders.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("o_orderpriority")
    cum = cnt.select(
        "o_orderpriority",
        "o_totalprice",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_n).alias("n"),
    )
    aggs = [F.max("n").alias("n_orders")]
    for q in QUANTILES:
        target = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(
            F.min(
                F.when(F.col("cum") >= target, F.col("o_totalprice"))
            ).alias(f"p{int(q * 100)}")
        )
    return cum.groupBy("o_orderpriority").agg(*aggs)


# ---------------------------------------------------------------------------
# q109 — sliding event-time windows: per event_type hourly rates at
# 30-minute slide — the canonical streaming-dashboard aggregation,
# expressed with Spark's native ``F.window`` (each event lands in
# duration/slide = 2 overlapping windows via an internal generator —
# no self-join, no explode in user code). The DuckDB oracle rebuilds
# the window assignment with exact integer epoch-microsecond
# arithmetic: start_k = t - ((t - k·slide) mod duration-aligned slide)
# — concretely the two aligned 30-minute boundaries covering t.
# Value mass uses the q54 exact-millis trick so the per-window sums are
# order-independent integers, not float accumulation.
#
# Scale shape: ONE partial-combined shuffle on (event_type, window) —
# the 2× window fan-out happens map-side before the combine. In
# Structured Streaming the identical expression runs incrementally with
# a watermark; q97/q83 cover that leg.

SLIDE_MIN = 30
WIN_MIN = 60


@register(
    "q109_sliding_window_rates",
    oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS t,
             CAST(floor(value * 1000) AS BIGINT) AS v_mil
      FROM events
    ),
    slide AS (SELECT CAST({SLIDE_MIN} * 60 * 1000000 AS BIGINT) AS us),
    fan AS (
      SELECT e.event_type, e.v_mil,
             epoch_us(e.t) - ((epoch_us(e.t) % s.us + s.us) % s.us)
               - k.k * s.us AS start_us
      FROM e, slide s, (SELECT unnest(range(0, {WIN_MIN // SLIDE_MIN})) AS k) k
    )
    -- every generated window contains t by construction: duration is
    -- exactly 2 slides and k enumerates both aligned offsets
    SELECT event_type,
           strftime(make_timestamp(start_us), '{TS_FMT_DUCK}') AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v_mil) AS BIGINT) AS value_millis
    FROM fan
    GROUP BY event_type, start_us
    """,
    doc="sliding event-time windows (1h window, 30min slide) per event "
    "type via native F.window; one partial-combined shuffle",
    tags=("window", "agg", "T5", "streaming"),
)
def q109_sliding_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", f"{WIN_MIN} minutes", f"{SLIDE_MIN} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
        .select(
            "event_type",
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "value_millis",
        )
    )


# ---------------------------------------------------------------------------
# q111 — partition-pruned scan over a hive-layout table: events written
# once partitioned by event_type, then a two-type analysis that reads
# ONLY those directories — partition pruning happens at PLAN time (the
# file index never lists the other types' files), which at 100 TB is
# the difference between scanning 2/5 of the table and all of it.
# ``sources/layout.py`` owns the write pattern; this query makes the
# read-side pruning a registry-visible operator with an oracle. The
# pruned column comes back as a partition value (not file data), so
# parity also proves the hive round-trip preserved the grouping.

PRUNE_TYPES = ("click", "purchase")


@register(
    "q111_partition_pruning",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events
    WHERE event_type IN {PRUNE_TYPES}
    GROUP BY event_type
    """,
    doc="partition-pruned hive-layout scan: filter on the partition "
    "column prunes directories at plan time; only 2/5 of the data is read",
    tags=("layout", "S1", "A4"),
)
def q111_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = scratch_dir("q111_hive")
    ev.write.partitionBy("event_type").parquet(f"{base}/events")
    part = spark.read.parquet(f"{base}/events")
    return (
        part.filter(F.col("event_type").isin(*PRUNE_TYPES))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
    )


# ---------------------------------------------------------------------------
# q112 — bucketed co-located fact-fact join: orders and lineitem written
# ONCE bucketed by order key (sources/layout.py:write_bucketed), then
# joined WITHOUT any shuffle — neither side has an Exchange in the plan,
# because matching bucket layouts make the join purely file-local. At
# 1000 executors this removes the widest network stage a fact-fact join
# has; the write-time bucketing cost amortizes over every subsequent
# keyed join/agg. The per-bucket sort also drops the join's Sort nodes.
# A plan test asserts the zero-exchange property; the oracle pins the
# results.

BUCKET_N = 8


@register(
    "q112_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="bucketed co-located orders⋈lineitem: both sides pre-bucketed on "
    "the order key, the join runs with zero Exchange (plan-asserted)",
    tags=("layout", "J1", "A4"),
)
def q112_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os

    from ..scratch import scratch_dir
    from ..sources.layout import write_bucketed

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    base = scratch_dir("q112_bucketed")
    # pid-unique catalog names: concurrent sessions sharing a metastore
    # must not race on one table name, and the entries are dropped atexit
    # so nothing persists pointing at reaped scratch data.
    orders_tbl = f"q112_orders_b_{os.getpid()}"
    lineitem_tbl = f"q112_lineitem_b_{os.getpid()}"
    if not getattr(q112_bucketed_join, "_drop_registered", False):
        q112_bucketed_join._drop_registered = True

        def _drop_tables():
            for tbl in (orders_tbl, lineitem_tbl):
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                except Exception:
                    pass  # session already stopped — scratch reaper gets the files

        atexit.register(_drop_tables)
    # the two bucketed writes are independent (distinct tables/paths):
    # overlap them so the second job's tasks back-fill the first's tail
    # (guide §2.6) — sequential writes left half the executors idle
    from ..concurrency import run_concurrently

    run_concurrently(
        lambda: write_bucketed(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            orders_tbl, "o_orderkey", BUCKET_N, path=f"{base}/orders",
        ),
        lambda: write_bucketed(
            t["lineitem"].select("l_orderkey", "l_extendedprice"),
            lineitem_tbl, "l_orderkey", BUCKET_N, path=f"{base}/lineitem",
        ),
    )
    o = spark.table(orders_tbl)
    li = spark.table(lineitem_tbl)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "price_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q113 — salted two-stage aggregation (operators/skew.py:two_stage_agg)
# under the oracle gate: exact per-key count + count-distinct where a
# hot grouping key (event_type: 5 values over the whole table — EVERY
# key is hot) would otherwise concentrate on 5 reducers. Stage 1 groups
# on (key, salt) so each hot key spreads across 16 reducers; stage 2
# merges partials on the key alone. The distinct count dedups on the
# (key, value) composite — the value IS the salt — never gathering a
# key's values into one buffer. Result-identical to the plain
# GROUP BY + COUNT(DISTINCT), which is exactly what the oracle runs.


@register(
    "q113_skew_two_stage_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
    doc="salted two-stage count + count-distinct over a hot grouping key "
    "(5 values -> 16-way salt spread); result-identical to plain GROUP BY",
    tags=("skew", "agg", "A4"),
)
def q113_skew_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import two_stage_agg

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return two_stage_agg(
        ev.select("event_type", "user_id"),
        ["event_type"],
        n_salts=16,
        count_distinct_col="user_id",
    )


# ---------------------------------------------------------------------------
# q114 — small-files compaction (sources/layout.py:compact_parquet)
# under the oracle gate: a fragmented ingest landing zone (64 shard
# files from micro-batched writes) is compacted to ~target-size files
# with the crash-recoverable rename-swap, then read back for per-type
# accounting. The oracle computes the same accounting from the
# original events table, so parity proves the maintenance rewrite is
# exactly lossless — the property a compaction job must guarantee
# before it is allowed near 100 TB of landed data.


@register(
    "q114_compaction_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
    doc="small-files compaction round-trip: 64 ingest shards rewritten "
    "to target-size files (rename-swap), accounting proves losslessness",
    tags=("layout", "S1", "A4"),
)
def q114_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir
    from ..sources.layout import compact_parquet

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = scratch_dir("q114_compact")
    landing = f"{base}/events_landing"
    # simulate a fragmented micro-batched landing zone
    ev.repartition(64).write.parquet(landing)
    compact_parquet(spark, landing, target_mb=64)
    compacted = spark.read.parquet(landing)
    return compacted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# q121 — per-group exact OLS trend (distributed model fitting without a
# UDF): slope of event value over time per event_type, computed from the
# five classical sums entirely in integer/DECIMAL(38,0) arithmetic so the
# result is bit-identical across engines (floating-point OLS — DuckDB's
# regr_slope — is NOT cross-engine stable). x is centered per group
# (minutes since the group's first event) BEFORE squaring, which keeps
# every sum inside BIGINT range even at sf1 (bounds in comments); the
# moment products then widen to DECIMAL(38,0)/HUGEINT where n*Sxy can
# reach ~4e22. Output slope in micro-units (value-millis per minute,
# truncated toward zero — verified identical div/'//' semantics).
# Scale: two shuffles (per-group min, then the sums); the 5-row min
# table broadcasts back. No window, no UDF, pure codegen.


@register(
    "q121_group_trend",
    oracle="""
    WITH m AS (
      SELECT event_type, min(epoch_us(ts)) AS us0 FROM events GROUP BY event_type
    ),
    pts AS (
      SELECT e.event_type,
             (epoch_us(e.ts) - m.us0) // 60000000 AS x,
             CAST(floor(e.value * 1000) AS BIGINT) AS y
      FROM events e JOIN m ON m.event_type = e.event_type
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(sy // n AS BIGINT) AS mean_y_millis,
           CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) AS BIGINT)
             AS slope_e6
    FROM s
    WHERE n * sxx - sx * sx <> 0
    """,
    doc="per-group exact OLS slope (value-millis per minute, e6 units) "
    "from integer moment sums; no UDF, no floats, cross-engine exact",
    tags=("analytics", "training", "A4"),
)
def q121_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = ev.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("y"),
    )
    m = base.groupBy("event_type").agg(F.min("us").alias("us0"))
    # x in minutes since group start: range ~4e4 (30-day span) .. ~5e5
    # (a year), so with n<=2e5/group: sxy <= n*x*y ~ 2e17 < 2^63 ✓
    pts = base.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.expr("(us - us0) div 60000000").alias("x"),
        "y",
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )

    def d38(c):
        return F.col(c).cast("decimal(38,0)")

    num = d38("n") * d38("sxy") - d38("sx") * d38("sy")
    den = d38("n") * d38("sxx") - d38("sx") * d38("sx")
    return (
        s.withColumn("num", num)
        .withColumn("den", den)
        .filter(F.col("den") != 0)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr("CAST(sy div n AS BIGINT)").alias("mean_y_millis"),
            F.expr("CAST((num * 1000000) div den AS BIGINT)").alias("slope_e6"),
        )
    )


# ---------------------------------------------------------------------------
# q122 — ORC round-trip (second columnar format, SURVEY §2.1 source
# surface): the events table written to ORC and read back, with the
# same lossless-accounting oracle pattern as q114 — the oracle computes
# the accounting from the ORIGINAL parquet, so parity proves the format
# conversion dropped and altered nothing. value is pre-quantized to
# millis before the write so the round-trip contract covers integers,
# strings, and ids (ORC timestamp semantics are format-specific and are
# deliberately kept out of the payload — a conversion pipeline should
# normalize times BEFORE changing formats, not during).


@register(
    "q122_orc_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
    doc="ORC round-trip: parquet -> ORC -> scan; accounting vs the "
    "original table proves the format conversion is lossless",
    tags=("layout", "S1", "A4"),
)
def q122_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = scratch_dir("q122_orc")
    ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_millis"),
    ).write.orc(f"{base}/events_orc")
    back = spark.read.orc(f"{base}/events_orc")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value_millis").cast("bigint").alias("value_millis"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# q125/q126 — pivot and unpivot (the reshape pair, SURVEY §2.4 adjacent):
# per-day event counts turned into one column per event type, and melted
# back. Spark's pivot with an EXPLICIT value list compiles to a single
# hash aggregate over pivot-CASE expressions — one shuffle, no second
# pass (omitting the list costs an extra distinct-scan job to discover
# values, and makes the output schema data-dependent — never do that in
# a pipeline). unpivot/melt is a generate-style row expansion, map-only.
# The oracle mirrors with FILTER aggregates / UNION ALL.

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q125_pivot_event_matrix",
    oracle=f"""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           {", ".join(
               f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
               for t in PIVOT_TYPES
           )}
    FROM events GROUP BY day
    """,
    doc="pivot with explicit value list: day x event_type count matrix "
    "in ONE hash aggregate (no value-discovery scan)",
    tags=("agg", "pivot", "A4"),
)
def q125_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(PIVOT_TYPES))
        .count()
        .select(
            "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_TYPES]
        )
    )


@register(
    "q126_unpivot_event_matrix",
    oracle=f"""
    WITH m AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             {", ".join(
                 f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
                 for t in PIVOT_TYPES
             )}
      FROM events GROUP BY day
    )
    {" UNION ALL ".join(
        f"SELECT day, '{t}' AS event_type, {t} AS n_events FROM m"
        for t in PIVOT_TYPES
    )}
    """,
    doc="unpivot/melt back to long form (map-only row expansion); "
    "round-trips q125's matrix",
    tags=("agg", "pivot"),
)
def q126_unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q125_pivot_event_matrix(spark, sf_dir)
    return wide.unpivot(
        "day", list(PIVOT_TYPES), "event_type", "n_events"
    )


# ---------------------------------------------------------------------------
# q127 — CUBE with GROUPING id: all four aggregation granularities of
# (priority, status) in one pass. Like ROLLUP (q53), Spark expands the
# cube into one Expand + hash aggregate — 4 grouping sets cost one
# shuffle, not four queries. grouping_id() disambiguates the NULLs that
# mark rolled-up dimensions from genuine NULL data.


@register(
    "q127_cube_order_stats",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    doc="CUBE over (priority, status) + grouping_id: 4 granularities in "
    "one Expand + single hash aggregate",
    tags=("agg", "rollup"),
)
def q127_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
    )


# ---------------------------------------------------------------------------
# q129 — range-clustered scan: events rewritten range-sorted on user_id
# (sources/layout.py:write_sorted), then a narrow user slice scanned
# back. Each file covers a contiguous user span, so the filter skips
# whole files on parquet footer min/max before reading a row — the
# zone-map effect on a high-cardinality key, complementing q111's
# discrete-value directory pruning. The oracle computes the same slice
# from the original table (lossless + correct-slice in one gate);
# tests/test_storage_layout.py asserts the files-read metric actually
# dropped.

CLUSTER_USER_LO, CLUSTER_USER_HI = 100, 199


@register(
    "q129_range_clustered_scan",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events
    WHERE user_id BETWEEN {CLUSTER_USER_LO} AND {CLUSTER_USER_HI}
    GROUP BY event_type
    """,
    doc="range-clustered layout scan: file-level min/max skipping on a "
    "high-cardinality key (zone-map effect, no index structure)",
    tags=("layout", "S1", "A4"),
)
def q129_range_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir
    from ..sources.layout import write_sorted

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = scratch_dir("q129_clustered")
    write_sorted(ev, f"{base}/events_by_user", ["user_id"])
    clustered = spark.read.parquet(f"{base}/events_by_user")
    return (
        clustered.filter(
            F.col("user_id").between(CLUSTER_USER_LO, CLUSTER_USER_HI)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias(
                "value_millis"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q136 — dynamic-partition-overwrite incremental rematerialization: the
# 100 TB pattern for correcting a partitioned table in place. A day-
# partitioned events table receives a correction batch covering only the
# 2 most recent days; with partitionOverwriteMode=dynamic the write
# replaces EXACTLY the partitions present in the batch — every other
# day's files are untouched (asserted byte-for-byte in
# tests/test_storage_layout.py). Static overwrite mode would truncate
# the whole table; recomputing it would scan 100 TB to fix 2 days.
# The oracle pins the post-overwrite table state: untouched days keep
# their original rows, corrected days keep only rows passing the
# correction predicate.

Q136_CORRECTED_DAYS = 2
Q136_MIN_VALUE = 0.5


@register(
    "q136_dynamic_partition_overwrite",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, value,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
      FROM events
    ),
    tgt AS (
      SELECT day FROM (SELECT DISTINCT day FROM ev ORDER BY day DESC
                       LIMIT {Q136_CORRECTED_DAYS})
    ),
    final AS (
      SELECT * FROM ev WHERE day NOT IN (SELECT day FROM tgt)
      UNION ALL
      SELECT * FROM ev WHERE day IN (SELECT day FROM tgt)
                         AND value >= {Q136_MIN_VALUE}
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM final GROUP BY day
    """,
    doc="dynamic partition overwrite: a 2-day correction batch replaces "
    "only its own day-partitions in a hive-layout table; all other "
    "partition files are untouched (file-level test asserts it)",
    tags=("layout", "S1", "S7", "A4"),
)
def q136_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    base = scratch_dir("q136_dynpart")
    path = f"{base}/events_by_day"
    ev.write.partitionBy("day").parquet(path)

    # correction batch: the 2 most recent days, low-value rows dropped.
    # The day list is tiny (bounded by the calendar) — broadcast it.
    days = (
        ev.select("day").distinct()
        .orderBy(F.col("day").desc())
        .limit(Q136_CORRECTED_DAYS)
    )
    batch = ev.join(F.broadcast(days), "day", "left_semi").filter(
        F.col("value") >= Q136_MIN_VALUE
    )
    # dynamic mode: only partitions present in `batch` are replaced.
    (
        batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    return (
        # partition-column inference types `day` as DATE on read-back;
        # cast to string so the output schema matches the written column
        # (and the oracle's VARCHAR) rather than the inferred type.
        spark.read.parquet(path)
        .withColumn("day", F.col("day").cast("string"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
    )


# ---------------------------------------------------------------------------
# q137 — GROUPING SETS with explicitly chosen, non-hierarchical sets:
# the report-planner shape CUBE can't express economically. CUBE(a,b,c)
# pays for 8 granularities; a dashboard usually needs 3. One Expand (3×
# the input, not 8×) feeding a single hash aggregate — at 100 TB the
# Expand factor IS the cost model, so enumerating only the needed sets
# is the optimization.

@register(
    "q137_grouping_sets_report",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    """,
    doc="explicit GROUPING SETS (3 of the 4 cube granularities): Expand "
    "factor = number of sets, the knob CUBE doesn't give you",
    tags=("agg", "rollup"),
)
def q137_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
    )


# ---------------------------------------------------------------------------
# q138 — calendar-spine gap fill: per (user, day) activity series with
# explicit zero rows for silent days — the shape every retention/
# forecasting pipeline needs before a window or model sees the data.
# The spine is generated with sequence() off the user's own first/last
# active day (no global calendar scan), exploded map-side; activity
# joins back on (user_id, day). Costs: one groupBy for spans, one
# explode (bounded by the date range), one shuffle join on a dense
# composite key — no skew (each user contributes its own span).

@register(
    "q138_gapfill_user_days",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      FROM events
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    act AS (
      SELECT user_id, day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
      FROM ev GROUP BY user_id, day
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(a.n_events, 0) AS n_events,
           coalesce(a.value_millis, 0) AS value_millis,
           a.n_events IS NULL AS is_gap
    FROM spine s LEFT JOIN act a USING (user_id, day)
    """,
    doc="calendar-spine gap fill: per-user day spine via sequence(), "
    "explicit zero rows for silent days (retention/forecast input shape)",
    tags=("timeseries", "W3", "A4"),
)
def q138_gapfill_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, ["events"])["events"]
        .select("user_id", F.col("ts").cast("date").alias("day"), "value")
    )
    act = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    return spine.join(act, ["user_id", "day"], "left").select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("value_millis", F.lit(0)).alias("value_millis"),
        F.col("n_events").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# q140 — MAD-based robust outlier gate per event_type: median and
# median-absolute-deviation via the q96 distributed-selection shape
# (count-per-value + cumulative selection over DISTINCT values — never a
# per-group row sort), then flag values with |x - med| > 3·MAD. Median/
# MAD are SELECTED data values (percentile_disc), so no cross-engine
# float synthesis exists anywhere: the only arithmetic on doubles is
# subtract/abs/multiply/compare — deterministic IEEE ops. Three
# partial-agg shuffles total; the med/MAD tables are |event_type| rows
# and broadcast back to the fact scan.

MAD_K = 3.0


@register(
    "q140_mad_outliers",
    oracle=f"""
    WITH cnt AS (
      SELECT event_type, value AS v, count(*) AS c FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM cnt
    ),
    med AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
             min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS med
      FROM cum GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)
    ),
    dcnt AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
    dcum AS (
      SELECT event_type, d,
             sum(c) OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM dcnt
    ),
    mad AS (
      SELECT event_type,
             min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN d END) AS mad
      FROM dcum GROUP BY 1
    )
    SELECT m.event_type, m.n_events, m.med, mad.mad,
           CAST(sum(CASE WHEN dev.d > {MAD_K} * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type) JOIN med m USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
    doc="robust MAD outlier gate per event_type: discrete-selection "
    "median + MAD (q96 shape), flag |x-med| > 3*MAD; no per-group row "
    "sort, med/MAD broadcast back to the fact scan",
    tags=("analytics", "A5", "quality"),
)
def q140_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select("event_type", "value")

    def _disc_median(df: DataFrame, col: str, out: str) -> DataFrame:
        cnt = df.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("c"))
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_n = Window.partitionBy("event_type")
        cum = cnt.select(
            "event_type",
            col,
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_n).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col(col))
            ).alias(out),
        )

    med = _disc_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = _disc_median(dev, "d", "mad").drop("n_events")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(med), "event_type")
        .groupBy("event_type", "n_events", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )


# ---------------------------------------------------------------------------
# q141 — Z-order (Morton) clustered layout: events sorted by the bit-
# interleave of (user_id, cents(value)) so every file covers a narrow
# box in BOTH dimensions — a 2-d box predicate then skips files on
# parquet footer min/max for either column (q129 clusters one dimension;
# Z-order is the multi-dimension generalization, the Delta/Iceberg
# Z-ORDER primitive, built here from pure column arithmetic + the same
# range-partitioned sorted write). The oracle computes the identical box
# aggregate from the raw table: lossless round-trip + correct slice in
# one gate. tests/test_storage_layout.py asserts file skipping happens
# for EACH single-dimension predicate on the z-layout.

# low user range: user_id cardinality scales with SF (max 14 at
# sf0.001), so the box must sit at the bottom to be non-empty at every SF
Z_USER_LO, Z_USER_HI = 2, 39
Z_VAL_LO, Z_VAL_HI = 20.0, 60.0


@register(
    "q141_zorder_box_scan",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events
    WHERE user_id BETWEEN {Z_USER_LO} AND {Z_USER_HI}
      AND value >= {Z_VAL_LO} AND value < {Z_VAL_HI}
    GROUP BY event_type
    """,
    doc="Z-order clustered scan: Morton-interleaved (user_id, value) "
    "sort key gives file-level skipping on BOTH dimensions of a box "
    "predicate (multi-column zone maps from one sort)",
    tags=("layout", "S1", "A4"),
)
def q141_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir
    from ..sources.layout import morton_key, write_sorted

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    z = morton_key(
        F.col("user_id").cast("bigint"),
        F.floor(F.col("value") * 100).cast("bigint"),
    )
    base = scratch_dir("q141_zorder")
    path = f"{base}/events_zorder"
    write_sorted(ev.withColumn("z", z), path, ["z"], n_files=16)
    clustered = spark.read.parquet(path)
    return (
        clustered.filter(
            F.col("user_id").between(Z_USER_LO, Z_USER_HI)
            & (F.col("value") >= Z_VAL_LO)
            & (F.col("value") < Z_VAL_HI)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
    )


# ---------------------------------------------------------------------------
# q142 — VARIANT semi-structured ingest: raw JSON event payloads parsed
# ONCE into Spark 4's binary VARIANT encoding, then field-extracted with
# typed variant_get paths. Versus get_json_object (re-tokenizes the
# string on every access) the parse cost is paid once per row and every
# extraction is a binary offset lookup — the difference between O(fields)
# and O(fields × payload) string work at 100 TB ingest. The JSON payload
# is synthesized from the events table in-query (map-only), so the
# oracle can pin the round-trip against the raw columns: parse →
# extract → aggregate must equal the aggregate computed without any
# JSON at all.

@register(
    "q142_variant_ingest",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events
    WHERE value >= 1.0
    GROUP BY 1, 2
    """,
    doc="VARIANT ingest: JSON payloads parsed once to binary variant, "
    "typed variant_get extraction + filter + aggregate; oracle pins the "
    "round-trip against the raw columns",
    tags=("analytics", "F1", "A4"),
)
def q142_variant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale_out: to_json + parse_json + 4 variant_gets are per-row
    # string/binary work trapped in the one-row-group scan task
    # (profiled 1.4s single-task at sf0.1); no-op on a multi-file scan.
    ev = scale_out(load_tables(spark, sf_dir, ["events"])["events"])
    payload = F.to_json(
        F.struct(
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.struct(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
            ).alias("meta"),
        )
    )
    v = ev.select(F.parse_json(payload).alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.meta.day", "string").alias("day"),
        F.variant_get("v", "$.event_type", "string").alias("event_type"),
        F.variant_get("v", "$.value", "double").alias("value"),
        F.variant_get("v", "$.user_id", "bigint").alias("user_id"),
    )
    return (
        extracted.filter(F.col("value") >= 1.0)
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
            F.max("user_id").alias("max_user"),
        )
    )


# ---------------------------------------------------------------------------
# q147 — event-transition (first-order Markov) mining: per-user ordered
# event streams → (prev, next) transition counts → row-normalized
# transition probabilities. The behavioral-modeling primitive behind
# next-action prediction and anomaly scoring. The lag window partitions
# BY USER (bounded per-user history, never a global sort); the
# transition aggregate's domain is |event_type|² — tiny, broadcast-
# friendly. Ordering ties: the sort key is the full (ts, type, millis)
# tuple, and transitions are invariant under permutation of identical
# tuples, so cross-engine row order can't change the answer. The only
# float is the final count/total division.

@register(
    "q147_event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm, CAST(ts AS TIMESTAMP) AS t
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type AS curr,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY t, event_type, vm) AS prev
      FROM s
    ),
    trans AS (
      SELECT prev, curr, count(*) AS n_trans
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev, curr, CAST(n_trans AS BIGINT) AS n_trans,
           CAST(sum(n_trans) OVER (PARTITION BY prev) AS BIGINT) AS out_total,
           CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY prev) AS prob
    FROM trans
    """,
    doc="first-order Markov transition matrix over per-user event "
    "streams: user-partitioned lag, |types|^2 bounded aggregate, "
    "row-normalized probabilities",
    tags=("analytics", "W3", "A4"),
)
def q147_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.col("ts").cast("timestamp").alias("t"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("t", "event_type", "vm")
    seq = ev.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type").over(w_seq).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", "curr").agg(F.count(F.lit(1)).alias("n_trans"))
    w_out = Window.partitionBy("prev")
    return trans.select(
        "prev",
        "curr",
        F.col("n_trans").cast("bigint").alias("n_trans"),
        F.sum("n_trans").over(w_out).cast("bigint").alias("out_total"),
        (
            F.col("n_trans").cast("double") / F.sum("n_trans").over(w_out)
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# q149 — chi-squared drift detector between two event batches (the
# monitoring gate that catches a shifted event-type mix before a model
# retrains on it). Reference batch = even calendar days, current = odd
# days — a deterministic split needing no state. The per-type statistic
# uses the identity (o − e)²/e = (oR − rC)²/(R·r·C) with e = rC/R, so
# both engines evaluate THE SAME rational in double (products stay
# ≤2^53 at any per-type count the int64 counts allow; mul/div are
# deterministic IEEE), then quantize to integer micro-units BEFORE any
# sum. Two bounded-domain aggregates (|event_type| rows) + one
# broadcast-scale join — map-side combine does all the heavy lifting.
# Types absent from the reference batch are excluded (a production gate
# would alert on them separately — new-category drift needs no χ²).

@register(
    "q149_chi2_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, day(CAST(ts AS TIMESTAMP)) % 2 = 0 AS is_ref FROM events
    ),
    per AS (
      SELECT event_type,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS o
      FROM tagged GROUP BY event_type
    ),
    tot AS (SELECT sum(r) AS big_r, sum(o) AS big_c FROM per)
    SELECT event_type,
           CAST(r AS BIGINT) AS ref_n, CAST(o AS BIGINT) AS cur_n,
           CAST(floor(1000000.0 *
                 (CAST(o AS DOUBLE) * big_r - CAST(r AS DOUBLE) * big_c) *
                 (CAST(o AS DOUBLE) * big_r - CAST(r AS DOUBLE) * big_c) /
                 (CAST(big_r AS DOUBLE) * r * big_c)) AS BIGINT) AS term_micros
    FROM per CROSS JOIN tot
    WHERE r > 0
    """,
    doc="chi-squared event-mix drift between even/odd-day batches: "
    "(oR-rC)^2/(R r C) per type in deterministic IEEE double, quantized "
    "to integer micro-units before any summation",
    tags=("analytics", "quality", "A4"),
)
def q149_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    tagged = ev.select(
        "event_type", (F.dayofmonth(F.col("ts").cast("timestamp")) % 2 == 0).alias("is_ref")
    )
    per = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("o"),
    )
    tot = per.agg(F.sum("r").alias("big_r"), F.sum("o").alias("big_c"))
    num = F.col("o").cast("double") * F.col("big_r") - F.col("r").cast("double") * F.col("big_c")
    term = num * num / (F.col("big_r").cast("double") * F.col("r") * F.col("big_c"))
    return (
        per.join(F.broadcast(tot))
        .filter(F.col("r") > 0)
        .select(
            "event_type",
            F.col("r").cast("bigint").alias("ref_n"),
            F.col("o").cast("bigint").alias("cur_n"),
            F.floor(F.lit(1000000.0) * term).cast("bigint").alias("term_micros"),
        )
    )


# ---------------------------------------------------------------------------
# q151 — forward-fill imputation over the gap-filled spine (LOCF — last
# observation carried forward, the pandas ``ffill`` the reference's
# notebook workflows lean on, distributed). Composes q138's calendar
# spine: silent days carry the user's last active day's value; leading
# gaps (before any observation) stay NULL and are reported. The fill is
# one ``last(..., ignorenulls=True)`` running window PER USER ordered by
# day — state is a single value per partition stream, and the window is
# user-partitioned (bounded by a user's own span, never a global sort).
# Integer payloads only, so the carried values are hash-stable.

@register(
    "q151_ffill_user_days",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      FROM events
    ),
    act AS (
      SELECT user_id, day,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
      FROM ev GROUP BY user_id, day
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    joined AS (
      SELECT s.user_id, s.day, a.value_millis,
             a.value_millis IS NULL AS is_gap
      FROM spine s LEFT JOIN act a USING (user_id, day)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, is_gap,
           last_value(value_millis IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS filled_millis
    FROM joined
    """,
    doc="distributed pandas-ffill (LOCF) over the q138 calendar spine: "
    "last-non-null running window per user, bounded partitions, integer "
    "payloads for hash stability",
    tags=("timeseries", "W3", "F15"),
)
def q151_ffill_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, ["events"])["events"]
        .select("user_id", F.col("ts").cast("date").alias("day"), "value")
    )
    act = ev.groupBy("user_id", "day").agg(
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    joined = spine.join(act, ["user_id", "day"], "left").select(
        "user_id", "day", "value_millis", F.col("value_millis").isNull().alias("is_gap")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "is_gap",
        F.last("value_millis", ignorenulls=True).over(w).alias("filled_millis"),
    )


# ---------------------------------------------------------------------------
# q153 — per-user ordered event-path reconstruction: the sequence-
# mining substrate (clickstream paths, care-pathway strings) built with
# ONE grouped collect of (t, type, millis) structs sorted in-group —
# array_sort on structs is lexicographic, so the order key is the same
# full tuple q147 uses and identical-tuple permutations can't change
# the path string. Per-user state is the user's own event list (bounded
# by per-user activity, the same bound any sessionizer carries); at
# 100 TB the group-by shuffles once on user_id with map-side partial
# collects. No window, no global sort.

@register(
    "q153_user_event_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm, CAST(ts AS TIMESTAMP) AS t
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           string_agg(event_type, '->' ORDER BY t, event_type, vm) AS path
    FROM s GROUP BY user_id
    """,
    doc="per-user ordered event-path strings: grouped struct-sorted "
    "collect (full-tuple order key, permutation-invariant ties), one "
    "shuffle, no windows",
    tags=("analytics", "W3", "A4"),
)
def q153_user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.col("ts").cast("timestamp").alias("t"),
    )
    path = F.concat_ws(
        "->",
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "event_type", "vm"))),
            lambda s: s.event_type,
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        path.alias("path"),
    )


# ---------------------------------------------------------------------------
# q154 — recency-decayed engagement scores with an EXACT half-life:
# weight = 2^(-age_days) implemented as an integer right-shift of the
# millis value (vm >> age), so the decayed sum is pure int64 arithmetic
# — the decay curve ranking/recommendation systems want, without the
# exp() that would break cross-engine parity. age is measured from the
# corpus max day (broadcast 1-row bound); shifts past 62 clamp to zero
# explicitly. One partial-agg shuffle on user_id.

DECAY_MAX_SHIFT = 62


@register(
    "q154_decayed_scores",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events
    ),
    mx AS (SELECT max(day) AS d1 FROM ev),
    aged AS (
      SELECT user_id, vm, date_diff('day', day, d1) AS age
      FROM ev CROSS JOIN mx
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN age > {DECAY_MAX_SHIFT} THEN 0
                         ELSE vm // CAST(power(2, age) AS BIGINT) END)
                AS BIGINT) AS decayed_millis,
           CAST(sum(vm) AS BIGINT) AS raw_millis
    FROM aged GROUP BY user_id
    """,
    doc="half-life-decayed engagement scores: weight 2^-age as an "
    "integer shift (vm >> age_days) — exact decay, no exp(); one "
    "partial-agg shuffle",
    tags=("analytics", "W3", "A4"),
)
def q154_decayed_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
    )
    mx = ev.agg(F.max("day").alias("d1"))
    aged = ev.join(F.broadcast(mx)).select(
        "user_id", "vm", F.datediff("d1", "day").alias("age")
    )
    decayed = F.when(F.col("age") > DECAY_MAX_SHIFT, F.lit(0)).otherwise(
        F.expr("shiftright(vm, cast(age AS int))")
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(decayed).cast("bigint").alias("decayed_millis"),
        F.sum("vm").cast("bigint").alias("raw_millis"),
    )


# ---------------------------------------------------------------------------
# q155 — bitmap audience intersection: the segment-overlap primitive
# behind "users who did A and B" at interactive latency. Each segment's
# membership compresses to 63-bit words — user u sets bit (u mod 63) of
# word (u div 63); 63 keeps every shift off the int64 sign bit, which
# DuckDB rejects (1<<63 overflow) and Spark silently wraps — via a
# bit_or aggregate; overlap is then
# bit_count(word_a AND word_b) summed over words. The contrast at
# 100 TB: the naive distinct-pair self-join shuffles user-grain rows;
# the bitmap form shuffles |segments| × (max_user/64) words — four
# orders of magnitude less — and overlap queries against materialized
# segment bitmaps never touch the fact table again. All int64 bit ops,
# exact in both engines. Output: every segment pair's overlap (the
# segment-similarity matrix), from one word-grain self-join.

@register(
    "q155_bitmap_audience_overlap",
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type AS seg, user_id FROM events
    ),
    words AS (
      SELECT seg, user_id // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
      FROM m GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
             sum(bit_count(a.bits & b.bits)) AS n_both
      FROM words a JOIN words b ON a.w = b.w AND a.seg < b.seg
      GROUP BY 1, 2
    ),
    sizes AS (SELECT seg, count(*) AS n FROM m GROUP BY seg)
    SELECT p.seg_a, p.seg_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both
    FROM pairs p
    JOIN sizes sa ON sa.seg = p.seg_a
    JOIN sizes sb ON sb.seg = p.seg_b
    """,
    doc="bitmap segment overlap: membership packed to 63-bit words via "
    "bit_or, intersections as popcount(a AND b) over a word-grain join "
    "(shuffles words, not users)",
    tags=("analytics", "A4", "J1"),
)
def q155_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    m = ev.select(F.col("event_type").alias("seg"), "user_id").distinct()
    words = m.groupBy(
        "seg", F.expr("user_id div 63").alias("w")
    ).agg(F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))")).alias("bits"))
    a, b = words.alias("a"), words.alias("b")
    pairs = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.seg") < F.col("b.seg")))
        .groupBy(F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b"))
        .agg(F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits")))).alias("n_both"))
    )
    sizes = m.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(F.broadcast(sizes.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))), "seg_a")
        .join(F.broadcast(sizes.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))), "seg_b")
        .select(
            "seg_a", "seg_b",
            F.col("n_a").cast("bigint"),
            F.col("n_b").cast("bigint"),
            F.coalesce(F.col("n_both"), F.lit(0)).cast("bigint").alias("n_both"),
        )
    )


# ---------------------------------------------------------------------------
# q157 — score-band lift table: the model-evaluation report ("do high-
# score users actually convert more?") in its scale-correct form. Exact
# global deciles need a corpus-wide rank; banding the integer score
# into fixed-width bins FIRST makes every downstream structure bounded-
# domain (|bands| rows) — the histogram-quantile trade every large-scale
# eval harness makes, with the band width as the documented resolution.
# Score = summed click value per user; response = any purchase. Lift =
# band conversion over global conversion, computed as one deterministic
# IEEE expression on exact int64 counts, quantized to micro-units.

LIFT_BAND_MILLIS = 50_000
LIFT_MAX_BAND = 19


@register(
    "q157_score_band_lift",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click'
                      THEN CAST(floor(value * 1000) AS BIGINT) ELSE 0 END) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp
      FROM events GROUP BY user_id
    ),
    banded AS (
      SELECT least(score // {LIFT_BAND_MILLIS}, {LIFT_MAX_BAND}) AS band,
             resp
      FROM per_user
    ),
    per_band AS (
      SELECT band, count(*) AS n_users, sum(resp) AS n_resp
      FROM banded GROUP BY band
    ),
    tot AS (SELECT sum(n_users) AS tu, sum(n_resp) AS tr FROM per_band)
    SELECT CAST(band AS BIGINT) AS band,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_resp AS BIGINT) AS n_resp,
           CAST(CASE WHEN tr = 0 THEN 0
                     ELSE floor(1000000.0 * (CAST(n_resp AS DOUBLE) * tu)
                                / (CAST(n_users AS DOUBLE) * tr)) END
                AS BIGINT) AS lift_micros
    FROM per_band CROSS JOIN tot
    """,
    doc="score-band lift table: fixed-width integer score bands (the "
    "histogram-quantile trade), per-band conversion vs global in one "
    "deterministic IEEE expression, micro-unit quantized",
    tags=("analytics", "ml", "A4"),
)
def q157_score_band_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.floor(F.col("value") * 1000).cast("bigint"),
            ).otherwise(0)
        ).alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("resp"),
    )
    per_band = (
        per_user.select(
            F.least(
                F.expr(f"score div {LIFT_BAND_MILLIS}"), F.lit(LIFT_MAX_BAND)
            ).alias("band"),
            "resp",
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_users"), F.sum("resp").alias("n_resp"))
    )
    tot = per_band.agg(F.sum("n_users").alias("tu"), F.sum("n_resp").alias("tr"))
    lift = F.when(F.col("tr") == 0, F.lit(0)).otherwise(
        F.floor(
            F.lit(1000000.0)
            * (F.col("n_resp").cast("double") * F.col("tu"))
            / (F.col("n_users").cast("double") * F.col("tr"))
        )
    )
    return per_band.join(F.broadcast(tot)).select(
        F.col("band").cast("bigint"),
        F.col("n_users").cast("bigint"),
        F.col("n_resp").cast("bigint"),
        lift.cast("bigint").alias("lift_micros"),
    )


# ---------------------------------------------------------------------------
# q161 helpers: one md5-derived int64 per canonicalized row, identical
# in both engines (same trick as the dedup shingle hashes).


def _row_hash(df):
    from .dedup_queries import _md5_int

    return _md5_int(
        F.concat_ws("|", F.col("user_id"), F.col("event_type"), F.col("vm"), F.col("tss"))
    )


def _duck_row_hash_expr() -> str:
    from .dedup_queries import _duck_md5_int

    return _duck_md5_int(
        "CAST(user_id AS VARCHAR) || '|' || event_type || '|' || "
        "CAST(vm AS VARCHAR) || '|' || tss"
    )


# ---------------------------------------------------------------------------
# q161 — order-insensitive table checksum reconciliation: prove a
# relocated copy (here: the events table rewritten into hive day-
# partitions) is byte-equal to its source WITHOUT a sort or a full
# anti-join compare. Each row folds to one md5-derived int64; the
# table's fingerprint is (row_count, SUM of row hashes, XOR-ish
# bit_or/bit_and pair; the sum accumulates in exact decimal(38,0) —
# Spark's ANSI int64 sum would overflow, DuckDB's HUGEINT wouldn't,
# so 128-bit-exact-then-mod is the one form both agree on) — all
# commutative integer aggregates, so the
# checksum never cares how the copy is partitioned, ordered, or split
# into files. At 100 TB this is one map+reduce per side versus the
# shuffle-heavy EXCEPT both-ways a naive reconciliation runs. The
# oracle computes the fingerprint from the source, pinning the
# Spark-side match=true (source vs relocated copy) as the claim.

@register(
    "q161_table_checksum",
    oracle=f"""
    WITH canon AS (
      SELECT {_duck_row_hash_expr()} AS rh FROM (
        SELECT user_id, event_type,
               CAST(floor(value * 1000) AS BIGINT) AS vm,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS tss
        FROM events)
    ),
    fp AS (
      SELECT count(*) AS n_rows,
             CAST(sum(rh) % 9223372036854775807 AS BIGINT) AS hash_sum,
             bit_or(rh) AS hash_or, bit_and(rh) AS hash_and
      FROM canon
    )
    SELECT a.n_rows, a.hash_sum, a.hash_or, a.hash_and,
           TRUE AS copies_match
    FROM fp a
    """,
    doc="order-insensitive table checksum: commutative integer "
    "fingerprint (count, wrapped hash sum, bit_or/bit_and) reconciles a "
    "repartitioned copy in one map+reduce per side — no sort, no "
    "except-compare",
    tags=("analytics", "quality"),
)
def q161_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    canon_cols = [
        F.col("user_id"),
        F.col("event_type"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("tss"),
    ]

    def fingerprint(df):
        rh = _row_hash(df)
        return df.select(rh.alias("rh")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("rh").cast("decimal(38,0)")) % F.lit(9223372036854775807))
            .cast("bigint")
            .alias("hash_sum"),
            F.bit_or("rh").alias("hash_or"),
            F.bit_and("rh").alias("hash_and"),
        )

    src = ev.select(*canon_cols)
    base = scratch_dir("q161_checksum")
    # the relocated copy: hive day-partitioned, different file layout
    src.withColumn("day", F.substring("tss", 1, 10)).write.partitionBy(
        "day"
    ).parquet(f"{base}/copy")
    copy = spark.read.parquet(f"{base}/copy").select(
        "user_id", "event_type", "vm", "tss"
    )

    a = fingerprint(src)
    b = (
        fingerprint(copy)
        .select(
            F.col("n_rows").alias("b_rows"),
            F.col("hash_sum").alias("b_sum"),
            F.col("hash_or").alias("b_or"),
            F.col("hash_and").alias("b_and"),
        )
    )
    return a.join(F.broadcast(b)).select(
        "n_rows",
        "hash_sum",
        "hash_or",
        "hash_and",
        (
            (F.col("n_rows") == F.col("b_rows"))
            & (F.col("hash_sum") == F.col("b_sum"))
            & (F.col("hash_or") == F.col("b_or"))
            & (F.col("hash_and") == F.col("b_and"))
        ).alias("copies_match"),
    )


# ---------------------------------------------------------------------------
# q162 — percent-of-total within hierarchy: each nation's share of its
# region's revenue plus its rank — the canonical BI report shape. The
# window runs over PRE-AGGREGATED rows (|nation| = 25 at any data
# scale), so the share/rank pass is free no matter how large lineitem
# is; all the heavy lifting is one partial-agg shuffle keyed by nation.
# Revenue accumulates in exact decimal; share is a single decimal
# division quantized to micro-units (no float summation anywhere).

@register(
    "q162_region_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS rev_cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(rev_cents * 1000000 // sum(rev_cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_micros,
           CAST(row_number() OVER (PARTITION BY region
                                   ORDER BY rev_cents DESC, nation) AS BIGINT)
             AS rank_in_region
    FROM rev
    """,
    doc="percent-of-total + rank within region: windows over 25 pre-"
    "aggregated rows (free at any scale), exact integer cents, share as "
    "integer-division micro-units",
    tags=("analytics", "A4"),
)
def q162_region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation", "region"])
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev_cents).alias("rev_cents"))
    )
    w = Window.partitionBy("region")
    w_rank = Window.partitionBy("region").orderBy(F.desc("rev_cents"), F.asc("nation"))
    return rev.select(
        "region",
        "nation",
        F.col("rev_cents").cast("bigint"),
        F.expr("rev_cents * 1000000").cast("bigint")
        .alias("_num"),
        F.sum("rev_cents").over(w).alias("_den"),
        F.row_number().over(w_rank).cast("bigint").alias("rank_in_region"),
    ).select(
        "region",
        "nation",
        "rev_cents",
        F.expr("_num div _den").cast("bigint").alias("share_micros"),
        "rank_in_region",
    )


# ---------------------------------------------------------------------------
# q163 — rolling 7-day distinct users (WAU) via day-bitmaps: COUNT
# DISTINCT over a sliding window doesn't partial-aggregate — the naive
# form re-scans 7 days of raw events per output day. Bitmaps restore
# mergeability: one pass packs each day's membership into 63-bit words
# (q155's encoding), then each day-word row fans out to the ≤7 window
# ends it contributes to (a bounded explode — this is the shuffle-frame
# trick for sliding windows), bit_or merges per (end_day, word), and
# popcount sums give the exact rolling distinct. Work per day is
# |words| = max_user/63 regardless of event volume. The oracle computes
# the NAIVE definition (per-day range join + count distinct), so the
# equality gate proves the bitmap algebra, not just reproducibility.

ROLL_DAYS = 7


@register(
    "q163_rolling_distinct_users",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ev)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST((SELECT count(DISTINCT e.user_id) FROM ev e
                 WHERE e.day BETWEEN d.day - INTERVAL {ROLL_DAYS - 1} DAY
                                 AND d.day) AS BIGINT) AS rolling_users,
           CAST((SELECT count(*) FROM ev e WHERE e.day = d.day) AS BIGINT)
             AS daily_users
    FROM days d
    """,
    doc="exact rolling 7-day distinct users via mergeable day-bitmaps "
    "(63-bit words, bounded 7-way fan-out, bit_or merge + popcount); "
    "oracle is the naive range-join definition, gating the bitmap algebra",
    tags=("analytics", "W3", "A4"),
)
def q163_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, ["events"])["events"]
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    day_words = ev.groupBy(
        "day", F.expr("user_id div 63").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))")
        ).alias("bits")
    )
    # each (day, word) contributes to window ends day .. day+6; only ends
    # that are real activity days survive the semi-join below
    fanned = day_words.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), ROLL_DAYS - 1))
        ).alias("end_day"),
        "w",
        "bits",
    )
    real_days = ev.select(F.col("day").alias("end_day")).distinct()
    merged = (
        fanned.join(F.broadcast(real_days), "end_day", "left_semi")
        .groupBy("end_day", "w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    rolling = merged.groupBy("end_day").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("rolling_users")
    )
    daily = ev.groupBy(F.col("day").alias("end_day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("daily_users")
    )
    return rolling.join(daily, "end_day").select(
        F.date_format("end_day", "yyyy-MM-dd").alias("day"),
        "rolling_users",
        "daily_users",
    )


# ---------------------------------------------------------------------------
# q164 — partition-level fingerprint diff: q161 says WHETHER two copies
# match; this says WHERE they diverge, so the repair job re-syncs one
# partition instead of 100 TB. Both sides fingerprint per day (count +
# decimal-exact hash sum); a full outer join labels each day matched/
# diverged/missing. The "remote" copy is deterministically corrupted —
# the latest day drops every user_id ≡ 0 (mod 97) — so the expected
# answer is computable by the oracle from the source alone: exactly one
# diverged day (the latest), everything else matched. Fingerprints are
# |days| rows — the diff join is metadata-sized at any scale.

@register(
    "q164_partition_fingerprint_diff",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS tss,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    mx AS (SELECT max(day) AS d1 FROM ev),
    src AS (
      SELECT day, count(*) AS n,
             CAST(sum({_duck_row_hash_expr()}) % 9223372036854775807 AS BIGINT) AS hs
      FROM ev GROUP BY day
    ),
    cpy AS (
      SELECT e.day, count(*) AS n,
             CAST(sum({_duck_row_hash_expr()}) % 9223372036854775807 AS BIGINT) AS hs
      FROM ev e CROSS JOIN mx
      WHERE NOT (e.day = mx.d1 AND e.user_id % 97 = 0)
      GROUP BY e.day
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(s.n AS BIGINT) AS src_rows,
           CAST(coalesce(c.n, 0) AS BIGINT) AS copy_rows,
           CASE WHEN c.day IS NULL THEN 'missing'
                WHEN s.n = c.n AND s.hs = c.hs THEN 'matched'
                ELSE 'diverged' END AS status
    FROM src s LEFT JOIN cpy c ON c.day = s.day
    """,
    doc="partition-level checksum diff: per-day (count, decimal-exact "
    "hash sum) fingerprints full-outer-joined -> matched/diverged/"
    "missing per partition; repair scope = one partition, not the table",
    tags=("analytics", "quality"),
)
def q164_partition_fingerprint_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("tss"),
        F.col("ts").cast("date").alias("day"),
    )
    mx = ev.agg(F.max("day").alias("d1"))
    corrupted = ev.join(F.broadcast(mx)).filter(
        ~((F.col("day") == F.col("d1")) & (F.col("user_id") % 97 == 0))
    )

    def fp(df):
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_row_hash(df).cast("decimal(38,0)")) % F.lit(9223372036854775807))
            .cast("bigint")
            .alias("hs"),
        )

    s = fp(ev)
    c = fp(corrupted).select(
        F.col("day").alias("c_day"), F.col("n").alias("c_n"), F.col("hs").alias("c_hs")
    )
    return s.join(c, s.day == c.c_day, "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("src_rows"),
        F.coalesce("c_n", F.lit(0)).cast("bigint").alias("copy_rows"),
        F.when(F.col("c_day").isNull(), "missing")
        .when((F.col("n") == F.col("c_n")) & (F.col("hs") == F.col("c_hs")), "matched")
        .otherwise("diverged")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# q165 — multi-touch attribution (batch): every purchase distributes
# credit over the SAME USER's clicks in the prior 24 hours under three
# models at once — first-touch, last-touch, linear. The candidate join
# is user-keyed THEN time-banded (equi-join on user_id with the range
# predicate as a residual — never a pure range join over the corpus),
# so its fan-out is each user's own click history inside the window.
# Linear credit 1/n is exact integer micro-units (1e6 div n, remainder
# to the last touch so credits sum EXACTLY to 1e6 per purchase — the
# accounting property auditors actually check); first/last selection is
# a min/max over the candidate set with full-tuple tie-breaks. Output
# is per click-day × model totals (bounded), all integers.

ATTR_WINDOW_H = 24


@register(
    "q165_multitouch_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events
    ),
    p AS (SELECT user_id, t AS pt, vm FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT user_id, t AS ct, vm AS cvm FROM ev WHERE event_type = 'click'),
    cand AS (
      SELECT p.user_id, p.pt, p.vm, c.ct, c.cvm
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ct <= p.pt AND c.ct > p.pt - INTERVAL {ATTR_WINDOW_H} HOUR
    ),
    ranked AS (
      SELECT *,
             count(*) OVER (PARTITION BY user_id, pt, vm) AS n_touch,
             row_number() OVER (PARTITION BY user_id, pt, vm
                                ORDER BY ct, cvm) AS rk_first,
             row_number() OVER (PARTITION BY user_id, pt, vm
                                ORDER BY ct DESC, cvm DESC) AS rk_last
      FROM cand
    ),
    credits AS (
      SELECT CAST(ct AS DATE) AS click_day,
             CASE WHEN rk_first = 1 THEN 1000000 ELSE 0 END AS first_micros,
             CASE WHEN rk_last = 1 THEN 1000000 ELSE 0 END AS last_micros,
             1000000 // n_touch
               + CASE WHEN rk_last = 1 THEN 1000000 % n_touch ELSE 0 END
               AS linear_micros
      FROM ranked
    )
    SELECT strftime(click_day, '%Y-%m-%d') AS click_day,
           CAST(sum(first_micros) AS BIGINT) AS first_touch_micros,
           CAST(sum(last_micros) AS BIGINT) AS last_touch_micros,
           CAST(sum(linear_micros) AS BIGINT) AS linear_micros,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM credits GROUP BY click_day
    """,
    doc="multi-touch attribution: user-keyed 24h candidate join, first/"
    "last/linear credit in exact micro-units (remainder to last touch "
    "so each purchase's credit sums to exactly 1e6)",
    tags=("analytics", "W3", "J1"),
)
def q165_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("t"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t").alias("pt"), "vm"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("t").alias("ct"), F.col("vm").alias("cvm")
    )
    cand = p.join(
        c,
        (F.col("c_uid") == F.col("user_id"))
        & (F.col("ct") <= F.col("pt"))
        & (F.col("ct") > F.col("pt") - F.expr(f"interval {ATTR_WINDOW_H} hours")),
    ).select("user_id", "pt", "vm", "ct", "cvm")
    w_n = Window.partitionBy("user_id", "pt", "vm")
    w_first = w_n.orderBy(F.asc("ct"), F.asc("cvm"))
    w_last = w_n.orderBy(F.desc("ct"), F.desc("cvm"))
    ranked = cand.select(
        "*",
        F.count(F.lit(1)).over(w_n).alias("n_touch"),
        F.row_number().over(w_first).alias("rk_first"),
        F.row_number().over(w_last).alias("rk_last"),
    )
    credits = ranked.select(
        F.col("ct").cast("date").alias("click_day"),
        F.when(F.col("rk_first") == 1, 1000000).otherwise(0).alias("first_micros"),
        F.when(F.col("rk_last") == 1, 1000000).otherwise(0).alias("last_micros"),
        (
            F.expr("1000000 div n_touch")
            + F.when(F.col("rk_last") == 1, F.expr("1000000 % n_touch")).otherwise(0)
        ).alias("linear_micros"),
    )
    return credits.groupBy("click_day").agg(
        F.sum("first_micros").cast("bigint").alias("first_touch_micros"),
        F.sum("last_micros").cast("bigint").alias("last_touch_micros"),
        F.sum("linear_micros").cast("bigint").alias("linear_micros"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
    ).select(
        F.date_format("click_day", "yyyy-MM-dd").alias("click_day"),
        "first_touch_micros", "last_touch_micros", "linear_micros", "n_touches",
    )


# ---------------------------------------------------------------------------
# q166 — cohort LTV curves: users cohorted by first-activity day; each
# cohort's purchase value accumulates over days-since-signup. The heavy
# pass is two partial-agg shuffles (first-day per user, then per
# (cohort, age) value mass); the cumulative LTV window runs over the
# bounded (cohort × age) grid — days², metadata-sized at any event
# volume. Per-user average rides along as exact micro-units per user.

@register(
    "q166_cohort_ltv",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events
    ),
    signup AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
    csize AS (SELECT cohort, count(*) AS n_users FROM signup GROUP BY cohort),
    mass AS (
      SELECT s.cohort, date_diff('day', s.cohort, e.day) AS age,
             sum(CASE WHEN e.event_type = 'purchase' THEN e.vm ELSE 0 END) AS v
      FROM ev e JOIN signup s USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(m.cohort, '%Y-%m-%d') AS cohort,
           CAST(m.age AS BIGINT) AS age_days,
           CAST(c.n_users AS BIGINT) AS n_users,
           CAST(sum(m.v) OVER (PARTITION BY m.cohort ORDER BY m.age
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_value_millis,
           CAST(sum(m.v) OVER (PARTITION BY m.cohort ORDER BY m.age
                               ROWS UNBOUNDED PRECEDING) * 1000 // c.n_users
                AS BIGINT) AS ltv_micros_per_user
    FROM mass m JOIN csize c USING (cohort)
    """,
    doc="cohort LTV curves: first-day cohorts, cumulative purchase value "
    "over days-since-signup; cumulative window over the bounded "
    "(cohort x age) grid, per-user LTV in integer micro-units",
    tags=("analytics", "W3", "A4"),
)
def q166_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
    )
    signup = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    csize = signup.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    mass = (
        ev.join(signup, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").alias("age"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("vm")).otherwise(0)
            ).alias("v")
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        mass.join(F.broadcast(csize), "cohort")
        .select(
            "cohort",
            F.col("age").cast("bigint").alias("age_days"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.sum("v").over(w).cast("bigint").alias("cum_value_millis"),
            F.expr(
                "cast((sum(v) over (partition by cohort order by age "
                "rows between unbounded preceding and current row)) * 1000 "
                "div n_users as bigint)"
            ).alias("ltv_micros_per_user"),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "age_days",
            "n_users",
            "cum_value_millis",
            "ltv_micros_per_user",
        )
    )


# ---------------------------------------------------------------------------
# q167 — event-rate anomaly flags: each (event_type, hour) bucket
# compared against its own trailing 24-hour mean — the ops-monitoring
# gate that pages before a partner integration silently floods or goes
# dark. Counting happens once on the raw scan (one partial-agg shuffle
# to the bounded (type × hour) grid); the trailing mean is a 24-row
# window over that grid, and the 2x threshold compares integers
# cross-multiplied (cnt * trailing_n > 2 * trailing_sum) so no division
# ever happens — exact at any scale, and the grid is metadata-sized.

ANOM_TRAIL_H = 24


@register(
    "q167_rate_anomaly",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, h, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY h
                            ROWS BETWEEN {ANOM_TRAIL_H} PRECEDING AND 1 PRECEDING)
               AS trail_sum,
             count(*) OVER (PARTITION BY event_type ORDER BY h
                            ROWS BETWEEN {ANOM_TRAIL_H} PRECEDING AND 1 PRECEDING)
               AS trail_n
      FROM b
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(coalesce(trail_sum, 0) AS BIGINT) AS trail_sum,
           CAST(trail_n AS BIGINT) AS trail_n,
           (trail_n > 0 AND cnt * trail_n > 2 * trail_sum) AS spike,
           (trail_n > 0 AND 2 * cnt * trail_n < trail_sum) AS drop
    FROM w
    """,
    doc="hourly event-rate anomaly flags vs trailing-24h mean: bounded "
    "(type x hour) grid, cross-multiplied integer threshold (no "
    "division), 24-row trailing windows over the grid only",
    tags=("analytics", "W3", "quality"),
)
def q167_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-ANOM_TRAIL_H, -1)
    )
    g = b.select(
        "event_type",
        "h",
        "cnt",
        F.sum("cnt").over(w).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return g.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.col("cnt").cast("bigint"),
        F.coalesce("trail_sum", F.lit(0)).cast("bigint").alias("trail_sum"),
        F.col("trail_n").cast("bigint").alias("trail_n"),
        (
            (F.col("trail_n") > 0)
            & (F.col("cnt") * F.col("trail_n") > 2 * F.coalesce("trail_sum", F.lit(0)))
        ).alias("spike"),
        (
            (F.col("trail_n") > 0)
            & (2 * F.col("cnt") * F.col("trail_n") < F.coalesce("trail_sum", F.lit(0)))
        ).alias("drop"),
    )


# ---------------------------------------------------------------------------
# q168 — association rules over daily event baskets (market-basket
# analysis): which event types co-occur in the same user-day beyond
# chance? Baskets are (user, day) distinct-type sets; the pair join is
# basket-keyed so fan-out is C(|types in basket|, 2) ≤ C(5,2) — never a
# corpus-level pair explosion (the same inverted-index discipline as
# q23). support / confidence(A→B and B→A) / lift all land as integer
# micro-units via exact cross-multiplied divisions — counts never pass
# through a float. The contingency domain is |types|² rows.

@register(
    "q168_basket_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             event_type
      FROM events
    ),
    nb AS (SELECT count(DISTINCT (user_id, day)) AS n_baskets FROM b),
    tc AS (SELECT event_type, count(*) AS n FROM b GROUP BY event_type),
    pc AS (
      SELECT a.event_type AS type_a, c.event_type AS type_b, count(*) AS n_ab
      FROM b a JOIN b c
        ON c.user_id = a.user_id AND c.day = a.day
       AND a.event_type < c.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
           CAST(p.n_ab * 1000000 // nb.n_baskets AS BIGINT) AS support_micros,
           CAST(p.n_ab * 1000000 // ta.n AS BIGINT) AS conf_a_to_b_micros,
           CAST(p.n_ab * 1000000 // tb.n AS BIGINT) AS conf_b_to_a_micros,
           CAST(p.n_ab * nb.n_baskets * 1000000 // (ta.n * tb.n) AS BIGINT)
             AS lift_micros
    FROM pc p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b
    CROSS JOIN nb
    """,
    doc="market-basket rules over (user, day) event baskets: basket-"
    "keyed pair join (bounded fan-out), support/confidence/lift as "
    "exact integer micro-units",
    tags=("analytics", "A4", "J1"),
)
def q168_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    b = ev.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    nb = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    tc = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, c = b.alias("a"), b.alias("c")
    pc = (
        a.join(
            c,
            (F.col("c.user_id") == F.col("a.user_id"))
            & (F.col("c.day") == F.col("a.day"))
            & (F.col("a.event_type") < F.col("c.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("c.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pc.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .join(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint"),
            F.col("n_a").cast("bigint"),
            F.col("n_b").cast("bigint"),
            F.expr("n_ab * 1000000 div n_baskets").cast("bigint").alias(
                "support_micros"
            ),
            F.expr("n_ab * 1000000 div n_a").cast("bigint").alias(
                "conf_a_to_b_micros"
            ),
            F.expr("n_ab * 1000000 div n_b").cast("bigint").alias(
                "conf_b_to_a_micros"
            ),
            F.expr("n_ab * n_baskets * 1000000 div (n_a * n_b)")
            .cast("bigint")
            .alias("lift_micros"),
        )
    )


# ---------------------------------------------------------------------------
# q169 — inter-arrival time histogram: the burstiness profile of the
# event stream (bot vs human traffic, session-gap calibration for q59/
# q120's 30-minute threshold). Per-user consecutive gaps via the same
# full-tuple-ordered lag as q147; gaps bucket into LOG2 bins computed
# exactly as bitlength(seconds) via bin() string length — the q135
# integer-log trick again, so bin edges are powers of two and no float
# or log() ever runs. Histogram domain ≤ 64 rows; the lag window is
# user-partitioned.

@register(
    "q169_interarrival_histogram",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm,
             CAST(ts AS TIMESTAMP) AS t
      FROM events
    ),
    gaps AS (
      SELECT CAST(date_diff('second',
               lag(t) OVER (PARTITION BY user_id ORDER BY t, event_type, vm),
               t) AS BIGINT) AS gap_s
      FROM s
    ),
    binned AS (
      SELECT CASE WHEN gap_s <= 0 THEN 0
                  ELSE length(bin(gap_s)) END AS bucket,
             gap_s
      FROM gaps WHERE gap_s IS NOT NULL
    )
    SELECT CAST(bucket AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s,
           CAST(sum(gap_s) AS BIGINT) AS total_gap_s
    FROM binned GROUP BY bucket
    """,
    doc="inter-arrival gap histogram in exact log2 (bitlength) buckets: "
    "user-partitioned lag, <= 64-row bounded histogram, no float/log()",
    tags=("analytics", "W3", "A4"),
)
def q169_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.col("ts").cast("timestamp").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_type", "vm")
    gaps = ev.select(
        (
            F.unix_timestamp("t") - F.unix_timestamp(F.lag("t").over(w))
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    binned = gaps.select(
        F.when(F.col("gap_s") <= 0, F.lit(0))
        .otherwise(F.length(F.bin("gap_s")))
        .alias("bucket"),
        "gap_s",
    )
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum("gap_s").cast("bigint").alias("total_gap_s"),
    ).select(
        F.col("bucket").cast("bigint").alias("log2_bucket"),
        "n_gaps", "min_gap_s", "max_gap_s", "total_gap_s",
    )


# ---------------------------------------------------------------------------
# q172 — Benford first-digit audit: the classic anomaly screen for
# financial columns (fabricated numbers rarely follow Benford's law).
# The observed side is exact integer counting (first significant digit
# of floor(o_totalprice)); the EXPECTED side is log10(1 + 1/d), which
# is NOT cross-engine-reproducible as a float computation — so the
# expected shares are a fixed literal table in integer micro-units,
# identical text in both engines.  The divergence stat is the integer
# chi-square numerator Σ (obs_u - exp_u)² div exp_u over per-digit
# micro-unit shares.  One map + one 9-row aggregate; scan-bandwidth
# bound at any scale.

# log10(1 + 1/d) in micro-units, d = 1..9 (rounded to integer micros —
# a shared CONSTANT, not a computed float).
BENFORD_MICROS = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_values_sql() -> str:
    return ", ".join(f"({d}, {m})" for d, m in BENFORD_MICROS.items())


@register(
    "q172_benford_audit",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n
      FROM orders
      WHERE o_totalprice >= 1.0
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
    exp AS (SELECT * FROM (VALUES {_benford_values_sql()}) AS t(digit, exp_micros))
    SELECT CAST(e.digit AS BIGINT) AS digit,
           COALESCE(CAST(o.n AS BIGINT), 0) AS n_orders,
           CAST(COALESCE(o.n, 0) * 1000000 // t.total AS BIGINT) AS obs_micros,
           CAST(e.exp_micros AS BIGINT) AS exp_micros,
           CAST((COALESCE(o.n, 0) * 1000000 // t.total - e.exp_micros)
                * (COALESCE(o.n, 0) * 1000000 // t.total - e.exp_micros)
                // e.exp_micros AS BIGINT) AS chi2_term_micros
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot t
    """,
    doc="Benford first-digit audit: exact integer digit counts vs a "
    "literal expected-share table; integer chi-square terms; map + "
    "9-row aggregate",
    tags=("analytics", "A4", "F15"),
)
def q172_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    obs = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    exp = spark.createDataFrame(
        [(d, m) for d, m in BENFORD_MICROS.items()], "digit bigint, exp_micros bigint"
    )
    j = (
        exp.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.expr("coalesce(n, 0) * 1000000 div total").alias("om"),
            F.col("exp_micros").cast("bigint"),
        )
    )
    return j.select(
        "digit",
        "n_orders",
        F.col("om").cast("bigint").alias("obs_micros"),
        "exp_micros",
        F.expr("(om - exp_micros) * (om - exp_micros) div exp_micros")
        .cast("bigint")
        .alias("chi2_term_micros"),
    )


# ---------------------------------------------------------------------------
# q174 — lag-7 autocorrelation of daily event volume: the weekly-
# seasonality detector for traffic series.  Daily counts are exact
# integers; the lagged pairing is a SELF-JOIN on day = day+7 (no
# window, no global sort — the day spine is tiny and the join
# broadcasts); Pearson r comes out of the integer moment sums
# (n·Σxy − Σx·Σy over sqrt-products), so the only floating point is
# two correctly-rounded sqrts, one multiply, one divide — identical
# IEEE operations in both engines.

@register(
    "q174_lag7_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.n AS x, b.n AS y
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 7 DAY
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT n_pairs, sx, sy, sxy, sxx, syy,
           CAST(n_pairs * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS r_lag7
    FROM m
    """,
    doc="lag-7 autocorrelation of daily event counts: integer moment "
    "sums via a 7-day self-join on the day spine; floats limited to "
    "two exact sqrts and one division",
    tags=("analytics", "W3", "A4"),
)
def q174_lag7_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    daily = (
        ev.select(F.col("ts").cast("timestamp").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("n").alias("x"))
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("y"))
    pairs = a.join(
        F.broadcast(b), F.col("day_b") == F.date_add(F.col("day_a"), 7)
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "n_pairs", "sx", "sy", "sxy", "sxx", "syy", (num / den).alias("r_lag7")
    )


# ---------------------------------------------------------------------------
# q176 — incremental JOIN-view maintenance (delta-join algebra): the
# materialized view V = orders ⋈ lineitem is kept current under inserts
# to BOTH base tables without recomputing it.  The view delta is the
# standard trilinear rule  ΔV = ΔO⋈L₀ ∪ O₀⋈ΔL ∪ ΔO⋈ΔL — each term
# touches at most one full base table, so maintenance cost scales with
# the DELTA (×join fan-out), not the view.  q90 maintains an AGGREGATE
# incrementally; this maintains a JOIN, the other half of IVM.  The
# oracle recomputes from first principles — full join, keep rows that
# are NOT old⋈old — so the three-term algebra is verified, not assumed.
# "New" rows: orders with o_orderkey % 10 = 7, lineitems with
# l_linenumber % 4 = 2 (independent splits → all three terms non-empty).
# Output is the per-(term, priority) rollup in exact decimal millis.

@register(
    "q176_delta_join_view",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             (o_orderkey % 10 = 7) AS o_new
      FROM orders
    ),
    l AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))
                        * 1000) AS BIGINT) AS rev_millis,
             (l_linenumber % 4 = 2) AS l_new
      FROM lineitem
    ),
    delta AS (
      SELECT CASE WHEN o_new AND l_new THEN 'delta_delta'
                  WHEN o_new THEN 'new_orders'
                  ELSE 'new_lines' END AS term,
             o.o_orderpriority, l.rev_millis
      FROM o JOIN l ON l.l_orderkey = o.o_orderkey
      WHERE o_new OR l_new
    )
    SELECT term, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(rev_millis) AS BIGINT) AS revenue_millis
    FROM delta GROUP BY term, o_orderpriority
    """,
    doc="incremental JOIN-view maintenance: trilinear delta rule "
    "(dO*L0 + O0*dL + dO*dL) vs a full-recompute oracle; cost scales "
    "with the delta, not the view",
    tags=("analytics", "J1", "A4"),
)
def q176_delta_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderkey") % 10 == 7).alias("o_new"),
    )
    rev_millis = (
        (dec("l_extendedprice") * (one() - dec("l_discount", 4)) * F.lit(1000))
        .cast("bigint")
    )
    l = t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        rev_millis.alias("rev_millis"),
        (F.col("l_linenumber") % 4 == 2).alias("l_new"),
    )
    o0, do_ = o.filter(~F.col("o_new")), o.filter(F.col("o_new"))
    l0, dl = l.filter(~F.col("l_new")), l.filter(F.col("l_new"))
    join_on = F.col("l_orderkey") == F.col("o_orderkey")
    # the three IVM terms — each join prunes at least one side to the
    # delta before shuffling; at scale each is delta-sized work.
    terms = (
        do_.join(l0, join_on).select(
            F.lit("new_orders").alias("term"), "o_orderpriority", "rev_millis"
        )
        .unionByName(
            o0.join(dl, join_on).select(
                F.lit("new_lines").alias("term"), "o_orderpriority", "rev_millis"
            )
        )
        .unionByName(
            do_.join(dl, join_on).select(
                F.lit("delta_delta").alias("term"), "o_orderpriority", "rev_millis"
            )
        )
    )
    return terms.groupBy("term", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("rev_millis").cast("bigint").alias("revenue_millis"),
    )


# ---------------------------------------------------------------------------
# q177-q180 — the correlated-subquery OLAP family (TPC-H Q11/Q22/Q20/Q21
# shapes, adapted to this star schema).  The DuckDB oracles are written
# as literally CORRELATED subqueries — the semantic gold standard — while
# the Spark plans are the DECORRELATED forms a 100 TB engine must run:
# broadcast scalar joins, groupBy-then-join-back, semi/anti self-joins.
# Every threshold comparison is integer cross-multiplication
# (a > total×f  ⇔  a_cents×K > total_cents×(K·f)) so no float division
# ever decides a row's membership.


# q177 — global-share threshold (Q11 shape): parts whose revenue exceeds
# 0.05% of TOTAL revenue. Decorrelation: the scalar total is ONE
# broadcast row; the per-part aggregate is one shuffle; membership is
# sum_cents * 2000 > total_cents (0.05% = 1/2000) — exact integers.

@register(
    "q177_part_value_share",
    oracle="""
    WITH lc AS (
      SELECT l_partkey,
             CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2))) * 100)
                  AS BIGINT) AS rev_cents
      FROM lineitem
    )
    SELECT l_partkey AS partkey,
           CAST(sum(rev_cents) AS BIGINT) AS part_rev_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lc
    GROUP BY l_partkey
    HAVING sum(rev_cents) * 2000 >
           (SELECT sum(rev_cents) FROM lc)
    """,
    doc="Q11-shape global-share threshold: per-part revenue vs 0.05% of "
    "the corpus total; broadcast scalar + integer cross-multiply "
    "(decorrelated HAVING-vs-global-subquery)",
    tags=("analytics", "A4", "J1"),
)
def q177_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    rev_cents = (
        (dec("l_extendedprice") * (one() - dec("l_discount", 4)) * F.lit(100))
        .cast("bigint")
    )
    lc = li.select(F.col("l_partkey"), rev_cents.alias("rev_cents"))
    per_part = lc.groupBy("l_partkey").agg(
        F.sum("rev_cents").cast("bigint").alias("part_rev_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    total = per_part.agg(
        F.sum("part_rev_cents").cast("bigint").alias("total_cents")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev_cents") * 2000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"), "part_rev_cents", "n_lines"
        )
    )


# q178 — above-average + no-orders (Q22 shape): customers with account
# balance above the average POSITIVE balance who have never ordered,
# rolled up by nation. Decorrelation: the avg-subquery becomes one
# broadcast (sum, count) row with membership bal_cents·n > sum_cents
# (exact — no division); NOT EXISTS becomes a left-anti join.

@register(
    "q178_dormant_rich_customers",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) * 100)
                         AS BIGINT)) AS BIGINT) AS total_bal_cents
    FROM customer c
    WHERE CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
            * (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
          > (SELECT sum(CAST(floor(CAST(c2.c_acctbal AS DECIMAL(12,2)) * 100)
                             AS BIGINT))
             FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    doc="Q22-shape: above-average-balance customers with no orders, by "
    "nation; avg-subquery -> broadcast (sum,n) + integer cross-multiply, "
    "NOT EXISTS -> left-anti join",
    tags=("analytics", "A4", "P7"),
)
def q178_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t["customer"].select(
        "c_custkey",
        "c_nationkey",
        (dec("c_acctbal") * F.lit(100)).cast("bigint").alias("bal_cents"),
        (F.col("c_acctbal") > 0.0).alias("positive"),
    )
    thresh = cust.filter("positive").agg(
        F.sum("bal_cents").cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
    )
    rich = (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
    )
    dormant = rich.join(
        t["orders"].select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return dormant.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
    )


# q179 — per-group dominance (Q20 shape): (supplier, part) pairs whose
# unit share of the part exceeds TWICE the fair share 1/n_suppliers —
# i.e. suppliers over-concentrating a part's flow. The correlated
# "qty × (SELECT count(DISTINCT supp) … same part) > 2 × (SELECT sum …
# same part)" pair decorrelates into ONE per-part aggregate
# (part_units, n_suppliers) joined back on partkey; the threshold is
# pure integer cross-multiplication. (A fixed >50% cut is degenerate
# here — parts average ~10 suppliers, so no share reaches it.)

@register(
    "q179_dominant_part_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS pair_units
      FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey AS suppkey, l_partkey AS partkey, pair_units,
           (SELECT CAST(sum(CAST(floor(l2.l_quantity) AS BIGINT)) AS BIGINT)
            FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey) AS part_units,
           (SELECT CAST(count(DISTINCT l2.l_suppkey) AS BIGINT)
            FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey) AS n_suppliers
    FROM sp
    WHERE pair_units *
          (SELECT count(DISTINCT l2.l_suppkey)
           FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey) >
          2 * (SELECT sum(CAST(floor(l2.l_quantity) AS BIGINT))
               FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey)
    """,
    doc="Q20-shape per-group dominance: (supplier, part) pairs with unit "
    "share > 2x the fair share 1/n_suppliers; three correlated subqueries "
    "decorrelated to ONE groupBy(part) + join-back, integer cross-multiply",
    tags=("analytics", "A4", "J1"),
)
def q179_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_suppkey",
        "l_partkey",
        F.floor("l_quantity").cast("bigint").alias("units"),
    )
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("units").cast("bigint").alias("pair_units")
    )
    part = li.groupBy("l_partkey").agg(
        F.sum("units").cast("bigint").alias("part_units"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
    )
    return (
        pair.join(part, "l_partkey")
        .filter(
            F.col("pair_units") * F.col("n_suppliers") > 2 * F.col("part_units")
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
            "pair_units",
            "part_units",
            "n_suppliers",
        )
    )


# q180 — sole-supplier orders (Q21 shape): for each supplier, how many
# multi-line orders they supplied ALONE. The EXISTS(same order, same
# supplier, other line) / NOT EXISTS(same order, OTHER supplier) pair
# decorrelates into one per-order aggregate (n_lines, n_suppliers,
# min_supplier) — a single shuffle on orderkey, no self-join at all —
# followed by a supplier-keyed count. The oracle keeps the literal
# correlated EXISTS/NOT EXISTS formulation.

@register(
    "q180_sole_supplier_orders",
    oracle="""
    WITH sole AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l.l_orderkey
                      AND l2.l_linenumber <> l.l_linenumber)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l.l_orderkey
                          AND l3.l_suppkey <> l.l_suppkey)
    )
    SELECT l_suppkey AS suppkey,
           CAST(count(*) AS BIGINT) AS n_sole_orders
    FROM sole GROUP BY l_suppkey
    """,
    doc="Q21-shape sole-supplier orders: EXISTS/NOT-EXISTS pair "
    "decorrelated to ONE per-order aggregate (n_lines, n_suppliers) — "
    "no self-join; supplier rollup after",
    tags=("analytics", "A4", "A3"),
)
def q180_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_linenumber"
    )
    # "exists another line with a DIFFERENT linenumber" == the order has
    # >= 2 distinct linenumbers (synthetic data has duplicate
    # linenumbers, so count(*) >= 2 would over-admit).
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_linenos"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.min("l_suppkey").alias("the_supplier"),
    )
    sole = per_order.filter(
        (F.col("n_linenos") >= 2) & (F.col("n_suppliers") == 1)
    )
    return sole.groupBy(F.col("the_supplier").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sole_orders")
    )


# ---------------------------------------------------------------------------
# q182 — join-key skew profiler: the diagnostic that decides WHEN the
# repo's skew operators (q54 salted join, q113 two-stage agg) are
# needed.  Per-key row counts collapse into a log2 (bitlength)
# histogram — the q169 integer-log trick, so the profile is ≤ 64 rows
# and exactly reproducible — and each bucket carries the hottest key's
# row count plus the SALT FACTOR ceil(max_rows / TARGET) a salted
# repartition would need to cap per-task fan-in at TARGET rows.  Two
# shuffles total: keys (partial-agg collapsed map-side), then the
# bounded histogram.

SKEW_TARGET_ROWS = 1000  # per-task fan-in budget the salt must restore


@register(
    "q182_key_skew_profile",
    oracle=f"""
    WITH per_key AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(length(bin(n)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           CAST((max(n) + {SKEW_TARGET_ROWS} - 1) // {SKEW_TARGET_ROWS}
                AS BIGINT) AS salt_factor
    FROM per_key GROUP BY 1
    """,
    doc="join-key skew profiler: per-key counts -> exact log2 histogram "
    f"(<= 64 rows) with per-bucket hottest key and the salt factor that "
    f"restores a {SKEW_TARGET_ROWS}-row per-task budget",
    tags=("analytics", "A4", "skew"),
)
def q182_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_key.groupBy(F.length(F.bin("n")).cast("bigint").alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_key_rows"),
        )
        .select(
            "log2_bucket",
            "n_keys",
            "total_rows",
            "max_key_rows",
            F.expr(
                f"(max_key_rows + {SKEW_TARGET_ROWS} - 1) div {SKEW_TARGET_ROWS}"
            )
            .cast("bigint")
            .alias("salt_factor"),
        )
    )


# ---------------------------------------------------------------------------
# q183 — time-weighted average value (TWAP) per user: the correct
# average for IRREGULARLY sampled series (plain avg over-weights bursts
# — exactly what q169 shows this stream has).  Trapezoidal integration
# in pure integers: each consecutive-event segment contributes
# gap_seconds × (vm_i + vm_{i-1}) to DOUBLE the integral, so the only
# floats are one exact halving and one division at the very end.  The
# lag window partitions BY USER (the q147/q169 full-tuple ordering —
# never a global sort); the rollup is one user-keyed aggregate.

@register(
    "q183_user_twap",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm,
             CAST(ts AS TIMESTAMP) AS t
      FROM events
    ),
    seg AS (
      SELECT user_id,
             CAST(date_diff('second',
               lag(t) OVER (PARTITION BY user_id ORDER BY t, event_type, vm),
               t) AS BIGINT) AS gap_s,
             vm + lag(vm) OVER (PARTITION BY user_id
                                ORDER BY t, event_type, vm) AS vm2
      FROM s
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(gap_s) AS BIGINT) AS total_seconds,
           CAST(sum(gap_s * vm2) AS BIGINT) AS integral_2x_millis,
           CAST(sum(gap_s * vm2) AS DOUBLE) / (2 * sum(gap_s)) AS twap_millis
    FROM seg
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    HAVING sum(gap_s) > 0
    """,
    doc="time-weighted average (trapezoid) per user over irregular "
    "events: integer segment integrals via user-partitioned lag; floats "
    "only in the final halving+division",
    tags=("analytics", "W3", "A4"),
)
def q183_user_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.col("ts").cast("timestamp").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_type", "vm")
    seg = ev.select(
        "user_id",
        (F.unix_timestamp("t") - F.unix_timestamp(F.lag("t").over(w))).alias(
            "gap_s"
        ),
        (F.col("vm") + F.lag("vm").over(w)).alias("vm2"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("gap_s").cast("bigint").alias("total_seconds"),
            F.sum(F.col("gap_s") * F.col("vm2")).cast("bigint").alias(
                "integral_2x_millis"
            ),
        )
        .filter(F.col("total_seconds") > 0)
        .select(
            "user_id",
            "n_segments",
            "total_seconds",
            "integral_2x_millis",
            (
                F.col("integral_2x_millis").cast("double")
                / (F.lit(2) * F.col("total_seconds"))
            ).alias("twap_millis"),
        )
    )


# ---------------------------------------------------------------------------
# q187 — declarative data-quality expectations (the Deequ/"expectations
# suite" pattern): a fixed contract of constraints — key uniqueness,
# referential integrity, domain membership, value bounds, completeness
# — evaluated as ONE conditional aggregate per table plus one anti-join
# for the RI probe, never a pass per rule.  Each row is a verdict:
# (constraint, checked_rows, violations, pass).  At 100 TB this is the
# pre-publish gate in front of q150's write-audit-publish promotion;
# every check is exact integer counting, the aggregate work is
# map-side, and the only shuffle is the RI anti-join on the key.

EVENT_TYPE_DOMAIN = ["click", "error", "purchase", "signup", "view"]


@register(
    "q187_quality_expectations",
    oracle=f"""
    SELECT 'customer_key_unique' AS constraint,
           CAST(count(*) AS BIGINT) AS checked_rows,
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS violations,
           count(*) = count(DISTINCT c_custkey) AS pass
    FROM customer
    UNION ALL
    SELECT 'orders_custkey_ri',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) = 0
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_quantity_bounds',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_quantity IS NULL
                          OR l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN l_quantity IS NULL
                     OR l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'orders_totalprice_complete',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'events_type_in_domain',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN NOT list_contains({EVENT_TYPE_DOMAIN!r},
                                                event_type)
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN NOT list_contains({EVENT_TYPE_DOMAIN!r}, event_type)
                    THEN 1 ELSE 0 END) = 0
    FROM events
    """,
    doc="declarative expectations suite: uniqueness, referential "
    "integrity, bounds, completeness, domain membership — one "
    "conditional aggregate per table + one RI anti-join, verdict rows",
    tags=("analytics", "A4", "P7", "governance"),
)
def q187_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "events"])

    def verdict(name, checked, violations):
        return F.struct(
            F.lit(name).alias("constraint"),
            checked.cast("bigint").alias("checked_rows"),
            violations.cast("bigint").alias("violations"),
            (violations == 0).alias("pass"),
        )

    cust = t["customer"].agg(
        verdict(
            "customer_key_unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("c_custkey"),
        ).alias("v")
    )
    # RI as ONE left-join aggregate (checked = all orders, violations =
    # unmatched) — no separate count() action, no second pass
    orphans = (
        t["orders"]
        .join(
            # distinct build side: a duplicated dim key must not fan
            # out the probe and inflate checked_rows
            t["customer"]
            .select(F.col("c_custkey").alias("o_custkey"))
            .distinct()
            .withColumn("__hit", F.lit(1)),
            "o_custkey",
            "left",
        )
        .agg(
            verdict(
                "orders_custkey_ri",
                F.count(F.lit(1)),
                F.sum(F.col("__hit").isNull().cast("int")),
            ).alias("v")
        )
    )
    bad_qty = (
        F.col("l_quantity").isNull()
        | (F.col("l_quantity") < 1)
        | (F.col("l_quantity") > 50)
    )
    qty = t["lineitem"].agg(
        verdict(
            "lineitem_quantity_bounds",
            F.count(F.lit(1)),
            F.sum(bad_qty.cast("int")),
        ).alias("v")
    )
    price = t["orders"].agg(
        verdict(
            "orders_totalprice_complete",
            F.count(F.lit(1)),
            F.sum(F.col("o_totalprice").isNull().cast("int")),
        ).alias("v")
    )
    dom = t["events"].agg(
        verdict(
            "events_type_in_domain",
            F.count(F.lit(1)),
            F.sum((~F.col("event_type").isin(EVENT_TYPE_DOMAIN)).cast("int")),
        ).alias("v")
    )
    return (
        cust.unionByName(orphans)
        .unionByName(qty)
        .unionByName(price)
        .unionByName(dom)
        .select("v.constraint", "v.checked_rows", "v.violations", "v.pass")
    )


# ---------------------------------------------------------------------------
# q189 — the Spark 4 SQL PIPE syntax (`|>`) through the text entry
# point: the q01 pricing-summary semantics written as a linear dataflow
# (FROM |> WHERE |> EXTEND |> AGGREGATE … GROUP BY |> ORDER BY) instead
# of inside-out SELECT nesting.  Same Catalyst plan as the DataFrame
# form — the pipe operators are pure parser surface — so this pins the
# engine's newest SQL dialect against a standard-SQL oracle.  Exact
# DECIMAL accumulation behind final double casts, as everywhere.

@register(
    "q189_pipe_syntax_pricing",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE)
        AS sum_disc_price,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Spark 4 SQL pipe syntax (|> WHERE / EXTEND / AGGREGATE) via "
    "spark.sql text: q01 semantics as a linear dataflow, standard-SQL "
    "oracle",
    tags=("analytics", "S2", "A4"),
)
def q189_pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sql_text import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> EXTEND CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                  CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                  CAST(l_discount AS DECIMAL(4,2)) AS disc
        |> AGGREGATE
             CAST(sum(qty) AS DOUBLE) AS sum_qty,
             CAST(sum(price) AS DOUBLE) AS sum_base,
             CAST(sum(price * (1 - disc)) AS DOUBLE) AS sum_disc_price,
             CAST(count(*) AS BIGINT) AS count_order
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# q190 — correlated LATERAL subquery through the text entry point: for
# each nation, its highest-value order (full row context, not just the
# max), written as the SQL-standard LATERAL form users port from
# Postgres/DuckDB.  Catalyst DECORRELATES the per-nation dependent
# subquery into a join over a ranked aggregate — the plan a hand
# decorrelation (q56's max+join-back) would build — so this pins both
# the dialect surface AND the decorrelation. Deterministic: the top
# order per nation is unique by (o_totalprice DESC, o_orderkey).

@register(
    "q190_lateral_top_order",
    oracle="""
    SELECT n.n_name, t.o_orderkey AS top_orderkey,
           t.o_totalprice AS top_totalprice,
           CAST(t.o_custkey AS BIGINT) AS top_custkey
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey, o.o_totalprice, o.o_custkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 1
    ) t
    """,
    doc="SQL-standard LATERAL correlated top-1-per-nation via spark.sql "
    "text; Catalyst decorrelates to a ranked join (the q56 shape)",
    tags=("analytics", "S2", "J1", "W1"),
)
def q190_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sql_text import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey AS top_orderkey,
               t.o_totalprice AS top_totalprice,
               CAST(t.o_custkey AS BIGINT) AS top_custkey
        FROM nation n,
        LATERAL (
          SELECT o.o_orderkey, o.o_totalprice, o.o_custkey
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 1
        ) t
        """
    )


# ---------------------------------------------------------------------------
# q191 — A/B experiment readout with deterministic hash assignment: the
# md5-derived user bucket (the dedup modules' cross-engine integer
# idiom) splits users 50/50 into arms at ASSIGNMENT time — stable under
# reprocessing, no stored assignment table — and the readout is exact
# integer accounting: exposures (users with any 'view'), conversions
# (exposed users with a later 'purchase'), per-arm rate and the lift
# delta in micro-units (floored integer division; no float decides
# anything).  One pass over events into a per-user profile, one
# |arms|-row rollup; the "later" constraint uses min-timestamps, not a
# join.

@register(
    "q191_ab_experiment_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
                  AS BIGINT) % 2 AS arm,
             min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
               AS first_purchase
      FROM events GROUP BY 1
    ),
    flags AS (
      SELECT arm,
             CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS exposed,
             CASE WHEN first_view IS NOT NULL AND first_purchase IS NOT NULL
                   AND first_purchase > first_view THEN 1 ELSE 0 END AS converted
      FROM per_user
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(exposed) AS BIGINT) AS n_exposed,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) * 1000000 // sum(exposed) AS BIGINT)
             AS conv_rate_micros
    FROM flags GROUP BY arm
    """,
    doc="A/B readout with deterministic md5 hash assignment: stable "
    "50/50 arms, exposure->conversion ordering via min-timestamps (no "
    "self-join), exact integer micro-unit rates",
    tags=("analytics", "A4", "W3", "experiment"),
)
def q191_ab_experiment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts").cast("timestamp"))
        ).alias("first_view"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("timestamp")
            )
        ).alias("first_purchase"),
    )
    flags = per_user.select(
        "arm",
        F.col("first_view").isNotNull().cast("int").alias("exposed"),
        (
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_view"))
        )
        .cast("int")
        .alias("converted"),
    )
    return (
        flags.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("exposed").cast("bigint").alias("n_exposed"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            F.col("arm").cast("bigint"),
            "n_users",
            "n_exposed",
            "n_converted",
            F.expr("n_converted * 1000000 div n_exposed")
            .cast("bigint")
            .alias("conv_rate_micros"),
        )
    )


# ---------------------------------------------------------------------------
# q192 — funnel time-to-convert histogram: the latency distribution
# between a user's first 'view' and their first LATER 'purchase', in
# the q169 exact log2 (bitlength) buckets.  Completes the funnel
# triptych — q91 counts stage reach, q191 reads out conversion rates,
# this one shows HOW LONG conversion takes — and stays all-integer:
# per-user min-timestamps (one aggregate, no self-join), whole-second
# deltas, bitlength bins, a ≤64-row histogram.

@register(
    "q192_funnel_latency_histogram",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
               AS first_purchase
      FROM events GROUP BY 1
    ),
    delays AS (
      SELECT date_diff('second', first_view, first_purchase) AS delay_s
      FROM per_user
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_view
    )
    SELECT CAST(CASE WHEN delay_s <= 0 THEN 0
                     ELSE length(bin(delay_s)) END AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(delay_s) AS BIGINT) AS min_delay_s,
           CAST(max(delay_s) AS BIGINT) AS max_delay_s
    FROM delays GROUP BY 1
    """,
    doc="funnel time-to-convert (first view -> first later purchase) in "
    "exact log2 buckets: one per-user aggregate, no self-join, <=64-row "
    "histogram",
    tags=("analytics", "W3", "A4", "experiment"),
)
def q192_funnel_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts").cast("timestamp"))
        ).alias("first_view"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("timestamp")
            )
        ).alias("first_purchase"),
    )
    delays = per_user.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).alias("delay_s")
    )
    return (
        delays.select(
            F.when(F.col("delay_s") <= 0, F.lit(0))
            .otherwise(F.length(F.bin("delay_s")))
            .cast("bigint")
            .alias("log2_bucket"),
            "delay_s",
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("delay_s").cast("bigint").alias("min_delay_s"),
            F.max("delay_s").cast("bigint").alias("max_delay_s"),
        )
    )


# ---------------------------------------------------------------------------
# q193 — small-files audit: the operational telemetry that justifies
# q114's compaction — read a fragmented landing zone back WITH
# ``input_file_name()`` and report the rows-per-file histogram.  The
# layout is made SQL-predictable on purpose — see _bucketed_landing for
# why hash-bucketing (not round-robin) is the deterministic construction.
# At scale this query is the health check a table-maintenance service
# runs before scheduling compaction; per-file counting rides the normal
# scan (input_file_name is free metadata, no extra pass).

Q193_FILES = 64


def _bucketed_landing(spark: SparkSession, sf_dir: str, name: str,
                      n_files: int) -> str:
    """Write events as a fragmented landing zone whose file → row-count
    mapping is a pure function of the DATA: rows are bucketed on
    ``event_id % n_files`` and written ``partitionBy`` that bucket after
    a ``repartition`` ON the bucket column, so each bucket lives wholly
    in one task and therefore lands in exactly one file — directory
    ``__b=k`` holds exactly the rows with ``event_id % n_files == k``.

    The previous construction (plain ``repartition(n)``) was round-robin,
    whose global floor/ceil row multiset only holds when the upstream
    scan is a SINGLE split: each Spark task round-robins independently
    from its own pseudorandom start, so at a larger sf (or smaller
    ``maxPartitionBytes``, or under AQE coalescing) the per-file counts
    become split-layout-dependent and no SQL oracle can reproduce them.
    Hash-bucketing removes the dependence on physical split layout — and
    is the more realistic landing shape anyway (micro-batched ingest
    partitioned by key hash).  Returns the landing path."""
    from ..scratch import scratch_dir

    base = scratch_dir(name)
    landing = f"{base}/events_landing"
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    bucketed = ev.withColumn(
        "__b", F.pmod(F.col("event_id"), F.lit(n_files)).cast("int")
    )
    bucketed.repartition(n_files, F.col("__b")).write.partitionBy(
        "__b"
    ).parquet(landing)
    return landing


@register(
    "q193_small_files_audit",
    oracle=f"""
    WITH per_file AS (
      -- ((x % n) + n) % n == Spark pmod(x, n) even for negative ids
      -- (DuckDB % is sign-following); fixtures are non-negative today
      -- but the oracle must not silently diverge if that changes.
      SELECT CAST(count(*) AS BIGINT) AS rows_per_file
      FROM events
      GROUP BY ((event_id % {Q193_FILES}) + {Q193_FILES}) % {Q193_FILES}
    )
    SELECT rows_per_file, CAST(count(*) AS BIGINT) AS n_files
    FROM per_file GROUP BY rows_per_file
    """,
    doc="small-files audit via input_file_name(): rows-per-file "
    "histogram of a hash-bucketed 64-file landing zone; oracle derives "
    "the exact histogram from the bucket-key distribution",
    tags=("analytics", "A4", "layout"),
)
def q193_small_files_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the landing zone is rebuilt on every invocation — the
    # staged-fixture cost is part of this query's runtime by design (it
    # IS the small-files workload under audit)
    landing = _bucketed_landing(spark, sf_dir, "q193_files", Q193_FILES)
    per_file = (
        spark.read.parquet(landing)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows_per_file"))
    )
    return per_file.groupBy("rows_per_file").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files")
    ).select(F.col("rows_per_file").cast("bigint"), "n_files")


# ---------------------------------------------------------------------------
# q194 — NHS-number mod-11 check-digit audit (the reference's U9
# validation domain: its identifiers are NHS ODS/GMP codes and NHS
# numbers).  Candidate 10-digit numbers are synthesized
# deterministically from patient ids (the fixture carries none), then
# validated with the REAL algorithm: weights 10..2 over digits 1-9,
# remainder r = sum mod 11, check digit 11-r (11->0, 10->unissuable).
# Digit extraction is pure integer div/mod — no strings — so both
# engines run bit-identical arithmetic.  Map-only + one 1-row rollup.

def _q194_oracle() -> str:
    from ..sources.fhir import FIXTURES_DIR

    digit_sum = " + ".join(
        f"((nhs // {10 ** (10 - k)}) % 10) * {11 - k}" for k in range(1, 10)
    )
    return f"""
    WITH cand AS (
      SELECT 1000000000 + (CAST(_id AS BIGINT) * 2654435761) % 8999999999 AS nhs
      FROM read_parquet('{FIXTURES_DIR}/patients.parquet')
    ),
    scored AS (
      SELECT nhs, nhs % 10 AS given,
             11 - (({digit_sum}) % 11) AS check_raw
      FROM cand
    ),
    verdicts AS (
      SELECT CASE WHEN check_raw = 10 THEN 'unissuable'
                  WHEN (CASE WHEN check_raw = 11 THEN 0 ELSE check_raw END)
                       = given THEN 'valid'
                  ELSE 'bad_check_digit' END AS verdict
      FROM scored
    )
    SELECT verdict, CAST(count(*) AS BIGINT) AS n
    FROM verdicts GROUP BY verdict
    """


@register(
    "q194_nhs_checksum_audit",
    oracle=_q194_oracle(),
    doc="NHS-number mod-11 check-digit audit: weights 10..2, r=sum%11, "
    "11->0 / 10->unissuable; pure integer div/mod digit extraction, "
    "map-only + 3-row rollup",
    tags=("analytics", "A4", "U9", "governance"),
)
def q194_nhs_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.fhir import load_fhir_tables

    pats = load_fhir_tables(spark, ["patients"])["patients"].select(
        F.col("_id").cast("bigint").alias("pid")
    )
    nhs = (F.lit(1000000000) + (F.col("pid") * F.lit(2654435761)) % F.lit(8999999999)).alias("nhs")
    cand = pats.select(nhs)
    digit_sum = None
    for k in range(1, 10):
        # exact integer div — a double divide-then-cast could misround
        term = (F.expr(f"nhs div {10 ** (10 - k)}") % 10) * F.lit(11 - k)
        digit_sum = term if digit_sum is None else digit_sum + term
    scored = cand.select(
        "nhs",
        (F.col("nhs") % 10).alias("given"),
        (F.lit(11) - (digit_sum % 11)).alias("check_raw"),
    )
    verdict = (
        F.when(F.col("check_raw") == 10, F.lit("unissuable"))
        .when(
            F.when(F.col("check_raw") == 11, F.lit(0)).otherwise(F.col("check_raw"))
            == F.col("given"),
            F.lit("valid"),
        )
        .otherwise(F.lit("bad_check_digit"))
    )
    return (
        scored.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# q195 — interval-union coverage: each event opens a 5-minute exposure
# window; per user, the TOTAL COVERED SECONDS after merging overlaps —
# the ad-exposure / uptime primitive where plain sum(duration)
# double-counts bursts.  The merge is the sort-free-of-global-order
# islands algebra: a window starts a new island iff it begins after the
# running max of prior ends (user-partitioned cumulative max — never a
# global sort), islands then aggregate to [min_start, max_end] spans.
# Everything is whole-second integers; output is per-user coverage plus
# the island count (burstiness).

EXPOSURE_S = 300


@register(
    "q195_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s0,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               + {EXPOSURE_S} AS s1
      FROM events
    ),
    flagged AS (
      SELECT user_id, s0, s1,
             CASE WHEN s0 > coalesce(max(s1) OVER (
                    PARTITION BY user_id ORDER BY s0, event_type, vm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s0, s1,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s0, new_island DESC
               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    spans AS (
      SELECT user_id, island,
             min(s0) AS a, max(s1) AS b
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(b - a) AS BIGINT) AS covered_seconds
    FROM spans GROUP BY user_id
    """,
    doc=f"interval-union coverage per user ({EXPOSURE_S}s exposure "
    "windows): islands via user-partitioned running-max of ends, merged "
    "spans summed exactly — no double counting, no global sort",
    tags=("analytics", "W3", "A4"),
)
def q195_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"].select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vm"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("s0"),
    )
    iv = ev.withColumn("s1", F.col("s0") + EXPOSURE_S)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s0", "event_type", "vm")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s0",
        "s1",
        (
            F.col("s0") > F.coalesce(F.max("s1").over(w_prev), F.lit(-1))
        )
        .cast("int")
        .alias("new_island"),
    )
    # island ids: cumulative sum ordered by (s0, new_island DESC) — ties
    # on s0 put island-openers first, matching the oracle exactly
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s0"), F.col("new_island").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_cum))
    spans = islands.groupBy("user_id", "island").agg(
        F.min("s0").alias("a"), F.max("s1").alias("b")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("b") - F.col("a")).cast("bigint").alias("covered_seconds"),
    )


# ---------------------------------------------------------------------------
# q196 — longest consecutive-day streak per user (the DAU-streak /
# badge primitive): distinct active days collapse into runs with the
# classic day − dense_rank trick — consecutive days share a constant
# difference, so the "anchor" IS the run id; no iteration, no self
# join.  Windows are user-partitioned over DISTINCT DAYS (bounded by
# the calendar, not the event volume); output is the bounded histogram
# of longest-streak lengths across users.

@register(
    "q196_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    runs AS (
      SELECT user_id,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, count(*) AS len FROM runs GROUP BY 1, 2
    ),
    longest AS (
      SELECT user_id, max(len) AS longest_streak FROM streaks GROUP BY 1
    )
    SELECT CAST(longest_streak AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_users
    FROM longest GROUP BY 1
    """,
    doc="longest consecutive-day streak per user via the day - "
    "row_number anchor trick (one pass, no iteration); bounded "
    "streak-length histogram",
    tags=("analytics", "W3", "A4"),
)
def q196_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    days = ev.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = runs.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak")
    )
    return longest.groupBy(
        F.col("longest_streak").cast("bigint").alias("longest_streak")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


# ---------------------------------------------------------------------------
# q197 — decile cumulative-gains curve (the targeting-model eval
# primitive: "the top-scored 10% of users hold X% of conversions").
# The global ranking a naive ntile() needs is NOT materialized, and —
# because per-user sum-scores are near-unique, so the distinct-score
# domain is ≈ |users| — neither is any unpartitioned window:
#   1. count-per-distinct-score (map-side combine collapses users);
#   2. cumulative count via RANGE-sort of the distinct scores +
#      per-partition offsets (the zipWithIndex decomposition): the
#      offsets come from a partition-count frame (≤ shuffle-partition
#      rows, a config bound, not a data bound) folded with a broadcast
#      theta-join, so no window ever sees more than one range
#      partition of scores;
#   3. decile threshold k = max score whose cumulative count reaches
#      k·n/10 (max, NOT min — min collapses every threshold to the
#      global minimum, where cum_c = n qualifies every k);
#   4. thresholds broadcast back, bucket assignment map-side; the
#      final ≤10-row decile cumulative is a broadcast theta-join fold.
# Ties share a bucket by value (deciles are value-defined, so both
# engines agree exactly). Integer micro-unit shares.

@register(
    "q197_decile_gains",
    oracle="""
    WITH score AS (
      SELECT user_id,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS s,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    counts AS (SELECT s, count(*) AS c FROM score GROUP BY s),
    cum AS (
      SELECT s, sum(c) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS cum_c,
             (SELECT count(*) FROM score) AS n
      FROM counts
    ),
    bounds AS (
      SELECT k, max(s) AS thresh
      FROM cum, unnest(range(1, 10)) AS t(k)
      WHERE cum_c * 10 >= k * n
      GROUP BY k
    ),
    bucketed AS (
      SELECT sc.user_id, sc.s, sc.conv,
             1 + (SELECT count(*) FROM bounds b WHERE sc.s < b.thresh)
               AS decile
      FROM score sc
    ),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_converters
      FROM bucketed GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_users, n_converters,
           CAST(sum(n_converters) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) * 1000000
                // (SELECT sum(n_converters) FROM per) AS BIGINT)
             AS cum_conv_share_micros
    FROM per
    """,
    doc="decile cumulative-gains curve: exact value-quantile boundaries "
    "via range-sorted distinct scores + per-partition offsets (no "
    "unpartitioned window anywhere), broadcast thresholds, theta-join "
    "decile cumulative; integer micro-unit shares",
    tags=("analytics", "A4", "W3", "experiment"),
)
def q197_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import materialize

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # materialize the per-user score table ONCE: it feeds three branches
    # (distinct-score counts, the n_total scalar, the bucket assignment)
    # and without a cut point each branch re-aggregates the events scan
    # — the r13 plan audit counted 48 Exchange nodes from the duplicated
    # subtree.  At scale this is one corpus aggregation instead of three.
    score = materialize(
        ev.groupBy("user_id").agg(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("s"),
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("conv"),
        ),
        "q197_score",
    )
    counts = score.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    n_total = score.agg(F.count(F.lit(1)).alias("n"))
    # cumulative count over distinct scores, DESC, WITHOUT a single-
    # partition window: range-sort the distinct scores, then global
    # prefix = per-partition offset + within-partition running sum.
    # The offset fold is a broadcast theta-join over the per-partition
    # count frame (rows ≤ shuffle partitions — a config bound); with
    # unique keys the result is identical wherever the sampled range
    # boundaries fell (same argument as operators/ml.py:_global_rank).
    part = counts.repartitionByRange(F.col("s").desc()).sortWithinPartitions(
        F.col("s").desc()
    )
    # materialize the partition-stamped frame: BOTH the per-partition
    # offset table and the running-sum branch consume it, and re-running
    # the range partitioning per branch would also re-sample boundaries
    # — one cut point makes the shared __pid assignment load-bearing by
    # construction instead of by deterministic-replay argument
    pid = materialize(
        part.withColumn("__pid", F.spark_partition_id()), "q197_pid"
    )
    pc = pid.groupBy("__pid").agg(F.sum("c").alias("__cnt"))
    prior = pc.select(F.col("__pid").alias("__pid2"), F.col("__cnt").alias("__cnt2"))
    offsets = (
        pc.join(F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__offset"))
    )
    w_in = Window.partitionBy("__pid").orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        pid.join(F.broadcast(offsets), "__pid")
        .withColumn("cum_c", F.col("__offset") + F.sum("c").over(w_in))
        .drop("__pid", "__offset")
        .crossJoin(F.broadcast(n_total))
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    # threshold k = MAX qualifying score (the boundary). min() is the
    # classic collapse bug: the global minimum score has cum_c = n, so
    # it qualifies for every k and all nine thresholds coincide.
    bounds = (
        cum.join(F.broadcast(ks), F.col("cum_c") * 10 >= F.col("k") * F.col("n"))
        .groupBy("k")
        .agg(F.max("s").alias("thresh"))
    )
    thresh_arr = bounds.agg(
        F.collect_list("thresh").alias("ts")
    )
    bucketed = score.crossJoin(F.broadcast(thresh_arr)).select(
        "user_id",
        "conv",
        (
            F.lit(1)
            + F.size(F.filter(F.col("ts"), lambda t: F.col("s") < t))
        ).alias("decile"),
    )
    # ≤10 rows, referenced THREE times (itself, the prev fold, the total
    # scalar) — cut here so the bucket-assignment aggregate runs once
    per = materialize(
        bucketed.groupBy("decile").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("conv").cast("bigint").alias("n_converters"),
        ),
        "q197_per",
    )
    total_conv = per.agg(F.sum("n_converters").alias("tc"))
    # ≤10-row cumulative: broadcast theta-join fold, not a window
    prev = per.select(
        F.col("decile").alias("d2"), F.col("n_converters").alias("nc2")
    )
    return (
        per.join(F.broadcast(prev), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_users", "n_converters")
        .agg(F.sum("nc2").alias("cum_conv"))
        .crossJoin(F.broadcast(total_conv))
        .select(
            F.col("decile").cast("bigint"),
            "n_users",
            "n_converters",
            F.expr("cum_conv * 1000000 div tc")
            .cast("bigint")
            .alias("cum_conv_share_micros"),
        )
    )


# ---------------------------------------------------------------------------
# q199 — functional-dependency audit (the data-profiling primitive
# behind key discovery and denormalization checks): for each CLAIMED
# dependency X → Y, count the X-values that map to more than one
# distinct Y — zero violations means the FD holds exactly.  Each claim
# is one two-level aggregate (distinct (X, Y) collapses map-side, then
# a count-per-X); claims over the same table share the scan.  Exact
# integer verdicts, |claims|-row output.

@register(
    "q199_fd_audit",
    oracle="""
    WITH pn AS (
      SELECT p_name AS x, count(DISTINCT p_brand) AS dy,
             count(DISTINCT p_type) AS dt
      FROM part GROUP BY p_name
    ),
    os AS (
      SELECT o_custkey AS x, count(DISTINCT o_orderpriority) AS dy
      FROM orders GROUP BY o_custkey
    )
    SELECT 'p_name->p_brand' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM pn
    UNION ALL
    SELECT 'p_name->p_type', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN dt > 1 THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN dt > 1 THEN 1 ELSE 0 END) = 0
    FROM pn
    UNION ALL
    SELECT 'o_custkey->o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) = 0
    FROM os
    """,
    doc="functional-dependency audit: per claimed X->Y, count LHS "
    "values with >1 distinct RHS (0 == FD holds); shared scans, "
    "two-level aggregates, |claims|-row verdict",
    tags=("analytics", "A4", "governance"),
)
def q199_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part", "orders"])
    pn = t["part"].groupBy("p_name").agg(
        F.countDistinct("p_brand").alias("dy"),
        F.countDistinct("p_type").alias("dt"),
    )
    os_ = t["orders"].groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("dy")
    )

    def verdict(df, name, col):
        viol = F.sum((F.col(col) > 1).cast("int"))
        return df.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
            viol.cast("bigint").alias("n_violating"),
            (viol == 0).alias("holds"),
        )

    return (
        verdict(pn, "p_name->p_brand", "dy")
        .unionByName(verdict(pn, "p_name->p_type", "dt"))
        .unionByName(verdict(os_, "o_custkey->o_orderpriority", "dy"))
    )


# ---------------------------------------------------------------------------
# q203 — k-anonymity audit (the privacy-governance primitive behind
# quasi-identifier release decisions): bucket every customer by the
# quasi-identifier tuple (nation, market segment, account-balance band),
# then report the GROUP-SIZE DISTRIBUTION with an at-risk flag for
# groups smaller than K_ANON — the exact numbers a re-identification
# review asks for ("how many people are in cells smaller than k?").
#
# Scale shape: two keyed aggregates — (QI-tuple) → group size, then
# (group size) → histogram — both with map-side combine; output is
# O(distinct group sizes), never O(rows).  Bands use integer floor
# division so both engines draw identical boundaries.

K_ANON = 5
Q203_BAND = 1000  # acctbal band width in currency units


@register(
    "q203_k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {Q203_BAND}) AS BIGINT) AS bal_band,
             count(*) AS group_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CAST(group_size AS BIGINT) AS group_size,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(group_size * count(*) AS BIGINT) AS n_rows,
           group_size < {K_ANON} AS at_risk
    FROM qi GROUP BY group_size
    """,
    doc=f"k-anonymity audit (k={K_ANON}): quasi-identifier group-size "
    "histogram with at-risk flags; two map-side-combined aggregates, "
    "output bounded by distinct group sizes",
    tags=("analytics", "A4", "governance", "privacy"),
)
def q203_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / Q203_BAND).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    return qi.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups")
    ).select(
        F.col("group_size").cast("bigint"),
        "n_groups",
        (F.col("group_size") * F.col("n_groups")).cast("bigint").alias("n_rows"),
        (F.col("group_size") < K_ANON).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# q210 — Pareto frontier (skyline): the orders no other order dominates
# on (higher value, earlier date) — the classic multi-objective
# shortlist (best-tradeoff suppliers, price/latency frontiers).
#
# The naive definition is a quadratic NOT EXISTS self-join; the
# DISTRIBUTED shape used here is the 2-D skyline reduction:
#   1. collapse to max-price-per-date M(d) — one keyed aggregate
#      (the only per-date candidate that can survive);
#   2. A(d) = max over strictly-earlier dates of M — a cumulative max
#      over the DISTINCT date domain, run as range-sort +
#      per-partition prefix max + broadcast theta-join offsets (the
#      q197 decomposition; no unpartitioned window, no whitelist);
#   3. an order (d, p) is on the frontier iff p == M(d) and p > A(d);
#      equal-(d, p) duplicates all survive (neither strictly dominates).
# Total cost: two keyed aggregates + one broadcast join back to the
# fact rows — linear in data, parallel everywhere.  The ORACLE keeps
# the quadratic NOT EXISTS definition on purpose: both engines must
# agree across two genuinely different algorithms, so a subtle
# dominance-rule bug in the reduction cannot self-confirm.  (That
# costs the oracle O(n²) — ~11s at the sf0.01 driver gate, minutes in
# a full local sf0.1 sweep — a price paid in DuckDB only, once per
# verification run; the Spark side stays linear.)  Prices compared as
# exact integer cents.

@register(
    "q210_pareto_frontier",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders
    )
    SELECT p.o_orderkey, CAST(p.o_orderdate AS DATE) AS o_orderdate, p.pc
    FROM o p
    WHERE NOT EXISTS (
      SELECT 1 FROM o q
      WHERE q.o_orderdate <= p.o_orderdate AND q.pc >= p.pc
        AND (q.o_orderdate < p.o_orderdate OR q.pc > p.pc)
    )
    """,
    doc="2-D Pareto frontier (max value, earliest date) via the linear "
    "skyline reduction (per-date max + decomposed strict-prior "
    "cumulative max); oracle is the quadratic NOT EXISTS definition — "
    "two different algorithms must agree",
    tags=("analytics", "A4", "skyline"),
)
def q210_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("pc"),
    )
    m = o.groupBy("o_orderdate").agg(F.max("pc").alias("m"))
    # strict-prior cumulative max over the distinct-date domain,
    # decomposed: range-sort dates, per-partition prefix max, offsets
    # from a broadcast fold over the per-partition maxima
    part = m.repartitionByRange(F.col("o_orderdate")).sortWithinPartitions(
        "o_orderdate"
    )
    pid = part.withColumn("__pid", F.spark_partition_id())
    pmax = pid.groupBy("__pid").agg(F.max("m").alias("__pm"))
    prior = pmax.select(F.col("__pid").alias("__pid2"), F.col("__pm").alias("__pm2"))
    offsets = (
        pmax.join(F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.max("__pm2").alias("__off"))
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_dates = (
        pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "a",
            F.greatest(
                F.coalesce(F.max("m").over(w_in), F.lit(-1)),
                F.coalesce(F.col("__off"), F.lit(-1)),
            ),
        )
        .filter(F.col("m") > F.col("a"))
        .select("o_orderdate", "m")
    )
    fd = frontier_dates.select(
        F.col("o_orderdate").alias("fd_date"), F.col("m").alias("fd_pc")
    )
    return o.join(
        F.broadcast(fd),
        (F.col("o_orderdate") == F.col("fd_date")) & (F.col("pc") == F.col("fd_pc")),
    ).select("o_orderkey", "o_orderdate", "pc")


# ---------------------------------------------------------------------------
# q219 — compaction PLANNER: the other half of q114 (which executes a
# compaction) and q193 (which audits fragmentation).  Given the per-file
# row counts of a fragmented landing zone, emit the bin-pack plan a
# table-maintenance service (Delta OPTIMIZE, Iceberg rewrite_data_files)
# would schedule: files sorted smallest-first, packed greedily by
# running total into output groups of ~target rows.  group_id =
# cumulative_rows_before // target — the classic running-total binning,
# fully deterministic given the sort order.
#
# Scale notes (100 TB): the planner's input is FILE METADATA (one row
# per file — millions of rows for a petabyte table, never data-sized),
# and the running total uses the q197 decomposition: range partition +
# per-partition offsets folded via a broadcast theta-join (rows ≤
# shuffle partitions), zero unpartitioned windows.  The tie-break on
# file path keeps the sort total; since equal-size files are
# interchangeable in a running sum, the group AGGREGATES are
# path-independent — which is why the oracle can reproduce them from
# the per-bucket row counts alone (the landing zone is hash-bucketed on
# event_id, see _bucketed_landing, so each file's count IS a GROUP BY
# over the data — deterministic at any upstream split layout).

Q219_FILES = 64
Q219_GROUPS = 16  # target rows per output group = n // 16 + 1


@register(
    "q219_compaction_plan",
    oracle=f"""
    WITH per_file AS (
      -- pmod-equivalent bucketing: matches Spark pmod(event_id, n)
      -- even if event_id goes negative (DuckDB % is sign-following)
      SELECT ((event_id % {Q219_FILES}) + {Q219_FILES}) % {Q219_FILES} AS b,
             count(*) AS rows_per_file
      FROM events
      GROUP BY ((event_id % {Q219_FILES}) + {Q219_FILES}) % {Q219_FILES}
    ),
    params AS (SELECT count(*) // {Q219_GROUPS} + 1 AS t FROM events),
    cum AS (
      SELECT rows_per_file,
             COALESCE(SUM(rows_per_file) OVER (
               ORDER BY rows_per_file, b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM per_file
    )
    SELECT CAST(cum_before // t AS BIGINT) AS group_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(rows_per_file) AS BIGINT) AS total_rows,
           CAST(min(rows_per_file) AS BIGINT) AS min_file_rows,
           CAST(max(rows_per_file) AS BIGINT) AS max_file_rows
    FROM cum, params GROUP BY 1
    """,
    doc="compaction bin-pack planner over file metadata: smallest-first "
    "running-total binning into ~target-row output groups; cumulative "
    "via range-sort + per-partition offsets (metadata-sized, never "
    "data-sized)",
    tags=("layout", "analytics", "A4"),
)
def q219_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    landing = _bucketed_landing(spark, sf_dir, "q219_files", Q219_FILES)
    per_file = (
        spark.read.parquet(landing)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_per_file"))
    )
    # target rows per output group from the zone's total row count
    params = per_file.agg(
        (F.sum("rows_per_file") / Q219_GROUPS).cast("bigint") + 1
    ).toDF("t")

    # running total BEFORE each file: range sort + per-partition offsets
    # (the q197 decomposition — the offset fold is a broadcast theta-join
    # over the per-partition sums, rows ≤ shuffle partitions, so no
    # unpartitioned window anywhere)
    part = per_file.repartitionByRange(
        "rows_per_file", "file"
    ).sortWithinPartitions("rows_per_file", "file")
    pid = part.withColumn("__pid", F.spark_partition_id())
    psums = pid.groupBy("__pid").agg(F.sum("rows_per_file").alias("__psum"))
    prior = psums.select(
        F.col("__pid").alias("__pid2"), F.col("__psum").alias("__psum2")
    )
    offsets = (
        psums.join(F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__psum2"), F.lit(0)).alias("__off"))
    )
    w_in = Window.partitionBy("__pid").orderBy("rows_per_file", "file")
    cum = (
        pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "cum_before",
            F.col("__off")
            + F.coalesce(
                F.sum("rows_per_file").over(
                    w_in.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return (
        cum.crossJoin(F.broadcast(params))
        .select(
            F.expr("cum_before div t").cast("bigint").alias("group_id"),
            "rows_per_file",
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("rows_per_file").cast("bigint").alias("total_rows"),
            F.min("rows_per_file").cast("bigint").alias("min_file_rows"),
            F.max("rows_per_file").cast("bigint").alias("max_file_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q220 — Z-order layout audit: quantize orders onto an 8-bit x 8-bit
# (customer, order-day) grid, interleave the bits into a 16-bit Morton
# key, bucket rows into 256 z-range "files" (z >> 8), and report each
# file's row count and min/max extent in BOTH dimensions plus whether a
# fixed customer-band predicate would have to read it.  This is the
# measurement behind multi-dimensional clustering (Delta ZORDER BY,
# Iceberg sort orders): under a date-linear layout every file spans the
# full customer range, so a customer predicate reads ALL files; under
# z-order the same predicate touches ~sqrt of them — the `touched`
# column makes that skipping ratio auditable.
#
# Determinism: quantization is pure bigint arithmetic against max-key
# bounds folded in via 1-row broadcast; the bit interleave is an
# unrolled <<//&/| expression — the SAME text runs on both engines.
# Scale notes (100 TB): one map-only pass computes z; the single shuffle
# is the 256-key bucket aggregate (map-side combining, bounded output).
# The real write would range-partition on z — the audit proves why.

_Q220_Z = " + ".join(
    f"(((x8 >> {k}) & 1) << {2 * k + 1}) + (((y8 >> {k}) & 1) << {2 * k})"
    for k in range(8)
)
Q220_BAND_LO, Q220_BAND_HI = 64, 96  # x8-band predicate under audit


@register(
    "q220_zorder_layout",
    oracle=f"""
    WITH bounds AS (
      SELECT max(o_custkey) AS maxc,
             max(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)) AS maxd
      FROM orders
    ),
    grid AS (
      SELECT (o_custkey * 256) // (maxc + 1) AS x8,
             (date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) * 256)
               // (maxd + 1) AS y8
      FROM orders, bounds
    ),
    z AS (SELECT x8, y8, ({_Q220_Z}) AS z FROM grid)
    SELECT CAST(z >> 8 AS BIGINT) AS z_file,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(x8) AS BIGINT) AS min_x8,
           CAST(max(x8) AS BIGINT) AS max_x8,
           CAST(min(y8) AS BIGINT) AS min_y8,
           CAST(max(y8) AS BIGINT) AS max_y8,
           CAST(max(x8) >= {Q220_BAND_LO} AND min(x8) < {Q220_BAND_HI}
                AS BOOLEAN) AS touched
    FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) layout audit: 16-bit interleaved (custkey, "
    "order-day) key -> 256 z-range files with per-file extents and "
    "data-skipping `touched` flags for a customer-band predicate",
    tags=("layout", "analytics", "A4"),
)
def q220_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    bounds = orders.agg(
        F.max("o_custkey").alias("maxc"),
        F.max(F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))).alias(
            "maxd"
        ),
    )
    grid = (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.expr("(o_custkey * 256) div (maxc + 1)").alias("x8"),
            F.expr(
                "(datediff(o_orderdate, date'1992-01-01') * 256) div (maxd + 1)"
            ).alias("y8"),
        )
    )
    z = grid.select("x8", "y8", F.expr(_Q220_Z).alias("z"))
    return (
        z.groupBy(F.expr("z >> 8").cast("bigint").alias("z_file"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x8").cast("bigint").alias("min_x8"),
            F.max("x8").cast("bigint").alias("max_x8"),
            F.min("y8").cast("bigint").alias("min_y8"),
            F.max("y8").cast("bigint").alias("max_y8"),
        )
        .select(
            "z_file",
            "n_rows",
            "min_x8",
            "max_x8",
            "min_y8",
            "max_y8",
            (
                (F.col("max_x8") >= Q220_BAND_LO)
                & (F.col("min_x8") < Q220_BAND_HI)
            ).alias("touched"),
        )
    )


# ---------------------------------------------------------------------------
# q227 — CUPED variance-reduced experiment readout: the industry-standard
# pre-period covariate adjustment (Deng et al., WSDM'13).  Each user's
# pre-period spend X (all events before the split instant) predicts
# their post-period purchase spend Y; the pooled regression coefficient
# theta = cov(X,Y)/var(X) is computed ONCE from global sufficient
# statistics, and each arm's adjusted mean is
#   mean(Y|arm) - theta * (mean(X|arm) - mean(X)).
# Everything upstream of the 2-row arm table is exact integer
# accounting: per-event milli-units, per-user bigint sums, sufficient
# statistics (n, Sx, Sy, Sxy, Sxx, Syy) accumulated as DECIMAL(38,0) so
# the map-side combine never overflows at 1e9-user scale; the scalar
# theta / rho^2 math runs on the resulting exact integers through ONE
# shared IEEE-double expression text in both engines, micro-quantized
# with floor().  Scale shape: one per-user shuffle (map-side combinable),
# a 2-row arm rollup, a 1-row global rollup broadcast back — no second
# pass over the data, no per-user adjustment materialized.

_Q227_SPLIT = "2024-01-16 00:00:00"

_Q227_SCALARS = """
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_num,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_num,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_num
"""


@register(
    "q227_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
                  AS BIGINT) % 2 AS arm,
             COALESCE(sum(CASE WHEN ts < TIMESTAMP '{_Q227_SPLIT}'
                  THEN CAST(floor(value * 1000) AS BIGINT) END), 0) AS x,
             COALESCE(sum(CASE WHEN ts >= TIMESTAMP '{_Q227_SPLIT}'
                       AND event_type = 'purchase'
                  THEN CAST(floor(value * 1000) AS BIGINT) END), 0) AS y
      FROM events GROUP BY 1
    ),
    arm_stats AS (
      SELECT arm,
             CAST(count(*) AS DECIMAL(38,0)) AS n_a,
             CAST(sum(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx_a,
             CAST(sum(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy_a,
             CAST(sum(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sxy_a,
             CAST(sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sxx_a,
             CAST(sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS syy_a
      FROM per_user GROUP BY arm
    ),
    overall AS (
      SELECT sum(n_a) AS n, sum(sx_a) AS sx, sum(sy_a) AS sy,
             sum(sxy_a) AS sxy, sum(sxx_a) AS sxx, sum(syy_a) AS syy
      FROM arm_stats
    ),
    scalars AS (
      SELECT n, sx, {_Q227_SCALARS}
      FROM overall
    )
    SELECT CAST(a.arm AS BIGINT) AS arm,
           CAST(a.n_a AS BIGINT) AS n_users,
           CAST(floor((CAST(a.sy_a AS DOUBLE) / CAST(a.n_a AS DOUBLE)) * 1000.0)
                AS BIGINT) AS mean_y_micros,
           CAST(floor(((CAST(a.sy_a AS DOUBLE) / CAST(a.n_a AS DOUBLE))
                 - (s.cov_num / s.varx_num)
                   * ((CAST(a.sx_a AS DOUBLE) / CAST(a.n_a AS DOUBLE))
                      - (CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE)))) * 1000.0)
                AS BIGINT) AS mean_y_cuped_micros,
           CAST(floor((s.cov_num / s.varx_num) * 1000000.0) AS BIGINT)
             AS theta_micros,
           CAST(floor(((s.cov_num * s.cov_num) / (s.varx_num * s.vary_num))
                * 1000000.0) AS BIGINT) AS var_reduction_micros
    FROM arm_stats a CROSS JOIN scalars s
    """,
    doc="CUPED variance-reduced A/B readout: pooled "
    "theta=cov(X,Y)/var(X) from pre-period spend, per-arm adjusted "
    "means; exact DECIMAL(38,0) sufficient statistics, one shared "
    "IEEE-double scalar expression, micro-quantized",
    tags=("analytics", "A4", "experiment", "llm"),
)
def q227_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
    )
    mv = F.expr("CAST(floor(value * 1000) AS BIGINT)")
    split = F.lit(_Q227_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.coalesce(F.sum(F.when(F.col("ts") < split, mv)), F.lit(0)).alias("x"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ts") >= split) & (F.col("event_type") == "purchase"),
                    mv,
                )
            ),
            F.lit(0),
        ).alias("y"),
    )
    dec = "DECIMAL(18,0)"
    dec38 = "DECIMAL(38,0)"
    arm_stats = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast(dec38).alias("n_a"),
        F.sum(F.col("x").cast(dec)).cast(dec38).alias("sx_a"),
        F.sum(F.col("y").cast(dec)).cast(dec38).alias("sy_a"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(dec38).alias("sxy_a"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec38).alias("sxx_a"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).cast(dec38).alias("syy_a"),
    )
    glob = arm_stats.groupBy().agg(
        F.sum("n_a").alias("n"),
        F.sum("sx_a").alias("sx"),
        F.sum("sy_a").alias("sy"),
        F.sum("sxy_a").alias("sxy"),
        F.sum("sxx_a").alias("sxx"),
        F.sum("syy_a").alias("syy"),
    )
    scalars = glob.selectExpr("n", "sx", *[
        s.strip() for s in _Q227_SCALARS.split(",\n")
    ])
    joined = arm_stats.crossJoin(F.broadcast(scalars))
    return joined.selectExpr(
        "CAST(arm AS BIGINT) AS arm",
        "CAST(n_a AS BIGINT) AS n_users",
        "CAST(floor((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 1000.0)"
        " AS BIGINT) AS mean_y_micros",
        "CAST(floor(((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        " - (cov_num / varx_num)"
        " * ((CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) * 1000.0)"
        " AS BIGINT) AS mean_y_cuped_micros",
        "CAST(floor((cov_num / varx_num) * 1000000.0) AS BIGINT)"
        " AS theta_micros",
        "CAST(floor(((cov_num * cov_num) / (varx_num * vary_num))"
        " * 1000000.0) AS BIGINT) AS var_reduction_micros",
    )


# ---------------------------------------------------------------------------
# q233 — large-to-large INTERVAL JOIN via bucket blocking: for every user
# session (q59's session_window intervals), count the events OTHER users
# fired inside its span ("how contended was the platform during this
# session"). The join condition is pure range (s_start <= ts < s_end,
# different user) — no equi key — which naive plans execute as a
# broadcast nested loop (only legal when one side is small; q133
# broadcasts a dimension for exactly that reason). Here BOTH sides scale
# with the event stream, so the engine must MANUFACTURE an equi key:
# chop time into fixed W=1h buckets, explode each interval to the
# buckets it covers (intervals are minutes-to-hours, so the fan-out is
# small and bounded), tag each point with its single containing bucket,
# hash-join on the bucket id, then apply the exact range predicate as a
# residual filter. Every (point, interval) match is found exactly once —
# the point lives in exactly ONE bucket and an interval's covered-bucket
# list never repeats a bucket — so no post-join dedup is needed. This is
# the canonical Spark/Flink range-join decomposition; the DuckDB oracle
# runs the undecomposed theta join (its IEJoin), so the bucket-cover
# algebra (truncation at hour edges, exclusive upper bound) is verified
# against the declarative definition, not assumed.
#
# Scale: one shuffle each side on the bucket key; a hot hour adds a
# salt digit to the bucket id at 1000-executor scale (operators/skew.py
# pattern). Zero-match sessions survive through the final LEFT join
# against the session substrate, which is materialized once and reused
# for both the bucket explode and that outer join.

Q233_BUCKET_S = 3600


_Q233_ORACLE = f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flag AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sid AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s
      FROM flag
    ),
    sess AS (
      SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
             count(*) AS n_events
      FROM sid GROUP BY user_id, s
    ),
    conc AS (
      SELECT s.user_id, s.s_start, count(*) AS n_concurrent
      FROM sess s JOIN e p
        ON p.ts >= s.s_start AND p.ts < s.s_end AND p.user_id <> s.user_id
      GROUP BY s.user_id, s.s_start
    )
    SELECT s.user_id,
           strftime(s.s_start, '{TS_FMT_DUCK}') AS session_start,
           strftime(s.s_end, '{TS_FMT_DUCK}') AS session_end,
           s.n_events,
           COALESCE(c.n_concurrent, 0) AS n_concurrent
    FROM sess s LEFT JOIN conc c
      ON c.user_id = s.user_id AND c.s_start = s.s_start
    """


@register(
    "q233_concurrent_sessions",
    oracle=_Q233_ORACLE,
    doc="large-large interval join via 1h bucket blocking + residual range "
    "filter (theta-join oracle verifies the bucket-cover algebra)",
    tags=("join", "session", "window", "T5"),
)
def q233_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _concurrent_sessions_plan(spark, sf_dir, "q233_sessions", n_salts=0)


def _concurrent_sessions_plan(
    spark: SparkSession, sf_dir: str, sub_name: str, n_salts: int
) -> DataFrame:
    """Shared q233/q234 plan.  ``n_salts`` > 0 salts the bucket join:
    points get a deterministic salt, covers replicate ``n_salts``× (the
    operators/skew.py pattern), so a HOT HOUR's points split across
    ``n_salts`` shuffle partitions instead of one straggler task.  Rows
    produced are exactly those of the unsalted join — each point holds
    one salt value and each cover carries all of them, so every
    (point, cover) bucket match still meets exactly once; q234 proves
    the identity by running against q233's verbatim oracle."""
    from ..operators.skew import salted_equi_join
    from ..scratch import materialize

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sess = materialize(
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        ),
        sub_name,
    )
    covers = sess.select(
        F.col("user_id").alias("s_user"),
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp(s_start) div {Q233_BUCKET_S}"),
                F.expr(f"unix_timestamp(s_end) div {Q233_BUCKET_S}"),
            )
        ).alias("bkt"),
    )
    pts = ev.select(
        F.col("user_id").alias("p_user"),
        "ts",
        F.expr(f"unix_timestamp(ts) div {Q233_BUCKET_S}").alias("bkt"),
    )
    joined = (
        salted_equi_join(pts, covers, ["bkt"], n_salts=n_salts)
        if n_salts
        else covers.join(pts, "bkt")
    )
    conc = (
        joined.filter(
            (F.col("p_user") != F.col("s_user"))
            & (F.col("ts") >= F.col("s_start"))
            & (F.col("ts") < F.col("s_end"))
        )
        .groupBy(F.col("s_user").alias("user_id"), "s_start")
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )
    return (
        sess.join(conc, ["user_id", "s_start"], "left")
        .select(
            "user_id",
            F.date_format("s_start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("s_end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
            F.coalesce(F.col("n_concurrent"), F.lit(0)).cast("bigint").alias("n_concurrent"),
        )
    )


# ---------------------------------------------------------------------------
# q234 — the SALTED form of q233's interval join, proving the skew
# remedy the q233 scale note promises.  A hot hour (product launch,
# midnight batch) concentrates both points and interval covers on one
# bucket id; at 1000 executors that bucket is a single straggler task.
# Salting splits it: points take a deterministic salt in [0, S), covers
# replicate S×, the join key becomes (bkt, salt) — the operators/skew.py
# pattern.  Result identity with the unsalted plan is not asserted, it
# is PROVEN: q234 registers q233's oracle verbatim, so the driver
# hash-compares the salted plan against the undecomposed theta join.
# tests/test_plan_invariants.py additionally plan-asserts the salted
# shuffle (hashpartitioning on __salt).

Q234_SALTS = 8


@register(
    "q234_concurrent_sessions_salted",
    oracle=_Q233_ORACLE,
    doc="skew-salted variant of q233: bucket join key extended with a "
    "deterministic salt (points salted, covers replicated 8x); same "
    "theta-join oracle proves result identity",
    tags=("join", "session", "skew", "T5"),
)
def q234_concurrent_sessions_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _concurrent_sessions_plan(
        spark, sf_dir, "q234_sessions", n_salts=Q234_SALTS
    )


# ---------------------------------------------------------------------------
# q265-q270 — the canonical TPC-H shapes that were still missing from the
# OLAP family (r12): Q2's correlated-argmin decorrelation, Q13's outer-
# count distribution, Q16's distinct-count with an exclusion list, Q18's
# HAVING-IN, Q19's disjunctive OR-of-ANDs pushdown, and Q9's multi-join
# profit rollup.  The testdata has no partsupp table and no comment /
# shipmode / container columns, so stand-ins keep each shape honest:
# lineitem's (l_partkey, l_suppkey) pairs play partsupp, negative
# account balance plays the complaint filter, order priority plays the
# comment filter.  Oracles are the CANONICAL correlated/IN forms; the
# Spark plans are the decorrelated scalable rewrites — same results,
# different algebra, which is exactly what the pair is meant to prove.


@register(
    "q265_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offer AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l JOIN eu ON eu.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_name,
           CAST(o.unit_price AS DOUBLE) AS min_unit_price,
           min(eu.s_suppkey) AS s_suppkey
    FROM part p
    JOIN offer o ON o.l_partkey = p.p_partkey
    JOIN eu ON eu.s_suppkey = o.l_suppkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
      AND o.unit_price = (
        SELECT min(o2.unit_price) FROM offer o2
        WHERE o2.l_partkey = p.p_partkey
      )
    GROUP BY 1, 2, 3
    """,
    doc="min-cost supplier per part within a region (public TPC-H Q2 "
    "shape; lineitem unit prices stand in for partsupp): the correlated "
    "min-subquery decorrelates to one per-part aggregate joined back, "
    "argmin tie-broken to the lowest supplier key",
    tags=("join", "agg", "olap"),
)
def q265_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    eu = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    t["region"].filter(F.col("r_name") == "EUROPE"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = t["part"].filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    offer = (
        t["lineitem"]
        .join(F.broadcast(eu.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            )
        )
    )
    # decorrelated argmin: per-part min joined back on price equality
    # (the division is one shared IEEE scalar op — bit-identical in both
    # engines, so the equality join is exact), lowest-suppkey tie-break
    best = offer.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    return (
        parts.join(best, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            offer.withColumnRenamed("l_partkey", "o_partkey"),
            (F.col("o_partkey") == F.col("p_partkey"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy("p_partkey", "p_name", "min_unit_price")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
        .select(
            "p_partkey", "p_name",
            F.col("min_unit_price").cast("double").alias("min_unit_price"),
            "s_suppkey",
        )
    )


@register(
    "q266_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="customer order-count distribution including zero-order "
    "customers (public TPC-H Q13 shape; priority filter stands in for "
    "the comment filter): left outer join counted per customer, then a "
    "bounded histogram of the counts",
    tags=("join", "agg", "olap"),
)
def q266_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q267_parts_supplier_count",
    oracle="""
    SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
      ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
    doc="supplier-relationship count per (brand, size) with an exclusion "
    "list (public TPC-H Q16 shape; lineitem pairs stand in for partsupp, "
    "negative balance for the complaint filter): NOT IN becomes a "
    "broadcast anti-join over the distinct pair substrate",
    tags=("join", "agg", "olap"),
)
def q267_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    excluded = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = pairs.join(
        F.broadcast(excluded),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    parts = t["part"].filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        kept.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q268_large_order_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="large-quantity orders and their customers (public TPC-H Q18 "
    "shape): the HAVING-IN subquery becomes one per-order aggregate "
    "reused as a semi-filter — the order sum is computed once, not once "
    "per membership probe",
    tags=("join", "agg", "olap"),
)
def q268_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    order_qty = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    return (
        t["orders"]
        .join(order_qty, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", d(F.col("qty_dec")).alias("sum_qty"),
        )
    )


@register(
    "q269_disjunctive_revenue",
    oracle="""
    SELECT
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
           AS VARCHAR) AS DOUBLE) AS revenue,
      CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="disjunctive-predicate revenue (public TPC-H Q19 shape): an "
    "OR-of-ANDs across two tables — the per-table conjunct unions "
    "(brand/size on part, quantity on lineitem) must still push into "
    "each scan while the cross-table residual evaluates post-join",
    tags=("join", "agg", "olap"),
)
def q269_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            d(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q270_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
             - CAST(p.p_retailprice AS DECIMAL(12,2))
               * CAST(l.l_quantity AS DECIMAL(12,2))
           ) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="product-line profit by (supplier nation, order year) (public "
    "TPC-H Q9 shape; retail price x quantity stands in for partsupp "
    "supply cost): a 5-table join tree where every dimension broadcasts "
    "and only lineitem-orders shuffles, exact DECIMAL profit terms",
    tags=("join", "agg", "olap"),
)
def q270_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "orders"]
    )
    profit = dec("l_extendedprice") * (one() - dec("l_discount", 4)) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_name").like("%red%"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(
                t["supplier"].join(
                    F.broadcast(t["nation"]),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(d(F.sum(profit)).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q271-q276 — the remaining canonical TPC-H shapes (Q4, Q5, Q6, Q7, Q8,
# Q10), completing the public 22-query suite in shape form across the
# OLAP family (see also q01/q02/q03/q53/q56/q57/q58/q76/q96/q177-q180
# and q265-q270).  The testdata has no commitdate/receiptdate, so Q4's
# "late" EXISTS uses ship-lag beyond 80 days; nation names are the
# synthetic NATION_k domain.  As with q265-q270, oracles keep the
# canonical correlated / EXISTS / ORDER-LIMIT forms while the Spark
# plans are the decorrelated broadcast/semi-join rewrites.


@register(
    "q271_priority_late_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      )
    GROUP BY 1
    """,
    doc="order-priority counts for orders with a late-shipping line "
    "(public TPC-H Q4 shape; ship-lag > 80 days stands in for the "
    "missing commit/receipt dates): EXISTS becomes a semi-join whose "
    "non-equi residual rides the equi-join condition",
    tags=("join", "agg", "olap"),
)
def q271_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    late = o.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        # timestamp-preserving (+ INTERVAL, not date_add which truncates
        # to midnight) so intraday orderdates keep oracle parity (r12
        # ADVICE #1; q76 uses the same form)
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q272_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="local-supplier order volume per nation (public TPC-H Q5 shape): "
    "the customer-nation = supplier-nation equality rides the supplier "
    "join so only same-nation revenue survives; dims broadcast, one "
    "lineitem-orders shuffle",
    tags=("join", "agg", "olap"),
)
def q272_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    asia = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(asia.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(d(F.sum(revenue)).alias("revenue"))
    )


@register(
    "q273_forecast_revenue_change",
    oracle="""
    SELECT
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE)
        AS revenue,
      CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="forecast revenue change (public TPC-H Q6 shape): pure "
    "filter-aggregate — every predicate must reach the parquet scan, "
    "the agg is one map-side-combined partial, exact DECIMAL sum",
    tags=("agg", "olap"),
)
def q273_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            d(F.sum(dec("l_extendedprice") * dec("l_discount", 4))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q274_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    doc="two-nation volume shipping (public TPC-H Q7 shape): the "
    "disjunctive nation-pair predicate spans two dimension arms — each "
    "arm prunes to the 2-nation union before the join, the pair "
    "residual evaluates post-join",
    tags=("join", "agg", "olap"),
)
def q274_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "supplier", "orders", "customer", "nation"]
    )
    two = t["nation"].filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    supp = (
        t["supplier"]
        .join(F.broadcast(two), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(two), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            d(
                F.sum(dec("l_extendedprice") * (one() - dec("l_discount", 4)))
            ).alias("revenue")
        )
    )


@register(
    "q275_market_share",
    oracle="""
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume END)
                AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
               AS volume,
             sn.n_name AS nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY 1
    """,
    doc="single-nation market share within a region per year (public "
    "TPC-H Q8 shape): 7-table join tree, every dimension broadcasts, "
    "the share is a conditional-over-total ratio in one shared IEEE "
    "division over exact DECIMAL sums",
    tags=("join", "agg", "olap"),
)
def q275_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ["lineitem", "part", "supplier", "orders", "customer", "nation",
         "region"],
    )
    asia_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    t["region"].filter(F.col("r_name") == "ASIA"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    volume = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    base = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_type") == "ECONOMY")
                .select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    nat = F.sum(F.when(F.col("nation") == "NATION_5", volume))
    tot = F.sum(volume)
    return (
        base.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((d(nat) / d(tot)).alias("mkt_share"))
    )


@register(
    "q276_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="top returned-item customers (public TPC-H Q10 shape): revenue "
    "from returned lines in a quarter, TakeOrderedAndProject top-20 with "
    "a deterministic custkey tie-break so the LIMIT boundary is stable "
    "in both engines",
    tags=("join", "agg", "olap", "topk"),
)
def q276_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "nation"]
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", 4))
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                t["customer"].join(
                    F.broadcast(t["nation"]),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(d(F.sum(revenue)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q277 — XML round-trip (Spark 4's NATIVE xml format — no external
# package): the q122 ORC pattern applied to the third non-parquet
# format.  XML matters for the healthcare domain (CDA/HL7-adjacent
# feeds arrive as XML long before they arrive as parquet); the contract
# proven is the same losslessness accounting, with the read-side schema
# PINNED explicitly — XML carries no types, so an inferred read would
# make the pipeline's output schema data-dependent, the q125 anti-rule.


@register(
    "q277_xml_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
    doc="XML round-trip via Spark 4 native xml: parquet -> XML -> "
    "schema-pinned scan; accounting vs the original table proves the "
    "format conversion is lossless (types pinned on read — XML is "
    "untyped, so schema inference would be data-dependent)",
    tags=("layout", "S1", "A4"),
)
def q277_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = scratch_dir("q277_xml")
    ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_millis"),
    ).write.format("xml").option("rootTag", "events").option(
        "rowTag", "event"
    ).save(f"{base}/events_xml")
    back = (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema(
            "event_id bigint, user_id bigint, event_type string, "
            "value_millis bigint"
        )
        .load(f"{base}/events_xml")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value_millis").cast("bigint").alias("value_millis"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
