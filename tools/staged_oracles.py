"""Staged DuckDB verification for the queries whose MONOLITHIC oracles
are infeasible above a size bound.

The registered oracles stay as they are — single SQL statements DuckDB
runs at the driver's gate SFs, where two-algorithm agreement is the
point.  At synthetic-scale sweeps three of them blow up for reasons
that are properties of the ORACLE FORMULATION, not of the semantics:

* q95  — the unrolled-CTE PageRank re-evaluates the whole LSH band
         chain per iteration reference (DuckDB does not materialize
         non-``AS MATERIALIZED`` CTEs across references), spilling
         ~79 GB at the 50k-doc synthetic sf1 (r9 sweep note).
         Staged form: each stage is a TEMP TABLE (edges -> bidir ->
         deg/adj -> r0..r3), so every step runs once and the previous
         step's temp is released — identical integer arithmetic,
         identical result.
* q210 — the quadratic NOT-EXISTS skyline is 2.25e12 comparisons at
         1.5M orders.  Staged form: verify the SPARK frontier R
         exactly in O(N·|R|) — (a) every R row is a real order row
         with exact values, (b) soundness: no order dominates any R
         row, (c) completeness: every non-R order is dominated, and
         (d) R has no duplicate keys.  (a)-(d) hold iff R is EXACTLY
         the skyline: dominance is transitive, so any dominated point
         has an undominated dominator, which (b)+(c) force into R.
* q235 — the monolithic Lloyd-assignment joins materialize N·DIM·K
         cells in one plan (tools/probe_q235_stages.py, r10/r11).

``STAGED`` maps query name -> (needs_staged(con), staged_fn(spark,
sf_dir)); tools/check_oracle.py dispatches through it, so synthetic
sweeps report a staged hash-match instead of excluding the query.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# --- q95: step-materialized integer PageRank --------------------------------

#: Above this many documents the unrolled-CTE oracle's repeated band-
#: chain evaluation temp-spills (50k docs spilled 79 GB in the r9 sweep;
#: the 5k-doc sf0.1 monolithic run is routine).
Q95_MAX_DOCS = 20_000


def q95_needs_staged(con) -> bool:
    return con.execute("SELECT count(*) FROM documents").fetchone()[0] > Q95_MAX_DOCS


def staged_q95(spark, sf_dir: str) -> list:
    from data_engineering_examples_spark.plans.dedup_queries import (
        PR_ITERS,
        PR_UNIT,
        _duck_minhash_bands_cte,
        q95_neardup_pagerank,
    )

    con = _connect(sf_dir)
    con.execute(
        f"""CREATE TEMP TABLE t_edges AS
        WITH {_duck_minhash_bands_cte()}
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id"""
    )
    con.execute(
        "CREATE TEMP TABLE t_bidir AS "
        "SELECT u, v FROM t_edges UNION ALL SELECT v AS u, u AS v FROM t_edges"
    )
    con.execute("DROP TABLE t_edges")
    con.execute(
        "CREATE TEMP TABLE t_deg AS "
        "SELECT u, CAST(count(*) AS BIGINT) AS deg FROM t_bidir GROUP BY u"
    )
    con.execute(
        "CREATE TEMP TABLE t_adj AS "
        "SELECT b.u, b.v, d.deg FROM t_bidir b JOIN t_deg d USING (u)"
    )
    con.execute("DROP TABLE t_bidir")
    con.execute(
        f"CREATE TEMP TABLE t_r0 AS "
        f"SELECT u AS id, CAST({PR_UNIT} AS BIGINT) AS r FROM t_deg"
    )
    for i in range(1, PR_ITERS + 1):
        con.execute(
            f"""CREATE TEMP TABLE t_r{i} AS
            SELECT id, CAST({PR_UNIT * 15 // 100} + (85 * s) // 100 AS BIGINT) AS r
            FROM (SELECT a.v AS id, CAST(sum(r.r // a.deg) AS BIGINT) AS s
                  FROM t_adj a JOIN t_r{i - 1} r ON r.id = a.u GROUP BY a.v)"""
        )
        con.execute(f"DROP TABLE t_r{i - 1}")
    duck = {
        int(r[0]): (int(r[1]), repr(float(r[2])))
        for r in con.execute(
            f"SELECT d.u, d.deg, CAST(t_r{PR_ITERS}.r AS DOUBLE) / {PR_UNIT}.0 "
            f"FROM t_r{PR_ITERS} JOIN t_deg d ON d.u = t_r{PR_ITERS}.id"
        ).fetchall()
    }
    srows = q95_neardup_pagerank(spark, sf_dir).collect()
    spark_m = {
        int(r.doc_id): (int(r.degree), repr(float(r.pagerank))) for r in srows
    }
    if spark_m == duck:
        return []
    only_s = set(spark_m) - set(duck)
    only_d = set(duck) - set(spark_m)
    n_bad = sum(1 for k in spark_m if spark_m.get(k) != duck.get(k))
    return [
        f"staged PageRank differs: {n_bad}/{len(spark_m)} rows "
        f"(spark-only ids {len(only_s)}, duck-only {len(only_d)})"
    ]


# --- q210: frontier verified by dominance checks ----------------------------

#: Above this many orders the quadratic NOT-EXISTS oracle is infeasible
#: (150k at sf0.1 already costs minutes; 1.5M is 2.25e12 comparisons).
Q210_MAX_ORDERS = 400_000


def q210_needs_staged(con) -> bool:
    return con.execute("SELECT count(*) FROM orders").fetchone()[0] > Q210_MAX_ORDERS


def staged_q210(spark, sf_dir: str) -> list:
    from data_engineering_examples_spark.plans.analytics import q210_pareto_frontier

    pdf = q210_pareto_frontier(spark, sf_dir).toPandas()
    con = _connect(sf_dir)
    con.register("r_raw", pdf)
    con.execute(
        "CREATE TEMP TABLE r AS SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(o_orderdate AS DATE) AS o_orderdate, CAST(pc AS BIGINT) AS pc FROM r_raw"
    )
    con.execute(
        "CREATE TEMP TABLE o AS SELECT o_orderkey, CAST(o_orderdate AS DATE) AS "
        "o_orderdate, CAST(floor(o_totalprice * 100) AS BIGINT) AS pc FROM orders"
    )
    problems = []
    dup = con.execute(
        "SELECT count(*) - count(DISTINCT o_orderkey) FROM r"
    ).fetchone()[0]
    if dup:
        problems.append(f"frontier has {dup} duplicate order keys")
    bad_member = con.execute(
        """SELECT count(*) FROM r LEFT JOIN o USING (o_orderkey)
        WHERE o.o_orderdate IS NULL
           OR o.o_orderdate <> r.o_orderdate OR o.pc <> r.pc"""
    ).fetchone()[0]
    if bad_member:
        problems.append(f"{bad_member} frontier rows are not exact order rows")
    dominated = con.execute(
        """SELECT count(*) FROM r p JOIN o q
        ON q.o_orderdate <= p.o_orderdate AND q.pc >= p.pc
           AND (q.o_orderdate < p.o_orderdate OR q.pc > p.pc)"""
    ).fetchone()[0]
    if dominated:
        problems.append(f"soundness: {dominated} dominance witnesses against R")
    missing = con.execute(
        """SELECT count(*) FROM o p
        WHERE NOT EXISTS (SELECT 1 FROM r s WHERE s.o_orderkey = p.o_orderkey)
          AND NOT EXISTS (
            SELECT 1 FROM r q
            WHERE q.o_orderdate <= p.o_orderdate AND q.pc >= p.pc
              AND (q.o_orderdate < p.o_orderdate OR q.pc > p.pc))"""
    ).fetchone()[0]
    if missing:
        problems.append(f"completeness: {missing} undominated orders outside R")
    return problems


# --- q235: staged seeds/assignment/edges probe ------------------------------


def q235_needs_staged(con) -> bool:
    from probe_q235_stages import MONOLITHIC_MAX_CELLS, q235_monolithic_cells

    return q235_monolithic_cells(con) > MONOLITHIC_MAX_CELLS


def staged_q235(spark, sf_dir: str) -> list:
    from probe_q235_stages import staged_check

    return staged_check(spark, sf_dir)


STAGED = {
    "q95_neardup_pagerank": (q95_needs_staged, staged_q95),
    "q210_pareto_frontier": (q210_needs_staged, staged_q210),
    "q235_semantic_dedup_learned": (q235_needs_staged, staged_q235),
}
