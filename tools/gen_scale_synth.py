"""Generate a key-shifted K-fold replication of a testdata scale factor
for SCALE-STRESS correctness sweeps (not a substitute for the driver's
sf gates — the inputs are synthesized from the driver's own tables).

Each fact table is replicated K times with every primary/foreign key
shifted by copy_index * (max_key + 1), so referential integrity holds
exactly (orders still join customers, lineitems still join orders) and
key-uniqueness assumptions survive, while every distribution the
queries aggregate over grows 10x.  Dimension tables (region, nation)
keep a single copy — as they would at any real scale.  Payload columns
(text, embeddings, media bytes) are duplicated verbatim, which inflates
duplicate rates — dedup queries find MORE work, which is the point of
a stress sweep.

Usage:
    python tools/gen_scale_synth.py [src_dir] [dst_dir] [K]
    python tools/check_oracle.py <dst_dir>        # the sweep itself

Defaults: /root/testdata/sf0.1 -> /tmp/sfsynth1 with K=10 (a synthetic
"sf1").  Round-7 finding from this sweep: DuckDB's DECIMAL->DOUBLE cast
double-rounds (exact int128 -> double, then / 10^scale) and diverges
from Spark's single-rounded BigDecimal cast by 1 ulp once the scaled
integer exceeds 2^53 — the affected oracles single-round by inlining
a VARCHAR round-trip, ``CAST(CAST(expr AS VARCHAR) AS DOUBLE)``, at
each decimal->double site (see plans/analytics.py module docstring).
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# table -> [(key_column, offset_name)]; offset_name keys the shared
# max+1 shift so foreign keys move in lockstep with their parents
SHIFTS = {
    "customer": [("c_custkey", "C")],
    "supplier": [("s_suppkey", "S")],
    "part": [("p_partkey", "P")],
    "orders": [("o_orderkey", "O"), ("o_custkey", "C")],
    "lineitem": [("l_orderkey", "O"), ("l_partkey", "P"), ("l_suppkey", "S")],
    "events": [("event_id", "E"), ("user_id", "U")],
    "documents": [("doc_id", "D")],
    "embeddings": [("vec_id", "V")],
}
OFFSET_SOURCES = {
    "O": ("orders", "o_orderkey"),
    "C": ("customer", "c_custkey"),
    "S": ("supplier", "s_suppkey"),
    "P": ("part", "p_partkey"),
    "E": ("events", "event_id"),
    "U": ("events", "user_id"),
    "D": ("documents", "doc_id"),
    "V": ("embeddings", "vec_id"),
}


def generate(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def rp(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    off = {
        name: con.execute(
            f"SELECT max({col}) + 1 FROM {rp(t)}"
        ).fetchone()[0]
        for name, (t, col) in OFFSET_SOURCES.items()
    }
    series = f"(SELECT unnest(range({k})) AS i)"
    for t in TABLES:
        if t in SHIFTS:
            repl = ", ".join(
                f"{col} + i * {off[name]} AS {col}"
                for col, name in SHIFTS[t]
            )
            sel = (
                f"SELECT * EXCLUDE (i) REPLACE ({repl}) "
                f"FROM {rp(t)}, {series}"
            )
        else:
            sel = f"SELECT * FROM {rp(t)}"
        con.execute(
            f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfsynth1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, k)
