"""L1 — generic relational sources (the driver's TPC-H-ish star schema).

Mirrors the reference's "scan" surface (SURVEY.md §2.1 S1-S3): where the
reference issues SQL text to IRIS and materialises `fetchall()` into pandas,
here a scan is a lazy `spark.read.parquet` whose projection/predicates are
pushed into the parquet reader by Catalyst — no eager client materialisation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5, nation=25 rows at every SF). customer/supplier/part grow with
# SF; AQE decides for those at runtime.
ALWAYS_BROADCAST = {"region", "nation"}


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw
    int64 (runtime-settable legacy conf — works under any caller-provided
    session, including the driver's) and truncate to a microsecond
    timestamp, matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # integer div — ns values exceed 2^53, double division would round
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Lazy DataFrames for each table in ``sf_dir``; nothing is read until
    an action runs, so column pruning / predicate pushdown reach the scan."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = _read_events(spark, path) if name == "events" else spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the spark.sql query surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
