"""L4 — the declared query set.

Each query exists twice by contract: a Spark callable (DataFrame API or
spark.sql) and an ANSI-SQL oracle string DuckDB can run over the same
parquet. The driver hash-compares both at sf0.01 (BASELINE.md), so every
computed column is aliased identically on both sides, float aggregates go
through exact decimal arithmetic before a final cast to double, and
timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from .registry import QuerySpec, all_specs, get_spec

__all__ = ["QuerySpec", "all_specs", "get_spec"]
