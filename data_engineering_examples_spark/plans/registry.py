"""Query registry: one QuerySpec per operator/query claimed in SURVEY.md §2.

``fn(spark, sf_dir) -> DataFrame`` is the Spark implementation;
``oracle`` is the equivalent DuckDB SQL (None => driver runs the weaker
rows-only check — reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = "", tags: tuple = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from . import analytics  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import fhir_queries  # noqa: F401
    from . import etl_queries  # noqa: F401
    from . import workflow_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401

    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    return all_specs()[name]
