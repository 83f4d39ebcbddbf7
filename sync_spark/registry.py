"""Central query registry: every implemented operator from SURVEY.md §2
has one entry here, pairing the Spark implementation with its DuckDB
oracle SQL (None for non-SQL-expressible ops → driver does a weaker
rows-only check).

``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, spark_fn, oracle: Optional[str]) -> None:
    _REGISTRY[name] = QuerySpec(name, spark_fn, oracle)


def all_queries() -> dict[str, QuerySpec]:
    _populate()
    return dict(_REGISTRY)


_populated = False


def _populate() -> None:
    global _populated
    if _populated:
        return
    _populated = True

    from sync_spark.operators import relational

    register("q1_pricing_summary", relational.q1_pricing_summary, relational.Q1_SQL)
