"""Query registry: the SURVEY.md §2 operator inventory as named queries.

Each entry is (spark_fn, oracle_sql | None):
  spark_fn(spark, sf_dir) -> DataFrame      — the engine under test
  oracle_sql                                — equivalent DuckDB ANSI SQL over
                                              the fixture views, or None for
                                              non-SQL-expressible operators
                                              (driver then does rows-only).

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    from koby_s_ai_vector_db_spark import queries as _q  # noqa: F401

    _LOADED = True
