"""Parity query registry.

Every capability row from SURVEY §2 gets a named query here, built
twice: a Spark DataFrame plan and (where SQL-expressible) an ANSI-SQL
oracle string DuckDB can run on the same parquet tables. DuckDB is
exactly the engine the reference delegates all querying to
(/root/reference/Cargo.toml:15), so hash-matching the oracle IS
behavioral parity with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator registering a parity query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect registration; lazy to avoid cycles.
    from huckli_spark.queries import tpch_parity  # noqa: F401
    from huckli_spark.queries import text_pipeline  # noqa: F401
    from huckli_spark.queries import embeddings  # noqa: F401
    from huckli_spark.queries import dedup_sketch  # noqa: F401
    from huckli_spark.queries import relational_extra  # noqa: F401
    from huckli_spark.queries import sql_surface  # noqa: F401
    from huckli_spark.queries import streaming_parity  # noqa: F401
    from huckli_spark.queries import multimodal_parity  # noqa: F401

    return dict(_REGISTRY)
