"""Central registry mapping query names to Spark callables + DuckDB oracles.

The driver contract (__spark_entry__.py) is generated from this registry:
``queries()`` returns the callables, ``oracle_sql()`` the oracle strings for
every query that is ANSI-SQL-expressible (others get the driver's weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the inventory."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = EngineQuery(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def get(name: str) -> EngineQuery:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}
