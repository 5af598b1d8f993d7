"""Registry plumbing for the query catalog."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERY_REGISTRY: dict[str, QueryFn] = {}
ORACLE_REGISTRY: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL.

    Omitting ``oracle`` marks the query non-SQL-expressible (or
    nondeterministic): the driver then records a rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        QUERY_REGISTRY[name] = fn
        if oracle is not None:
            ORACLE_REGISTRY[name] = oracle.strip()
        return fn

    return deco
