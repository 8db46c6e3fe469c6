"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2 that the engine implements registers
here as a named query: a Spark plan builder ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. Keeping both in one
``register`` call keeps column aliases in lockstep — the driver's
compare hashes values under name-sorted columns, so a drifted alias is
a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as driver query ``name`` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def _load_all() -> None:
    """Import every suite module for its registration side effects."""
    from gas_data_pipeline_spark.suite import (  # noqa: F401
        relational,
        scalar,
        reshape,
        pipeline_suite,
        streaming_suite,
        northstar,
        analytics_suite,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }
