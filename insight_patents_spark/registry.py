"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers itself here via the ``@query``
decorator, keeping the Spark implementation and its DuckDB oracle SQL
side by side in the same file (the driver hashes results of both; keeping
them adjacent is what keeps column names/rounding in sync).

``oracle=None`` marks a genuinely non-SQL-expressible op -> the driver
records a weaker rows-only check (SURVEY §2 inventory notes which).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Operator modules; imported (once) by load_all so decorators run.
_OPERATOR_MODULES = (
    "insight_patents_spark.operators.relational",
    "insight_patents_spark.sources.pyds",
    "insight_patents_spark.operators.joins",
    "insight_patents_spark.operators.aggregates",
    "insight_patents_spark.operators.windows",
    "insight_patents_spark.operators.setops",
    "insight_patents_spark.functions.scalar",
    "insight_patents_spark.operators.text",
    "insight_patents_spark.operators.vector",
    "insight_patents_spark.operators.multimodal",
    "insight_patents_spark.operators.graph",
    "insight_patents_spark.operators.udf",
    "insight_patents_spark.streaming.queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of operator ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module and return the full registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
