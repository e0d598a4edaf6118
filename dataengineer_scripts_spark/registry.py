"""Operator registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator from SURVEY.md §2 registers here with a stable id, a callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the equivalent
DuckDB oracle SQL.  The driver compares the two per-round (row count +
schema + order-insensitive value hash), so:

- every computed column is aliased identically in the Spark plan and the SQL;
- floating aggregates are rounded on both sides (sum order is
  non-deterministic under parallelism in *both* engines);
- anything order-sensitive (LIMIT, "first per key") carries an explicit
  deterministic ordering key.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as operator ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        _REGISTRY[name] = QueryDef(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers operators (idempotent)."""
    from . import functions, operators, streaming  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .operators import etl, health, llm, multimodal, relational  # noqa: F401
    from .streaming import windows  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: q.fn for n, q in sorted(_REGISTRY.items())}


def oracles() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in sorted(_REGISTRY.items()) if q.oracle}


def definitions() -> dict[str, QueryDef]:
    _load_all()
    return dict(sorted(_REGISTRY.items()))
