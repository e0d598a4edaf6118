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


def oracle_of(name: str) -> str:
    """The already-registered oracle SQL of ``name`` — for composite
    operators (flagships) that reuse member queries' oracles as
    subqueries instead of duplicating 60 lines of SQL.  Callable only
    after the member registered (i.e. from later in module import
    order), which the KeyError enforces loudly."""
    return _REGISTRY[name].oracle


def _load_all() -> None:
    """Import every module that registers operators (idempotent)."""
    from . import functions, operators, streaming  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .operators import (  # noqa: F401
        bi,
        etl,
        health,
        llm,
        multimodal,
        relational,
        relevance,
        timeseries,
        tpch,
    )
    from .streaming import windows  # noqa: F401


# The grading driver only records CORRECTNESS rows for the first ~50 ids it
# sees; the window ROTATES each round to keep attestations fresh.  Round 11
# is the first of two freshness rounds (r10 verdict item 1): 78 ids were
# last driver-graded on r5/r6-era code and the engine under them has since
# changed (session-shared frames, rebalanced(), shingle-hash narrowing).
# This window carries: (1) the ONE new op — the Excel value-gate companion
# (r10 verdict item 5) — which has never been graded; (2) the entire r5
# cohort (31 ids: the fn_*/flt-adjacent scalar layer, join/lim/snk/src
# reference core); (3) the 18 highest-risk r6 ids — the shingle/dedup/
# kNN family whose hot paths the session_cache and shingle-hash rework
# touched most.  The 4 rows-only ids among them sit at the window tail so
# a 49-wide window drops weak attestations, not oracle ones.  Remaining
# 29 r6 ids (streams, multimodal, the lighter LLM text ops) front r12.
# Purely an ordering change: same keys, same callables, same oracles.
_PRIORITY_NAMES = (
    # (1) new in r11, never graded: workbook value gate for the Excel sink
    "snk_excel_values",
    # (2) the r5 cohort — stalest attestations in the registry
    "fn_case_status",
    "fn_date_extract",
    "fn_date_ge",
    "fn_hour_mod_arith",
    "fn_json_parse",
    "fn_json_serialize",
    "fn_lower",
    "fn_map_lookup",
    "fn_str_concat",
    "fn_time_lt",
    "fn_ts_format",
    "fn_ts_parse_fmt",
    "fn_tz_convert",
    "join_memo_dedup",
    "join_point_lookup",
    "join_url_construct",
    "lim_first_match",
    "lim_page_fetch",
    "snk_http_post",
    "snk_json_records",
    "snk_parquet_partitioned",
    "snk_stdout_progress",
    "src_jdbc_select",
    "src_json_file",
    "src_parquet_schema_evolution",
    "src_rest_auth",
    "src_rest_get",
    "src_rest_limit_push",
    # (3) r6 ids whose hot paths changed most since grading: the shared
    # shingle frame (session_cache), rebalanced(), shingle-hash narrowing
    "x_llm_dedup_exact",
    "x_llm_dedup_minhash",
    "x_llm_dedup_ngram_jaccard",
    "x_llm_dedup_clusters",
    "x_llm_dedup_embed",
    "x_llm_dedup_incremental",
    "x_llm_dedup_incremental_indexed",
    "x_llm_decontaminate",
    "x_llm_dup_spans",
    "x_llm_fingerprint",
    "x_llm_semdedup",
    "x_llm_knn_cosine",
    "x_llm_knn_batch",
    "x_llm_knn_batch_blocked",
    "x_llm_nearest_class",
    "x_llm_ngram_lm_counts",
    "x_llm_vocab_topk",
    # rows-only by design at the tail: if the window is 49 wide instead of
    # 50, these weak attestations are the ones to slip, not oracle ids
    "x_llm_dedup_simhash",
    "snk_excel_styled",
    "x_agg_approx_distinct",
    "x_agg_approx_quantile",
)
_PRIORITY_RANK = {n: i for i, n in enumerate(_PRIORITY_NAMES)}


def _driver_order(names: list[str]) -> list[str]:
    def key(n: str) -> tuple[int, str]:
        return (_PRIORITY_RANK.get(n, len(_PRIORITY_NAMES)), n)

    return sorted(names, key=key)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _REGISTRY[n].fn for n in _driver_order(list(_REGISTRY))}


def oracles() -> dict[str, str]:
    _load_all()
    return {
        n: _REGISTRY[n].oracle
        for n in _driver_order(list(_REGISTRY))
        if _REGISTRY[n].oracle
    }


def definitions() -> dict[str, QueryDef]:
    _load_all()
    return {n: _REGISTRY[n] for n in _driver_order(list(_REGISTRY))}
