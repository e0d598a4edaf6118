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
# r17 window every id carries a ≥r12-era grade; the merge of
# CORRECTNESS_r01–r17.json puts the stalest cohort at exactly 29 ids graded
# r12 (the LLM text/packing family, the multimodal block, and the streaming
# windows) and 50 at r13.  This r18 window (prescribed id-for-id by the r17
# verdict, item 2) takes those 29 r12 ids plus the 21 alphabetically-first
# r13 ids (flagship_dataset_card … x_etl_shard_assign; the remaining 29 r13
# ids rotate in at r19).  Two window ids are rows-only (`x_stream_smoke`, a
# liveness probe of the micro-batch runtime, and `x_agg_hll_merge`, gated by
# its exact twin `x_agg_hll_merge_exact`) — included so their rows-only
# grades refresh with the cohort, but listed LAST per the r13 slip-safety
# convention: a truncated window drops a weak attestation, never an oracle
# one.  After this window the stalest grade becomes r13.
_PRIORITY_NAMES = (
    # (0) the remaining r13-era oracle-bearing ids — stalest cohort
    "x_etl_snapshot_diff",
    "x_etl_zorder_stats",
    "x_join_asof_tolerance",
    "x_join_full_outer",
    "x_join_fuzzy_name",
    "x_join_multiway_analytic",
    "x_join_range_bucketed",
    "x_llm_bm25_rank",
    "x_llm_bpe_merge_step",
    "x_llm_char_trigram_profile",
    "x_llm_collocations",
    "x_llm_dedup_bfs_depth",
    "x_llm_dedup_prefix",
    "x_llm_embed_outlier",
    "x_llm_source_mix",
    "x_llm_source_overlap",
    "x_set_except",
    "x_set_intersect",
    "x_set_union",
    "x_sort_limit_topk",
    "x_sub_exists_other",
    "x_sub_exists_semi",
    "x_sub_not_exists_anti",
    "x_sub_scalar_avg",
    "x_win_distribution",
    "x_win_lag_lead",
    "x_win_rank",
    "x_win_running",
    # (1) the alphabetically-first r14-era oracle-bearing ids, padding to 50
    "flagship_analytics",
    "x_agg_corr_matrix",
    "x_agg_count_distinct",
    "x_agg_cube",
    "x_agg_entropy",
    "x_agg_grouping_sets",
    "x_agg_hypertable_rollup",
    "x_agg_percentile",
    "x_agg_rollup",
    "x_agg_string_agg",
    "x_agg_sum_avg_min_max",
    "x_agg_waterfall",
    "x_etl_cdc_compact",
    "x_etl_mask_pii",
    "x_etl_sample_weighted",
    "x_etl_table_checksum",
    "x_etl_unpivot",
    "x_fn_array_map",
    "x_fn_regexp_extract",
    "x_join_anti",
    "x_join_cross",
    # (2) the window's one rows-only id, slip-safe at the tail: the r13 PQ
    # ADC top-k demo (gated by the hash-matched x_llm_pq_adc_scores oracle)
    # refreshes its rows-only grade without ever displacing an oracle
    # attestation
    "x_llm_pq_adc_topk",
)
_PRIORITY_RANK = {n: i for i, n in enumerate(_PRIORITY_NAMES)}


def _driver_order(
    names: list[str], rank: dict[str, int] | None = None
) -> list[str]:
    """Priority ids first in listed order, everything else alphabetical.

    ``rank`` defaults to the module's rotation window; the parameter exists
    so the window-rotation PROPERTY test (r15 verdict item 7) can drive the
    same code path with arbitrary legal priority tuples instead of only the
    current one.
    """
    if rank is None:
        rank = _PRIORITY_RANK

    def key(n: str) -> tuple[int, str]:
        return (rank.get(n, len(rank)), n)

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
