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
# r15 window every id carries a ≥r10-era grade; the merge of
# CORRECTNESS_r01–r15.json puts the stalest cohort at exactly 24 ids graded
# r10 (the struct/scd2/pagerank pair/recursive-CTE block, the r10 LLM block —
# ann_*_scores, cluster_purity, dataset_split, dedup_suffix, dup_graph_degree,
# lang_confusion, mixture_reweight, ngram_coverage_curve,
# quality_filter_report, template_extract, zipf_fit — the csv/orc roundtrips,
# the r10 timeseries trio peak/survival/wow, and the window pair
# first_last_value/moving_median) and 50 at r11.  This window fronts the
# round-16 additions (the five derived-partsupp TPC-H queries — never
# graded, so stalest of all), then the 24 r10 ids, padded to 50 with the
# 21 alphabetically-first r11 ids (the next five r11 ids rotate in at
# r17).  Two window ids are rows-only (x_graph_pagerank_converged,
# snk_excel_styled) — included DELIBERATELY per the r15 verdict so their
# rows-only grades refresh along with the oracle-bearing cohort, but
# listed LAST (after every oracle-bearing id) per the r13 slip-safety
# convention: a truncated window drops a weak attestation, never an
# oracle one.  After this window the stalest grade becomes r11.
_PRIORITY_NAMES = (
    # (0) round-16 additions: the five TPC-H shapes unlocked by the
    # derived partsupp dimension (operators/tpch.py) — ungraded until
    # this window, so they outrank even the r10 cohort
    "x_tpch_q2_minimum_cost_supplier",
    "x_tpch_q9_product_type_profit",
    "x_tpch_q11_important_stock",
    "x_tpch_q16_parts_supplier_relationship",
    "x_tpch_q20_potential_part_promotion",
    # (1) the r10-era oracle-bearing ids — stalest cohort of the rotation
    "x_fn_struct_pack_extract",
    "x_graph_pagerank",
    "x_join_scd2_pointintime",
    "x_llm_ann_ivf_scores",
    "x_llm_ann_lsh_scores",
    "x_llm_cluster_purity",
    "x_llm_dataset_split",
    "x_llm_dedup_suffix",
    "x_llm_dup_graph_degree",
    "x_llm_lang_confusion",
    "x_llm_mixture_reweight",
    "x_llm_ngram_coverage_curve",
    "x_llm_quality_filter_report",
    "x_llm_template_extract",
    "x_llm_zipf_fit",
    "x_sql_recursive_cte",
    "x_src_csv_roundtrip",
    "x_src_orc_roundtrip",
    "x_ts_peak_detection",
    "x_ts_survival_km",
    "x_ts_week_over_week",
    "x_win_first_last_value",
    "x_win_moving_median",
    # (2) the alphabetically-first r11-era ids as padding to 50
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
    "snk_excel_values",
    "snk_http_post",
    # (3) the window's two rows-only ids, slip-safe at the tail: the r10
    # converged-pagerank probe and the r11 styled-Excel sink refresh their
    # rows-only grades without ever displacing an oracle attestation
    "x_graph_pagerank_converged",
    "snk_excel_styled",
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
