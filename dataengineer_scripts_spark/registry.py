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
# r16 window every id carries a ≥r11-era grade; the merge of
# CORRECTNESS_r01–r16.json puts the stalest cohort at exactly 29 ids graded
# r11 (the snk/src connector block and the LLM dedup/knn/fingerprint family)
# and 50 at r12.  This r17 window (prescribed id-for-id by the r16 verdict,
# item 2) takes those 29 r11 ids plus the 21 alphabetically-first r12 ids
# (agg_collect_errors … x_llm_lm_doc_score; the remaining 29 r12 ids rotate
# in at r18).  Five window ids are rows-only (the approx-sketch pair, the
# simhash dedup, and the two ANN index probes — each gated by an exact or
# *_scores oracle twin) — included so their rows-only grades refresh with
# the cohort, but listed LAST per the r13 slip-safety convention: a
# truncated window drops a weak attestation, never an oracle one.  After
# this window the stalest grade becomes r12.
_PRIORITY_NAMES = (
    # (0) the r11-era oracle-bearing ids — stalest cohort of the rotation
    "snk_json_records",
    "snk_parquet_partitioned",
    "snk_stdout_progress",
    "src_jdbc_select",
    "src_json_file",
    "src_parquet_schema_evolution",
    "src_rest_auth",
    "src_rest_get",
    "src_rest_limit_push",
    "x_llm_decontaminate",
    "x_llm_dedup_clusters",
    "x_llm_dedup_embed",
    "x_llm_dedup_exact",
    "x_llm_dedup_incremental",
    "x_llm_dedup_incremental_indexed",
    "x_llm_dedup_minhash",
    "x_llm_dedup_ngram_jaccard",
    "x_llm_dup_spans",
    "x_llm_fingerprint",
    "x_llm_knn_batch",
    "x_llm_knn_batch_blocked",
    "x_llm_knn_cosine",
    "x_llm_nearest_class",
    "x_llm_ngram_lm_counts",
    "x_llm_semdedup",
    "x_llm_vocab_topk",
    # (1) the alphabetically-first r12-era oracle-bearing ids, padding to 50
    "agg_collect_errors",
    "agg_count_threshold",
    "agg_exists_to_status",
    "agg_first_per_key",
    "exec_async",
    "exec_memo_cache",
    "exec_retry",
    "exec_sequential",
    "x_etl_scd2_merge",
    "x_etl_zorder_stats_sharded",
    "x_join_asof",
    "x_join_bucketed",
    "x_join_skew_salted",
    "x_llm_bpe_pair_counts",
    "x_llm_chunk_windows",
    "x_llm_dedup_keep_best",
    "x_llm_embed_quantize",
    "x_llm_lang_id",
    "x_llm_lm_doc_score",
    # (2) the window's five rows-only ids, slip-safe at the tail: the r11
    # approx-sketch pair + simhash dedup and the r12 ANN index probes
    # refresh their rows-only grades without ever displacing an oracle
    # attestation
    "x_agg_approx_distinct",
    "x_agg_approx_quantile",
    "x_llm_dedup_simhash",
    "x_llm_ann_ivf",
    "x_llm_ann_lsh",
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
