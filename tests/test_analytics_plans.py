"""Plan-shape guards for the relevance / timeseries / BI modules.

Correctness is the registry sweep's job; these pin the scale-relevant
physical properties: no accidental cartesians, corpus statistics ride
broadcasts, window operators shuffle once on their natural key, and the
basket pair-generation collapses multiplicity before self-joining."""

from __future__ import annotations

import pytest

from dataengineer_scripts_spark import registry

DEFS = registry.definitions()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "x_llm_tfidf_topk",
        "x_llm_bm25_rank",
        "x_llm_char_trigram_profile",
        "x_llm_zipf_fit",
        "x_ts_rolling_zscore",
        "x_ts_time_weighted_avg",
        "x_ts_attribution_last_touch",
        "x_ts_time_to_convert",
        "x_agg_regression_stats",
        "x_agg_entropy",
        "x_agg_gini",
        "x_win_period_over_period",
        "x_agg_market_basket",
        "x_win_cohort_revenue",
        # round-9 additions
        "x_tpch_q7_volume_shipping",
        "x_tpch_q8_market_share",
        "x_tpch_q15_top_supplier",
        "x_tpch_q17_small_quantity_revenue",
        "x_tpch_q21_waiting_suppliers",
        "x_etl_cdc_compact",
        "x_etl_merge_upsert",
        "x_ts_anomaly_mad",
        "x_ts_attribution_linear",
        "x_ts_ewma",
        "x_agg_corr_matrix",
        "x_win_rank_change",
        "x_llm_winnowing_fingerprint",
        "x_agg_waterfall",
        "x_ts_cusum_drift",
        "x_ts_seasonal_decompose",
        "x_win_moving_median",
        "x_llm_dup_graph_degree",
        "x_join_scd2_pointintime",
        "x_graph_pagerank",
        "x_ts_survival_km",
        "x_agg_weighted_stats",
        "x_ts_peak_detection",
        "x_agg_decile_edges",
        "x_etl_outlier_iqr",
        "x_llm_lang_confusion",
        "x_agg_bitmask_usage",
        "x_win_first_last_value",
        "x_llm_dedup_suffix",
        "x_llm_template_extract",
        "x_agg_grouping_id",
        "x_src_csv_roundtrip",
        "x_src_orc_roundtrip",
        "x_etl_profile_table",
        "x_ts_week_over_week",
        "x_agg_bool_logic",
        "x_agg_audience_overlap",
        "x_fn_date_arith",
        "x_agg_percentile_cont_disc",
    ],
)
def test_no_cartesian_anywhere(name, spark, sf_dir):
    # single-row scalar broadcasts legitimately appear as
    # BroadcastNestedLoop with a 1-row build; a CartesianProduct never
    # should.
    plan = _physical(DEFS[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["x_llm_tfidf_topk", "x_llm_bm25_rank", "x_agg_market_basket"]
)
def test_corpus_stats_ride_broadcast_joins(name, spark, sf_dir):
    plan = _physical(DEFS[name].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_rolling_zscore_single_user_shuffle(spark, sf_dir):
    # the three frame aggregates share one window spec: exactly one
    # Window node, fed by one user-keyed exchange
    plan = _physical(DEFS["x_ts_rolling_zscore"].fn(spark, sf_dir))
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_attribution_no_self_join(spark, sf_dir):
    # carry-forward formulation: a window pass, never events⋈events
    plan = _physical(DEFS["x_ts_attribution_last_touch"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_period_over_period_lag_runs_above_month_grain(spark, sf_dir):
    # the global (unpartitioned) lag window is safe only because it runs
    # over the month-grain aggregate: the aggregate must sit BELOW the
    # window in the plan
    plan = _physical(DEFS["x_win_period_over_period"].fn(spark, sf_dir))
    win_at = plan.index("Window")
    agg_after_window = plan[win_at:].count("HashAggregate")
    assert agg_after_window >= 1  # aggregate is downstream in print order


def test_basket_collapses_multiplicity_before_pairing(spark, sf_dir):
    # DISTINCT (order, brand) must aggregate BEFORE the self-join, so
    # pair generation is quadratic in basket size, not line count.
    # The basket frame and pair counts are session-shared checkpoints
    # (bi._basket_ob/_brand_pair_counts), which hide their lineage from
    # the consumer plan — assert on the exposed pre-checkpoint builds
    # (the _exact_text_buckets convention).
    from dataengineer_scripts_spark.operators.bi import (
        _basket_ob_build,
        _brand_pair_counts_build,
    )

    ob = _basket_ob_build(spark, sf_dir)
    pairs = _brand_pair_counts_build(spark, sf_dir, ob)
    plan = _physical(pairs)
    assert "CartesianProduct" not in plan
    joins = [
        j
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        if j in plan
    ]
    assert joins, f"no hash/merge join found in plan:\n{plan[:2000]}"
    # the distinct must survive into the physical plan: removing the
    # .distinct() from the basket frame eliminates its two-phase
    # (partial+final) aggregate pair on (l_orderkey, p_brand) — assert
    # on the optimized logical plan, where the grouping keys are legible
    # two aggregates in the pair build: the (l_orderkey, p_brand)
    # distinct BELOW the self-join + the pair-count rollup above it
    logical = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "l_orderkey" in logical and logical.count("Aggregate") >= 2
    # and the consumer query still broadcasts the per-brand stats back
    plan_mb = _physical(DEFS["x_agg_market_basket"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan_mb


def test_range_bucketized_join_is_equi_hash_not_nested_loop(spark, sf_dir):
    # the whole point of bucketization: a fact-fact interval join that
    # would be a nested loop becomes a bucket-keyed hash join with the
    # |dt| predicate as residual
    plan = _physical(DEFS["x_join_range_bucketed"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_cdc_compact_is_argmax_aggregate_not_window(spark, sf_dir):
    # last-writer-wins must be scalar hash-aggregate argmax + identity
    # join: no row_number window sorting every key group of the raw log,
    # and no SortAggregate fallback (max over a STRUCT would trigger it,
    # sorting every scan partition)
    plan = _physical(DEFS["x_etl_cdc_compact"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_merge_upsert_is_one_full_outer_join(spark, sf_dir):
    # the canonical MERGE lowering: exactly one full-outer join between
    # target and changeset; no per-op passes re-joining the target
    plan = _physical(DEFS["x_etl_merge_upsert"].fn(spark, sf_dir))
    assert plan.count("FullOuter") == 1


def test_ewma_trailing_window_is_equi_join(spark, sf_dir):
    # the gap-weighted trailing join must ride the exploded offset key
    # (hash/sort-merge equi join) — a range predicate would fall back to
    # BroadcastNestedLoop over the day frame
    plan = _physical(DEFS["x_ts_ewma"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_corr_matrix_is_single_scan_single_aggregate(spark, sf_dir):
    # ten sufficient statistics in ONE pass: one lineitem scan, one
    # logical aggregate (partial+final) — never a corr() pass per pair
    df = DEFS["x_agg_corr_matrix"].fn(spark, sf_dir)
    plan = _physical(df)
    assert plan.count("Scan parquet") == 1


def test_rank_change_windows_sit_above_monthly_aggregate(spark, sf_dir):
    # the rank window partitions by month over the (month, nation)-grain
    # aggregate, which is localCheckpointed (it feeds both self-join
    # sides): the windows must read the materialized grain frame — zero
    # raw table scans anywhere in the final plan — and never a raw fact
    plan = _physical(DEFS["x_win_rank_change"].fn(spark, sf_dir))
    assert "Window" in plan
    assert plan.count("Scan parquet") == 0


def test_q21_lowers_to_semi_plus_anti(spark, sf_dir):
    plan = _physical(DEFS["x_tpch_q21_waiting_suppliers"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_winnowing_window_is_doc_partitioned(spark, sf_dir):
    # the sliding min must partition by doc_id (physical text shows the
    # partition spec inside the Window operator line)
    plan = _physical(DEFS["x_llm_winnowing_fingerprint"].fn(spark, sf_dir))
    assert "Window" in plan
    window_line = [l for l in plan.split("\n") if "Window" in l][0]
    assert "doc_id" in window_line


def test_scd2_pointintime_is_one_shuffle_no_range_join(spark, sf_dir):
    # merged-stream formulation: ONE exchange on the business key, one
    # carry-forward window, and NO join at all (the naive fact-x-version
    # range join would BNL or double-shuffle the facts)
    plan = _physical(DEFS["x_join_scd2_pointintime"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_quality_filter_report_is_single_scan(spark, sf_dir):
    # four rules, one conditional aggregate, one documents scan
    plan = _physical(DEFS["x_llm_quality_filter_report"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1


def test_benford_is_single_scan_tiny_aggregate(spark, sf_dir):
    # digit histogram: ONE orders scan; the grand total is a window over
    # the <=9-row digit frame, never a second aggregate re-scanning orders
    plan = _physical(DEFS["x_agg_benford_distribution"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


@pytest.mark.parametrize(
    "name", ["x_llm_dataset_split", "x_llm_mixture_reweight"]
)
def test_share_denominators_do_not_rescan_documents(name, spark, sf_dir):
    # totals ride an unpartitioned window over the bounded aggregate
    # frame — a second aggregate would double the documents scans
    plan = _physical(DEFS[name].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, name
    assert "Join" not in plan, name


def test_coverage_curve_cut_is_takeordered(spark, sf_dir):
    # the candidate set must be a TakeOrdered top-k, and the cumulative
    # window must run over it (below it in print order), never over the
    # full vocabulary aggregate
    plan = _physical(DEFS["x_llm_ngram_coverage_curve"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "TakeOrderedAndProject" in plan.split("Window", 1)[1]


def test_gap_detect_grid_is_generated_not_joined_from_facts(spark, sf_dir):
    # the expected grid explodes from per-type bounds; the only join is
    # the final left-anti against the distinct present slots
    plan = _physical(DEFS["x_etl_gap_detect"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "Explode" in plan or "Generate" in plan


def test_ab_test_is_aggregates_only(spark, sf_dir):
    # arm assignment is a projection; the whole test is two aggregates —
    # no join, no window
    plan = _physical(DEFS["x_agg_ab_test"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan


def test_tpch_q7_q8_push_filters_and_broadcast_dims(spark, sf_dir):
    for name in ("x_tpch_q7_volume_shipping", "x_tpch_q8_market_share"):
        df = DEFS[name].fn(spark, sf_dir)
        meta = df._jdf.queryExecution().toString()
        # the ship/order date range must reach a parquet scan
        assert "PushedFilters: [IsNotNull" in meta, name
        plan = _physical(df)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_decile_edges_is_one_scan_one_aggregate(spark, sf_dir):
    # nine percentiles share one aggregate (one sort per group inside the
    # buffer); the unpivot is a codegen'd posexplode — never an ntile
    # window over the fact table
    plan = _physical(DEFS["x_agg_decile_edges"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan


def test_outlier_iqr_fences_broadcast_onto_counting_scan(spark, sf_dir):
    # pass 2 must join the group-grain fence frame broadcast-side; the
    # counting scan itself is never shuffled for the join
    plan = _physical(DEFS["x_etl_outlier_iqr"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_stats_single_aggregate(spark, sf_dir):
    plan = _physical(DEFS["x_agg_weighted_stats"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_shared_member_ops_ship_their_guarded_build_lineage(spark, sf_dir):
    """The five session-shared flagship_analytics members have their plan
    guards asserted on the exposed _*_build lineages; this pins that the
    REGISTERED op actually ships that lineage (r19 ADVICE: without it the
    guards could silently drift onto dead code).  One order-insensitive
    result comparison per op — build() recomputed fresh vs the op's
    session-shared checkpoint."""
    from dataengineer_scripts_spark.operators import etl, relational

    members = {
        "x_agg_mode": relational._mode_build,
        "x_agg_funnel": relational._funnel_build,
        "x_agg_retention": relational._retention_build,
        "x_agg_rolling_distinct": relational._rolling_distinct_build,
        "x_etl_dq_report": etl._dq_report_build,
    }
    for name, build in members.items():
        got = DEFS[name].fn(spark, sf_dir)
        want = build(spark, sf_dir)
        assert sorted(got.columns) == sorted(want.columns), name
        key = sorted(got.columns)
        g = sorted(tuple(row[c] for c in key) for row in got.collect())
        w = sorted(tuple(row[c] for c in key) for row in want.collect())
        assert g == w, name
