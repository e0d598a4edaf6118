"""Synthetic-plan unit tests for tests/plan_sweep.unpartitioned_window_hits.

The registry-wide sweep adjudicates real executedPlan text; these cases pin
the parser's chain-walking rules on hand-written plan shapes so a parsing
regression is caught without building a single DataFrame.  The stacked
shape is the r15 ADVICE blind spot: a second global window directly on an
allowlisted one plans WITHOUT an intervening exchange (the inner window's
SinglePartition output already satisfies the outer's distribution), so the
scan must continue through nested window nodes, counting both.
"""

from __future__ import annotations

from .plan_sweep import unpartitioned_window_hits


def test_single_window_over_single_partition_exchange_counts_one():
    plan = (
        "Window [sum(v) windowspecdefinition(...)], []\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- FileScan parquet [v]\n"
    )
    assert unpartitioned_window_hits(plan) == 1


def test_partitioned_window_counts_zero():
    plan = (
        "Window [sum(v) windowspecdefinition(k, ...)], [k]\n"
        "+- Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS\n"
        "   +- FileScan parquet [k, v]\n"
    )
    assert unpartitioned_window_hits(plan) == 0


def test_stacked_windows_over_one_exchange_count_both():
    # the r15 ADVICE shape: no exchange between the windows — the inner
    # one's SinglePartition output satisfies the outer's distribution
    plan = (
        "Window [avg(v) windowspecdefinition(...)], []\n"
        "+- Window [sum(v) windowspecdefinition(...)], []\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "      +- FileScan parquet [v]\n"
    )
    assert unpartitioned_window_hits(plan) == 2


def test_stacked_partitioned_windows_count_zero():
    plan = (
        "Window [avg(v) windowspecdefinition(k, ...)], [k]\n"
        "+- Window [sum(v) windowspecdefinition(k, ...)], [k]\n"
        "   +- Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS\n"
        "      +- FileScan parquet [k, v]\n"
    )
    assert unpartitioned_window_hits(plan) == 0


def test_window_without_exchange_in_subtree_counts_zero():
    # input already satisfied the distribution upstream (bucketed scan)
    plan = (
        "Window [sum(v) windowspecdefinition(k, ...)], [k]\n"
        "+- Sort [k ASC], false, 0\n"
        "   +- FileScan parquet bucketed [k, v]\n"
    )
    assert unpartitioned_window_hits(plan) == 0


def test_reused_single_partition_exchange_still_counts():
    # Spark's exchange reuse names the reused exchange's partitioning on
    # the ReusedExchange line itself — it must adjudicate like Exchange
    plan = (
        "Window [avg(v) windowspecdefinition(...)], []\n"
        "+- ReusedExchange [v], Exchange SinglePartition\n"
    )
    assert unpartitioned_window_hits(plan) == 1


def test_window_in_pandas_is_a_window_node():
    plan = (
        "WindowInPandas [my_udf(v) windowspecdefinition(...)], []\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "   +- FileScan parquet [v]\n"
    )
    assert unpartitioned_window_hits(plan) == 1


def test_sibling_windows_adjudicate_independently():
    # a join of two windowed sides: one global, one partitioned — only
    # the global side counts; leaving the subtree ends each scan
    plan = (
        "SortMergeJoin [k], [k], Inner\n"
        ":- Window [sum(v) windowspecdefinition(...)], []\n"
        ":  +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        ":     +- FileScan parquet [v]\n"
        "+- Window [sum(v) windowspecdefinition(k, ...)], [k]\n"
        "   +- Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS\n"
        "      +- FileScan parquet [k, v]\n"
    )
    assert unpartitioned_window_hits(plan) == 1
