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

from hypothesis import given, settings
from hypothesis import strategies as st

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


# --- differential property: random plan trees vs an independent counter ---

#: (node text, arity).  Window/exchange nodes are unary like Spark's; the
#: join is the binary shape; Sort/Project/Filter are pass-through unaries.
_NODES = [
    ("Window [sum(v) windowspecdefinition(...)], []", 1),
    ("WindowInPandas [udf(v) windowspecdefinition(...)], []", 1),
    ("Exchange SinglePartition, ENSURE_REQUIREMENTS", 1),
    ("Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS", 1),
    ("ReusedExchange [v], Exchange SinglePartition", 0),
    ("ReusedExchange [v], Exchange hashpartitioning(k, 32)", 0),
    ("Sort [k ASC NULLS FIRST], false, 0", 1),
    ("Project [k, v]", 1),
    ("Filter isnotnull(v)", 1),
    ("SortMergeJoin [k], [k], Inner", 2),
    ("FileScan parquet [k, v]", 0),
]


def _tree(draw, depth):
    text, arity = draw(
        st.sampled_from(_NODES if depth > 0 else [n for n in _NODES if n[1] == 0])
    )
    return (text, [_tree(draw, depth - 1) for _ in range(arity)])


def _render_lines(tree):
    """Render a tree in Spark's treeString style: non-last children get
    ':- ' markers with ':  ' continuation rails, the last child '+- '
    with '   ' rails."""
    text, children = tree
    out = [text]
    for i, ch in enumerate(children):
        last = i == len(children) - 1
        marker = "+- " if last else ":- "
        rail = "   " if last else ":  "
        sub = _render_lines(ch)
        out.append(marker + sub[0])
        out.extend(rail + s for s in sub[1:])
    return out


def _reference_hits(tree):
    """Independent recursive count: for each window node, pre-order-walk
    its subtree to the FIRST exchange (reused or not) and count the
    window iff that exchange is SinglePartition — nested windows do not
    stop the walk.  Mirrors the intended adjudication, derived from the
    tree, not the text."""

    def first_exchange(node):
        text, children = node
        if text.startswith(("Exchange", "ReusedExchange")):
            return text
        for ch in children:
            found = first_exchange(ch)
            if found is not None:
                return found
        return None

    def walk(node):
        text, children = node
        hits = 0
        if text.startswith(("Window", "WindowInPandas")):
            ex = None
            for ch in children:
                ex = first_exchange(ch)
                if ex is not None:
                    break
            if ex is not None and "SinglePartition" in ex:
                hits += 1
        return hits + sum(walk(ch) for ch in children)

    return walk(tree)


@given(data=st.data())
@settings(max_examples=300, deadline=None)
def test_hits_counter_matches_tree_reference_on_random_plans(data):
    """Differential fuzz of the text parser (r15 ADVICE hardening): for
    ANY random plan tree rendered in Spark's treeString format, the
    line-scanning counter must agree with an independent tree-walking
    reference — stacked windows, sibling branches, reused exchanges and
    rails included."""
    tree = _tree(data.draw, depth=data.draw(st.integers(0, 5)))
    plan = "\n".join(_render_lines(tree)) + "\n"
    assert unpartitioned_window_hits(plan) == _reference_hits(tree), plan
