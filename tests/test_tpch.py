"""Plan-shape guards for the TPC-H-derived suite (operators/tpch.py).

Correctness is covered by the registry-wide parity sweep
(test_registry_parity.py); these tests pin the SCALE-relevant physical
properties: EXISTS/NOT-EXISTS lower to hash semi/anti joins (never a
nested loop), dimensions broadcast, selective predicates reach the
parquet scan, and the one top-k query takes the limit without a global
sort of the full aggregate."""

from __future__ import annotations

from dataengineer_scripts_spark import registry

DEFS = registry.definitions()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_meta(df) -> str:
    # a selective query's PushedFilters list exceeds the 100-char default
    # metadata truncation; widen it for the assertion's sake
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    return df._jdf.queryExecution().toString()


def test_q4_exists_is_semi_join_with_lateness_residual(spark, sf_dir):
    df = DEFS["x_tpch_q4_order_priority"].fn(spark, sf_dir)
    plan = _physical(df)
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    semi_line = [ln for ln in plan.splitlines() if "LeftSemi" in ln][0]
    # equi key is the order key; the 60-day lateness inequality rides the
    # join as a residual, not a post-filter
    assert "l_orderkey" in semi_line and "l_shipdate" in semi_line
    # the quarter filter reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in _scan_meta(df)


def test_q5_dims_broadcast_one_fact_shuffle(spark, sf_dir):
    df = DEFS["x_tpch_q5_local_supplier_volume"].fn(spark, sf_dir)
    plan = _physical(df)
    # customer/supplier/nation/region all ride broadcast; the only
    # sort-merge-eligible join is orders⋈lineitem (AQE may still take it
    # broadcast at tiny SF, so assert the dims' side only)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # region prune reaches its scan
    assert "EqualTo(r_name,ASIA)" in _scan_meta(df)


def test_q6_predicates_push_and_scan_prunes(spark, sf_dir):
    df = DEFS["x_tpch_q6_forecast_revenue"].fn(spark, sf_dir)
    meta = _scan_meta(df)
    assert "GreaterThanOrEqual(l_shipdate" in meta
    assert "GreaterThanOrEqual(l_discount,0.05)" in meta
    assert "LessThan(l_quantity,24.0)" in meta
    # 4-column read of a 11-column table
    read = meta.split("ReadSchema: ")[-1].split("\n")[0]
    assert "l_quantity" in read and "l_extendedprice" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q10_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _physical(DEFS["x_tpch_q10_returned_items"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the return-flag filter reaches the lineitem scan
    df = DEFS["x_tpch_q10_returned_items"].fn(spark, sf_dir)
    assert "EqualTo(l_returnflag,R)" in _scan_meta(df)


def test_q13_filter_rides_join_not_where(spark, sf_dir, duck):
    # the priority exclusion must NOT push below the outer join's stream
    # side as a customer-eliminating filter: order-less customers stay.
    df = DEFS["x_tpch_q13_customer_distribution"].fn(spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    n_cust = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert sum(rows.values()) == n_cust  # every customer lands in a bucket


def test_q18_gate_semi_joins_on_aggregate_key(spark, sf_dir):
    plan = _physical(DEFS["x_tpch_q18_large_volume_customer"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_q19_derives_quantity_hull_for_the_scan(spark, sf_dir):
    # Catalyst derives l_quantity >= 1 AND <= 30 from the OR-of-ANDs and
    # pushes the hull to the scan even though the full disjunction is
    # per-brand
    meta = _scan_meta(DEFS["x_tpch_q19_discounted_revenue"].fn(spark, sf_dir))
    assert "GreaterThanOrEqual(l_quantity,1.0)" in meta
    assert "LessThanOrEqual(l_quantity,30.0)" in meta


def test_q22_not_exists_is_anti_join_scalar_broadcast(spark, sf_dir):
    plan = _physical(DEFS["x_tpch_q22_global_sales_opportunity"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan
    # the scalar average joins broadcast-side (single-row build)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


# --- round 16: the derived-partsupp queries (Q2/Q9/Q11/Q16/Q20) ---------


def test_partsupp_derivation_is_bit_identical_to_oracle(spark, duck, sf_dir):
    """The derived partsupp dimension must be BIT-identical between the
    Spark plan and the DuckDB oracle CTE — exact double equality, no
    rounding tolerance — because Q2 joins on ps_supplycost equality and
    Q11/Q20 compare it on thresholds.  Both sides read the suite's
    ``sf_dir``/``duck`` fixtures (the pair keeps them pointed at the
    SAME fixture even under the SPARK_GRAFT_TEST_SF override)."""
    from dataengineer_scripts_spark.operators.tpch import _PSUPP_SQL, _partsupp

    got = {
        (r.ps_partkey, r.ps_suppkey, r.ps_availqty, r.ps_supplycost)
        for r in _partsupp(spark, sf_dir).collect()
    }
    want = set(
        map(
            tuple,
            duck.sql(f"WITH {_PSUPP_SQL} SELECT * FROM psupp").fetchall(),
        )
    )
    assert got == want


def test_q2_min_cost_is_takeordered_with_broadcast_dims(spark, sf_dir):
    df = DEFS["x_tpch_q2_minimum_cost_supplier"].fn(spark, sf_dir)
    plan = _physical(df)
    # the LIMIT-100 report is a top-k, never a global sort of all parts
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan
    # the type-suffix filter reaches the part scan
    assert "StringEndsWith(p_type,ANDARD)" in _scan_meta(df)


def test_q9_part_filter_pushes_and_no_cartesian(spark, sf_dir):
    df = DEFS["x_tpch_q9_product_type_profit"].fn(spark, sf_dir)
    plan = _physical(df)
    assert "Cartesian" not in plan
    # part/supplier/nation ride broadcast joins; only pair-set and orders
    # joins may shuffle
    assert "BroadcastHashJoin" in plan
    # the product-line filter reaches the part scan as a contains pushdown
    assert "StringContains(p_name,red)" in _scan_meta(df)


def test_q11_threshold_is_single_row_broadcast(spark, sf_dir):
    plan = _physical(DEFS["x_tpch_q11_important_stock"].fn(spark, sf_dir))
    assert "Cartesian" not in plan
    # the nation-total denominator joins as a broadcast single-row build,
    # never a per-row subquery or a cross product
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan


def test_q16_blacklist_is_broadcast_anti_join(spark, sf_dir):
    plan = _physical(
        DEFS["x_tpch_q16_parts_supplier_relationship"].fn(spark, sf_dir)
    )
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan
    anti_line = [ln for ln in plan.splitlines() if "LeftAnti" in ln][0]
    assert "Broadcast" in anti_line


def test_q20_in_chain_lowers_to_semi_joins(spark, sf_dir):
    plan = _physical(
        DEFS["x_tpch_q20_potential_part_promotion"].fn(spark, sf_dir)
    )
    assert plan.count("LeftSemi") >= 2  # part-family IN + supplier IN
    assert "Cartesian" not in plan


def test_q20_excludes_supplier_without_surplus(spark, tmp_path):
    """Semantics micro-fixture: at fixture scale nearly every supplier
    holds SOME qualifying pair, so the availqty>half-shipped filter's
    exclusion branch never fires in the sf sweeps.  Pin it here: supplier
    0's only small-part pair has ps_availqty=1 (the key formula at
    (0,0)) against 10 shipped units (half=5) -> excluded; supplier 1's
    pair derives ps_availqty=32 against the same shipment -> kept."""
    import datetime as dt

    sf = str(tmp_path)
    spark.createDataFrame(
        [(15, "NATION_15", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(0, "S0", 15, 10.0), (1, "S1", 15, 10.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(0, "small ring"), (1, "big bolt")],
        "p_partkey long, p_name string",
    ).write.parquet(f"{sf}/part.parquet")
    ship = dt.datetime(1997, 6, 1)
    spark.createDataFrame(
        [(0, 0, 10.0, ship), (0, 1, 10.0, ship)],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")

    rows = DEFS["x_tpch_q20_potential_part_promotion"].fn(spark, sf).collect()
    assert [r.s_name for r in rows] == ["S1"]


def test_partsupp_cost_formula_injective_within_supplier_span():
    """Q2's equality join-back relies on ps_supplycost being injective in
    ps_suppkey for a fixed part: two suppliers of the same part collide
    only when 7*(s1-s2) ≡ 0 (mod 90000), i.e. when their keys differ by
    a multiple of 90000 (gcd(7, 90000) = 1).  Fixture supplier spans are
    orders of magnitude below that; pin the claim (and its boundary) by
    property so a formula edit that narrows the collision-free span
    cannot slip through."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def cost_cents(p: int, s: int) -> int:
        return (p * 13 + s * 7) % 90000 + 10000

    @given(
        p=st.integers(min_value=0, max_value=10**12),
        s1=st.integers(min_value=0, max_value=89_999),
        s2=st.integers(min_value=0, max_value=89_999),
    )
    @settings(max_examples=300, deadline=None)
    def check(p: int, s1: int, s2: int) -> None:
        if s1 != s2:
            assert cost_cents(p, s1) != cost_cents(p, s2)
        # the documented boundary: keys 90000 apart DO collide — the
        # injectivity claim is a span condition, not unconditional
        assert cost_cents(p, s1) == cost_cents(p, s1 + 90_000)
        # range claims the oracle arithmetic relies on
        assert 10_000 <= cost_cents(p, s1) <= 99_999
        assert 1 <= (p * 47 + s1 * 31) % 100 + 1 <= 100

    check()


def test_q11_threshold_keeps_above_average_parts_only(spark, tmp_path):
    """Semantics micro-fixture for Q11's self-normalizing HAVING (the
    review of the fixed-fraction bug asked for a non-vacuous local gate
    independent of fixture luck): one NATION_15 supplier (suppkey 2)
    holds three parts whose derived values are unequal by construction;
    only the part whose value exceeds 2x the nation average may survive.
    The expected survivor set is computed HERE from the same formulas,
    not hard-coded, so a formula change keeps the test honest."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(15, "NATION_15", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(2, "S2", 15, 10.0), (3, "S3", 7, 10.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{sf}/supplier.parquet")
    import datetime as dt

    ship = dt.datetime(1996, 6, 1)
    # parts 0/1/3 with supplier 2 (nation 15); part 1 also supplied by
    # supplier 3 (nation 7) — that pair must NOT contribute to the total
    pairs = [(0, 2), (1, 2), (3, 2), (1, 3)]
    spark.createDataFrame(
        [(p, s, 10.0, ship) for p, s in pairs],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")

    def value(p, s):
        availqty = (p * 47 + s * 31) % 100 + 1
        cost = ((p * 13 + s * 7) % 90000 + 10000) / 100.0
        return cost * availqty

    vals = {p: value(p, 2) for p, s in pairs if s == 2}
    avg = sum(vals.values()) / len(vals)
    expect = {p for p, v in vals.items() if v > 2.0 * avg}
    assert expect and expect != set(vals), (
        "micro-fixture must exercise BOTH branches; got " + str(vals)
    )
    rows = DEFS["x_tpch_q11_important_stock"].fn(spark, sf).collect()
    assert {r.ps_partkey for r in rows} == expect
    for r in rows:
        assert abs(r.value - vals[r.ps_partkey]) < 1e-6


def _python_partsupp(duck):
    pairs = duck.execute(
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"
    ).fetchall()
    return {
        (p, s): (
            (p * 47 + s * 31) % 100 + 1,
            ((p * 13 + s * 7) % 90000 + 10000) / 100.0,
        )
        for p, s in pairs
    }


def test_q9_profit_matches_python_rollup(spark, duck, sf_dir):
    """Brute-force Python reference for Q9 (the DuckDB oracle proves
    cross-engine agreement; this proves the profit FORMULA and the
    three-key join structure against a dict-join reimplementation over
    the collected fixture)."""
    import pytest

    ps = _python_partsupp(duck)
    nation = dict(duck.execute(
        "SELECT s_suppkey, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey").fetchall())
    red = {p for (p,) in duck.execute(
        "SELECT p_partkey FROM part WHERE p_name LIKE '%red%'").fetchall()}
    oyear = dict(duck.execute(
        "SELECT o_orderkey, year(o_orderdate) FROM orders").fetchall())
    agg: dict[tuple, float] = {}
    for ok, pk, sk, qty, ext, disc in duck.execute(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,"
        " l_extendedprice, l_discount FROM lineitem").fetchall():
        if pk not in red or (pk, sk) not in ps or sk not in nation:
            continue
        cost = ps[(pk, sk)][1]
        key = (nation[sk], oyear[ok])
        agg[key] = agg.get(key, 0.0) + (ext * (1 - disc) - cost * qty)
    got = {
        (r.nation, r.o_year): r.sum_profit
        for r in DEFS["x_tpch_q9_product_type_profit"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for k, v in agg.items():
        assert got[k] == pytest.approx(round(v, 2), abs=1e-4)


def test_q16_counts_match_python_reference(spark, duck, sf_dir):
    """Brute-force Python reference for Q16's NOT-IN + COUNT DISTINCT."""
    ps = _python_partsupp(duck)
    bad = {s for (s,) in duck.execute(
        "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0").fetchall()}
    keep_sizes = {1, 4, 9, 16, 25, 36, 49}
    part = {
        pk: (b, t, z)
        for pk, b, t, z in duck.execute(
            "SELECT p_partkey, p_brand, p_type, p_size FROM part").fetchall()
        if b != "Brand#21" and t != "MEDIUM" and z in keep_sizes
    }
    supp: dict[tuple, set] = {}
    for (pk, sk), _ in ps.items():
        if pk in part and sk not in bad:
            supp.setdefault(part[pk], set()).add(sk)
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in DEFS["x_tpch_q16_parts_supplier_relationship"]
        .fn(spark, sf_dir).collect()
    }
    assert got == {k: len(v) for k, v in supp.items()}
