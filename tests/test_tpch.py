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
