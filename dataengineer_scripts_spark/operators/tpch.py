"""TPC-H-derived analytic suite over the fixture star schema.

The fixture tables (TESTDATA.md) are TPC-H-shaped, and the classic suite
is the canonical acceptance test for an analytics engine: every query
below is the standard TPC-H shape adapted to the columns the fixtures
actually carry (no ``partsupp``, no ``l_commitdate``/``l_receiptdate``,
no ``c_phone`` — each adaptation is noted per query).  Q1's pricing
summary and Q3's shipping priority already exist as
``x_agg_sum_avg_min_max`` and ``x_join_multiway_analytic``
(operators/relational.py); this module adds the remaining distinct
shapes: EXISTS-per-group (Q4), the 6-table snowflake revenue rollup
(Q5), the selective scan aggregate (Q6), returned-item top-k (Q10), the
outer-join count distribution (Q13), the conditional revenue share
(Q14), the HAVING-gated large-order join (Q18), disjunctive
predicate-pushdown revenue (Q19) and the anti-join + scalar-subquery
report (Q22).

Design notes (100 TB posture):
- region/nation/part/customer are dimension-sided and broadcast; orders
  and lineitem are the fact sides and meet in AQE-managed shuffle joins
  on their natural keys (skew-split enabled in session.py).
- Every float sum is accumulated as DECIMAL(30,10) of the per-row term
  in BOTH engines (each term is a deterministic elementwise double
  product; decimal addition is exact and associative, so the rounded
  result is bit-identical regardless of partitioning — a plain double
  sum rounds differently across engines at half-cent boundaries).
- The one top-k query (Q10) carries a deterministic tiebreak
  (``c_custkey``) under the rounded sort key, per SURVEY.md §7.4.2.
- EXISTS / NOT EXISTS lower to semi/anti joins — never a correlated
  per-row subquery, never a cartesian (guarded in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "x_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def x_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders placed in a quarter
    with at least one line item shipped more than 60 days after the
    order date, counted per priority.  Adaptation: the fixture has no
    ``l_commitdate``/``l_receiptdate``, so the lateness predicate is
    ``l_shipdate > o_orderdate + 60 days`` — same correlated-EXISTS
    shape, same selectivity role.

    Plan: the EXISTS lowers to ONE left-semi join on ``l_orderkey`` with
    the lateness inequality as a join residual — the quarter filter
    prunes the orders scan first, so the semi join probes only the
    quarter's orders; no correlated per-row subquery, no second pass."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "x_tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(30,10)), 2)
               ::DOUBLE AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def x_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from line items where
    the customer and supplier share a nation inside one region, per
    nation, for one order year — the suite's deepest join tree (six
    tables, snowflake + a fact-fact join).

    Plan: region→nation prunes FIRST (broadcast, 'ASIA' cuts nations
    5×), then customer and supplier join that pruned dim broadcast-side;
    the only data-sized shuffles are orders⋈lineitem on orderkey and the
    customer-supplier nation equality enforced as a residual on the
    already-joined row — Catalyst pushes ``r_name`` and the date range
    into the scans (PushedFilters), so the fact shuffle carries one
    filtered year, not the table."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "x_tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(30,10)), 2)
               ::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def x_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the revenue that would have
    been lost had discounts in a band been eliminated for one ship year —
    a pure selective scan aggregate, zero joins.

    Plan: ALL three predicates reach the parquet scan as PushedFilters
    and the scan reads exactly four columns (ReadSchema); the aggregate
    is a map-side partial + one single-row final.  This is the query
    shape where a columnar scan does all the work — at 100 TB it is
    bounded by I/O after row-group min/max skipping, nothing else."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "x_tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(30,10)), 2)
               ::DOUBLE AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def x_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): the 20 customers who lost the
    most revenue to returned items in one quarter — the classic "who to
    call" churn report.

    Plan: return flag + date range push into the two fact scans, the
    orderkey fact-fact join shuffles only the quarter's returned lines,
    customer/nation ride in broadcast-side, and the top-20 is a TakeOrdered
    over the rounded sort key with ``c_custkey`` as the deterministic
    tiebreak (ties in rounded revenue would otherwise make the cut
    engine-dependent)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "x_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def x_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed 0, 1,
    2… qualifying orders — the outer-join-then-histogram shape that
    catches engines that drop unmatched rows.  Adaptation: the original
    excludes orders by comment pattern; the fixture has no comment, so
    the exclusion is ``o_orderpriority <> '5-LOW'`` — same
    filter-inside-left-join semantics (the filter must NOT eliminate
    customers, only their orders).

    Plan: the filter rides IN the join condition (a WHERE would turn the
    outer join inner); ``count(o_orderkey)`` counts non-null matches so
    order-less customers land in the 0 bucket.  Two hash aggregates; the
    second groups on a cardinality-bounded key (distinct order counts),
    so the final shuffle is tiny."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "x_tpch_q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END::DECIMAL(30,10))::DOUBLE
                 / sum((l_extendedprice * (1 - l_discount))
                       ::DECIMAL(30,10))::DOUBLE, 4)
               AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def x_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promotional parts' share of one
    month's revenue.  Adaptation: fixture ``p_type`` is a plain category
    ('PROMO', 'ECONOMY', …), so the test is equality, not the original
    ``LIKE 'PROMO%'`` — same conditional-aggregate-ratio shape.

    Plan: date range pushes into the lineitem scan (one month survives),
    part is broadcast, and both the conditional and total sums ride ONE
    aggregate — the ratio is computed in the single-row final, not via
    two passes."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc)
                    .otherwise(0.0)
                    .cast("decimal(30,10)")
                ).cast("double")
                / F.sum(disc.cast("decimal(30,10)")).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "x_tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity::DECIMAL(30,10)), 2)::DOUBLE AS sum_qty
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def x_tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customer): orders whose total quantity
    exceeds a threshold, with their customer — the HAVING-subquery-gated
    join shape.

    Plan: the gating aggregate (sum(l_quantity) per order, HAVING) runs
    once and semi-joins the fact ON THE SAME KEY the per-order aggregate
    just shuffled on, so AQE reuses the exchange; customers broadcast.
    The qualifying-order set is threshold-selective (<<1% of orders), so
    everything after the gate is small."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey", "semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(30,10)")), 2)
            .cast("double")
            .alias("sum_qty")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "x_tpch_q19_discounted_revenue",
    oracle="""
    SELECT round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(30,10)), 2)
               ::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#21' AND l_quantity BETWEEN 20 AND 30))
    """,
)
def x_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue from three disjunctive
    brand × quantity-band baskets — the OR-of-ANDs predicate that
    separates engines that can only push conjunctions.  Adaptation: the
    fixture part has no container/size combinations rich enough for the
    original triple, so the disjunction is brand × quantity bands.

    Plan: part is broadcast; the disjunction evaluates as the join
    residual in one codegen stage.  The quantity bounds (1..30 overall)
    still push to the lineitem scan as a covering range predicate —
    Catalyst derives ``l_quantity >= 1 AND l_quantity <= 30`` from the
    disjunction, so row groups outside the hull are skipped even though
    the full predicate is per-brand."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    basket = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#3") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(basket)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "x_tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pos AS (
        SELECT sum(c_acctbal::DECIMAL(30,10))::DOUBLE / count(*) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, count(*) AS numcust,
           round(sum(c_acctbal::DECIMAL(30,10)), 2)::DOUBLE AS totacctbal
    FROM customer c, nation, pos
    WHERE c.c_nationkey = n_nationkey AND c.c_acctbal > pos.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
)
def x_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): well-funded customers who
    have gone quiet — above-average account balance, no recent orders —
    counted per market.  Adaptation: the fixture has no ``c_phone``, so
    the market is the customer's nation and "no orders" is scoped to the
    recent window (every fixture customer has SOME order), preserving
    the scalar-subquery + NOT-EXISTS + aggregate composition.

    Plan: the positive-balance average is ONE scalar computed in a
    single-row aggregate and broadcast into the filter (no per-row
    subquery); NOT EXISTS lowers to a left-anti join against the
    date-pruned orders projection; nation broadcasts.  Anti-join input
    is already average-filtered, so the shuffle carries only the
    above-average slice."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    # decimal-exact average: the threshold is a comparison boundary, so a
    # parallel double sum (order-dependent in the last ulp) could flip a
    # customer across engines/runs; exact sum / exact count is identical
    # everywhere
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,10)")).cast("double")
            / F.count("*")
        ).alias("a")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(30,10)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )
