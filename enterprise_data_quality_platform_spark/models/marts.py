"""Mart models — the dbt mart layer done natively.

The reference's mart is ``chicory_mds_marts.mart_sales_perfromance_dashboard``
(sic, ``/root/reference/airflow/dags/pager-workflow.py:189``): a join+agg
"sales performance dashboard" over the raw dims. These models implement that
shape (star join + aggregate + rank/rollup) Spark-first:

- dimension sides (region 5 rows, nation 25) are explicitly ``broadcast()``
  so the star join never shuffles the small sides (SURVEY.md §4.2);
- fact-side aggregations rely on Catalyst partial+final hash aggregation;
- top-k uses window rank bounded per partition — Spark plans the final
  ``orderBy().limit()`` as TakeOrderedAndProject, no global sort.

Float policy (SURVEY.md §2.7): money sums are quantized to fixed-point and
summed as integers (``functions.numeric``), so the result is independent of
partition/summation order AND bit-identical to the DuckDB oracle — plain
ROUND on doubles is NOT engine-portable (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import fx_avg as money_avg
from ..functions.numeric import fx_sum as money_sum


def mart_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (SURVEY.md §2.7
    ``mart_pricing_summary``). Pure scan + hash aggregate: Catalyst plans
    partial aggregation map-side, so the shuffle carries only
    (returnflag, linestatus) groups — 6 rows — not data."""
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = net * (1 + F.col("l_tax"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), "sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            money_sum(net, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            money_avg(F.col("l_quantity"), "avg_qty"),
            money_avg(F.col("l_extendedprice"), "avg_price"),
            money_avg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def mart_region_revenue(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """4-way star join + agg + sort (SURVEY.md §2.7 ``mart_region_revenue``)
    — the flagship; the closest analogue of the reference's sales-performance
    mart (pager-workflow.py:189). nation/region are broadcast: only the
    orders⋈customer equi-join shuffles, on the customer key.

    Aggregation is pushed BELOW the join: orders pre-aggregate per customer
    key (map-side partials, one shuffled row per customer) and only then
    meet the customer dimension — the fact join input shrinks by the
    orders-per-customer fan-in (10x here, measured 2.32 s -> 1.74 s at
    sf10), and the per-customer frame doubles as the Expand-free
    distinct-customer count. Money sums stay exact across the levels via
    integer fixed-point units."""
    from ..functions.numeric import fx_from_units, fx_units

    per_customer = orders.groupBy("o_custkey").agg(
        F.sum(fx_units(F.col("o_totalprice"))).alias("revenue_units"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    joined = (
        per_customer.join(customer, per_customer["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.groupBy(F.col("r_name").alias("region_name"))
        .agg(
            fx_from_units(F.sum("revenue_units")).alias("total_revenue"),
            F.sum("n_orders").alias("order_count"),
            F.count(F.lit(1)).alias("customer_count"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("region_name"))
    )


def mart_topk_customers(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k customers by revenue per nation via window rank (SURVEY.md §2.7
    ``mart_topk_customers``). Revenue is rounded BEFORE ranking so the order
    (and thus membership of the top-k) is identical to the oracle; c_name
    tiebreaks make it fully deterministic. Orders pre-aggregate per customer
    key below the join (same shape as mart_region_revenue) so the fact join
    carries one row per customer, not one per order."""
    per_cust = orders.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice"), "revenue")
    )
    revenue = (
        per_cust.join(customer, per_cust["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select("n_name", "c_name", "revenue")
    )
    # Single declarative window: Spark 4 plans rank<=k as WindowGroupLimit
    # with a Partial pass BEFORE the exchange, so each map task ships only
    # its local top-k per nation — a manual two-level tournament was A/B'd
    # at sf10 and is within noise (1.37 s vs 1.45 s). The c_name tiebreak
    # keeps membership deterministic and oracle-identical.
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("c_name"))
    return (
        revenue.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("c_name").alias("customer_name"),
            "revenue",
            F.col("rk").cast("bigint").alias("revenue_rank"),
        )
    )


def mart_rollup_revenue(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Region/nation rollup with subtotals + grand total (SURVEY.md §2.7
    ``mart_rollup_revenue``, R11) — the dashboard-subtotal pattern.

    Deliberately join-first (unlike mart_region_revenue's agg-below-join):
    the rollup's grouping keys are dimension columns only, so its partial
    aggregation collapses map-side to ~|regions x nations| rows per task —
    A/B at sf10: join-first 1.39 s vs pre-agg-below-join 1.85 s (the
    1.5M-unique-key hash aggregate costs more than streaming 15M rows
    through the sort-merge join). Agg-below-join only pays off when the
    post-join aggregate would re-shuffle fact-sized data (see
    mart_region_revenue / mart_topk_customers)."""
    joined = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.rollup(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        money_sum(F.col("o_totalprice"), "total_revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


def mart_priority_semijoin(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders that have at least one high-quantity lineitem, counted per
    priority (SURVEY.md §2.7 ``mart_priority_semijoin``, R7). Left-semi keeps
    the probe side narrow: only o_orderkey crosses the shuffle from lineitem."""
    big_items = lineitem.filter(F.col("l_quantity") >= 30).select("l_orderkey")
    return (
        orders.join(
            big_items, orders["o_orderkey"] == big_items["l_orderkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            money_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("o_orderpriority")
    )
