"""Staging models — the dbt staging layer done natively.

The reference's dbt Cloud job (triggered at
``/root/reference/airflow/dags/pager-workflow.py:292-306``) materializes
``stg_territory`` / ``stg_salesperson`` from ``raw_adventureworks`` dims
(``pager-workflow.py:126,133,159,174``): rename/cast projections. Here each
staging model is a pure ``DataFrame -> DataFrame`` function; materialization
(``df.write.parquet``) is the caller's choice, so Catalyst can also inline
the model into downstream plans (no forced materialization barrier).

All are narrow transformations: no shuffle, predicates/pruning push through
to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import fx_round


def stg_nation(nation: DataFrame) -> DataFrame:
    """Rename/cast projection (SURVEY.md §2.7 ``stg_projection_cast``) —
    the ``SalesTerritoryKey`` -> ``region_name`` axis of the reference's
    staging models (pager-workflow.py:159,127)."""
    return nation.select(
        F.col("n_nationkey").cast("bigint").alias("nation_key"),
        F.lower(F.col("n_name")).alias("nation_name"),
        F.col("n_regionkey").cast("bigint").alias("region_key"),
    )


def stg_lineitem_pricing(lineitem: DataFrame) -> DataFrame:
    """Derived expression columns (SURVEY.md §2.7 ``stg_derived_column``):
    net/charge prices computed row-wise, JVM-side, no shuffle."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        fx_round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "net_price"
        ),
        fx_round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            2,
        ).alias("charge_price"),
    )


def stg_orders_enriched(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Orders joined to their customer dimension — the enrichment-join shape
    of the Glue chain (``Glue-etl-pipeline.py:93-101`` Sales-Enrichment).
    Customer is the smaller side; at warehouse scale it still shuffles, so
    callers joining onward should reuse this key partitioning."""
    return orders.join(
        customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        orders["o_custkey"] == customer["c_custkey"],
        "inner",
    )
