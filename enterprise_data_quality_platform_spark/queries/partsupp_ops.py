"""Derived-partsupp TPC-H family (Q2/Q9/Q20 analogues).

The driver's synthetic schema ships no ``partsupp`` table, which blocked
the three partsupp-dependent TPC-H shapes (correlated min-over-group,
profit decomposition, inventory-vs-usage semi-join). This module closes
the gap with a DERIVED partsupp: the distinct (part, supplier) pairs that
actually traded in ``lineitem``, annotated with deterministic integer
supply-cost/avail-qty attributes (pure +,*,% over the keys — exact and
identical in any engine, so every query here carries a full DuckDB value
oracle).

Scale posture: the derivation is one dropDuplicates shuffle on the pair
key; at 100 TB it would be materialized once (bucketed by ps_partkey) and
reused, exactly like a real partsupp. The queries themselves follow the
repo's decorrelation discipline — no correlated subqueries survive into
the plan; min-over-group becomes a bounded window (suppliers-per-part ≤
|suppliers-per-part|), usage-vs-inventory becomes a pre-aggregated
equi-join.

Reference parity: the reference's BigQuery SQL surface is generic SELECT/
JOIN/GROUP BY (``/root/reference/airflow/dags/pager-workflow.py:120-126``);
these queries extend the repo's TPC-H mart family (SURVEY.md §2.7) to the
full relational-shape checklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import fx_round, sql_round
from .registry import register

#: SQL twin of ``derived_partsupp`` — keep byte-equivalent semantics.
PS_CTE = """
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             (l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS ps_supplycost_cents,
             (l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS ps_availqty
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )
"""


def derived_partsupp(
    spark: SparkSession,
    sf_dir: str,
    parts: DataFrame | None = None,
    suppliers: DataFrame | None = None,
) -> DataFrame:
    """The derived partsupp relation (see module docstring). Cost/qty are
    integer-arithmetic functions of the keys: exact, engine-portable, and
    stable across partitionings.

    ``parts`` (a ``p_partkey`` frame) pushes a part predicate INTO the
    derivation: the pair dedup shuffles only the filtered lines' pairs
    (a broadcast semi-join before dropDuplicates — 60M → ~6M rows at
    sf10 for a 10% part filter). Legal whenever the consumer only reads
    ps rows of those parts — restricting the PART axis never changes any
    surviving part's supplier set, so window-min/join results are
    row-identical to deriving from the full fact (A/B'd: Q9 6.7 → 2.6 s).

    ``suppliers`` (an ``s_suppkey`` frame) is the supplier-axis analogue
    (r8): legal whenever the consumer INNER-joins ps to exactly that
    supplier set — rows removed here are rows that join would drop, and
    any per-part aggregate computed AFTER that join (Q2's regional
    window-min) sees the identical candidate set. Both pushdowns compose
    (the semi-joins commute)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    if parts is not None:
        li = li.join(
            F.broadcast(parts), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
    if suppliers is not None:
        li = li.join(
            F.broadcast(suppliers),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
    pair = li.dropDuplicates()
    return pair.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 100000 + 100).alias(
            "ps_supplycost_cents"
        ),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey") * 3) % 9999 + 1).alias(
            "ps_availqty"
        ),
    )


@register(
    "mart_min_cost_supplier",
    oracle=f"""
    WITH {PS_CTE.strip()},
    costed AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents, s.s_name, s.s_acctbal,
             n.n_name AS nation_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT c.*, MIN(ps_supplycost_cents) OVER (PARTITION BY ps_partkey) AS min_cost
      FROM costed c
    )
    SELECT p.p_partkey AS part_key, p.p_brand AS brand, b.s_name AS supplier_name,
           b.nation_name, CAST(b.ps_supplycost_cents AS BIGINT) AS supplycost_cents,
           b.s_acctbal AS acctbal
    FROM best b
    JOIN part p ON p.p_partkey = b.ps_partkey
    WHERE b.ps_supplycost_cents = b.min_cost AND p.p_size <= 10
    ORDER BY acctbal DESC, supplier_name, part_key
    LIMIT 100
    """,
    tables=("lineitem", "supplier", "nation", "region", "part"),
)
def mart_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the EUROPE supplier(s) offering
    the minimum supply cost — the correlated-min-over-group query.

    r8: the EUROPE supplier set pushes into the pair derivation alongside
    the part filter (both broadcast semi-joins before the dedup — the
    dedup input shrinks ~5× further; 2.30 → 1.85 s at sf10, value-
    identical by the inner-join argument in derived_partsupp).

    Decorrelation: the correlated scalar subquery becomes ONE window min
    partitioned by part over the region-filtered costed relation (bounded
    group: suppliers-per-part), then an equality filter — no join-back, no
    second scan of the pair relation, one pair-key shuffle total.
    supplier/nation/region attach before the window so the min is over the
    correct (regional) candidate set; part attaches after (AQE-broadcast
    at any SF where the filtered part side fits). Top-100 is
    TakeOrderedAndProject."""
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    part = table(spark, sf_dir, "part")
    small_parts = part.filter(F.col("p_size") <= 10).select("p_partkey")
    # r8: push the EUROPE supplier set into the derivation too — the costed
    # join is INNER on exactly this set, so dedup input shrinks ~5× more
    # with row-identical results (see derived_partsupp docstring).
    europe_suppliers = (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    ps = derived_partsupp(
        spark, sf_dir, parts=small_parts, suppliers=europe_suppliers
    )
    costed = (
        ps.join(supplier, ps.ps_suppkey == supplier.s_suppkey)
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "ps_partkey",
            "ps_supplycost_cents",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation_name"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    best = costed.withColumn(
        "min_cost", F.min("ps_supplycost_cents").over(w)
    ).filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
    return (
        best.join(
            part.filter(F.col("p_size") <= 10).select("p_partkey", "p_brand"),
            best.ps_partkey == F.col("p_partkey"),
        )
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_brand").alias("brand"),
            F.col("s_name").alias("supplier_name"),
            "nation_name",
            F.col("ps_supplycost_cents").cast("long").alias("supplycost_cents"),
            F.col("s_acctbal").alias("acctbal"),
        )
        .orderBy(F.col("acctbal").desc(), "supplier_name", "part_key")
        .limit(100)
    )


@register(
    "mart_product_profit",
    oracle=f"""
    WITH {PS_CTE.strip()}
    SELECT n.n_name AS nation_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           {sql_round(
               "SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)"
               " - ps.ps_supplycost_cents * 100 * CAST(l.l_quantity AS BIGINT)) / 10000.0",
               2,
           )} AS profit
    FROM lineitem l
    JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    tables=("lineitem", "orders", "part", "supplier", "nation"),
)
def mart_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on a product line —
    revenue minus supply cost, the two-fact-derived-measures join.

    Exactness: revenue quantizes to 1e-4 units (``fx_units`` discipline),
    supply cost is integer cents × integer quantity × 100 — the whole
    profit sum is one exact BIGINT stream, so distributed order can't
    drift the compare; one division + half-up round at the very end.

    Plan: the part filter prunes lineitem FIRST (broadcast semi via the
    filtered part dim — AQE-sized), then the pair join against derived
    partsupp shuffles only the filtered lines; orders attaches on the
    orderkey edge for the year."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    bolt_parts = part.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    ps = derived_partsupp(spark, sf_dir, parts=bolt_parts)
    rev_units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000)
        + F.lit(0.5)
    ).cast("long")
    cost_units = (
        F.col("ps_supplycost_cents") * 100 * F.col("l_quantity").cast("long")
    )
    j = (
        li.join(
            F.broadcast(bolt_parts), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(supplier.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.sum(rev_units - cost_units).alias("profit_units"))
        .select(
            "nation_name",
            "order_year",
            fx_round(F.col("profit_units") / F.lit(10000.0), 2).alias("profit"),
        )
        .orderBy("nation_name", F.col("order_year").desc())
    )


@register(
    "mart_excess_inventory",
    oracle=f"""
    WITH {PS_CTE.strip()},
    usage AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS used_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    eligible AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN usage u
        ON u.l_partkey = ps.ps_partkey AND u.l_suppkey = ps.ps_suppkey
      JOIN part p ON p.p_partkey = ps.ps_partkey
      WHERE p.p_name LIKE '%gear%'
        AND ps.ps_availqty * 2 > u.used_qty
    )
    SELECT s.s_name AS supplier_name, n.n_name AS nation_name
    FROM eligible e
    JOIN supplier s ON s.s_suppkey = e.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY supplier_name
    """,
    tables=("lineitem", "part", "supplier", "nation"),
)
def mart_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding more than half a year's shipped
    quantity of a product line — the inventory-vs-usage correlated
    comparison, decorrelated to a pre-aggregated equi-join.

    The '> 50% of usage' predicate is the integer cross-multiplication
    ``2 * availqty > used_qty`` (no 0.5 literal, no float compare). Usage
    pre-aggregates lineitem to the (part, supplier) grain BEFORE any join,
    so the pair join sees |pairs| rows, not |lineitem|; the part filter
    broadcasts. Distinct suppliers, then names attach."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    gear_parts = part.filter(F.col("p_name").like("%gear%")).select("p_partkey")
    ps = derived_partsupp(spark, sf_dir, parts=gear_parts)
    usage = (
        li.join(
            F.broadcast(gear_parts), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("used_qty"))
    )
    eligible = (
        ps.join(
            usage,
            (ps.ps_partkey == usage.l_partkey)
            & (ps.ps_suppkey == usage.l_suppkey),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("used_qty"))
        .select("ps_suppkey")
        .dropDuplicates()
    )
    return (
        eligible.join(supplier, eligible.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation_name"),
        )
        .orderBy("supplier_name")
    )


@register(
    "mart_excess_inventory_checksum",
    # the BENCHED twin of mart_excess_inventory: identical Q20 pipeline,
    # the 100k eligible-supplier rows folded into per-nation counts plus a
    # 28-bit-md5-prefix name checksum (r7 decomposition: 0.7 s of the
    # 3.0 s sf10 bench was driver collect IPC). Any supplier appearing or
    # vanishing changes its nation's count AND checksum.
    oracle=f"""
    WITH {PS_CTE.strip()},
    usage AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS used_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    eligible AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN usage u
        ON u.l_partkey = ps.ps_partkey AND u.l_suppkey = ps.ps_suppkey
      JOIN part p ON p.p_partkey = ps.ps_partkey
      WHERE p.p_name LIKE '%gear%'
        AND ps.ps_availqty * 2 > u.used_qty
    )
    SELECT n.n_name AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(('0x' || substr(md5(s.s_name), 1, 7)) AS BIGINT))
             AS BIGINT) AS name_checksum
    FROM eligible e
    JOIN supplier s ON s.s_suppkey = e.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY nation_name
    ORDER BY nation_name
    """,
    tables=("lineitem", "part", "supplier", "nation"),
)
def mart_excess_inventory_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-output benched form of ``mart_excess_inventory`` (see that
    docstring for the Q20 decorrelation); the per-supplier twin stays
    registered for the driver's full-granularity gate."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    gear_parts = part.filter(F.col("p_name").like("%gear%")).select("p_partkey")
    ps = derived_partsupp(spark, sf_dir, parts=gear_parts)
    usage = (
        li.join(
            F.broadcast(gear_parts), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("used_qty"))
    )
    eligible = (
        ps.join(
            usage,
            (ps.ps_partkey == usage.l_partkey)
            & (ps.ps_suppkey == usage.l_suppkey),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("used_qty"))
        .select("ps_suppkey")
        .dropDuplicates()
    )
    name_term = F.conv(F.substring(F.md5(F.encode(F.col("s_name"), "UTF-8")), 1, 7), 16, 10).cast("long")
    return (
        eligible.join(supplier, eligible.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(name_term).alias("name_checksum"),
        )
        .orderBy("nation_name")
    )
