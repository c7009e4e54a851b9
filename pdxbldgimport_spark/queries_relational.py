"""Relational OLAP family over the driver's TPC-H-style tables
(lineitem / orders) — the classic warehouse shapes (pricing-summary
scan-agg, shipping-priority join + top-k) so every driver-provided
input table is exercised by the gated surface. The reference analog is
its plain-SQL reporting over loaded tables (the rake tasks' COUNT/SUM
reports); here they double as the engine's demonstration of pushed-down
scans + map-side partial aggregation on non-spatial inputs.

Cross-engine exactness: money flows as integer cents
(floor(price·100)), discounts/taxes as integer ppm; the discounted and
taxed amounts apply per-row with floor division on non-negative
operands (Spark ``div`` truncation == DuckDB ``//`` floor there), so
every aggregate is an exact int64 in both engines — no double sums
(which are ordering-sensitive) ever cross the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import register, views

CUTOFF = "1998-06-01 00:00:00"

_CENTS = "CAST(FLOOR(l_extendedprice * 100e0) AS BIGINT)"
_QTY_C = "CAST(FLOOR(l_quantity * 100e0) AS BIGINT)"
_DISC_PPM = "CAST(FLOOR(l_discount * 1000000e0) AS BIGINT)"
_TAX_PPM = "CAST(FLOOR(l_tax * 1000000e0) AS BIGINT)"


def _li_cte(div: str) -> str:
    """Per-row exact money columns; ``div`` spells the floor-division
    operator ('//' DuckDB, 'div' Spark)."""
    return f"""
  SELECT l_orderkey, l_returnflag, l_linestatus, l_shipdate,
         {_QTY_C} AS qty_c,
         {_CENTS} AS base_c,
         ({_CENTS} * (1000000 - {_DISC_PPM})) {div} 1000000 AS disc_c,
         (({_CENTS} * (1000000 - {_DISC_PPM})) {div} 1000000)
           * (1000000 + {_TAX_PPM}) {div} 1000000 AS charge_c
  FROM lineitem
"""


# ----------------------------------------------------------------------
# pricing_summary (TPC-H Q1 shape): one pushed-down scan + ONE
# partial/final hash agg over 4 group keys — the canonical map-side
# combine showcase; at 10^12 rows the exchange carries ≤ |groups| rows
# per partition.

_PRICING_ORACLE = f"""
WITH li AS ({_li_cte('//')})
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
       CAST(SUM(base_c) AS BIGINT) AS sum_base_c,
       CAST(SUM(disc_c) AS BIGINT) AS sum_disc_c,
       CAST(SUM(charge_c) AS BIGINT) AS sum_charge_c,
       COUNT(*) AS n_rows
FROM li
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY 1, 2
"""


@register("pricing_summary", _PRICING_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(
        "SELECT * FROM (" + _li_cte("div") + ")"
        f" WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("base_c").alias("sum_base_c"),
        F.sum("disc_c").alias("sum_disc_c"),
        F.sum("charge_c").alias("sum_charge_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ----------------------------------------------------------------------
# shipping_priority (TPC-H Q3 shape): filters pushed to BOTH scans, an
# orderkey equi-join (broadcast or shuffle per AQE — both sides shrink
# before the join), ONE partial/final revenue agg, and a
# TakeOrderedAndProject top-k (no global sort).

SHIP_TOP_K = 10

_SHIPPING_ORACLE = f"""
WITH li AS ({_li_cte('//')})
SELECT li.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(li.disc_c) AS BIGINT) AS revenue_c
FROM li
JOIN orders o ON o.o_orderkey = li.l_orderkey
WHERE o.o_orderdate < TIMESTAMP '{CUTOFF}'
  AND li.l_shipdate > TIMESTAMP '{CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue_c DESC, li.l_orderkey
LIMIT {SHIP_TOP_K}
"""


@register("shipping_priority", _SHIPPING_ORACLE)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(
        "SELECT l_orderkey, disc_c FROM (" + _li_cte("div") + ")"
        f" WHERE l_shipdate > TIMESTAMP '{CUTOFF}'"
    )
    orders = spark.table("orders").where(
        F.expr(f"o_orderdate < TIMESTAMP '{CUTOFF}'")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("disc_c").alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(SHIP_TOP_K)
    )


# ----------------------------------------------------------------------
# local_supplier_volume (TPC-H Q5 shape): revenue per nation where the
# customer and supplier share a nation, rolled up per region+nation — the classic
# snowflake join chain (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
# nation ⋈ region). Together with brand_revenue below this puts every
# remaining driver table (customer, supplier, nation, region, part)
# under the gate. Engine shape: the two genuinely small dims (nation 25
# rows, region 5) broadcast explicitly; customer/supplier join under
# AQE (at warehouse scale customer is fact-sized — forcing a broadcast
# there would be wrong); ONE partial/final revenue agg at the end.

def _q5_li(div: str) -> str:
    return f"""
  SELECT l_orderkey, l_suppkey,
         ({_CENTS} * (1000000 - {_DISC_PPM})) {div} 1000000 AS disc_c
  FROM lineitem
"""


_Q5_ORACLE = f"""
WITH li AS ({_q5_li('//')})
SELECT r.r_name, n.n_name, CAST(SUM(li.disc_c) AS BIGINT) AS revenue_c,
       COUNT(*) AS n_items
FROM li
JOIN orders o   ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND o.o_orderdate < TIMESTAMP '{CUTOFF}'
GROUP BY 1, 2
"""


@register("local_supplier_volume", _Q5_ORACLE)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql("SELECT * FROM (" + _q5_li("div") + ")")
    orders = spark.table("orders").where(
        F.expr(f"o_orderdate < TIMESTAMP '{CUTOFF}'")
    ).select("o_orderkey", "o_custkey")
    cust = spark.table("customer").select("c_custkey", "c_nationkey")
    supp = spark.table("supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(spark.table("nation"))
    reg = F.broadcast(spark.table("region"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nat, nat.n_nationkey == supp.s_nationkey)
        .join(reg, reg.r_regionkey == nat.n_regionkey)
    )
    return j.groupBy("r_name", "n_name").agg(
        F.sum("disc_c").alias("revenue_c"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ----------------------------------------------------------------------
# brand_revenue: discounted revenue and volume per part brand — the
# part-dimension rollup (broadcast the dim onto the fact stream, one
# partial/final agg; the "broadcast small dims" lever on a true
# dimension table).

_BRAND_ORACLE = f"""
WITH li AS (
  SELECT l_partkey,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c,
         {_QTY_C} AS qty_c
  FROM lineitem
)
SELECT p.p_brand, CAST(SUM(li.disc_c) AS BIGINT) AS revenue_c,
       CAST(SUM(li.qty_c) AS BIGINT) AS sum_qty_c, COUNT(*) AS n_items
FROM li JOIN part p ON p.p_partkey = li.l_partkey
GROUP BY 1
"""


@register("brand_revenue", _BRAND_ORACLE)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(
        "SELECT l_partkey, "
        f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000 AS disc_c, "
        f"{_QTY_C} AS qty_c FROM lineitem"
    )
    part = F.broadcast(spark.table("part").select("p_partkey", "p_brand"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("disc_c").alias("revenue_c"),
            F.sum("qty_c").alias("sum_qty_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
