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

from pyspark.sql import DataFrame, SparkSession, Window as Wnd, functions as F

from .queries import cut, register, views

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


# ----------------------------------------------------------------------
# table_profile: per-column data-quality profile of lineitem — row
# count, nulls, exact distinct count, min/max — the ingest-validation
# pass every pipeline runs before trusting a new table drop. Every
# value is first mapped to ONE canonical int64 (doubles quantized to
# half-up cents, timestamps to epoch microseconds, single-char flags
# to their ASCII code — order-preserving in every case), so MIN/MAX
# equals the column's native order and the distinct agg hashes fixed-
# width integers instead of padded strings (the string canonicalization
# this query first shipped with spent its whole budget hashing 20-byte
# keys through the two-phase distinct — 13.1 s vs 3.0 s, same plan).
# The spec dict below generates the Spark expressions AND the oracle
# SQL, so the two sides cannot drift.
#
# Scale shape: the unpivot is a map-side stack (|cols| rows out per
# row in — explicit, no planner Expand), then ONE hash agg keyed by
# column name; |cols| groups. Exact per-column DISTINCT is the honest
# gate-scale choice; at 100 TB the same pass swaps COUNT(DISTINCT) for
# the mergeable FM sketch this repo already ships
# (distinct_sketch_fm) — documented, not silently approximated here.
_PROFILE_COLS: dict[str, tuple[str, str]] = {
    # col -> (spark canonical int64 expr, duckdb canonical int64 expr)
    "l_orderkey": ("cast(l_orderkey as bigint)",
                   "CAST(l_orderkey AS BIGINT)"),
    "l_partkey": ("cast(l_partkey as bigint)",
                  "CAST(l_partkey AS BIGINT)"),
    "l_suppkey": ("cast(l_suppkey as bigint)",
                  "CAST(l_suppkey AS BIGINT)"),
    "l_linenumber": ("cast(l_linenumber as bigint)",
                     "CAST(l_linenumber AS BIGINT)"),
    "l_quantity": (
        "cast(floor(l_quantity * 100 + 0.5) as bigint)",
        "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)",
    ),
    "l_extendedprice": (
        "cast(floor(l_extendedprice * 100 + 0.5) as bigint)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
    ),
    "l_discount": (
        "cast(floor(l_discount * 100 + 0.5) as bigint)",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
    ),
    "l_tax": (
        "cast(floor(l_tax * 100 + 0.5) as bigint)",
        "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)",
    ),
    "l_returnflag": ("cast(ascii(l_returnflag) as bigint)",
                     "CAST(ascii(l_returnflag) AS BIGINT)"),
    "l_linestatus": ("cast(ascii(l_linestatus) as bigint)",
                     "CAST(ascii(l_linestatus) AS BIGINT)"),
    "l_shipdate": (
        "unix_micros(cast(l_shipdate as timestamp))",
        "CAST(epoch_us(l_shipdate) AS BIGINT)",
    ),
}

_PROFILE_ORACLE = (
    "WITH u AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS col, {duck} AS val FROM lineitem"
        for c, (_, duck) in _PROFILE_COLS.items()
    )
    + """
)
SELECT col,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT(val) AS n_null,
       COUNT(DISTINCT val) AS n_distinct,
       MIN(val) AS min_val,
       MAX(val) AS max_val
FROM u GROUP BY col
"""
)


@register("table_profile", _PROFILE_ORACLE)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    n = len(_PROFILE_COLS)
    stack_args = ", ".join(
        f"'{c}', {sp}" for c, (sp, _) in _PROFILE_COLS.items()
    )
    u = spark.table("lineitem").select(
        F.expr(f"stack({n}, {stack_args}) AS (col, val)")
    )
    return u.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# ----------------------------------------------------------------------
# orders_month_pivot: the classic warehouse PIVOT report — order revenue
# (exact integer cents) as a priority × month matrix for one year. The
# engine uses DataFrame ``pivot`` with the month list pinned (no extra
# distinct-values pass); Spark compiles it to ONE partial/final hash
# aggregate whose pivot cells are conditional aggregates — same shape
# as a 5-group rollup, no Expand, no second scan. The oracle is the
# conditional-aggregation formulation (SUM(CASE WHEN month=m ...)), a
# genuinely different spelling of the same matrix. Empty cells stay
# NULL in both engines.
_MONTHS = list(range(1, 13))
_PIVOT_YEAR = 1997

_PIVOT_ORACLE = (
    "SELECT o_orderpriority,\n"
    + ",\n".join(
        f"       CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) = {m}"
        f" THEN CAST(FLOOR(o_totalprice * 100e0) AS BIGINT) END)"
        f" AS BIGINT) AS m{m:02d}"
        for m in _MONTHS
    )
    + f"""
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = {_PIVOT_YEAR}
GROUP BY o_orderpriority
"""
)


@register("orders_month_pivot", _PIVOT_ORACLE)
def q_orders_month_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    base = (
        spark.table("orders")
        .where(F.year("o_orderdate") == _PIVOT_YEAR)
        .select(
            "o_orderpriority",
            F.month("o_orderdate").alias("m"),
            F.expr("CAST(FLOOR(o_totalprice * 100e0) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    p = base.groupBy("o_orderpriority").pivot("m", _MONTHS).agg(
        F.sum("cents")
    )
    return p.select(
        "o_orderpriority",
        *[F.col(f"`{m}`").alias(f"m{m:02d}") for m in _MONTHS],
    )


# ----------------------------------------------------------------------
# fk_integrity: referential-integrity audit over every FK edge in the
# driver's TPC-H-style star — per relationship: child rows, orphan
# children (FK value with no parent), parent rows, childless parents.
# The single-source _FK_EDGES spec drives BOTH engines (the same
# pattern as functions/maps.py), so an edge added later cannot drift.
# On this data orphans are structurally 0 (the generator is consistent)
# while childless parents are live (TPC-H-style: ~1/3 of customers
# place no orders; parts/suppliers unreferenced at small SF) — the
# audit asserts the former and measures the latter.
#
# Scale shape: per edge, ONE full-outer join of two partial-aggregated
# key-cardinality relations (child groupBy key with map-side combine,
# parent keys distinct) followed by a partial-agg count rollup — the
# shuffle carries |distinct keys| rows, never raw children; the seven
# edges are independent branches of one job. At 10^12 child rows this
# is the audit you can actually afford: no row-level join output ever
# materializes.
_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{rel}' AS rel,
       (SELECT COUNT(*) FROM {ct}) AS n_child,
       (SELECT COUNT(*) FROM {ct} c LEFT JOIN {pt} p ON c.{ck} = p.{pk}
         WHERE p.{pk} IS NULL) AS n_orphan,
       (SELECT COUNT(*) FROM {pt}) AS n_parent,
       (SELECT COUNT(*) FROM {pt} p WHERE NOT EXISTS
         (SELECT 1 FROM {ct} c WHERE c.{ck} = p.{pk})) AS n_childless
"""
    for rel, ct, ck, pt, pk in _FK_EDGES
)


@register("fk_integrity", _FK_ORACLE)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    out = None
    for rel, ct, ck, pt, pk in _FK_EDGES:
        ckeys = (
            spark.table(ct)
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        pkeys = (
            spark.table(pt)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("is_p", F.lit(1))
        )
        summary = (
            ckeys.join(pkeys, "k", "full_outer")
            .agg(
                F.coalesce(F.sum("nc"), F.lit(0)).alias("n_child"),
                F.coalesce(
                    F.sum(F.when(F.col("is_p").isNull(), F.col("nc"))),
                    F.lit(0),
                ).alias("n_orphan"),
                F.count("is_p").alias("n_parent"),
                F.count(
                    F.when(
                        F.col("is_p").isNotNull() & F.col("nc").isNull(), 1
                    )
                ).alias("n_childless"),
            )
            .select(
                F.lit(rel).alias("rel"),
                "n_child",
                "n_orphan",
                "n_parent",
                "n_childless",
            )
        )
        out = summary if out is None else out.unionByName(summary)
    return out


# ----------------------------------------------------------------------
# revenue_rollup: nation × order-year revenue with ROLLUP subtotals —
# the warehouse drill-path report (detail → per-nation → grand total)
# in ONE pass. Spark's .rollup() compiles to a single Expand (3 grouping
# sets) feeding one partial/final hash agg — subtotals cost one extra
# replicated row per input row, never a second scan. grouping_id()
# disambiguates subtotal rows from a hypothetical real ('ALL', -1)
# group; both engines use the same standard bit order (first rollup
# column = MSB). Money is exact integer cents end-to-end.
_ROLLUP_ORACLE = """
WITH base AS (
  SELECT n.n_name,
         EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(FLOOR(o.o_totalprice * 100e0) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT COALESCE(n_name, 'ALL') AS nation,
       CAST(COALESCE(o_year, -1) AS BIGINT) AS o_year,
       CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS BIGINT) AS lvl,
       CAST(SUM(cents) AS BIGINT) AS revenue_c,
       COUNT(*) AS n_orders
FROM base
GROUP BY ROLLUP(n_name, o_year)
"""


@register("revenue_rollup", _ROLLUP_ORACLE)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    base = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.table("nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr("CAST(FLOOR(o_totalprice * 100e0) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    return (
        base.rollup("n_name", "o_year")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.sum("cents").alias("revenue_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_year", F.lit(-1)).cast("long").alias("o_year"),
            "lvl",
            "revenue_c",
            "n_orders",
        )
    )


# ----------------------------------------------------------------------
# lang_source_cube: grouping-sets OLAP rollup — the CUBE over
# (lang, source) with counts and exact char volume, the "report at
# every marginal" query behind ingest dashboards (per-language ×
# per-source, per-language totals, per-source totals, grand total in
# one pass). GROUPING() markers disambiguate a real NULL key from a
# rollup row; key columns are coalesced to '(all)' so the gate hashes
# a stable text domain.
#
# Scale shape: Spark plans CUBE as ONE Expand (×4 grouping sets,
# map-local — no extra scan) feeding a single partial/final hash agg;
# the exchange carries ≤ 4·|groups| rows per partition. At 10^12 docs
# this is strictly cheaper than the 4 separate GROUP BYs it replaces
# (one corpus scan instead of four). Plan-guarded: Expand + 2
# HashAggregate levels, no Python.

_CUBE_ORACLE = """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source,
       CAST(GROUPING(lang) AS BIGINT) AS lang_rollup,
       CAST(GROUPING(source) AS BIGINT) AS source_rollup,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents
GROUP BY CUBE(lang, source)
"""


@register("lang_source_cube", _CUBE_ORACLE)
def q_lang_source_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return (
        spark.table("documents")
        .cube("lang", "source")
        .agg(
            F.grouping("lang").cast("long").alias("lang_rollup"),
            F.grouping("source").cast("long").alias("source_rollup"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            F.coalesce("source", F.lit("(all)")).alias("source"),
            "lang_rollup",
            "source_rollup",
            "n_docs",
            "chars_sum",
        )
    )


# ----------------------------------------------------------------------
# small_order_revenue: TPC-H Q17's correlated-subquery shape — revenue
# locked in "small" orders, where small means below 20% of that part's
# average quantity. The textbook formulation is a correlated scalar
# subquery per row; the scalable plan DECORRELATES it: one
# partial/final (sum_qty, cnt) agg per part, broadcast back over the
# lineitem scan, the fractional-average comparison cleared of division
# as 5·qty_c·cnt < sum_qty_c (exact int64 — no 0.2·avg float), then
# one final rollup by brand. The oracle keeps the CORRELATED
# formulation (DuckDB decorrelates internally) — a genuinely different
# derivation of the same rows certifying the decorrelation is
# semantics-preserving.
#
# Scale shape: two scans of lineitem with ONE bounded (part-keyed)
# shuffle for the stats and a broadcast join back; no row-level
# correlated evaluation anywhere.

_SMALL_ORDER_ORACLE = f"""
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM({_CENTS}) AS BIGINT) AS lost_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * {_QTY_C} * (
        SELECT COUNT(*) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      ) < (
        SELECT SUM({_QTY_C.replace('l_quantity', 'l2.l_quantity')})
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
GROUP BY p.p_brand
"""


@register("small_order_revenue", _SMALL_ORDER_ORACLE)
def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_partkey",
        F.expr(_QTY_C).alias("qty_c"),
        F.expr(_CENTS).alias("cents"),
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(F.broadcast(stats), "l_partkey").where(
        5 * F.col("qty_c") * F.col("cnt") < F.col("sum_qty_c")
    )
    part = spark.table("part").select("p_partkey", "p_brand")
    return (
        small.join(F.broadcast(part), small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum("cents").cast("long").alias("lost_cents"),
        )
    )


# ----------------------------------------------------------------------
# top_supplier: TPC-H Q15's view-plus-global-max shape — quarterly
# discounted revenue per supplier, keep the supplier(s) achieving the
# global maximum. The interesting plan property is the MAX-equality
# join back onto the aggregate: the revenue agg is ONE bounded
# (suppkey-keyed) partial/final shuffle, the global max is a 1-row
# aggregate broadcast back (never a sort), and the supplier dim is a
# broadcast. Money stays integer cents throughout, so the equality
# comparison is exact (a double SUM would make "equals the max"
# ordering-dependent).

_TOPSUP_LO, _TOPSUP_HI = "1996-01-01", "1996-04-01"
_DISC_C_SQL = f"({_CENTS} * (1000000 - {_DISC_PPM}))"

_TOPSUP_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_DISC_C_SQL} // 1000000) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= '{_TOPSUP_LO}' AND l_shipdate < '{_TOPSUP_HI}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_c AS BIGINT) AS total_rev_c
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_c = (SELECT MAX(rev_c) FROM rev)
"""


@register("top_supplier", _TOPSUP_ORACLE)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= F.lit(_TOPSUP_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_TOPSUP_HI).cast("timestamp"))
    )
    rev = (
        li.select(
            "l_suppkey",
            F.expr(f"{_DISC_C_SQL} div 1000000").alias("disc_c"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("disc_c").alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    sup = spark.table("supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.rev_c == mx.mx)
        .join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_c").cast("long").alias("total_rev_c"),
        )
    )


# ----------------------------------------------------------------------
# custdist: TPC-H Q13's customer-order distribution — the COUNT-OF-
# COUNTS shape: per customer, how many non-urgent orders they placed
# (customers with zero orders included via the outer join), then the
# histogram of those counts. The interesting plan property is the
# double contraction: orders contract to (custkey, n) in one partial/
# final agg BEFORE the outer join (never join raw order rows to
# customers), and the second agg runs over the already-customer-sized
# relation. At 10^12-row fact scale the first agg is the only big
# shuffle; everything after is dimension-sized.

_CUSTDIST_ORACLE = """
WITH o AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders
  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1
), cc AS (
  SELECT c.c_custkey, COALESCE(o.n, 0) AS c_count
  FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM cc GROUP BY 1
"""


@register("custdist", _CUSTDIST_ORACLE)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    o = (
        spark.table("orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cc = (
        spark.table("customer")
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce("n", F.lit(0)).alias("c_count"))
    )
    return cc.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ----------------------------------------------------------------------
# wait_suppliers: TPC-H Q21's suppliers-who-kept-waiting shape, adapted
# to the driver schema (no commit/receipt dates — "late" is shipping
# more than WAIT_LATE_DAYS after the order date). A supplier "kept an
# order waiting" when, in a finished ('F') multi-supplier order, it was
# the ONLY supplier that shipped late. Q21's classic formulation is an
# EXISTS (another supplier participated) plus a NOT EXISTS (no OTHER
# supplier was late) — two correlated self-joins on the fact table.
#
# Scale shape: the engine replaces both correlated self-joins with ONE
# per-order contraction — n_supp = distinct suppliers, n_late_supp =
# distinct late suppliers per order — then a hash join of late supplier
# rows back to that order summary; qualification is (n_supp >= 2 AND
# n_late_supp = 1). The fact table shuffles ONCE by orderkey instead of
# three times (l1/l2/l3); orders joins in as a broadcast-able dim
# filter. The oracle keeps the EXISTS/NOT EXISTS formulation, so the
# gate certifies the decorrelated rewrite is semantics-preserving.
# numwait counts DISTINCT qualifying orders per supplier (multiplicity-
# free, exact cross-engine).

WAIT_LATE_DAYS = 75

_WAIT_ORACLE = f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         date_diff('day', o.o_orderdate, l.l_shipdate)
           > {WAIT_LATE_DAYS} AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late
), w AS (
  SELECT a.l_suppkey, a.l_orderkey FROM l1 a
  WHERE EXISTS (
      SELECT 1 FROM li b
      WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM li c
      WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey <> a.l_suppkey
        AND c.late)
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY 1, 2
"""


@register("wait_suppliers", _WAIT_ORACLE)
def q_wait_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    orders = (
        spark.table("orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        spark.table("lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                > WAIT_LATE_DAYS
            ).alias("late"),
        )
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late_supp"),
    )
    w = (
        per_supp.where(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    sup = spark.table("supplier").select("s_suppkey", "s_name")
    return (
        w.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


# ----------------------------------------------------------------------
# idle_customers: TPC-H Q22's "positive-balance customers who went
# quiet" shape — customers (in a selected nation stratum) whose account
# balance exceeds the stratum's positive-balance average AND who placed
# no order on/after the idle cutoff; rolled up per nation. Two classic
# decorrelations in one query: the scalar AVG subquery becomes a 1-row
# broadcast compared exactly as bal_c * cnt > sum_c (no float average),
# and the NOT EXISTS becomes a left_anti against the DISTINCT custkeys
# of post-cutoff orders (orders contract to distinct keys BEFORE the
# anti join — at 10^12 orders the anti probe is customer-sized, not
# fact-sized). The oracle keeps both correlated forms, so the gate
# certifies both rewrites. acctbal can be negative: FLOOR is floor
# division in both engines, consistent at the cents quantization.

IDLE_CUTOFF = "2001-01-01 00:00:00"

_BAL_C = "CAST(FLOOR(c_acctbal * 100e0) AS BIGINT)"

_IDLE_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey, {_BAL_C} AS bal_c
  FROM customer WHERE c_nationkey % 2 = 0
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
FROM cust c
WHERE c.bal_c * (SELECT COUNT(*) FROM cust p WHERE p.bal_c > 0)
        > (SELECT SUM(p.bal_c) FROM cust p WHERE p.bal_c > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
GROUP BY 1
"""


@register("idle_customers", _IDLE_ORACLE)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    cust = (
        spark.table("customer")
        .where(F.col("c_nationkey") % 2 == 0)
        .select(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") * F.lit(100.0))
            .cast("long")
            .alias("bal_c"),
        )
    )
    stats = cust.where(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("bal_c").alias("sum_c")
    )
    active = (
        spark.table("orders")
        .where(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        cust.join(F.broadcast(stats))
        .where(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .join(active, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("bal_c").cast("long").alias("total_bal_c"),
        )
    )


# ----------------------------------------------------------------------
# part_share_suppliers: TPC-H Q20's "suppliers holding an outsized
# share" shape over the driver schema (no partsupp — share is of
# SHIPPED quantity): a supplier dominates a part when it shipped more
# than SHARE_PPM of that part's total quantity; output each dominating
# supplier with how many parts it dominates. The correlated per-part
# total (oracle keeps the scalar subquery) decorrelates to ONE
# (partkey, suppkey) contraction + a per-part rollup of that already-
# contracted relation joined back on partkey — the fact table shuffles
# once; both aggs and the join share the partkey-prefix partitioning.
# Exact: quantities in integer centi-units, share test cleared of
# fractions as q * 1e6 > tot * SHARE_PPM (int64-safe: q ≤ 5e3 cents ×
# rows/part).

SHARE_PPM = 150_000

_PSHARE_ORACLE = f"""
WITH ps AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         CAST(SUM({_QTY_C}) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(a.q) AS BIGINT) AS dom_qty_c
FROM ps a JOIN supplier s ON s.s_suppkey = a.l_suppkey
WHERE a.q * 1000000
        > (SELECT SUM(b.q) FROM ps b WHERE b.l_partkey = a.l_partkey)
          * {SHARE_PPM}
GROUP BY 1, 2
"""


@register("part_share_suppliers", _PSHARE_ORACLE)
def q_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    # r6: ps feeds both the per-part total and the share join — cut()
    # so the lineitem agg runs once per invocation, and AQE can see
    # tot's true (tiny) size and broadcast it.
    ps = cut(
        spark.table("lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.floor(F.col("l_quantity") * F.lit(100.0))
            .cast("long")
            .alias("qty_c"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty_c").alias("q"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("q").alias("tot"))
    sup = spark.table("supplier").select("s_suppkey", "s_name")
    return (
        ps.join(tot, "l_partkey")
        .where(F.col("q") * F.lit(1_000_000) > F.col("tot") * F.lit(SHARE_PPM))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("q").cast("long").alias("dom_qty_c"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts", "dom_qty_c")
    )


# ----------------------------------------------------------------------
# priority_orders: TPC-H Q4's order-priority-checking shape — orders
# placed in a window that had at least one line shipped on/after a
# later horizon, counted per priority. The EXISTS decorrelates to a
# LEFT SEMI against the DISTINCT late orderkeys: lineitem contracts
# (filter + distinct, both pushed to the scan side) BEFORE touching
# orders, so the semi probe carries |late orders| keys, not fact rows;
# the oracle keeps the correlated EXISTS. Both scans are
# predicate-pushed (date filters reach parquet).

Q4_WINDOW = ("1996-01-01 00:00:00", "1997-01-01 00:00:00")
Q4_SHIP_HORIZON = "1999-01-01 00:00:00"

_Q4_ORACLE = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_WINDOW[0]}'
  AND o.o_orderdate <  TIMESTAMP '{Q4_WINDOW[1]}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= TIMESTAMP '{Q4_SHIP_HORIZON}')
GROUP BY 1
"""


@register("priority_orders", _Q4_ORACLE)
def q_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    late = (
        spark.table("lineitem")
        .where(F.col("l_shipdate") >= F.lit(Q4_SHIP_HORIZON).cast("timestamp"))
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    return (
        spark.table("orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q4_WINDOW[0]).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q4_WINDOW[1]).cast("timestamp"))
        )
        .join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


# ----------------------------------------------------------------------
# promo_share: TPC-H Q14's promotion-revenue-share shape per ship
# month — conditional aggregation over the lineitem ⋈ part broadcast
# join, the ratio cleared of floats as integer ppm (promo_c * 1e6 div
# total_c). One fact-scale pass: the part dim broadcasts, the month
# rollup is a single partial/final agg — no second scan for the
# denominator (the CASE carries both arms through one agg).

_PROMO_ORACLE = f"""
WITH li AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c
  FROM lineitem
)
SELECT li.month,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN li.disc_c ELSE 0 END)
         AS BIGINT) AS promo_c,
       CAST(SUM(li.disc_c) AS BIGINT) AS total_c,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN li.disc_c ELSE 0 END)
              * 1000000 // SUM(li.disc_c) AS BIGINT) AS share_ppm
FROM li JOIN part p ON p.p_partkey = li.l_partkey
GROUP BY 1
"""


@register("promo_share", _PROMO_ORACLE)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        "l_partkey",
        F.expr(
            f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000"
        ).alias("disc_c"),
    )
    part = spark.table("part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("month")
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("disc_c")).otherwise(0))
            .cast("long")
            .alias("promo_c"),
            F.sum("disc_c").cast("long").alias("total_c"),
        )
        .select(
            "month",
            "promo_c",
            "total_c",
            F.expr("promo_c * 1000000 div total_c").cast("long").alias("share_ppm"),
        )
    )


# ----------------------------------------------------------------------
# min_cost_supplier: TPC-H Q2's minimum-cost-supplier shape over the
# driver schema (no partsupp — "cost" is the cheapest line a supplier
# ever shipped for the part): per part, the supplier with the lowest
# per-(part, supp) minimum cents, ties to the smallest suppkey. The
# argmin is a map-side min(struct(min_c, suppkey)) over the already-
# contracted (part, supp) relation — NO window over fact rows (a
# ROW_NUMBER formulation would sort every part's candidate list; the
# struct-min is partial-aggregatable). The oracle takes the
# ROW_NUMBER formulation, certifying the struct-min rewrite; supplier
# dim joins back as a broadcast.

_MINCOST_ORACLE = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN({_CENTS}) AS min_c
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_partkey, l_suppkey, min_c,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY min_c, l_suppkey) AS rn
  FROM ps
)
SELECT r.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
       CAST(r.min_c AS BIGINT) AS min_c
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rn = 1
"""


@register("min_cost_supplier", _MINCOST_ORACLE)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    ps = (
        spark.table("lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.floor(F.col("l_extendedprice") * F.lit(100.0))
            .cast("long")
            .alias("c"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("c").alias("min_c"))
    )
    best = ps.groupBy("l_partkey").agg(
        F.min(F.struct("min_c", "l_suppkey")).alias("b")
    )
    sup = spark.table("supplier").select("s_suppkey", "s_name")
    return (
        best.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("b.l_suppkey").alias("l_suppkey"),
            F.col("b.min_c").cast("long").alias("min_c"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "min_c")
    )


# ----------------------------------------------------------------------
# national_share: TPC-H Q8's market-share shape — per order year, the
# revenue fraction flowing to suppliers of the even-nation bloc, as an
# exact integer-ppm ratio. Numerator and denominator ride ONE
# conditional agg (no second scan); the supplier→bloc flag joins as a
# BROADCAST dim; the only fact-scale exchange is lineitem ⋈ orders on
# orderkey. YEAR() is pushed into the scan projection, so the group
# domain is bounded (7 years) and the final agg is map-side-combined
# to almost nothing.

_NSHARE_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c
  FROM lineitem
)
SELECT CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN s.s_nationkey % 2 = 0 THEN li.disc_c ELSE 0 END)
         AS BIGINT) AS bloc_c,
       CAST(SUM(li.disc_c) AS BIGINT) AS total_c,
       CAST(SUM(CASE WHEN s.s_nationkey % 2 = 0 THEN li.disc_c ELSE 0 END)
              * 1000000 // SUM(li.disc_c) AS BIGINT) AS share_ppm
FROM li
JOIN orders o ON o.o_orderkey = li.l_orderkey
JOIN supplier s ON s.s_suppkey = li.l_suppkey
GROUP BY 1
"""


@register("national_share", _NSHARE_ORACLE)
def q_national_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(
            f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000"
        ).alias("disc_c"),
    )
    orders = spark.table("orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    sup = spark.table("supplier").select(
        "s_suppkey", (F.col("s_nationkey") % 2 == 0).alias("in_bloc")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("in_bloc"), F.col("disc_c")).otherwise(0))
            .cast("long")
            .alias("bloc_c"),
            F.sum("disc_c").cast("long").alias("total_c"),
        )
        .select(
            "o_year",
            "bloc_c",
            "total_c",
            F.expr("bloc_c * 1000000 div total_c").cast("long").alias("share_ppm"),
        )
    )


# ----------------------------------------------------------------------
# returns_impact: TPC-H Q10's returned-item-reporting shape — revenue
# lost to returned lineitems ('R') per customer, top 20 by exact
# cents. The top-k is a TakeOrderedAndProject over the already-
# customer-contracted relation (never a global sort of fact rows, and
# never a sort of all customers — the heap keeps 20 per partition);
# customer and nation dims join back as BROADCASTS after the top-k,
# so only 20 rows ever touch them. Tie-break pinned by custkey so the
# cut is deterministic cross-engine.

RETURNS_TOPK = 20

_RETURNS_ORACLE = f"""
WITH li AS (
  SELECT l.l_orderkey,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c
  FROM lineitem l WHERE l.l_returnflag = 'R'
), bycust AS (
  SELECT o.o_custkey, CAST(SUM(li.disc_c) AS BIGINT) AS lost_c
  FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
  GROUP BY 1
), top AS (
  SELECT o_custkey, lost_c FROM bycust
  ORDER BY lost_c DESC, o_custkey LIMIT {RETURNS_TOPK}
)
SELECT c.c_custkey, c.c_name, n.n_name, t.lost_c
FROM top t
JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""


@register("returns_impact", _RETURNS_ORACLE)
def q_returns_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = (
        spark.table("lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.expr(
                f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000"
            ).alias("disc_c"),
        )
    )
    orders = spark.table("orders").select("o_orderkey", "o_custkey")
    # r6: contract returned lineitems to per-ORDER sums before the
    # orderkey join (guide §2.3 aggregate-before-shuffle) — integer sums
    # regroup exactly; the join then carries one row per returned order
    # instead of one per returned lineitem.
    li_o = li.groupBy("l_orderkey").agg(F.sum("disc_c").alias("o_disc_c"))
    top = (
        li_o.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("o_disc_c").cast("long").alias("lost_c"))
        .orderBy(F.desc("lost_c"), F.asc("o_custkey"))
        .limit(RETURNS_TOPK)
    )
    cust = spark.table("customer").select("c_custkey", "c_name", "c_nationkey")
    nat = spark.table("nation").select("n_nationkey", "n_name")
    return (
        top.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "lost_c")
    )


# ----------------------------------------------------------------------
# orders_cohort_value: the revenue cohort triangle — customers
# cohorted by the quarter of their FIRST order; each (cohort_quarter,
# quarter_offset) cell sums the cohort's later order value in exact
# cents. The monetary sibling of events_retention's count triangle
# (different fact table, different offset algebra: quarters linearized
# as year·4 + q, so offsets subtract exactly).
#
# Scale shape: one custkey-keyed MIN agg (cohort assignment) + one
# custkey hash join back onto orders (on a cluster the join reuses the
# agg's exchange — same discipline as events_retention), then one
# grid-bounded final agg (cohorts × offsets). The oracle assigns
# cohorts with MIN() OVER (PARTITION BY custkey) — the window
# formulation — certifying the agg+join rewrite.

_COHORT_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(date_part('year', o_orderdate) * 4
              + (date_part('month', o_orderdate) - 1) // 3 AS BIGINT) AS yq,
         CAST(FLOOR(o_totalprice * 100e0) AS BIGINT) AS val_c
  FROM orders
), c AS (
  SELECT o_custkey, yq, val_c,
         MIN(yq) OVER (PARTITION BY o_custkey) AS cohort_q
  FROM o
)
SELECT cohort_q,
       CAST(yq - cohort_q AS BIGINT) AS offset_q,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(val_c) AS BIGINT) AS value_c
FROM c GROUP BY 1, 2
"""


@register("orders_cohort_value", _COHORT_ORACLE)
def q_orders_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    o = spark.table("orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 4
            + F.expr("(month(o_orderdate) - 1) div 3")
        )
        .cast("long")
        .alias("yq"),
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("long")
        .alias("val_c"),
    )
    first = o.groupBy("o_custkey").agg(F.min("yq").alias("cohort_q"))
    return (
        o.join(first, "o_custkey")
        .groupBy("cohort_q", (F.col("yq") - F.col("cohort_q")).alias("offset_q"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("val_c").cast("long").alias("value_c"),
        )
    )


# ----------------------------------------------------------------------
# supplier_cooccurrence: market-basket co-occurrence over orders —
# supplier pairs that ship in the SAME order with ABOVE-AVERAGE
# affinity (pair count strictly above the mean pair count, compared
# exactly as n_pair · n_pairs_total > sum_counts — no float mean),
# the "frequently shipped together" item-pair mining shape. An
# absolute support threshold cannot bind across scale factors (the
# synth supplier pool grows with SF, diluting per-pair counts ~16×
# from sf0.001 to sf0.01), so the mining rule is distribution-
# relative — and therefore live at every SF, which pytest asserts.
#
# The pair blowup is bounded by construction: pairs enumerate within
# an order only (fan-out per order = C(distinct suppliers, 2), ~7
# lines/order) — never a global supplier×supplier join; the same
# per-container discipline as host_neighbor_jaccard's wedge cap.
#
# Scale shape: lineitem contracts to DISTINCT (order, supplier) in
# one partial/final agg; the within-order self-join reuses that
# orderkey partitioning; the (a, b) pair agg and a 1-row stats
# broadcast finish it.

_COOC_ORACLE = """
WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pair AS (
  SELECT a.l_suppkey AS s_a, b.l_suppkey AS s_b,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM os a JOIN os b
    ON b.l_orderkey = a.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
)
SELECT s_a, s_b, n_orders FROM pair
WHERE n_orders * (SELECT COUNT(*) FROM pair)
        > (SELECT SUM(n_orders) FROM pair)
"""


@register("supplier_cooccurrence", _COOC_ORACLE)
def q_supplier_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    # r6 reshape (same as host_mirror_detect): ONE orderkey agg
    # (collect_set fuses the distinct), i<j supplier pairs generated
    # MAP-SIDE from each order's sorted supplier array instead of a
    # second shuffle through an orderkey self-join. Unlike the mirror
    # query the pair table here is NOT tiny (10.7M distinct pairs at
    # sf1.0), so a cut() would write ~250 MB per run — measured slower
    # than recomputing the chain for the mean statistic; leave lazy.
    ospp = (
        spark.table("lineitem")
        .select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("sl"))
        .where(F.size("sl") >= 2)
    )
    pr = ospp.select(
        F.posexplode("sl").alias("i", "s_a"), "sl"
    ).select(
        "s_a",
        F.explode(
            F.slice("sl", F.col("i") + F.lit(2), F.size("sl"))
        ).alias("s_b"),
    )
    pair = pr.groupBy("s_a", "s_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    stats = pair.agg(
        F.count(F.lit(1)).alias("np"), F.sum("n_orders").alias("tot")
    )
    return (
        pair.join(F.broadcast(stats))
        .where(F.col("n_orders") * F.col("np") > F.col("tot"))
        .select("s_a", "s_b", "n_orders")
    )


# ----------------------------------------------------------------------
# forecast_revenue (TPC-H Q6 shape): the pure scan-filter-agg — three
# range predicates ALL pushed to the parquet scan (shipdate year,
# discount band, quantity cap), zero joins, one partial/final agg to a
# single row. At 10^12 rows this is the query where pushdown is the
# whole game: the exchange carries one partial sum per partition.
# Revenue = price × discount, exact: cents × ppm // 1e6.

_Q6_YEAR = "1997"
_FORECAST_ORACLE = f"""
SELECT CAST(SUM(({_CENTS} * {_DISC_PPM}) // 1000000) AS BIGINT)
         AS revenue_c,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_YEAR}-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '{int(_Q6_YEAR) + 1}-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@register("forecast_revenue", _FORECAST_ORACLE)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(f"""
        SELECT CAST(SUM(({_CENTS} * {_DISC_PPM}) div 1000000) AS BIGINT)
                 AS revenue_c,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q6_YEAR}-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '{int(_Q6_YEAR) + 1}-01-01 00:00:00'
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity < 24
    """)


# ----------------------------------------------------------------------
# nation_volume (TPC-H Q7 shape): shipping volume between two nations
# by year — the double-dimension probe (supplier nation via lineitem,
# customer nation via orders) where BOTH nation filters broadcast onto
# the fact stream and prune it before the fact⋈fact orderkey join.
# Pair set chosen by key (all unequal pairs among keys 0-3 — synth
# nation assignment is sparse at tiny SF, so a single fixed pair can be
# empty; the small key set keeps the filter selective yet live at
# every SF). Keys are the stable spelling across SFs.

_Q7_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c
  FROM lineitem
)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM li.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(li.disc_c) AS BIGINT) AS revenue_c,
       COUNT(*) AS n_items
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_nationkey < 4 AND n2.n_nationkey < 4
  AND n1.n_nationkey <> n2.n_nationkey
GROUP BY 1, 2, 3
"""


@register("nation_volume", _Q7_ORACLE)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(f"""
      SELECT l_orderkey, l_suppkey, l_shipdate,
             ({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000 AS disc_c
      FROM lineitem
    """)
    nat = F.broadcast(spark.table("nation"))
    supp = (
        spark.table("supplier")
        .join(nat.where(F.col("n_nationkey") < 4),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"))
    )
    cust = (
        spark.table("customer")
        .join(nat.where(F.col("n_nationkey") < 4),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"))
    )
    # r6: attach the customer-nation broadcast to ORDERS before the
    # orderkey fact⋈fact join — the cn<4 filter prunes orders ~6× on
    # the broadcast (map-side), so the orderkey exchange carries only
    # qualifying orders (AQE then often broadcasts the shrunken side).
    orders = (
        spark.table("orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("o_orderkey", "cn_key", "cust_nation")
    )
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("sn_key") != F.col("cn_key"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum("disc_c").cast("long").alias("revenue_c"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ----------------------------------------------------------------------
# late_shipments (TPC-H Q12 shape, adapted — synth has no shipmode/
# receiptdate): per order-priority, how many lineitems shipped >60
# days after the order date vs on time. One orderkey equi-join (the
# orders side projects two columns), conditional counts in ONE
# partial/final agg — the CASE-inside-agg shape.

_Q12_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) FILTER (
         WHERE li.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       ) AS BIGINT) AS n_late,
       CAST(COUNT(*) FILTER (
         WHERE li.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
       ) AS BIGINT) AS n_ontime
FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
GROUP BY 1
"""


@register("late_shipments", _Q12_ORACLE)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").select("l_orderkey", "l_shipdate")
    orders = spark.table("orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAY"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(late).alias("n_late"),
            F.count_if(~late).alias("n_ontime"),
        )
    )


# ----------------------------------------------------------------------
# large_orders (TPC-H Q18 shape): orders whose total quantity exceeds a
# threshold — the agg→semi-probe decorrelation. Engine: ONE
# partial/final agg over l_orderkey (the heavy reduction), the HAVING
# filter applied BEFORE any dimension join, then the surviving handful
# of orders probe orders/customer. At 10^12 rows the post-HAVING side
# is tiny — AQE turns both probes into broadcasts at runtime.

_Q18_QTY = 220  # sum(l_quantity) threshold: 61 orders at sf0.001, 514 at sf0.01

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM({_QTY_C}) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY 1
  HAVING SUM({_QTY_C}) > {_Q18_QTY} * 100
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(FLOOR(o.o_totalprice * 100e0) AS BIGINT) AS total_c,
       big.qty_c
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("large_orders", _Q18_ORACLE)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    big = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr(_QTY_C)).cast("long").alias("qty_c"))
        .where(F.col("qty_c") > _Q18_QTY * 100)
    )
    orders = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("long").alias("total_c"),
    )
    cust = spark.table("customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "total_c", "qty_c")
    )


# ----------------------------------------------------------------------
# discount_revenue (TPC-H Q19 shape): revenue under an OR-of-ANDs
# predicate spanning fact and dimension columns — the disjunctive-
# pushdown test. The quantity bounds (the fact-only disjunct envelope
# l_quantity BETWEEN 1 AND 35) prune the scan BEFORE the part join;
# the brand/size conjuncts prune the broadcast dim; the residual OR
# evaluates post-join in codegen.

_Q19_PRED_SQL = """
   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 1 AND 15)
OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      AND l_quantity BETWEEN 10 AND 25)
OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      AND l_quantity BETWEEN 20 AND 35)
"""

_Q19_ORACLE = f"""
SELECT CAST(SUM(({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000)
            AS BIGINT) AS revenue_c,
       COUNT(*) AS n_items
FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
WHERE {_Q19_PRED_SQL}
"""


@register("discount_revenue", _Q19_ORACLE)
def q_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = (
        spark.table("lineitem")
        # fact-only envelope of the disjunction — prunes the scan
        .where(F.col("l_quantity").between(1, 35))
        .select("l_partkey", "l_quantity",
                F.expr(f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000")
                .alias("disc_c"))
    )
    part = F.broadcast(
        spark.table("part")
        .where(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(F.expr(_Q19_PRED_SQL))
        .agg(F.sum("disc_c").cast("long").alias("revenue_c"),
             F.count(F.lit(1)).alias("n_items"))
    )


# ----------------------------------------------------------------------
# important_parts (TPC-H Q11 shape, adapted — synth has no partsupp, so
# "stock value" is shipped discounted value per part): parts whose
# revenue exceeds the MEAN per-part revenue — the scalar-subquery
# decorrelation. (TPC-H's absolute 1/1000-of-total cutoff is dead on
# the synth's uniform part values at every SF, so the cutoff is
# distribution-relative; same pattern as supplier_cooccurrence.)
# Engine: ONE agg over partkey; the global total re-aggregates the
# PER-PART sums (a second tiny agg over the group rows, NOT a second
# fact scan) and broadcasts as a 1-row join. The mean comparison is
# exact integer: value_c · n_parts > total_c.

_Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000)
              AS BIGINT) AS value_c
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, value_c FROM pv
WHERE value_c * (SELECT COUNT(*) FROM pv) > (SELECT SUM(value_c) FROM pv)
"""


@register("important_parts", _Q11_ORACLE)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    pv = (
        spark.table("lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr(f"({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000")
            ).cast("long").alias("value_c")
        )
    )
    total = pv.agg(
        F.sum("value_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(total))
        .where(F.col("value_c") * F.col("n_parts") > F.col("total_c"))
        .select("l_partkey", "value_c")
    )


# ----------------------------------------------------------------------
# dominant_suppliers (TPC-H Q20 shape, adapted — no partsupp availqty,
# so "excess share" is shipped-quantity share): suppliers that shipped
# MORE THAN 2× THEIR FAIR SHARE of some part's total quantity
# (qty · n_suppliers_for_part > 2 · part_total — a strict-majority
# cutoff is dead on the synth's uniform shares once parts have many
# suppliers, so the rule is fair-share-relative and live at every SF),
# with how many parts each dominates. The per-(part, supplier) agg
# reuses the part partitioning for the part-total re-agg (no second
# fact scan), the share filter is exact integer, and only the
# surviving (part, supplier) pairs — a small set — join the supplier
# dim.

_Q20_ORACLE = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM({_QTY_C}) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY 1, 2
), pt AS (
  SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS part_qty_c,
         CAST(COUNT(*) AS BIGINT) AS n_supp
  FROM ps GROUP BY 1
), dom AS (
  SELECT ps.l_suppkey
  FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
  WHERE ps.qty_c * pt.n_supp > 2 * pt.part_qty_c
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominated
FROM dom JOIN supplier s ON s.s_suppkey = dom.l_suppkey
GROUP BY 1, 2
"""


@register("dominant_suppliers", _Q20_ORACLE)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    # r6: ps feeds both the per-part rollup and the dominance join —
    # cut() so the lineitem agg runs once per invocation, and AQE can
    # see pt's true (tiny) size and broadcast it.
    ps = cut(
        spark.table("lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr(_QTY_C)).cast("long").alias("qty_c"))
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("qty_c").cast("long").alias("part_qty_c"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    dom = (
        ps.join(pt, "l_partkey")
        .where(F.col("qty_c") * F.col("n_supp")
               > F.lit(2) * F.col("part_qty_c"))
        .select("l_suppkey")
    )
    supp = spark.table("supplier").select("s_suppkey", "s_name")
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominated"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "n_dominated")
    )


# ----------------------------------------------------------------------
# orders_rfm: RFM (recency / frequency / monetary) customer
# segmentation — the classic CRM cut. Per customer: days since last
# order (against the global max order date, integer epoch-day
# arithmetic), order count, and lifetime cents; each metric then gets
# an exact quintile label and the three digits concatenate into the
# segment code ("555" = best). Ties are pinned by custkey so the
# quintile assignment is total-order deterministic in both engines.
#
# Scale shape: ONE partial/final agg over custkey builds the metric
# table; each quintile comes from global_rank's bucket-offset
# decomposition (a monotone hash-bucket coarsening + a tiny offset
# window + broadcast back) — NO single-partition NTILE window, which
# is what the naive spelling would cost at 10^9 customers; the
# quintile is then (5·rank) div n against a 1-row broadcast count.

from .operators.ranking import global_rank as _global_rank


def _rfm_oracle() -> str:
    return """
WITH m AS (
  SELECT o_custkey AS c_custkey,
         CAST((epoch(MAX(MAX(o_orderdate)) OVER ())
               - epoch(MAX(o_orderdate))) // 86400 AS BIGINT) AS r_days,
         CAST(COUNT(*) AS BIGINT) AS f_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100e0) AS BIGINT))
              AS BIGINT) AS m_cents
  FROM orders GROUP BY o_custkey
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM m)
, q AS (
  SELECT m.*,
    (5 * (ROW_NUMBER() OVER (ORDER BY r_days DESC, c_custkey) - 1))
      // n.nc AS r_q,
    (5 * (ROW_NUMBER() OVER (ORDER BY f_orders, c_custkey) - 1))
      // n.nc AS f_q,
    (5 * (ROW_NUMBER() OVER (ORDER BY m_cents, c_custkey) - 1))
      // n.nc AS m_q
  FROM m, n
)
SELECT c_custkey, r_days, f_orders, m_cents,
       CAST(r_q + 1 AS BIGINT) AS r_q,
       CAST(f_q + 1 AS BIGINT) AS f_q,
       CAST(m_q + 1 AS BIGINT) AS m_q,
       CAST(r_q + 1 AS VARCHAR) || CAST(f_q + 1 AS VARCHAR)
         || CAST(m_q + 1 AS VARCHAR) AS segment
FROM q
"""


@register("orders_rfm", _rfm_oracle())
def q_orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    o = spark.table("orders")
    last = o.agg(F.max("o_orderdate").alias("gmax"))
    m = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("f_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")
            ).cast("long").alias("m_cents"),
        )
        .crossJoin(F.broadcast(last))
        .select(
            "c_custkey",
            # NTZ → timestamp cast is UTC (session.py pins the session
            # timezone), matching the oracle's naive epoch()
            F.expr(
                "(unix_seconds(cast(gmax AS timestamp))"
                " - unix_seconds(cast(last_order AS timestamp))) div 86400"
            ).cast("long").alias("r_days"),
            "f_orders",
            "m_cents",
        )
    )
    m = m.localCheckpoint(eager=False)  # three rank passes read it
    nc = m.agg(F.count(F.lit(1)).alias("nc"))

    def quint(df, col, desc_first, coarse, name):
        # bucket = coarse monotone quantization of the leading key
        # (negated for DESC order), keeping the bucket table bounded
        ordered = (
            [F.col(col).desc(), F.col("c_custkey")]
            if desc_first
            else [F.col(col), F.col("c_custkey")]
        )
        bucket = F.expr(
            f"-({col} div {coarse})" if desc_first
            else f"{col} div {coarse}"
        )
        ranked = _global_rank(
            df, bucket=bucket, order_cols=ordered, rank_col="_rk"
        )
        return ranked.crossJoin(F.broadcast(nc)).withColumn(
            name, F.expr("(5 * _rk) div nc + 1").cast("long")
        ).drop("_rk", "nc")

    # r6: each quint consumes its input twice (bucket counts + rank
    # join), so chaining three without cuts recompiles the previous
    # quintile's window up to 4× — lazy cut between passes.
    m = quint(m, "r_days", True, 32, "r_q").localCheckpoint(eager=False)
    m = quint(m, "f_orders", False, 4, "f_q").localCheckpoint(eager=False)
    m = quint(m, "m_cents", False, 1_000_000, "m_q")
    return m.select(
        "c_custkey", "r_days", "f_orders", "m_cents", "r_q", "f_q", "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    )


# ----------------------------------------------------------------------
# part_margin: realized vs list revenue per brand — the
# margin-erosion rollup that finally puts p_retailprice (the one
# driver column no other query touched) under the gate. Exact units:
# cents × centi-units (retail_c · qty_c vs disc_c · 100), one
# broadcast dim join, one partial/final agg.

_MARGIN_ORACLE = f"""
WITH li AS (
  SELECT l_partkey, {_QTY_C} AS qty_c,
         ({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000 AS disc_c
  FROM lineitem
)
SELECT p.p_brand,
       CAST(SUM(CAST(FLOOR(p.p_retailprice * 100e0) AS BIGINT) * li.qty_c)
            AS BIGINT) AS list_c100,
       CAST(SUM(li.disc_c * 100) AS BIGINT) AS actual_c100,
       COUNT(*) AS n_items
FROM li JOIN part p ON p.p_partkey = li.l_partkey
GROUP BY 1
"""


@register("part_margin", _MARGIN_ORACLE)
def q_part_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(f"""
      SELECT l_partkey, {_QTY_C} AS qty_c,
             ({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000 AS disc_c
      FROM lineitem
    """)
    part = F.broadcast(
        spark.table("part").select(
            "p_partkey",
            "p_brand",
            F.floor(F.col("p_retailprice") * F.lit(100.0))
            .cast("long")
            .alias("retail_c"),
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("retail_c") * F.col("qty_c"))
            .cast("long")
            .alias("list_c100"),
            F.sum(F.col("disc_c") * 100).cast("long").alias("actual_c100"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ----------------------------------------------------------------------
# mktsegment_revenue: lifetime revenue and customer counts per market
# segment — the last unexercised customer column (c_mktsegment) under
# the gate. Fact⋈dim on custkey (customer is fact-sized at warehouse
# scale — AQE picks the strategy, no forced broadcast), ONE
# partial/final agg; the distinct-customer count rides the same agg as
# count(DISTINCT) with Spark's standard two-phase expansion.

_SEGREV_ORACLE = """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100e0) AS BIGINT))
            AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
"""


@register("mktsegment_revenue", _SEGREV_ORACLE)
def q_mktsegment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    o = spark.table("orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("long")
        .alias("total_c"),
    )
    c = spark.table("customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("total_c").cast("long").alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
        )
    )


# ----------------------------------------------------------------------
# supplier_balance_tiers: supplier account-balance health per nation —
# negative / small / large balance tiers (TPC-H acctbals go negative:
# suppliers in debt), counts and exact summed cents per (nation,
# tier). Covers s_acctbal, the last unexercised supplier column. The
# tier is a CASE on exact cents; nation is a broadcast dim; ONE
# partial/final agg on a (nation × 3)-bounded key space.

_BAL_TIER = """
CASE WHEN bal_c < 0 THEN 'debt'
     WHEN bal_c < 500000 THEN 'small'
     ELSE 'large' END
"""

_SUPPBAL_ORACLE = f"""
WITH s AS (
  SELECT s_nationkey,
         CAST(FLOOR(s_acctbal * 100e0) AS BIGINT) AS bal_c
  FROM supplier
)
SELECT n.n_name, {_BAL_TIER} AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
FROM s JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


@register("supplier_balance_tiers", _SUPPBAL_ORACLE)
def q_supplier_balance_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    s = spark.table("supplier").select(
        "s_nationkey",
        F.floor(F.col("s_acctbal") * F.lit(100.0)).cast("long").alias("bal_c"),
    )
    nat = F.broadcast(spark.table("nation").select("n_nationkey", "n_name"))
    return (
        s.join(nat, s.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.expr(_BAL_TIER).alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("bal_c").cast("long").alias("total_bal_c"),
        )
    )


# ----------------------------------------------------------------------
# customer_order_gaps: purchase-cadence sufficient statistics — per
# customer the exact int64 ingredients (n_gaps, Σgap, Σgap², min, max
# in days) of inter-order gap analysis; the churn-model feature the
# RFM recency column summarizes with one number. The lag window
# partitions by CUSTOMER — bounded partitions, the legitimate window
# shape. Customers with one order surface with n_gaps = 0 (the agg
# counts only non-null lags), so the row set is the full customer
# base, not the repeat buyers.
#
# Scale shape: one exchange keyed by custkey feeding both the window
# and the final agg (same key — no second shuffle), arithmetic in
# codegen.

_GAPS_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS d,
         LAG(CAST(epoch(o_orderdate) // 86400 AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_d
  FROM orders
)
SELECT o_custkey AS c_custkey,
       CAST(COUNT(d - prev_d) AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(d - prev_d), 0) AS BIGINT) AS sum_gap,
       CAST(COALESCE(SUM((d - prev_d) * (d - prev_d)), 0) AS BIGINT)
         AS sum_gap2,
       CAST(MIN(d - prev_d) AS BIGINT) AS min_gap,
       CAST(MAX(d - prev_d) AS BIGINT) AS max_gap
FROM o GROUP BY 1
"""


@register("customer_order_gaps", _GAPS_ORACLE)
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    d = F.expr(
        "unix_seconds(cast(o_orderdate AS timestamp)) div 86400"
    ).cast("long")
    w = Wnd.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = spark.table("orders").select(
        "o_custkey", d.alias("d"), F.lag(d).over(w).alias("prev_d")
    )
    gap = F.col("d") - F.col("prev_d")
    return o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(gap).cast("long").alias("n_gaps"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("sum_gap"),
        F.coalesce(F.sum(gap * gap), F.lit(0)).cast("long").alias("sum_gap2"),
        F.min(gap).cast("long").alias("min_gap"),
        F.max(gap).cast("long").alias("max_gap"),
    )


# ----------------------------------------------------------------------
# nation_supplier_hhi: supplier-concentration Herfindahl index per
# nation — Σᵢ shareᵢ² of shipped quantity, the antitrust-style
# concentration screen (HHI > 2500 ≈ highly concentrated), integer-
# exact as hhi_ppm = floor(1e6 · Σ qᵢ² / (Σ qᵢ)²). The per-supplier
# quantities come from ONE fact agg; the nation rollup re-aggregates
# the supplier rows (agg-of-agg — never a second fact scan); the
# nation dim broadcasts.

_HHI_ORACLE = f"""
WITH sq AS (
  SELECT s.s_nationkey, li.l_suppkey,
         CAST(SUM({_QTY_C}) AS BIGINT) AS q
  FROM lineitem li JOIN supplier s ON s.s_suppkey = li.l_suppkey
  GROUP BY 1, 2
)
SELECT n_name, n_suppliers, total_qty_c,
       CAST(FLOOR(1000000e0 * CAST(sq2 AS DOUBLE)
                  / (CAST(total_qty_c AS DOUBLE) * total_qty_c))
            AS BIGINT) AS hhi_ppm
FROM (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(q) AS BIGINT) AS total_qty_c,
         CAST(SUM(q * q) AS BIGINT) AS sq2
  FROM sq JOIN nation n ON n.n_nationkey = sq.s_nationkey
  GROUP BY 1
)
"""


@register("nation_supplier_hhi", _HHI_ORACLE)
def q_nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_suppkey", F.expr(_QTY_C).alias("qc")
    )
    supp = F.broadcast(
        spark.table("supplier").select("s_suppkey", "s_nationkey")
    )
    sq = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("qc").cast("long").alias("q"))
    )
    nat = F.broadcast(spark.table("nation").select("n_nationkey", "n_name"))
    return (
        sq.join(nat, sq.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("q").cast("long").alias("total_qty_c"),
            # both sums exact int64; the ONE float op is a scalar
            # division of exact integers — order-independent, so the
            # floored ppm matches DuckDB bit-for-bit (a float SUM here
            # would be partial-order-sensitive and gate-unstable)
            F.sum(F.col("q") * F.col("q")).cast("long").alias("sq2"),
        )
        .select(
            "n_name", "n_suppliers", "total_qty_c",
            F.floor(
                F.lit(1000000.0) * F.col("sq2").cast("double")
                / (F.col("total_qty_c").cast("double")
                   * F.col("total_qty_c"))
            ).cast("long").alias("hhi_ppm"),
        )
    )


# ----------------------------------------------------------------------
# orders_price_audit: value-consistency audit between the orders
# header and its lineitem detail — per order the header total vs the
# summed detail charge (both exact cents), rolled up into sign
# buckets (header_high / equal / detail_high, plus detail_missing for
# headers with no lines) with counts and the summed absolute
# discrepancy. The data-quality twin of fk_integrity: that one checks
# KEYS, this checks VALUES — the reconciliation report a warehouse
# runs after every load. (On the synth world header and detail are
# generated independently, so the mismatch buckets are live by
# construction; the gate certifies the exact discrepancy accounting,
# not a vacuous all-equal.)
#
# Scale shape: ONE partial/final agg contracts lineitem to per-order
# charge; the header join is key-co-partitioned (AQE picks the
# strategy); the bucket rollup is a second tiny agg. No window.

_AUDIT_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM((({_CENTS} * (1000000 - {_DISC_PPM})) // 1000000)
              * (1000000 + {_TAX_PPM}) // 1000000) AS BIGINT) AS detail_c
  FROM lineitem GROUP BY 1
)
, j AS (
  SELECT o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100e0) AS BIGINT) AS header_c,
         li.detail_c
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT CASE WHEN detail_c IS NULL THEN 'detail_missing'
            WHEN header_c > detail_c THEN 'header_high'
            WHEN header_c < detail_c THEN 'detail_high'
            ELSE 'equal' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(ABS(header_c - detail_c)), 0) AS BIGINT)
         AS abs_diff_c
FROM j GROUP BY 1
"""


@register("orders_price_audit", _AUDIT_ORACLE)
def q_orders_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.sql(f"""
      SELECT l_orderkey,
             CAST(SUM((({_CENTS} * (1000000 - {_DISC_PPM})) div 1000000)
                  * (1000000 + {_TAX_PPM}) div 1000000) AS BIGINT)
               AS detail_c
      FROM lineitem GROUP BY 1
    """)
    o = spark.table("orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("long").alias("header_c"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    bucket = (
        F.when(F.col("detail_c").isNull(), "detail_missing")
        .when(F.col("header_c") > F.col("detail_c"), "header_high")
        .when(F.col("header_c") < F.col("detail_c"), "detail_high")
        .otherwise("equal")
    )
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.coalesce(F.sum(F.abs(F.col("header_c") - F.col("detail_c"))),
                   F.lit(0)).cast("long").alias("abs_diff_c"),
    )
