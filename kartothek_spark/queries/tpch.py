"""TPC-H-derived analytic query suite, adapted to the testdata schema.

The round-1 entry ships q1/q3/q5/q6/q10; this module adds the remaining
canonical TPC-H plan shapes, adapted where the slimmed testdata schema
lacks a column or table (no partsupp, no ship/commit/receipt-date trio,
no phone/container/comment columns):

* q4  — EXISTS semi-join ("late shipment" replaces commit<receipt)
* q7  — volume shipping between nation sets, double-aliased dim join
* q8  — market-share conditional ratio aggregation
* q9  — LIKE-filtered profit rollup by supplier nation and year
* q13 — outer-join order-count distribution (two-level aggregation)
* q14 — promo revenue ratio
* q15 — top supplier via scalar-subquery max
* q16 — anti-join (NOT IN) + count-distinct supplier variety
* q17 — correlated per-part average (small-quantity revenue)
* q18 — group-HAVING IN (large-volume orders)
* q19 — disjunctive DNF predicate pushdown
* q21 — semi-join + anti-join on the same relation (late suppliers)
* q22 — dormant customers: scalar average + time-windowed anti-join

Determinism contract (shared with ``__spark_entry__``): monetary math in
integer cents (BIGINT), scaled back with IEEE double ops that are
bit-identical across Spark and DuckDB; date extraction cast to BIGINT on
both sides; output aliases identical on both sides.

Scale notes: only fixed-cardinality dims (nation, region) are explicitly
broadcast; part/supplier/customer scale with SF, so their join strategy
is left to Catalyst/AQE (auto-broadcast under the threshold, shuffle
join above it). Semi/anti shapes use ``left_semi``/``left_anti`` joins
rather than collected ID lists so they stay distributed at any SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _cents(col) -> F.Column:
    """Exact integer cents from a 2-decimal double (floor(x*100+0.5))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(floor({expr} * 100 + 0.5) AS BIGINT)"


def _pct(col) -> F.Column:
    """Exact integer percent from a 2-decimal fraction (discount/tax)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _rev() -> F.Column:
    """Revenue in 1/10000 currency units, exact (cents × percent).

    A function, not a module constant: Column construction needs a live
    SparkContext, and this module must stay importable before the session
    exists (the driver may import the entry contract first)."""
    return _cents("l_extendedprice") * (100 - _pct("l_discount"))


_REV_SQL = (
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


def _qty() -> F.Column:
    return F.floor(F.col("l_quantity") + 0.5).cast("long")


_QTY_SQL = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# q4 — order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter with at least one line shipped after the order
    date, counted by priority. Plan shape: non-equi left-semi join."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q7 — volume shipping (double-aliased nation dims)
# ---------------------------------------------------------------------------

_Q7_SUPP = ("NATION_1", "NATION_2", "NATION_3")
_Q7_CUST = ("NATION_4", "NATION_5", "NATION_6")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (F.col("supp_nation").isin(*_Q7_SUPP) & F.col("cust_nation").isin(*_Q7_CUST))
            | (F.col("supp_nation").isin(*_Q7_CUST) & F.col("cust_nation").isin(*_Q7_SUPP))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(_rev()).cast("double") / 10000).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(vol) AS DOUBLE) / 10000 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year, {_REV_SQL} AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name IN {_Q7_SUPP} AND n2.n_name IN {_Q7_CUST})
      OR (n1.n_name IN {_Q7_CUST} AND n2.n_name IN {_Q7_SUPP}))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q8 — market share (conditional ratio aggregation)
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of NATION_3 suppliers in PROMO-part volume sold to ASIA
    customers, per order year. Numerator and denominator are exact cent
    sums; the final division is one IEEE double op on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = _rev()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
         / CAST(sum({_REV_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q9 — product-type profit (LIKE rollup)
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(_rev()).cast("double") / 10000).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) / 10000 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join, two-level agg)
# ---------------------------------------------------------------------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q14 — promo revenue ratio
# ---------------------------------------------------------------------------

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    part = _t(spark, sf_dir, "part")
    vol = _rev()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
         / CAST(sum({_REV_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ---------------------------------------------------------------------------
# q15 — top supplier (scalar-subquery max)
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max is taken over exact cent totals (BIGINT), so the top-supplier
    selection can never flip on a floating-point tie."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("c"))
    mx = rev.agg(F.max("c").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.c == mx.mx)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("c").cast("double") / 10000).alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH r AS (
  SELECT l_suppkey, CAST(sum({_REV_SQL}) AS BIGINT) AS c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(c AS DOUBLE) / 10000 AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE c = (SELECT max(c) FROM r)
"""


# ---------------------------------------------------------------------------
# q16 — supplier variety (anti-join + count distinct)
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM' AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue (correlated per-part average)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``l_quantity < 0.2 * avg(part)`` is evaluated as the exact integer
    inequality ``5 * qty * n < sum_qty`` so both engines agree on
    borderline rows without any float division."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_qty()).alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .where(F.lit(5) * _qty() * F.col("cnt_qty") < F.col("sum_qty"))
        .agg((F.sum(_cents("l_extendedprice")).cast("double") / 700).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT CAST(sum({_cents_sql('l_extendedprice')}) AS DOUBLE) / 700 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS pk, CAST(sum({_QTY_SQL}) AS BIGINT) AS sum_qty,
             count(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey) a ON l_partkey = pk
WHERE p_brand = 'Brand#12' AND 5 * {_QTY_SQL} * cnt_qty < sum_qty
"""


# ---------------------------------------------------------------------------
# q18 — large-volume customers (group-HAVING IN)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 250


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("total_qty"))
        .where(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (SELECT l_orderkey, CAST(sum({_QTY_SQL}) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum({_QTY_SQL}) > {_Q18_MIN_QTY}) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q19 — disjunctive revenue (DNF pushdown)
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return joined.where(cond).agg((F.sum(_rev()).cast("double") / 10000).alias("revenue"))


Q19_SQL = f"""
SELECT CAST(sum({_REV_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (semi + anti on one relation)
# ---------------------------------------------------------------------------

def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finished orders: suppliers whose line shipped after the order
    date, where the order has other suppliers but none of the others were
    late. ``late`` is rebuilt from fresh scans on the anti side to keep
    the self-join lineage unambiguous."""
    orders_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    others = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o2_ok"), F.col("l_suppkey").alias("o2_sk")
    )
    l1 = l1.join(
        others,
        (l1.l_orderkey == others.o2_ok) & (l1.l_suppkey != others.o2_sk),
        "left_semi",
    )
    late2 = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "F")
            .select(F.col("o_orderkey").alias("o3_ok"), F.col("o_orderdate").alias("o3_od")),
            F.col("l_orderkey") == F.col("o3_ok"),
        )
        .where(F.col("l_shipdate") > F.col("o3_od"))
        .select(F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk"))
    )
    l1 = l1.join(
        late2,
        (l1.l_orderkey == late2.l3_ok) & (l1.l_suppkey != late2.l3_sk),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", F.col("n_name").alias("supp_nation"))
        .agg(F.count("*").alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, n_name AS supp_nation, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate)
GROUP BY s_name, n_name
"""


# ---------------------------------------------------------------------------
# q22 — dormant customers (scalar average + time-windowed anti-join)
# ---------------------------------------------------------------------------

_Q22_NATIONS = (
    "NATION_1", "NATION_2", "NATION_3", "NATION_4",
    "NATION_5", "NATION_6", "NATION_7",
)
_Q22_CUTOFF = "2001-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers in a nation subset with no recent
    orders. ``c_acctbal > avg(...)`` runs as the exact integer inequality
    ``cents * n > sum_cents`` on both engines."""
    nation = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*_Q22_NATIONS))
        .select("n_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    avg_tbl = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_cents("c_acctbal")).alias("s_cents"),
            F.count("*").alias("n_pos"),
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q22_CUTOFF)))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_tbl))
        .where(_cents("c_acctbal") * F.col("n_pos") > F.col("s_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(_cents("c_acctbal")).cast("double") / 100).alias("totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT n_name, count(*) AS numcust,
       CAST(sum({_cents_sql('c_acctbal')}) AS DOUBLE) / 100 AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN (SELECT CAST(sum({_cents_sql('c_acctbal')}) AS BIGINT) AS s_cents,
                   count(*) AS n_pos
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > 0 AND n_name IN {_Q22_NATIONS}) sub
WHERE n_name IN {_Q22_NATIONS}
  AND {_cents_sql('c_acctbal')} * n_pos > s_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
GROUP BY n_name
"""



# ---------------------------------------------------------------------------
# derived partsupp: the testdata ships no partsupp table, so q2/q11/q20
# run over a DETERMINISTIC derivation from lineitem that both engines
# compute identically — ps_availqty = Σ qty per (part, supplier),
# ps_supplycost_cents = min line price in cents. The PLAN SHAPES are the
# canonical TPC-H ones; only the data source is adapted (q12 alone stays
# impossible: no shipmode/commit/receipt columns at all).
# ---------------------------------------------------------------------------

def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.sum(_qty()).alias("ps_availqty"),
        F.min(_cents("l_extendedprice")).alias("ps_supplycost_cents"),
    )


_PARTSUPP_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         sum({_QTY_SQL}) AS ps_availqty,
         min({_cents_sql('l_extendedprice')}) AS ps_supplycost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per qualifying part in a region. Plan shape:
    correlated scalar-min subquery realized as a per-part window minimum
    over the region-restricted partsupp join (no re-scan, one shuffle on
    ps_partkey)."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part").where(
F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = _partsupp(spark, sf_dir)

    joined = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left_semi")
        .join(part, ps.ps_partkey == part.p_partkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        joined.withColumn("__min_cost", F.min("ps_supplycost_cents").over(w))
        .where(F.col("ps_supplycost_cents") == F.col("__min_cost"))
        .select(
            _cents("s_acctbal").alias("s_acctbal_cents"),
            "s_name", "n_name", "p_partkey", "p_brand",
        )
        .orderBy(
            F.desc("s_acctbal_cents"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH partsupp AS ({_PARTSUPP_SQL}),
eligible AS (
  SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
)
SELECT {_cents_sql('e.s_acctbal')} AS s_acctbal_cents, e.s_name, e.n_name,
       p.p_partkey, p.p_brand
FROM eligible e JOIN part p ON e.ps_partkey = p.p_partkey
WHERE p.p_size IN (5, 15, 25, 35, 45) AND p.p_type = 'LARGE'
  AND e.ps_supplycost_cents = (
    SELECT min(e2.ps_supplycost_cents) FROM eligible e2
    WHERE e2.ps_partkey = e.ps_partkey
  )
ORDER BY s_acctbal_cents DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose stock value within one nation exceeds a fraction of
    that nation's total. Plan shape: two-level aggregation with a
    broadcast scalar (group HAVING vs global sum)."""
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    ps = _partsupp(spark, sf_dir)
    base = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .select("ps_partkey", (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("__v"))
    )
    per_part = base.groupBy("ps_partkey").agg(F.sum("__v").alias("stock_value_cents"))
    total = base.agg((F.sum("__v") / 10000).alias("__cut"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("stock_value_cents").cast("double") > F.col("__cut"))
        .select("ps_partkey", "stock_value_cents")
        .orderBy(F.desc("stock_value_cents"), F.asc("ps_partkey"))
    )


Q11_SQL = f"""
WITH partsupp AS ({_PARTSUPP_SQL}),
base AS (
  SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS v
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_7'
)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS stock_value_cents
FROM base GROUP BY ps_partkey
HAVING CAST(sum(v) AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) / 10000 FROM base)
ORDER BY stock_value_cents DESC, ps_partkey
"""


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers holding excess stock of 'small *' parts. Plan shape: a
    semi-join CHAIN — lineitem-year aggregate → partsupp threshold filter
    → supplier semi-join → nation filter."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.sum(_qty()).alias("__shipped"))
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    ps = _partsupp(spark, sf_dir)
    heavy = (
        ps.join(part, ps.ps_partkey == part.p_partkey, "left_semi")
        .join(shipped, ["ps_partkey", "ps_suppkey"], "inner")
        .where(F.col("ps_availqty") * 2 > F.col("__shipped"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.ps_suppkey, "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


Q20_SQL = f"""
WITH partsupp AS ({_PARTSUPP_SQL}),
shipped AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, sum({_QTY_SQL}) AS sh
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_9'
WHERE s.s_suppkey IN (
  SELECT ps.ps_suppkey FROM partsupp ps
  JOIN shipped sh ON ps.ps_partkey = sh.ps_partkey AND ps.ps_suppkey = sh.ps_suppkey
  WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps.ps_availqty * 2 > sh.sh
)
ORDER BY s.s_name, s.s_suppkey
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_variety": q16_supplier_variety,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume": q18_large_volume,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
    "q21_late_suppliers": q21_late_suppliers,
    "q22_dormant_customers": q22_dormant_customers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_order_distribution": Q13_SQL,
    "q14_promo_effect": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q20_excess_stock_suppliers": Q20_SQL,
    "q21_late_suppliers": Q21_SQL,
    "q22_dormant_customers": Q22_SQL,
}
