"""Core analytical catalog: the star-schema query surface the reference
delegates to external SQL engines (ReadMe.md:85-94) — fact⋈dim joins,
date-pruned rollups, windows, set ops — exercised over the driver's TPC-H-ish
tables (lineitem/orders = fact role, customer/part/supplier = dims).

Every query is written scale-first:
- dims are explicitly broadcast (no shuffle for the fact side);
- filters sit directly on scans so Catalyst pushes them into parquet;
- aggregates are expressed as single groupBy.agg (map-side partial agg);
- ordered outputs always carry a unique key tiebreaker so results are
  deterministic under any partitioning (required for oracle hash parity).

Numeric-determinism policy (this is what makes value hashes reproducible
across Spark, DuckDB, and any partitioning):
- MONEY (2dp-valued doubles: prices, balances) is cast to DECIMAL(18,2)
  BEFORE summation. Decimal sums are exact and order-independent, so the
  result is bit-identical no matter how partitions combine. The exact sum is
  cast back to double at the end. Plain double sums are only used where every
  addend is integral (integer-valued doubles sum exactly in fp).
- means are computed as exact_decimal_sum / count in double (one division,
  identical everywhere) — never engine avg() over raw doubles.
- window prefix-sums stay double but pin total order with a unique key, so
  both engines accumulate in the same sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import dim_join, salted_join
from .registry import Query, materialize, table

# ---------------------------------------------------------------------------
# Decimal-exact aggregate helpers (see module docstring). SQL twins inline.
# ---------------------------------------------------------------------------

MONEY = "decimal(18,2)"


def _dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum of a 2dp-valued double, emitted as rounded double."""
    return F.round(F.sum(_dec(col)).cast("double"), scale)


def money_mean(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum / count mean (nulls excluded like avg())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(_dec(c)).cast("double") / F.count(c), scale)


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    one = F.lit(1).cast(MONEY)
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


def revenue_sum(scale: int = 2) -> Column:
    return F.round(F.sum(revenue()).cast("double"), scale)


# DuckDB fragments mirroring the helpers above.
SQL_REV = "(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))"
SQL_REV_SUM = f"round(sum({SQL_REV})::DOUBLE, 2)"


def sql_money_sum(col: str, scale: int = 2) -> str:
    return f"round(sum({col}::DECIMAL(18,2))::DOUBLE, {scale})"


def sql_money_mean(col: str, scale: int = 4) -> str:
    return f"round(sum({col}::DECIMAL(18,2))::DOUBLE / count({col}), {scale})"


# ---------------------------------------------------------------------------
# Pricing / rollup queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass grouped aggregate over the fact table.
    Filter is on the scan → parquet min/max pushdown prunes row groups."""
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),  # integral doubles: exact
        money_sum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(revenue()).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum("l_quantity") / F.count("l_quantity"), 4).alias("avg_qty"),
        money_mean("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {sql_money_sum("l_extendedprice")} AS sum_base_price,
       {SQL_REV_SUM} AS sum_disc_price,
       round(sum(l_quantity) / count(l_quantity), 4) AS avg_qty,
       {sql_money_mean("l_discount")} AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_brand_month(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship star rollup (the query shape the reference's curated zone is
    built to serve): fact ⋈ broadcast(dim) ⋈ orders → revenue by brand/month.
    part is the small dim → broadcast; lineitem⋈orders co-shuffle on orderkey."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    orders = table(spark, sf, "orders")
    return (
        dim_join(li, part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("p_brand"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        .agg(
            revenue_sum().alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_REVENUE_BY_BRAND_MONTH = f"""
SELECT p_brand, strftime(o_orderdate, '%Y-%m') AS order_month,
       {SQL_REV_SUM} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY p_brand, order_month
"""


def q_building_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast join → deterministic
    top-10 (exact-decimal revenue desc, orderkey)."""
    cust = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        dim_join(
            li.join(orders, li.l_orderkey == orders.o_orderkey),
            cust,
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(revenue_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


ORACLE_BUILDING_TOP_ORDERS = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       {SQL_REV_SUM} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, order_date
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_late_ship_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (no fact duplication, the
    cheapest join type for existence checks)."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_LATE_SHIP_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_region_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join. region/nation/customer broadcast up
    the chain; only lineitem⋈orders shuffles."""
    region = table(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = table(spark, sf, "nation")
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        dim_join(
            li.join(orders, li.l_orderkey == orders.o_orderkey),
            dim,
            orders.o_custkey == dim.c_custkey,
        )
        .groupBy("r_name", "n_name")
        .agg(revenue_sum().alias("revenue"))
    )


ORACLE_REGION_NATION_REVENUE = f"""
SELECT r_name, n_name, {SQL_REV_SUM} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


def q_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg, everything pushes to the scan."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    promo = _dec("l_extendedprice") * _dec("l_discount")
    return li.agg(F.round(F.sum(promo).cast("double"), 2).alias("promo_revenue"))


ORACLE_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE, 2)
         AS promo_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_segment_acctbal(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_mean("c_acctbal", 2).alias("avg_acctbal"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


ORACLE_SEGMENT_ACCTBAL = f"""
SELECT c_mktsegment, count(*) AS n_customers,
       {sql_money_mean("c_acctbal", 2)} AS avg_acctbal,
       round(min(c_acctbal), 2) AS min_acctbal,
       round(max(c_acctbal), 2) AS max_acctbal
FROM customer GROUP BY c_mktsegment
"""


def q_parts_by_type(spark: SparkSession, sf: str) -> DataFrame:
    part = table(spark, sf, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        money_mean("p_retailprice", 2).alias("avg_retail"),
        F.countDistinct("p_size").alias("n_sizes"),
    )


ORACLE_PARTS_BY_TYPE = f"""
SELECT p_type, count(*) AS n_parts,
       {sql_money_mean("p_retailprice", 2)} AS avg_retail,
       count(DISTINCT p_size) AS n_sizes
FROM part GROUP BY p_type
"""


def q_order_status_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping-sets over orders (NULL group rendered 'ALL' so the
    string survives the hash identically in both engines)."""
    orders = table(spark, sf, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


ORACLE_ORDER_STATUS_ROLLUP = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_returned_top_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, deterministic
    top-20."""
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    return (
        dim_join(
            li.join(orders, li.l_orderkey == orders.o_orderkey),
            cust,
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_custkey", "c_name")
        .agg(revenue_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_TOP_CUSTOMERS = f"""
SELECT c_custkey, c_name, {SQL_REV_SUM} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_supplier_nation_balance(spark: SparkSession, sf: str) -> DataFrame:
    sup = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_sum("s_acctbal").alias("total_acctbal"),
        )
    )


ORACLE_SUPPLIER_NATION_BALANCE = f"""
SELECT n_name, count(*) AS n_suppliers,
       {sql_money_sum("s_acctbal")} AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_discount_band_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """CASE-expression banding + rollup (reference F-family derivations feed
    exactly this kind of bucketed reporting)."""
    li = table(spark, sf, "lineitem")
    band = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    return (
        li.withColumn("discount_band", band)
        .groupBy("discount_band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            revenue_sum().alias("revenue"),
        )
    )


ORACLE_DISCOUNT_BAND_REVENUE = f"""
SELECT CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS discount_band,
       count(*) AS n_lines,
       {SQL_REV_SUM} AS revenue
FROM lineitem GROUP BY discount_band
"""


def q_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join (fact keys may be absent — mirrors the
    reference's dangling fact→dim keys, SURVEY §1.5) + two-level aggregate."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


def q_promo_revenue_pct(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio, broadcast dim join.
    Both sums exact decimal → one double division → identical everywhere."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", revenue().cast("decimal(18,4)")).otherwise(zero)
    return (
        dim_join(li, part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(revenue()).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


ORACLE_PROMO_REVENUE_PCT = f"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN {SQL_REV}::DECIMAL(18,4)
                              ELSE 0::DECIMAL(18,4) END)::DOUBLE
             / sum({SQL_REV})::DOUBLE, 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_top_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: agg → top-3 by exact-decimal revenue, suppkey
    tiebreak → identical ordering across engines.

    Plan shape: ``orderBy().limit(3)`` plans as TakeOrderedAndProject —
    per-partition top-3 heaps merged on the driver — instead of ranking via
    an UNPARTITIONED window, which would funnel every post-agg row through
    one task (the single-threaded stage in an otherwise parallel plan at
    scale). The rank is attached afterwards by a window over the 3
    surviving rows only."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    rev = li.groupBy("l_suppkey").agg(revenue_sum().alias("total_revenue"))
    order = [F.col("total_revenue").desc(), F.col("l_suppkey")]
    top = rev.orderBy(*order).limit(3)
    return (
        top.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
        .select(F.col("l_suppkey").alias("s_suppkey"), "total_revenue", "rk")
    )


ORACLE_TOP_SUPPLIERS = f"""
SELECT l_suppkey AS s_suppkey, total_revenue, rk FROM (
  SELECT l_suppkey, total_revenue,
         row_number() OVER (ORDER BY total_revenue DESC, l_suppkey) AS rk
  FROM (SELECT l_suppkey, {SQL_REV_SUM} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        GROUP BY l_suppkey))
WHERE rk <= 3
"""


def q_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: per-key aggregate joined back to the fact (the
    agg-then-join pattern; at scale the agg side is tiny → broadcast).
    Quantities are integral doubles → their avg is exact in both engines."""
    li = table(spark, sf, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        (0.5 * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_threshold")
    )
    return (
        dim_join(li, thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly")
        )
    )


ORACLE_SMALL_QTY_REVENUE = """
SELECT round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN (SELECT l_partkey AS t_partkey,
             0.5 * (sum(l_quantity) / count(l_quantity)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey) t ON l_partkey = t_partkey
WHERE l_quantity < qty_threshold
"""


def q_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over fact agg, join back to dims."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        dim_join(
            big.join(orders, big.l_orderkey == orders.o_orderkey),
            cust,
            orders.o_custkey == cust.c_custkey,
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.col("o_totalprice"), 2).alias("total_price"),
            "sum_qty",
        )
    )


ORACLE_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice, 2) AS total_price, sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_customer_top2_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Window row_number per key — deterministic (price desc, orderkey)."""
    orders = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("total_price"),
            "rn",
        )
    )


ORACLE_CUSTOMER_TOP2_ORDERS = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
"""


def q_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Running-sum window in exact decimal, accumulation order pinned by
    (orderdate, orderkey) — deterministic prefix sums in both engines."""
    orders = table(spark, sf, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum(_dec("o_totalprice")).over(w).cast("double"), 2).alias("running_total"),
    )


ORACLE_RUNNING_REVENUE = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(sum(o_totalprice::DECIMAL(18,2))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE, 2)
         AS running_total
FROM orders WHERE o_custkey % 10 = 0
"""


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join (TPC-H Q22 shape): customers that never ordered."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    idle = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_idle"),
        money_sum("c_acctbal").alias("total_acctbal"),
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = f"""
SELECT c_mktsegment, count(*) AS n_idle,
       {sql_money_sum("c_acctbal")} AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_nation_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operators: nations with customers INTERSECT nations with suppliers,
    plus customer-only nations via EXCEPT — tagged and unioned."""
    cust_nations = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    supp_nations = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust_nations.intersect(supp_nations).withColumn("presence", F.lit("both"))
    cust_only = (
        cust_nations.distinct()
        .exceptAll(supp_nations.distinct())
        .withColumn("presence", F.lit("customer_only"))
    )
    nation = table(spark, sf, "nation")
    out = both.unionByName(cust_only)
    return out.join(F.broadcast(nation), out.nk == nation.n_nationkey).select(
        "n_name", "presence"
    )


ORACLE_NATION_SET_OPS = """
WITH both_side AS (
  SELECT c_nationkey AS nk FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier),
cust_only AS (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  EXCEPT ALL
  SELECT DISTINCT s_nationkey FROM supplier),
tagged AS (
  SELECT nk, 'both' AS presence FROM both_side
  UNION ALL
  SELECT nk, 'customer_only' AS presence FROM cust_only)
SELECT n_name, presence FROM tagged JOIN nation ON nk = n_nationkey
"""


# ---------------------------------------------------------------------------
# Reference-parity scalar/shape queries (F/P/D operators over driver tables)
# ---------------------------------------------------------------------------


def q_capitalize_names(spark: SparkSession, sf: str) -> DataFrame:
    """F8 str.capitalize semantics (first upper, rest LOWER — NOT initcap;
    reference data_processing.py:387-391) applied and re-aggregated."""
    from ..functions.scalars import capitalize_first

    part = table(spark, sf, "part")
    return (
        part.select(capitalize_first(F.col("p_name")).alias("name_cap"))
        .groupBy("name_cap")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_CAPITALIZE_NAMES = """
SELECT upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS name_cap,
       count(*) AS n
FROM part GROUP BY name_cap
"""


def q_derive_date_string(spark: SparkSession, sf: str) -> DataFrame:
    """F1/F2 parity: timestamp → 'yyyy-MM-dd' STRING (the partition-key
    derivation, data_processing.py:175-180), then a per-date rollup."""
    from ..functions.scalars import derive_date_str

    orders = table(spark, sf, "orders")
    return (
        orders.select(derive_date_str(F.col("o_orderdate")).alias("order_date"))
        .groupBy("order_date")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_DERIVE_DATE_STRING = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date, count(*) AS n_orders
FROM orders GROUP BY order_date
"""


def q_null_fill_segment(spark: SparkSession, sf: str) -> DataFrame:
    """F7 parity: null-fill with 'Unknown' (data_processing.py:338-340).
    Nulls are synthesized via NULLIF since driver data has none."""
    cust = table(spark, sf, "customer")
    seg = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None).cast("string")).otherwise(
        F.col("c_mktsegment")
    )
    return (
        cust.select(F.coalesce(seg, F.lit("Unknown")).alias("segment_filled"))
        .groupBy("segment_filled")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_NULL_FILL_SEGMENT = """
SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), 'Unknown') AS segment_filled,
       count(*) AS n
FROM customer GROUP BY segment_filled
"""


def q_dedup_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """D1a — exact dedup via DISTINCT (set semantics, order-free)."""
    li = table(spark, sf, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_suppkey").distinct()


ORACLE_DEDUP_DISTINCT = """
SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem
"""


def q_dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """D1b — deterministic keep-first dedup (the reference's commented-out
    drop_duplicates keep='first', data_processing.py:342-345, made
    order-stable via row_number)."""
    orders = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_order_date"),
        )
    )


ORACLE_DEDUP_KEEP_FIRST = """
SELECT o_custkey, o_orderkey AS first_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS first_order_date
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
WHERE rn = 1
"""


def q_order_value_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact percentiles (p50/p90/p99) of order value per priority —
    the distribution surface missing from plain sum/avg rollups. Spark's
    ``percentile`` is the exact sort-based aggregate (linear interpolation,
    same definition as DuckDB ``quantile_cont``); at 100 TB switch to
    ``approx_percentile(c, p, accuracy)`` — same call shape, sketch-merge
    instead of per-group sort, documented tradeoff."""
    orders = table(spark, sf, "orders")
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(o_totalprice, {p})"), 2
    )
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        pct(0.5).alias("p50"),
        pct(0.9).alias("p90"),
        pct(0.99).alias("p99"),
    )


ORACLE_ORDER_VALUE_QUANTILES = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99
FROM orders GROUP BY o_orderpriority
"""


PIVOT_YEARS = list(range(1995, 2002))  # fixture o_orderdate spans 1995-2001


def q_priority_year_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: order revenue by priority × year, years as columns — the
    wide-report shape BI layers ask of the star schema. Explicit pivot
    values keep the plan a single pass (no distinct-values pre-query) and
    make the output schema static — the only sane form at scale."""
    orders = table(spark, sf, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    return (
        orders.groupBy("o_orderpriority")
        .pivot("order_year", PIVOT_YEARS)
        .agg(F.round(F.sum(F.col("o_totalprice").cast(MONEY)).cast("double"), 2))
        .withColumnsRenamed({str(y): f"y{y}" for y in PIVOT_YEARS})
    )


# pivot() needs the year column pre-derived; wrap via a select in the fn —
# done inline in the oracle with CASE sums (the engine-portable pivot form).
ORACLE_PRIORITY_YEAR_PIVOT = "SELECT o_orderpriority, " + ", ".join(
    f"round(sum(CASE WHEN year(o_orderdate) = {y} "
    f"THEN o_totalprice::DECIMAL(18,2) END)::DOUBLE, 2) AS y{y}"
    for y in PIVOT_YEARS
) + " FROM orders GROUP BY o_orderpriority"


def q_lineitem_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set levels in
    one pass (partial-aggregated like any groupBy — the cube expansion
    happens map-side). Complements the ROLLUP entry; NULL marks the
    rolled-up dimensions exactly as DuckDB's CUBE does."""
    li = table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        revenue_sum().alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


ORACLE_LINEITEM_CUBE = f"""
SELECT l_returnflag, l_linestatus, {SQL_REV_SUM} AS revenue, count(*) AS n_lines
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_lineitem_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS — the general grouping shape beyond
    rollup/cube: ((returnflag, linestatus), (returnflag), ()) computed in
    ONE pass (Catalyst's Expand + the usual partial/final aggregate; no
    union of three scans), with ``grouping_id`` labeling which set each
    output row belongs to (both engines use the same bitmask convention:
    leftmost grouping column = most significant bit)."""
    li = table(spark, sf, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().alias("gid"),
        revenue_sum().alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLE_LINEITEM_GROUPING_SETS = f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       {SQL_REV_SUM} AS revenue, count(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


FUZZY_MAX_DIST = 2  # Levenshtein threshold for a candidate match


def q_customer_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution primitive: BLOCKED fuzzy self-join. Candidate
    pairs are generated only within a block (equi-join on nationkey here;
    at scale block on (nation, name-prefix/phonetic key) so block size
    stays bounded and the block key remains the only shuffle — never
    all-pairs), then scored with Levenshtein edit distance (JVM builtin,
    whole-stage codegen) and kept at ≤ 2 edits. Output per nation:
    match count and mean distance (integer sum / count, one division)."""
    cust = table(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    a, b = cust.alias("a"), cust.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(F.col("a.c_nationkey").alias("nationkey"), dist.alias("dist"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.sum("dist").cast("double") / F.count(F.lit(1)), 4).alias("avg_dist"),
        )
    )


ORACLE_CUSTOMER_FUZZY_MATCH = f"""
SELECT a.c_nationkey AS nationkey, count(*) AS n_matches,
       round(sum(levenshtein(a.c_name, b.c_name))::DOUBLE / count(*), 4) AS avg_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
GROUP BY nationkey
"""


def q_events_dedup_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Time-windowed event dedup — the batch twin of the streaming
    ``stream_dedup_events``: at most one (user, type) event survives per
    10-minute tumbling window (the retry/at-least-once collapse every
    event-log pipeline runs). Keep-first is deterministic via (ts,
    event_id) row_number; the window key is derived by integer minute
    arithmetic so both engines bucket identically. Output: per-type
    surviving-event counts (drop share visible vs events_hourly totals).
    Scale: one shuffle on the (window, user, type) dedup key — the same
    key the streaming state store uses."""
    ev = table(spark, sf, "events")
    # integer DIV, not fp division: epoch-micros are ~1.7e15 and a double
    # quotient can land a hair under an exact boundary (same trap as the
    # nanos rebuild documented in plans/registry.events_table)
    bucket = F.expr("unix_micros(ts) DIV 600000000")
    w = Window.partitionBy(bucket, "user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_survivors"))
    )


ORACLE_EVENTS_DEDUP_WINDOWED = """
SELECT event_type, count(*) AS n_survivors
FROM (SELECT event_type,
             row_number() OVER (
               PARTITION BY (epoch_us(ts) // 600000000), user_id, event_type
               ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1 GROUP BY event_type
"""


def q_customer_spend_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """Decile segmentation WITHIN each nation — ntile partitioned by a real
    key, so every window partition is bounded (contrast the RFM query's
    broadcast-cuts design note for why a GLOBAL ntile is the wrong shape
    at scale; per-nation deciles need no such trick). Deterministic order
    (balance desc, custkey) makes the tile assignment engine-exact.
    Output: per (nation, decile) customer counts and decimal-exact balance
    sums."""
    cust = table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_nationkey", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum("c_acctbal").alias("balance_sum"),
        )
    )


ORACLE_CUSTOMER_SPEND_NTILE = f"""
SELECT c_nationkey, decile, count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS balance_sum
FROM (SELECT c_nationkey, c_acctbal,
             ntile(10) OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey) AS decile
      FROM customer)
GROUP BY c_nationkey, decile
"""


def q_events_distinct_users_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch family: HLL++ approximate distinct users per event type next
    to the exact count. At 100 TB the exact distinct is a full shuffle of
    every (type, user) pair; the sketch is a partial-aggregable fixed-size
    state (relativeSD 0.02 ≈ 1.5 KB/group) that never re-shuffles raw rows —
    THE way to count uniques at scale. No DuckDB oracle on purpose: HLL
    estimates are engine-specific, so the driver records the honest
    rows-only check; the error bound (|approx-exact| ≤ 5%), determinism,
    AND exact value equality against an independent pure-Python HLL++
    twin (XxHash64 + registers + linear counting over DuckDB-read rows)
    are pinned by tests/test_sketches.py instead."""
    ev = table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )


def q_order_value_sketch_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch family: approx_percentile (Greenwald-Khanna) p50/p90/p99 of
    order value beside the exact percentiles. Exact percentiles need a full
    sort (or percentile_disc's per-group buffering of every value); the GK
    sketch keeps bounded state per partition and merges — the 100 TB path
    for latency/size distributions. Engine-specific estimates → rows-only
    driver check; accuracy (each approx within the 1%-rank neighborhood
    of exact) AND exact value equality against an independent pure-Python
    QuantileSummaries twin are pinned by tests/test_sketches.py."""
    orders = table(spark, sf, "orders")
    exact = F.expr(
        "percentile_disc(array(0.5, 0.9, 0.99)) WITHIN GROUP (ORDER BY o_totalprice)"
    )
    approx = F.percentile_approx("o_totalprice", F.array(*[F.lit(x) for x in (0.5, 0.9, 0.99)]), 10_000)
    return orders.agg(exact.alias("exact_q"), approx.alias("approx_q")).select(
        F.round(F.element_at("exact_q", 1), 2).alias("p50_exact"),
        F.round(F.element_at("approx_q", 1), 2).alias("p50_approx"),
        F.round(F.element_at("exact_q", 2), 2).alias("p90_exact"),
        F.round(F.element_at("approx_q", 2), 2).alias("p90_approx"),
        F.round(F.element_at("exact_q", 3), 2).alias("p99_exact"),
        F.round(F.element_at("approx_q", 3), 2).alias("p99_approx"),
    )


def q_skew_salted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Brand revenue rollup routed THROUGH operators/joins.salted_join —
    the oracle row proving the skew-salting primitive is semantics-
    preserving under the hard signal (row count + schema + value hash vs a
    PLAIN join in DuckDB). The salt spreads each part key over 8 sub-keys
    on the lineitem side and explodes the part side 8×; if salting
    duplicated or dropped a single match, the decimal-exact revenue hash
    would catch it."""
    li = table(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice", "l_discount"
    )
    part = table(spark, sf, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_join(li, part, on="partkey", how="inner", salt_buckets=8)
    return joined.groupBy("p_brand").agg(
        revenue_sum().alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


ORACLE_SKEW_SALTED_REVENUE = f"""
SELECT p_brand, {SQL_REV_SUM} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Events (stream-table batch surface; the streaming twin lives in streaming/)
# ---------------------------------------------------------------------------


def q_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window rollup on the events stream table. Hour truncation
    also erases the ns(DuckDB)-vs-us(Spark) timestamp precision gap."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )


ORACLE_EVENTS_HOURLY = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n_events,
       {sql_money_sum("value")} AS total_value
FROM events GROUP BY hour, event_type
"""


def q_events_retention_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention — the product-analytics staple: users
    grouped by their FIRST active week (cohort), counted in every later
    week they return, as (cohort_week, week_offset) cells.

    Scale shape — ONE shuffle total: events partial-aggregate straight to
    per-user distinct-week sets (collect_set bounded by |weeks of
    history|, not event volume — map-side combine collapses each user's
    events before the exchange); the cohort week is array_min of the set
    (no second shuffle, no window); explode fans out |weeks-per-user| rows
    and the final (cohort, offset) rollup is a partial agg over that
    already-tiny frame. The naive spelling — distinct, then a min-window,
    then a self-join back — shuffles the event-scale frame three times.

    Both engines truncate weeks to ISO Monday, so offsets are exact
    multiples of 7 days."""
    ev = table(spark, sf, "events")
    per_user = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        )
        .groupBy("user_id")
        .agg(F.collect_set("week").alias("weeks"))
    )
    exploded = per_user.select(
        F.array_min("weeks").alias("cohort_week"), F.explode("weeks").alias("week")
    )
    return exploded.groupBy(
        "cohort_week",
        F.floor(F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


ORACLE_EVENTS_RETENTION_MATRIX = """
WITH per AS (
  SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id, week
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM per GROUP BY user_id)
SELECT cohort_week,
       (((week::DATE - cohort_week::DATE) // 7))::INT AS week_offset,
       count(*)::BIGINT AS n_users
FROM per JOIN cohort USING (user_id)
GROUP BY cohort_week, week_offset
"""


def q_events_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction from the props column (semi-structured surface)."""
    ev = table(spark, sf, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k_value"))
        .groupBy((F.col("k_value") % 10).alias("k_mod10"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_EVENTS_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
       count(*) AS n
FROM events GROUP BY k_mod10
"""


def q_event_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + prefix-sum —
    the classic stateful op expressed as two windows. Epoch seconds are
    floored so sub-second precision differences can't flip a session split."""
    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_EVENT_SESSIONIZATION = """
SELECT user_id, max(session_id)::BIGINT AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN floor(extract(epoch FROM ts))
                     - lag(floor(extract(epoch FROM ts)))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events))
GROUP BY user_id
"""


def q_events_session_stats_native(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` aggregate — the
    built-in twin of q_event_sessionization's lag+prefix-sum idiom, kept as
    a separate catalog entry because the two disagree at the boundary:
    session_window merges an event only while ts < previous-end (end =
    prev ts + gap), so a gap of EXACTLY 30:00.000000 starts a NEW session,
    where the idiom's ``gap > 1800`` keeps it. The oracle reproduces the
    native rule (>= in micros) from first principles, so this entry
    cross-checks Spark's builtin against the textbook definition.

    All arithmetic is integer microseconds (unix_micros) — no float gap
    math to disagree across engines. Output per user: session count, event
    count, total active time (sum over sessions of last-first, µs).

    Scale shape: ONE user-keyed shuffle into the session_window aggregate
    (Spark plans it as a sort + merging-window agg per user partition);
    the per-user rollup reuses the same partitioning — no second exchange
    of event-volume data."""
    ev = table(spark, sf, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.sum(F.col("last_us") - F.col("first_us")).cast("long").alias("active_us"),
    )


ORACLE_EVENTS_SESSION_STATS_NATIVE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
               OR us - lag(us) OVER w >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_sess AS (
  SELECT user_id, session_id, count(*) AS n_ev,
         min(us) AS first_us, max(us) AS last_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, sum(n_ev)::BIGINT AS n_events,
       sum(last_us - first_us)::BIGINT AS active_us
FROM per_sess GROUP BY user_id
"""


def q_nation_best_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation argmax WITHOUT a window: ``max(struct(orderkeys...))``
    is lexicographic, partial-aggregable (map-side combine to one struct
    per group per partition) and deterministic via the unique suppkey
    tiebreak — the at-scale replacement for the row_number()-over-
    partition top-1 idiom, which shuffles every row into a sort. The name
    rides in the struct's tail where it can't influence the comparison
    (suppkey is unique). Nation is a broadcast dim."""
    sup = table(spark, sf, "supplier")
    nat = table(spark, sf, "nation")
    best = sup.groupBy("s_nationkey").agg(
        F.max(F.struct(F.col("s_acctbal"), F.col("s_suppkey"), F.col("s_name"))).alias("b")
    )
    return (
        best.join(F.broadcast(nat), best.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            F.col("b.s_acctbal").alias("best_acctbal"),
            F.col("b.s_suppkey").alias("best_suppkey"),
            F.col("b.s_name").alias("best_supplier"),
        )
    )


ORACLE_NATION_BEST_SUPPLIER = """
WITH m AS (
  SELECT s_nationkey,
         max({'bal': s_acctbal, 'k': s_suppkey, 'nm': s_name}) AS b
  FROM supplier GROUP BY s_nationkey
)
SELECT n.n_name, (b).bal AS best_acctbal, (b).k AS best_suppkey, (b).nm AS best_supplier
FROM m JOIN nation n ON n.n_nationkey = m.s_nationkey
"""


def q_orders_above_cust_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Self-relative filter: orders priced above 1.5× their OWN customer's
    average order value, rolled up per market segment — the decorrelated
    form of the classic correlated-subquery shape (``WHERE o_totalprice >
    1.5 * (SELECT avg(...) WHERE same customer)``). The comparison is kept
    in exact integer/decimal arithmetic — ``2·n·price > 3·sum`` instead of
    ``price > 1.5·(sum/n)`` — so no float division sits on the predicate
    boundary to flip rows between engines.

    Scale shape: one custkey-keyed partial agg over orders, joined back to
    orders on custkey (co-shuffled hash join — AQE reuses the aggregation
    exchange), customer segment rides a broadcast; final rollup is
    |segments| rows."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    per = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("tot"), F.count(F.lit(1)).alias("n")
    )
    seg = cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    flagged = (
        orders.select("o_custkey", _dec("o_totalprice").alias("price"))
        .join(per, "o_custkey")
        .withColumn("big", F.col("price") * 2 * F.col("n") > F.col("tot") * 3)
    )
    return (
        dim_join(flagged, seg, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("big"), 1).otherwise(0)).cast("long").alias("n_above"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "c_mktsegment",
            "n_above",
            "n_orders",
            F.round(F.col("n_above").cast("double") / F.col("n_orders"), 4).alias("share"),
        )
    )


ORACLE_ORDERS_ABOVE_CUST_AVG = """
WITH per AS (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2)) AS tot, count(*) AS n
  FROM orders GROUP BY o_custkey
),
flagged AS (
  SELECT o.o_custkey,
         (o.o_totalprice::DECIMAL(18,2) * 2 * p.n > p.tot * 3) AS big
  FROM orders o JOIN per p USING (o_custkey)
)
SELECT c.c_mktsegment,
       sum(CASE WHEN big THEN 1 ELSE 0 END)::BIGINT AS n_above,
       count(*) AS n_orders,
       round(sum(CASE WHEN big THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS share
FROM flagged f JOIN customer c ON c.c_custkey = f.o_custkey
GROUP BY c.c_mktsegment
"""


def q_data_quality_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint-validation audit (the Deequ/dbt-test role, as one
    catalog query): evaluates referential and domain constraints over the
    star schema and emits one row per check — (check, n_violations,
    n_checked). Checks: (1) orphan lineitems (fact rows whose orderkey has
    no order header — left-anti), (2) duplicate (orderkey, linenumber)
    fact keys, (3) orders with a custkey missing from the customer dim,
    (4) negative or zero extendedprice, (5) discount outside [0, 1]. The
    duplicate-key check genuinely FIRES on the driver fixtures (the
    generator reuses linenumbers within an order — 11,785 dup pairs at
    sf0.01), so the report exercises both the pass and fail paths and the
    driver hash pins the real violation counts.

    Scale shape: each referential check is a LEFT ANTI hash join keyed on
    the fact side's join key (the dim/header side builds or co-shuffles);
    domain checks fold into ONE lineitem scan of partial-agg conditional
    counts; the final report is a union of single-row aggregates."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")

    def one(check: str, viol, checked) -> DataFrame:
        return viol.agg(
            F.lit(check).alias("check"),
            F.count(F.lit(1)).alias("n_violations"),
        ).crossJoin(F.broadcast(checked.agg(F.count(F.lit(1)).alias("n_checked"))))

    orphan = li.select("l_orderkey").join(
        orders.select("o_orderkey"),
        li.l_orderkey == orders.o_orderkey,
        "left_anti",
    )
    dup_keys = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    missing_cust = orders.select("o_custkey").join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti"
    )
    domain = li.agg(
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("bad_price"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("bad_discount"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        one("orphan_lineitems", orphan, li)
        .unionByName(one("duplicate_fact_keys", dup_keys, li))
        .unionByName(one("orders_missing_customer", missing_cust, orders))
        .unionByName(
            domain.select(
                F.lit("nonpositive_extendedprice").alias("check"),
                F.col("bad_price").cast("long").alias("n_violations"),
                F.col("n").alias("n_checked"),
            )
        )
        .unionByName(
            domain.select(
                F.lit("discount_out_of_range").alias("check"),
                F.col("bad_discount").cast("long").alias("n_violations"),
                F.col("n").alias("n_checked"),
            )
        )
    )


ORACLE_DATA_QUALITY_AUDIT = """
SELECT 'orphan_lineitems' AS check,
       (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL)::BIGINT AS n_violations,
       (SELECT count(*) FROM lineitem) AS n_checked
UNION ALL
SELECT 'duplicate_fact_keys',
       (SELECT count(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem
                              GROUP BY 1, 2 HAVING count(*) > 1))::BIGINT,
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'orders_missing_customer',
       (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL)::BIGINT,
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'nonpositive_extendedprice',
       (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)::BIGINT,
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'discount_out_of_range',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)::BIGINT,
       (SELECT count(*) FROM lineitem)
"""


def q_orders_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Year-over-year revenue growth per market segment — the BI staple:
    revenue by (segment, year) with each year's delta vs the prior year
    from a lag window over the AGGREGATE (|segments|×|years| rows, bounded
    by the calendar — the window never sees order-volume data). Growth is
    one IEEE division of two exact decimal sums, rounded 4dp; first year
    emits NULL growth in both engines.

    Scale shape: one segment-broadcast join + one (segment, year) partial
    agg; raw orders shuffle once."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    seg = cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    per = (
        dim_join(
            orders.select(
                "o_custkey", F.year("o_orderdate").alias("yr"), _dec("o_totalprice").alias("p")
            ),
            seg,
            "o_custkey",
        )
        .groupBy("c_mktsegment", "yr")
        .agg(F.sum("p").alias("rev"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("yr")
    prev = F.lag("rev").over(w)
    return per.select(
        "c_mktsegment",
        "yr",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round((F.col("rev") - prev).cast("double") / prev.cast("double"), 4).alias("yoy_growth"),
    )


ORACLE_ORDERS_YOY_GROWTH = """
WITH per AS (
  SELECT c.c_mktsegment, year(o.o_orderdate) AS yr,
         sum(o.o_totalprice::DECIMAL(18,2)) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, yr,
       round(rev::DOUBLE, 2) AS revenue,
       round((rev - lag(rev) OVER w)::DOUBLE / (lag(rev) OVER w)::DOUBLE, 4) AS yoy_growth
FROM per
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY yr)
"""


def q_customer_engagement_360(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-360: the clickstream (events) joined to the order history
    (star schema) on user_id = c_custkey — the cross-dataset view a
    lakehouse exists to serve. Per market segment: active clickstream
    users, their event/purchase-event volumes and on-site spend, their
    order-book revenue, and the engagement-to-revenue ratio. Event values
    are 2dp-valued doubles → DECIMAL(18,2) before summation (the money
    rule), so every aggregate is order-independent.

    Scale shape: events reduce to per-user aggregates in ONE user-keyed
    shuffle, orders likewise by custkey; the two per-user frames hash-join
    on the shared key; segment rides a broadcast; the rollup is
    |segments| rows. Raw events and raw orders each shuffle exactly once,
    pre-aggregated map-side."""
    ev = table(spark, sf, "events")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchase_events"),
        F.sum(F.coalesce(_dec("value"), F.lit(0).cast(MONEY))).alias("event_value"),
    )
    per_cust = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("order_rev"),
    )
    seg = cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        dim_join(per_user.join(per_cust, "user_id", "left"), seg, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("n_purchase_events").cast("long").alias("n_purchase_events"),
            F.round(F.sum("event_value").cast("double"), 2).alias("event_value"),
            F.sum(F.coalesce(F.col("n_orders"), F.lit(0))).cast("long").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.col("order_rev"), F.lit(0).cast(MONEY))).cast("double"), 2)
            .alias("order_revenue"),
        )
    )


ORACLE_CUSTOMER_ENGAGEMENT_360 = """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase_events,
         sum(coalesce(value::DECIMAL(18,2), 0)) AS event_value
  FROM events GROUP BY user_id
),
per_cust AS (
  SELECT o_custkey AS user_id, count(*) AS n_orders,
         sum(o_totalprice::DECIMAL(18,2)) AS order_rev
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment,
       count(*) AS n_active_users,
       sum(u.n_events)::BIGINT AS n_events,
       sum(u.n_purchase_events)::BIGINT AS n_purchase_events,
       round(sum(u.event_value)::DOUBLE, 2) AS event_value,
       sum(coalesce(o.n_orders, 0))::BIGINT AS n_orders,
       round(sum(coalesce(o.order_rev, 0))::DOUBLE, 2) AS order_revenue
FROM per_user u
LEFT JOIN per_cust o USING (user_id)
JOIN customer c ON c.c_custkey = u.user_id
GROUP BY c.c_mktsegment
"""


def q_customer_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Acquisition-cohort lifetime-value triangle: customers cohort by
    their FIRST order year, then revenue accumulates per (cohort_year,
    order_year) — the order-book twin of the events-based retention matrix
    (events_retention_cohorts), and the standard LTV payback report.
    `years_out` = order_year - cohort_year keeps the triangle readable.

    Scale shape: one custkey partial agg finds cohort years, joins back to
    orders on the SAME custkey key (AQE reuses the exchange), and the
    final rollup is |years|² rows. Orders shuffle once."""
    orders = table(spark, sf, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    return (
        orders.select("o_custkey", F.year("o_orderdate").alias("order_year"), _dec("o_totalprice").alias("p"))
        .join(first, "o_custkey")
        .groupBy("cohort_year", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("p").cast("double"), 2).alias("revenue"),
        )
        .withColumn("years_out", (F.col("order_year") - F.col("cohort_year")).cast("int"))
    )


ORACLE_CUSTOMER_COHORT_LTV = """
WITH first AS (
  SELECT o_custkey, min(year(o_orderdate)) AS cohort_year FROM orders GROUP BY o_custkey
)
SELECT f.cohort_year, year(o.o_orderdate) AS order_year,
       count(*) AS n_orders,
       round(sum(o.o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS revenue,
       (year(o.o_orderdate) - f.cohort_year)::INT AS years_out
FROM orders o JOIN first f USING (o_custkey)
GROUP BY f.cohort_year, order_year
"""


# Widest per-customer order history the clamped-balance fold will carry in
# one row: ~24 bytes/struct → ~24 MB at the cap, survivable in any sane
# executor; past it the row is a skew pathology (a platform account, a
# load-test key) that must fail LOUDLY, not OOM a task (VERDICT r7 wrong
# #3 — the same fail-don't-degrade doctrine as llm_ops._guard_quadratic).
BALANCE_SEQ_CAP = 1_000_000


def q_customer_balance_capped(
    spark: SparkSession, sf: str, seq_cap: int = BALANCE_SEQ_CAP
) -> DataFrame:
    """Floor-capped running balance per customer — the classic INHERENTLY
    SEQUENTIAL per-key recurrence (acc' = max(0, acc + Δ)): a store-credit
    ledger where finished orders debit and open orders credit, and the
    balance can never go negative. No window function can express it (a
    clamped prefix sum is a non-linear recurrence, not a frame aggregate),
    and the reflex answer — applyInPandas per key — drops to Python.

    This stays JVM-side: ONE shuffle collects each customer's ordered
    (date, orderkey, Δ) structs (bounded by orders-per-customer, not data
    volume; array_sort gives a deterministic total order because orderkey
    is unique), then ``F.aggregate`` folds the clamp as a HOF expression.
    DuckDB mirrors the fold with list_reduce over a 0-seeded list, so the
    recurrence itself is oracle-checked, not just its inputs. Amounts are
    integer cents end-to-end — the fold is bit-exact in both engines."""
    orders = table(spark, sf, "orders")
    delta = (
        F.when(F.col("o_orderstatus") == "F", F.lit(-1)).otherwise(F.lit(1))
        * F.round(_dec("o_totalprice") * 100).cast("long")
    ).alias("d")
    per = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey", delta)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("o_orderdate", "o_orderkey", "d"))
            ).alias("seq")
        )
    )
    zero = F.lit(0).cast("long")
    balance = F.aggregate(
        F.expr("transform(seq, s -> s.d)"),
        zero,
        lambda acc, x: F.greatest(zero, acc + x),
    )
    # fail-loud width guard: when() is lazy per row, so raise_error fires
    # only on a key wider than the documented cap (and never perturbs the
    # oracle-checked values below it)
    guarded = F.when(
        F.size("seq") > F.lit(seq_cap),
        F.raise_error(
            F.concat(
                F.lit("q_customer_balance_capped: customer "),
                F.col("o_custkey").cast("string"),
                F.lit(
                    f" holds > {seq_cap} orders — a hot-key pathology this "
                    "fold refuses to widen a single row for; raise seq_cap "
                    "deliberately or pre-split the key"
                ),
            )
        ).cast("long"),
    ).otherwise(balance)
    return per.select(
        "o_custkey",
        F.size("seq").cast("long").alias("n_orders"),
        guarded.alias("final_balance_cents"),
    )


ORACLE_CUSTOMER_BALANCE_CAPPED = """
SELECT o_custkey, count(*)::BIGINT AS n_orders,
       list_reduce(
         list_prepend(0::BIGINT, list(d ORDER BY o_orderdate, o_orderkey)),
         (acc, x) -> greatest(0::BIGINT, acc + x)
       )::BIGINT AS final_balance_cents
FROM (
  SELECT o_custkey, o_orderdate, o_orderkey,
         (CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 1 END)
           * round(o_totalprice::DECIMAL(18,2) * 100)::BIGINT AS d
  FROM orders)
GROUP BY o_custkey
"""


def q_brand_revenue_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand revenue trend: the OLS slope of monthly revenue over the
    ship-month index — 'which brands are growing'. Same exactness doctrine
    as the correlation matrix (q_lineitem_correlation_matrix): floating
    moments accumulate in partition order and drift between engines, so
    every moment (n, Σx, Σy, Σxy, Σx²) is an EXACT integer — x is the
    month index (year·12+month), y is monthly revenue in 10⁻⁴ currency
    units (revenue() is 4dp-decimal-exact) — and the slope
    (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) does ONE double division at the
    end, rounded to 6dp: bit-identical everywhere.

    Scale shape: lineitem⋈part rides dim_join (AQE-decided — part scales
    with data), one (brand, month) partial agg, then a |brands|-row
    moment rollup. Brands with a single month have no slope (HAVING
    n ≥ 2)."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part").select("p_partkey", "p_brand")
    big = "decimal(38,0)"
    monthly = (
        dim_join(li, part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("x"),
        )
        .agg((F.sum(revenue()) * 10000).cast(big).alias("y"))
    )
    x = F.col("x").cast(big)
    mo = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast(big).alias("n"),
        F.sum(x).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(x * F.col("y")).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        mo.filter(F.col("n") >= 2)
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_months"),
            F.round(num / den / 10000.0, 6).alias("slope_per_month"),
        )
    )


ORACLE_BRAND_REVENUE_TREND = f"""
WITH monthly AS (
  SELECT p_brand,
         (year(l_shipdate) * 12 + month(l_shipdate))::HUGEINT AS x,
         (sum({SQL_REV}) * 10000)::HUGEINT AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, x
),
mo AS (
  SELECT p_brand, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy, sum(x * y)::HUGEINT AS sxy,
         sum(x * x)::HUGEINT AS sxx
  FROM monthly GROUP BY p_brand
)
SELECT p_brand, n::BIGINT AS n_months,
       round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE / 10000.0, 6)
         AS slope_per_month
FROM mo WHERE n >= 2
"""


def q_brand_concentration_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Market concentration per part type: the Herfindahl–Hirschman index
    of brand revenue shares. The naive Σ share² sums FLOATS in engine-
    dependent order; instead the algebra collapses to (Σ rev_b²) / R² —
    per-brand revenues square EXACTLY in decimal, their sum is exact, and
    only TWO double conversions and one division remain (deterministic
    IEEE), rounded 4dp. The same moment doctrine as the correlation
    matrix.

    Scale shape: lineitem⋈part (brand/type) rides a broadcast; one
    (type, brand) partial agg, then a |types|-row rollup — revenue rows
    never shuffle twice."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part").select("p_partkey", "p_brand", "p_type")
    per_brand = (
        dim_join(li, part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        # shares cancel the scale: HHI = Σq² / (Σq)² for ANY fixed scaling
        # of revenue, so work in pure integers — q = rev·10⁴ (rev is
        # 4dp-valued, q exact) — and sidestep both engines' decimal-width
        # multiplication caps entirely
        .agg((F.sum(revenue()) * 10000).cast("decimal(38,0)").alias("q"))
    )
    return (
        per_brand.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_brands"),
            F.round(
                F.sum(F.col("q") * F.col("q")).cast("double")
                / (F.sum("q").cast("double") * F.sum("q").cast("double")),
                4,
            ).alias("hhi"),
        )
    )


ORACLE_BRAND_CONCENTRATION_HHI = f"""
WITH per_brand AS (
  SELECT p.p_type, p.p_brand, (sum({SQL_REV}) * 10000)::HUGEINT AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_type, p.p_brand
)
SELECT p_type, count(*) AS n_brands,
       round(sum(q * q)::DOUBLE / (sum(q)::DOUBLE * sum(q)::DOUBLE), 4) AS hhi
FROM per_brand GROUP BY p_type
"""


def q_engagement_revenue_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Does on-site engagement predict order-book revenue? Pearson
    correlation between each clickstream user's event spend and their
    order revenue — the cross-dataset statistic the customer-360 join
    exists to enable. Users without orders count as zero revenue (the
    honest join: engagement with no purchases is signal, not a dropped
    row). Exact-moment doctrine: both measures are 2dp-valued → ×100
    integer quantization, five decimal-exact sums, one fixed IEEE
    sequence, 4dp round (same construction as the lineitem correlation
    matrix).

    Scale shape: one user-keyed partial agg per dataset, one hash join of
    the two per-user frames, and a 5-aggregate reduce to a single row."""
    ev = table(spark, sf, "events")
    orders = table(spark, sf, "orders")
    per_user = ev.groupBy("user_id").agg(
        (F.sum(F.coalesce(_dec("value"), F.lit(0).cast(MONEY))) * 100)
        .cast("decimal(38,0)")
        .alias("x")
    )
    per_cust = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        (F.sum(_dec("o_totalprice")) * 100).cast("decimal(38,0)").alias("y")
    )
    joined = per_user.join(per_cust, "user_id", "left").select(
        "x", F.coalesce(F.col("y"), F.lit(0).cast("decimal(38,0)")).alias("y")
    )
    one = joined.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return one.selectExpr(
        "cast(n as long) as n_users",
        "round(cast(n * sxy - sx * sy as double) / "
        "(sqrt(cast(n * sxx - sx * sx as double)) * "
        "sqrt(cast(n * syy - sy * sy as double))), 4) as corr",
    )


ORACLE_ENGAGEMENT_REVENUE_CORRELATION = """
WITH per_user AS (
  SELECT user_id,
         (sum(coalesce(value::DECIMAL(18,2), 0)) * 100)::HUGEINT AS x
  FROM events GROUP BY user_id
),
per_cust AS (
  SELECT o_custkey AS user_id,
         (sum(o_totalprice::DECIMAL(18,2)) * 100)::HUGEINT AS y
  FROM orders GROUP BY o_custkey
),
joined AS (
  SELECT u.x, coalesce(c.y, 0)::HUGEINT AS y
  FROM per_user u LEFT JOIN per_cust c USING (user_id)
),
m AS (
  SELECT count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM joined
)
SELECT n::BIGINT AS n_users,
       round((n * sxy - sx * sy)::DOUBLE /
             (sqrt((n * sxx - sx * sx)::DOUBLE) *
              sqrt((n * syy - sy * sy)::DOUBLE)), 4) AS corr
FROM m
"""


RFM_REF_DATE = "2001-09-01"  # just past the orders fixture's last date


def q_customer_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation — the classic star-schema marketing rollup: per
    customer, Recency (days from last order to the reference date),
    Frequency (order count), Monetary (decimal-exact total spend); each
    metric classified into value-quartiles (1 = lowest value, 4 = highest)
    and rolled up per (r_q, f_q, m_q) cell.

    Deliberately NOT ``ntile``: a global ntile needs one totally-ordered
    partition (single-task at scale) and breaks ties by row order. Instead
    the three quartile thresholds come from one exact interpolated
    ``percentile`` aggregate (a 1-row frame, broadcast), and classification
    is a projection — scan-shaped at any table size. Threshold comparisons
    are engine-stable: an interpolated cut either equals an order statistic
    exactly (g=0 or equal neighbors — no float arithmetic) or lies strictly
    between two distinct data values where no metric can sit."""
    orders = table(spark, sf, "orders")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.lit(RFM_REF_DATE).cast("date"), F.col("last_order").cast("date")).alias(
                "r_days"
            ),
            "frequency",
            "monetary",
        )
    )
    cuts = per.agg(
        F.percentile("r_days", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("rc"),
        F.percentile("frequency", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("fc"),
        F.percentile("monetary", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("mc"),
    )

    def quartile(metric, cut_arr):
        q = F.lit(1)
        for i in 1, 2, 3:
            q = q + F.when(metric > F.element_at(cut_arr, i), 1).otherwise(0)
        return q

    scored = per.crossJoin(F.broadcast(cuts)).select(
        quartile(F.col("r_days"), F.col("rc")).alias("r_q"),
        quartile(F.col("frequency"), F.col("fc")).alias("f_q"),
        quartile(F.col("monetary"), F.col("mc")).alias("m_q"),
        "monetary",
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum("monetary").alias("total_monetary"),
    )


ORACLE_CUSTOMER_RFM_SEGMENTS = f"""
WITH per AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate)::DATE, DATE '{RFM_REF_DATE}') AS r_days,
         count(*) AS frequency,
         {sql_money_sum("o_totalprice")} AS monetary
  FROM orders GROUP BY o_custkey),
cuts AS (
  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rc,
         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fc,
         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
  FROM per)
SELECT r_q, f_q, m_q, count(*) AS n_customers,
       {sql_money_sum("monetary")} AS total_monetary
FROM (
  SELECT 1 + (CASE WHEN r_days > rc[1] THEN 1 ELSE 0 END)
           + (CASE WHEN r_days > rc[2] THEN 1 ELSE 0 END)
           + (CASE WHEN r_days > rc[3] THEN 1 ELSE 0 END) AS r_q,
         1 + (CASE WHEN frequency > fc[1] THEN 1 ELSE 0 END)
           + (CASE WHEN frequency > fc[2] THEN 1 ELSE 0 END)
           + (CASE WHEN frequency > fc[3] THEN 1 ELSE 0 END) AS f_q,
         1 + (CASE WHEN monetary > mc[1] THEN 1 ELSE 0 END)
           + (CASE WHEN monetary > mc[2] THEN 1 ELSE 0 END)
           + (CASE WHEN monetary > mc[3] THEN 1 ELSE 0 END) AS m_q,
         monetary
  FROM per, cuts)
GROUP BY r_q, f_q, m_q
"""


def q_events_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention over the events stream — the other classic
    product-analytics rollup: users are cohorted by the week of their first
    event; each (cohort_week, week_offset) cell counts the cohort's users
    active that many weeks later. Shape: one distinct over (user, week)
    (the only event-volume shuffle — partial-aggregated map-side), a
    per-user min for the cohort, a user-keyed join, and a cell rollup;
    weeks are Monday-truncated identically in Spark and DuckDB."""
    ev = table(spark, sf, "events")
    user_weeks = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week")).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        user_weeks.join(cohorts, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


ORACLE_EVENTS_RETENTION_COHORTS = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       date_diff('day', cohort_week, week) // 7 AS week_offset,
       count(DISTINCT user_id) AS n_active_users
FROM uw JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


def q_events_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential funnel conversion (view → click → purchase): a user
    advances a step only with an event of the next type STRICTLY AFTER
    their earliest arrival at the previous step — the order-dependent
    query shape plain per-type counts can't express. Per-step earliest
    times chain through user-keyed joins: filter + partial-agg min per
    step, each join hash-keyed on user_id (no windows, no event-volume
    fan-out), then three 1-row counts broadcast into one summary row with
    step conversion rates and the mean view→purchase latency (integer
    microsecond sums — exact; one double division at the end)."""
    ev = table(spark, sf, "events")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_viewed"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_clicked"))
    n3 = s3.agg(
        F.count(F.lit(1)).alias("n_purchased"),
        F.sum(F.unix_micros("t3") - F.unix_micros("t1")).alias("lat_us"),
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.round(F.col("n_clicked").cast("double") / F.col("n_viewed"), 4).alias(
                "view_to_click"
            ),
            F.round(F.col("n_purchased").cast("double") / F.col("n_clicked"), 4).alias(
                "click_to_purchase"
            ),
            F.round(
                F.col("lat_us").cast("double") / F.col("n_purchased") / 1_000_000.0, 2
            ).alias("avg_view_to_purchase_s"),
        )
    )


ORACLE_EVENTS_FUNNEL_CONVERSION = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s1) AS n_viewed,
       (SELECT count(*) FROM s2) AS n_clicked,
       (SELECT count(*) FROM s3) AS n_purchased,
       round((SELECT count(*) FROM s2)::DOUBLE / (SELECT count(*) FROM s1), 4)
         AS view_to_click,
       round((SELECT count(*) FROM s3)::DOUBLE / (SELECT count(*) FROM s2), 4)
         AS click_to_purchase,
       round((SELECT sum(epoch_us(t3) - epoch_us(t1)) FROM s3)::DOUBLE
             / (SELECT count(*) FROM s3) / 1000000.0, 2)
         AS avg_view_to_purchase_s
"""


def q_events_sliding_rates(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window rollup (15-minute windows every 5 minutes) — the batch
    twin of the streaming layer's ``sliding_event_rates``. ``F.window`` with
    a slide emits each event into windowDuration/slideDuration = 3
    epoch-aligned windows (a generator, not a shuffle); the only exchange
    is the final partial-agg groupBy on (window, type) buckets — events
    never shuffle raw. Value sums are decimal-exact (money_sum)."""
    ev = table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# Spark's sliding windows are epoch-aligned multiples of the slide; the
# oracle rebuilds them as time_bucket(5 min) - k*5min for k in 0..2 (every
# event belongs to exactly those three 15-minute windows).
ORACLE_EVENTS_SLIDING_RATES = f"""
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       {sql_money_sum("value")} AS total_value
FROM events, (SELECT unnest(range(3)) AS k)
GROUP BY window_start, event_type
"""


PARETO_BAND_WIDTH = 50_000  # revenue band for the two-level distributed scan


def q_revenue_pareto_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto concentration: how few customers produce half of all order
    revenue. The global cumulative sum is computed WITHOUT a single-
    partition window via a two-level banded scan: (1) per-customer decimal
    revenue (the only big shuffle), (2) customers bucket into fixed revenue
    bands whose per-band totals form a TINY table (≤ max_rev/band_width
    rows) where a plain window computes each band's preceding-bands sum,
    (3) that offset broadcasts back and a window PARTITIONED BY band (a
    bounded partition) finishes the exact global prefix sum. Bands
    partition the revenue ordering (every rev in band b+1 > every rev in
    band b), so banded cum == global cum exactly; all sums are decimal.
    The halfway comparison is ``2*(cum - rev) < total`` — decimal-exact,
    no division. Output: one row (n_pareto_customers, n_customers,
    customer_share)."""
    per = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("rev"))
        .withColumn("band", F.floor(F.col("rev") / PARETO_BAND_WIDTH).cast("long"))
    )
    # One tiny band table carries BOTH the per-band prefix offsets and the
    # grand totals (full-frame window), so `per` has exactly two consumers —
    # this branch and the final join — whose identical o_custkey Exchange
    # AQE deduplicates at runtime (ReusedExchange; verified in the plan).
    w_band = (
        Window.orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    band_tbl = (
        per.groupBy("band")
        .agg(F.sum("rev").alias("band_rev"), F.count(F.lit(1)).alias("band_n"))
        .select(
            "band",
            (F.sum("band_rev").over(w_band) - F.col("band_rev")).alias("cum_before_band"),
            F.sum("band_rev").over(w_all).alias("total_rev"),
            F.sum("band_n").over(w_all).alias("n_customers"),
        )
    )
    w_in_band = (
        Window.partitionBy("band")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per.join(F.broadcast(band_tbl), "band")
        .select(
            "rev",
            "total_rev",
            "n_customers",
            (F.col("cum_before_band") + F.sum("rev").over(w_in_band)).alias("cum_rev"),
        )
        .filter((F.col("cum_rev") - F.col("rev")) * 2 < F.col("total_rev"))
        .groupBy("n_customers")
        .agg(F.count(F.lit(1)).alias("n_pareto_customers"))
        .select(
            "n_pareto_customers",
            "n_customers",
            F.round(
                F.col("n_pareto_customers").cast("double") / F.col("n_customers"), 4
            ).alias("customer_share"),
        )
    )


ORACLE_REVENUE_PARETO_CUSTOMERS = """
WITH per AS (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2)) AS rev
  FROM orders GROUP BY o_custkey),
tot AS (SELECT sum(rev) AS total_rev, count(*) AS n_customers FROM per),
cum AS (
  SELECT rev, sum(rev) OVER (ORDER BY rev DESC, o_custkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev
  FROM per)
SELECT count(*) AS n_pareto_customers,
       (SELECT n_customers FROM tot) AS n_customers,
       round(count(*)::DOUBLE / (SELECT n_customers FROM tot), 4) AS customer_share
FROM cum WHERE (cum_rev - rev) * 2 < (SELECT total_rev FROM tot)
"""


BASKET_MIN_SUPPORT = 3  # pairs must co-occur in >= this many orders
BASKET_TOP_K = 20


def q_part_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket analysis (the apriori first stage): part pairs that
    co-occur in the same order, with support, confidence and lift — all
    ratios of exact integer counts (one deterministic IEEE division each),
    top BASKET_TOP_K by (lift desc, pair) so the cut is engine-exact.

    Scale shape: ONE shuffle of lineitem builds per-order sorted part
    ARRAYS (baskets are tiny — TPC-H ≤7 items); the pair fan-out is then
    pure map-side array combinatorics (transform×slice inside codegen),
    NEVER a self-join — the naive orderkey self-join costs two more full
    reshuffles for the same pair stream (measured 2.1s → 1.7s at sf0.1).
    Item supports and the order count derive from the same basket frame;
    min-support kills the tail before the broadcastable support joins.
    Top-k compiles to TakeOrderedAndProject."""
    li = table(spark, sf, "lineitem")
    # materialize the basket frame ONCE (r15, guide §5): n_orders, the
    # item supports (consumed twice, as n_a and n_b) and the pair fan-out
    # each re-executed the lineitem scan + collect_set shuffle — 4 fact
    # scans / 22 exchanges in the executed sf0.1 plan, zero AQE reuse;
    # ONE fact shuffle remains, and the basket frame (a row per order,
    # TPC-H baskets ≤7 parts) is far smaller than the lineitem it derives
    # from. Measured trade at sf0.1 (OPTIMIZATION_r15.md): the diamond's
    # four branches ran CONCURRENTLY inside one job on local[32], so the
    # materialized form is ~0.16 s slower there (1.67 → 1.83 s, and a
    # lighter-branches no-materialize variant measured the same 1.83) —
    # kept because at 100 TB the four corpus shuffles are CPU/IO-bound,
    # not latency-bound, and 4× → 1× fact shuffles dominates.
    baskets = materialize(
        li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        )
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    # all (pa < pb) pairs of one basket, generated in-expression: element i
    # pairs with every element after it (parts is sorted distinct)
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) ->"
        " transform(slice(parts, i + 2, size(parts)), y -> struct(x AS pa, y AS pb))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_SUPPORT)
    )
    na = item.select(F.col("l_partkey").alias("pa"), F.col("n_item").alias("n_a"))
    nb = item.select(F.col("l_partkey").alias("pb"), F.col("n_item").alias("n_b"))
    lift = (F.col("n_both") * F.col("n_orders")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    )
    return (
        dim_join(dim_join(pairs, na, "pa"), nb, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_a"), 4).alias("confidence_a_to_b"),
            F.round(lift, 4).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(BASKET_TOP_K)
    )


ORACLE_PART_MARKET_BASKET = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
item AS (SELECT l_partkey, count(*) AS n_item FROM baskets GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb
  HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT pa, pb, n_both,
       round(n_both::DOUBLE / na.n_item, 4) AS confidence_a_to_b,
       round((n_both * n_orders.n_orders)::DOUBLE / (na.n_item * nb.n_item), 4) AS lift
FROM pairs
JOIN item na ON na.l_partkey = pa
JOIN item nb ON nb.l_partkey = pb
CROSS JOIN n_orders
ORDER BY lift DESC, pa, pb
LIMIT {BASKET_TOP_K}
"""


def q_revenue_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Time-hierarchy ROLLUP: order revenue at (year, quarter, month) with
    the hierarchy's subtotal rows (grand total included) — the calendar
    drill-down every BI layer issues, distinct from lineitem_cube's flag
    cube. grouping_id disambiguates subtotal rows from real NULLs.
    Decimal-exact money sums; one partial-aggregable rollup pass."""
    orders = table(spark, sf, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mon"),
            "o_totalprice",
        )
        .rollup("yr", "qtr", "mon")
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


ORACLE_REVENUE_TIME_ROLLUP = f"""
SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       month(o_orderdate) AS mon,
       {sql_money_sum("o_totalprice")} AS revenue,
       count(*) AS n_orders,
       grouping(year(o_orderdate), quarter(o_orderdate), month(o_orderdate))::BIGINT AS gid
FROM orders
GROUP BY ROLLUP (yr, qtr, mon)
"""


def _priority_intervals(orders: DataFrame) -> DataFrame:
    """SCD Type-2 validity intervals for each customer's order priority:
    (o_custkey, o_orderpriority, valid_from, valid_to) with half-open
    [valid_from, valid_to) semantics and NULL valid_to for the open
    (current) interval. Run detection is the lag()≠current flag +
    running-sum run-id idiom; one customer-keyed shuffle feeds every
    window and the run collapse is a partial-agg groupBy."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    runs = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    intervals = runs.groupBy("o_custkey", "run_id", "o_orderpriority").agg(
        F.min("o_orderdate").alias("valid_from")
    )
    w_run = Window.partitionBy("o_custkey").orderBy("run_id")
    return intervals.withColumn("valid_to", F.lead("valid_from").over(w_run))


def q_customer_priority_scd(spark: SparkSession, sf: str) -> DataFrame:
    """SCD Type-2 interval build from a change stream: treating each
    customer's order sequence as a change log of their "current order
    priority", collapse consecutive same-priority orders into runs and
    emit validity intervals [run start, next run start) — the dimension-
    history table a lakehouse maintains for as-of joins. Run detection is
    the lag()≠current flag + running-sum run-id idiom (same two-window
    shape as sessionization); interval ends come from lead() over run
    starts. Output per priority: closed-interval counts and integer total
    days, plus how many customers' history ENDS in that priority (open
    intervals, no end date yet).

    Scale shape: one customer-keyed shuffle feeds every window; the run
    collapse is a partial-agg groupBy; final rollup is |priorities| rows."""
    iv = _priority_intervals(table(spark, sf, "orders"))
    return iv.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("valid_to").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_closed"),
        F.sum(
            F.when(
                F.col("valid_to").isNotNull(),
                F.datediff("valid_to", "valid_from"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("total_days"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
    )


ORACLE_CUSTOMER_PRIORITY_SCD = """
WITH runs AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
               OR lag(o_orderpriority) OVER w != o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
rid AS (
  SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs
),
intervals AS (
  SELECT o_custkey, run_id, o_orderpriority, min(o_orderdate) AS valid_from
  FROM rid GROUP BY o_custkey, run_id, o_orderpriority
),
iv AS (
  SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to
  FROM intervals
)
SELECT o_orderpriority,
       sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_closed,
       sum(CASE WHEN valid_to IS NOT NULL
                THEN date_diff('day', valid_from, valid_to) ELSE 0 END)::BIGINT AS total_days,
       sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_open
FROM iv GROUP BY o_orderpriority
"""


def q_priority_drift_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD Type-2 intervals —
    the feature-pipeline op that answers "what was the dimension value AT
    THE TIME of the fact", not at order entry: for every lineitem, look up
    the customer's priority interval active at l_shipdate (half-open
    [valid_from, valid_to), NULL valid_to = open) and cross-tab revenue by
    (priority at order entry) × (priority active at ship time). Off-
    diagonal rows are facts whose dimension drifted between the two
    timestamps — exactly what a training pipeline silently gets wrong when
    it joins facts to the CURRENT dim row (feature leakage).

    Scale shape: lineitem shuffles twice, both as equi hash joins —
    orderkey (fact⋈fact-header, co-shuffled) then custkey against the
    interval table; the interval range predicate is a post-join filter on
    a per-customer handful of rows (runs per customer ≈ orders per
    customer), never an all-pairs range join. Every ship date ≥ the
    customer's first order date, so exactly one interval matches and the
    join preserves lineitem cardinality. Final agg is |prio|² rows."""
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate", revenue().alias("rev"))
    orders = table(spark, sf, "orders")
    hdr = orders.select("o_orderkey", "o_custkey", F.col("o_orderpriority").alias("prio_at_order"))
    iv = _priority_intervals(orders).select(
        "o_custkey", F.col("o_orderpriority").alias("prio_at_ship"), "valid_from", "valid_to"
    )
    return (
        li.join(hdr, li.l_orderkey == hdr.o_orderkey)
        .join(
            iv,
            (hdr.o_custkey == iv.o_custkey)
            & (F.col("valid_from") <= F.col("l_shipdate"))
            & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
        )
        .groupBy("prio_at_order", "prio_at_ship")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
        )
    )


ORACLE_PRIORITY_DRIFT_REVENUE = f"""
WITH runs AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
               OR lag(o_orderpriority) OVER w != o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
rid AS (
  SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs
),
intervals AS (
  SELECT o_custkey, run_id, o_orderpriority, min(o_orderdate) AS valid_from
  FROM rid GROUP BY o_custkey, run_id, o_orderpriority
),
iv AS (
  SELECT o_custkey, o_orderpriority AS prio_at_ship, valid_from,
         lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to
  FROM intervals
)
SELECT o.o_orderpriority AS prio_at_order, iv.prio_at_ship,
       count(*) AS n_items,
       round(sum({SQL_REV})::DOUBLE, 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN iv ON o.o_custkey = iv.o_custkey
       AND iv.valid_from <= l.l_shipdate
       AND (iv.valid_to IS NULL OR l.l_shipdate < iv.valid_to)
GROUP BY prio_at_order, prio_at_ship
"""


def q_customer_order_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-order gap analysis: days between a customer's consecutive
    orders, rolled up per market segment (repeat customers only) — the
    recency signal behind churn models. Gaps via lag() inside bounded
    per-customer windows; integer day arithmetic (datediff) so the
    distribution is engine-exact; the per-segment percentile runs on the
    gap rows (one partial agg + percentile_disc per segment).

    Scale shape: one customer-keyed shuffle for the lag window, a
    broadcast customer→segment join, then a segment-keyed aggregate —
    raw orders shuffle once."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    seg = cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    return (
        dim_join(gaps, seg, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            # percentile_disc returns an ACTUAL gap value (an int) — Spark
            # types it double; cast back so both engines emit BIGINT
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)")
            .cast("long")
            .alias("median_gap"),
            F.max("gap_days").alias("max_gap"),
        )
    )


ORACLE_CUSTOMER_ORDER_GAPS = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT c_mktsegment, count(*) AS n_gaps,
       min(gap_days) AS min_gap,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days) AS median_gap,
       max(gap_days) AS max_gap
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
"""


PATHS_TOP_K = 15
PATHS_MAX_LEN = 8  # longer sessions roll up under a truncated '>...' path


def q_events_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence mining: the most common session journeys ('view>click>
    purchase'), sessions cut at 30-min inactivity exactly like
    q_event_sessionization. Per session the ordered event-type path is
    built by an array_sort over (ts, event_id, type) structs — NOT a bare
    collect_list, whose order is whatever the shuffle delivered — then
    truncated to PATHS_MAX_LEN steps with a '>...' marker so one
    pathological bot session cannot materialize an unbounded string.
    Deterministic top-K by (count desc, path).

    Scale shape: one user-keyed shuffle feeds both session windows (same
    as sessionization), one partial-agg groupBy to distinct paths, top-k
    as TakeOrderedAndProject. Per-session state is bounded by
    PATHS_MAX_LEN after truncation; the collect itself is bounded by
    session length, the same bound every sessionizer carries."""
    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ordered = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", F.col("event_type").alias("et")))
            ).alias("evs")
        )
        .select(
            F.transform("evs", lambda s: s["et"]).alias("types"),
        )
    )
    path = F.when(
        F.size("types") > PATHS_MAX_LEN,
        F.concat(
            F.array_join(F.slice("types", 1, PATHS_MAX_LEN), ">"), F.lit(">...")
        ),
    ).otherwise(F.array_join("types", ">"))
    return (
        ordered.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATHS_TOP_K)
    )


ORACLE_EVENTS_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
paths AS (
  SELECT CASE WHEN count(*) > {PATHS_MAX_LEN}
              THEN array_to_string((list(event_type ORDER BY ts, event_id))[1:{PATHS_MAX_LEN}], '>') || '>...'
              ELSE array_to_string(list(event_type ORDER BY ts, event_id), '>') END AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATHS_TOP_K}
"""


FUNNEL_WINDOW_DAYS = 7


def q_events_windowed_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Time-BOUNDED funnel: of each week's signup cohort, who purchased
    within FUNNEL_WINDOW_DAYS of their first signup (contrast
    q_events_funnel_conversion, which is order-only with no deadline).
    Deadline arithmetic in integer epoch seconds so both engines cut the
    window identically; conversion rate is one integer division.

    Scale shape: two user-keyed partial aggregates (first signup, per-user
    purchase times) meet in ONE co-partitioned equi join on user_id with
    the deadline as a post-filter inside a conditional aggregate — no
    range join, no window over raw events."""
    ev = table(spark, sf, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp("ts")).alias("signup_epoch"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").alias("p_epoch")
    )
    deadline = F.col("signup_epoch") + FUNNEL_WINDOW_DAYS * 86400
    conv = (
        signups.join(purchases, "user_id", "left")
        .groupBy("user_id", "signup_epoch")
        .agg(
            F.max(
                F.when(
                    (F.col("p_epoch") > F.col("signup_epoch")) & (F.col("p_epoch") <= deadline),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    week = F.date_format(
        F.date_trunc("week", F.timestamp_seconds(F.col("signup_epoch"))), "yyyy-MM-dd"
    )
    return (
        conv.groupBy(week.alias("signup_week"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted").cast("double") / F.col("n_signups"), 6),
        )
    )


ORACLE_EVENTS_WINDOWED_FUNNEL = f"""
WITH signups AS (
  SELECT user_id, min(epoch(ts)::BIGINT) AS signup_epoch
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
purchases AS (
  SELECT user_id, epoch(ts)::BIGINT AS p_epoch
  FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT s.user_id, s.signup_epoch,
         max(CASE WHEN p.p_epoch > s.signup_epoch
                   AND p.p_epoch <= s.signup_epoch + {FUNNEL_WINDOW_DAYS} * 86400
                  THEN 1 ELSE 0 END) AS converted
  FROM signups s LEFT JOIN purchases p USING (user_id)
  GROUP BY s.user_id, s.signup_epoch
)
SELECT strftime(date_trunc('week', to_timestamp(signup_epoch)), '%Y-%m-%d') AS signup_week,
       count(*) AS n_signups,
       sum(converted)::BIGINT AS n_converted,
       round(sum(converted)::DOUBLE / count(*), 6) AS conversion_rate
FROM conv
GROUP BY signup_week
"""


def q_shipment_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Interval sweep-line: how many orders are simultaneously OPEN (from
    o_orderdate until their last shipment ships) at the end of each
    date, reported as a monthly high-water mark — the operational-
    capacity question (peak concurrent in-flight load) that a plain
    per-month COUNT cannot answer because intervals span months.

    Scale shape: the interval endpoints collapse FIRST — lineitem
    partial-aggregates to one close-date per order (co-keyed
    orderkey⋈orderkey shuffle with orders), then the +1/-1 endpoint
    deltas partial-aggregate to one net per DATE (a |dates|-row frame,
    bounded by the calendar, not the data volume), and only that tiny
    frame pays the ordered running-sum window. At 100 TB the window
    still sees a few thousand rows; the 100 TB never sorts.
    """
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    closes = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_d"))
    spans = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey
    ).select("o_orderdate", "close_d")
    deltas = spans.select(
        F.col("o_orderdate").alias("d"), F.lit(1).alias("delta")
    ).unionAll(spans.select(F.col("close_d").alias("d"), F.lit(-1).alias("delta")))
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = daily.withColumn("open_cnt", F.sum("net").over(w))
    return (
        run.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(F.max("open_cnt").cast("long").alias("max_open"))
    )


ORACLE_SHIPMENT_CONCURRENCY = """
WITH spans AS (
  SELECT o.o_orderdate, max(l.l_shipdate) AS close_d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), deltas AS (
  SELECT o_orderdate AS d, 1 AS delta FROM spans
  UNION ALL
  SELECT close_d AS d, -1 AS delta FROM spans
), daily AS (
  SELECT d, sum(delta) AS net FROM deltas GROUP BY d
), run AS (
  SELECT d, sum(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS open_cnt
  FROM daily
)
SELECT strftime(d, '%Y-%m') AS month, max(open_cnt)::BIGINT AS max_open
FROM run
GROUP BY month
"""


def q_customer_order_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: each customer's LONGEST run of consecutive
    calendar months with at least one order, reported as a distribution
    (streak length -> number of customers). The island id is the classic
    ``month_index - row_number`` trick over distinct months — constant
    within a consecutive run, shifted by every gap — entirely integer
    arithmetic, so both engines agree exactly.

    Scale shape: one shuffle to distinct (custkey, month); every window
    partitions by custkey (bounded partitions); the two rollups are
    plain partial-aggregable groupBys. No self-join, no global sort.
    """
    orders = table(spark, sf, "orders")
    months = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("midx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("midx")
    islands = months.withColumn("island", F.col("midx") - F.row_number().over(w))
    streaks = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("streak")
    )
    best = streaks.groupBy("o_custkey").agg(F.max("streak").alias("max_streak"))
    return best.groupBy("max_streak").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


ORACLE_CUSTOMER_ORDER_STREAKS = """
WITH months AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS midx
  FROM orders
), islands AS (
  SELECT o_custkey, midx,
         midx - row_number() OVER (PARTITION BY o_custkey ORDER BY midx) AS island
  FROM months
), streaks AS (
  SELECT o_custkey, island, count(*) AS streak
  FROM islands GROUP BY o_custkey, island
), best AS (
  SELECT o_custkey, max(streak) AS max_streak FROM streaks GROUP BY o_custkey
)
SELECT max_streak, count(*)::BIGINT AS n_customers
FROM best
GROUP BY max_streak
"""


def q_lineitem_key_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew diagnostics — the profile an operator reads BEFORE
    choosing salting / AQE skew-join thresholds for a 100 TB join on
    this key (the doctrine queries like skew_salted_revenue then apply):
    per-key row counts summarized as exact disc-percentiles, the max
    key's share, and the top-10 keys' share of all rows.

    Scale shape: ONE event-scale shuffle (groupBy l_suppkey with partial
    aggregation); everything after runs on the |keys|-row count frame,
    and (r10) the top-10 share comes from a TakeOrdered 10-row frame
    crossed back in — never a global row_number window over |keys| rows
    (keys grow with the fact table; the flagged single-partition-window
    class). The exact percentile aggregates remain the documented
    |keys|-cost term of this profiling tool. Ratios are single rounded
    double divisions of exact integers (the OLS doctrine), so both
    engines agree bitwise.
    """
    li = table(spark, sf, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    top10 = (
        counts.orderBy(F.col("cnt").desc(), F.col("l_suppkey"))
        .limit(10)
        .agg(F.sum("cnt").cast("long").alias("top10_cnt"))
    )
    ranked = counts.crossJoin(F.broadcast(top10))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)")
        .cast("long")
        .alias("p50_cnt"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cnt)")
        .cast("long")
        .alias("p90_cnt"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)")
        .cast("long")
        .alias("p99_cnt"),
        F.round(F.max("cnt") / F.sum("cnt"), 8).alias("max_share"),
        F.round(F.max("top10_cnt") / F.sum("cnt"), 8).alias("top10_share"),
    )


ORACLE_LINEITEM_KEY_SKEW_PROFILE = """
WITH counts AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rk
  FROM counts
)
SELECT count(*)::BIGINT AS n_keys,
       sum(cnt)::BIGINT AS n_rows,
       max(cnt)::BIGINT AS max_cnt,
       quantile_disc(cnt, 0.5)::BIGINT AS p50_cnt,
       quantile_disc(cnt, 0.9)::BIGINT AS p90_cnt,
       quantile_disc(cnt, 0.99)::BIGINT AS p99_cnt,
       round(max(cnt)::DOUBLE / sum(cnt), 8) AS max_share,
       round(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 8)
         AS top10_share
FROM ranked
"""


def q_order_interarrival_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Repeat-purchase cadence: the gap in days between each customer's
    consecutive orders (lag window), summarized as a global distribution
    — count, mean (one rounded double division of exact integer sums),
    and exact disc-percentiles. The retention question ("how often do
    customers come back?") behind every re-engagement trigger.

    Scale shape: the lag window partitions by customer (bounded
    partitions, co-keyed with the one shuffle); the final rollup is a
    zero-key aggregate over the |orders - customers| gap rows with
    map-side partials. No self-join — the naive spelling joins orders to
    orders on adjacent ranks.
    """
    orders = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.sum("gap_days") / F.count(F.lit(1)), 8).alias("mean_gap"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)")
        .cast("long")
        .alias("p50_gap"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)")
        .cast("long")
        .alias("p90_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
    )


ORACLE_ORDER_INTERARRIVAL_STATS = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT count(*)::BIGINT AS n_gaps,
       round(sum(gap_days)::DOUBLE / count(*), 8) AS mean_gap,
       quantile_disc(gap_days, 0.5)::BIGINT AS p50_gap,
       quantile_disc(gap_days, 0.9)::BIGINT AS p90_gap,
       max(gap_days)::BIGINT AS max_gap
FROM gaps
WHERE gap_days IS NOT NULL
"""


QUERIES: dict[str, Query] = {
    "order_interarrival_stats": Query(
        q_order_interarrival_stats,
        ORACLE_ORDER_INTERARRIVAL_STATS,
        ("window", "lag", "percentile"),
    ),
    "shipment_concurrency": Query(
        q_shipment_concurrency,
        ORACLE_SHIPMENT_CONCURRENCY,
        ("sweepline", "interval", "window"),
        True,
    ),
    "customer_order_streaks": Query(
        q_customer_order_streaks,
        ORACLE_CUSTOMER_ORDER_STREAKS,
        ("islands", "window", "agg"),
    ),
    "lineitem_key_skew_profile": Query(
        q_lineitem_key_skew_profile,
        ORACLE_LINEITEM_KEY_SKEW_PROFILE,
        ("skew", "diagnostics", "percentile"),
        True,
    ),
    "pricing_summary": Query(q_pricing_summary, ORACLE_PRICING_SUMMARY, ("tpch", "agg"), True),
    "part_market_basket": Query(
        q_part_market_basket, ORACLE_PART_MARKET_BASKET, ("basket", "join", "agg"), True
    ),
    "events_windowed_funnel": Query(
        q_events_windowed_funnel, ORACLE_EVENTS_WINDOWED_FUNNEL, ("events", "funnel", "agg")
    ),
    "events_session_paths": Query(
        q_events_session_paths, ORACLE_EVENTS_SESSION_PATHS, ("events", "session", "sequence")
    ),
    "revenue_time_rollup": Query(
        q_revenue_time_rollup, ORACLE_REVENUE_TIME_ROLLUP, ("rollup", "agg", "tpch")
    ),
    "customer_order_gaps": Query(
        q_customer_order_gaps, ORACLE_CUSTOMER_ORDER_GAPS, ("window", "quantile", "join")
    ),
    "customer_priority_scd": Query(
        q_customer_priority_scd, ORACLE_CUSTOMER_PRIORITY_SCD, ("scd", "window", "agg")
    ),
    "priority_drift_revenue": Query(
        q_priority_drift_revenue,
        ORACLE_PRIORITY_DRIFT_REVENUE,
        ("scd", "pit", "join", "agg"),
        bench=True,
    ),
    "events_session_stats_native": Query(
        q_events_session_stats_native,
        ORACLE_EVENTS_SESSION_STATS_NATIVE,
        ("events", "session", "window-agg"),
    ),
    "nation_best_supplier": Query(
        q_nation_best_supplier, ORACLE_NATION_BEST_SUPPLIER, ("agg", "argmax", "join")
    ),
    "orders_above_cust_avg": Query(
        q_orders_above_cust_avg, ORACLE_ORDERS_ABOVE_CUST_AVG, ("tpch", "decorrelate", "agg")
    ),
    "data_quality_audit": Query(
        q_data_quality_audit, ORACLE_DATA_QUALITY_AUDIT, ("dq", "antijoin", "agg")
    ),
    "orders_yoy_growth": Query(
        q_orders_yoy_growth, ORACLE_ORDERS_YOY_GROWTH, ("star", "window", "agg")
    ),
    "customer_engagement_360": Query(
        q_customer_engagement_360,
        ORACLE_CUSTOMER_ENGAGEMENT_360,
        ("events", "star", "join", "agg"),
    ),
    "customer_cohort_ltv": Query(
        q_customer_cohort_ltv, ORACLE_CUSTOMER_COHORT_LTV, ("star", "cohort", "agg")
    ),
    "customer_balance_capped": Query(
        q_customer_balance_capped,
        ORACLE_CUSTOMER_BALANCE_CAPPED,
        ("sequential", "hof", "fold"),
    ),
    "brand_revenue_trend": Query(
        q_brand_revenue_trend,
        ORACLE_BRAND_REVENUE_TREND,
        ("regression", "agg", "tpch"),
    ),
    "brand_concentration_hhi": Query(
        q_brand_concentration_hhi, ORACLE_BRAND_CONCENTRATION_HHI, ("star", "agg", "exact-float")
    ),
    "engagement_revenue_correlation": Query(
        q_engagement_revenue_correlation,
        ORACLE_ENGAGEMENT_REVENUE_CORRELATION,
        ("events", "star", "join", "exact-float"),
    ),
    "customer_rfm_segments": Query(
        q_customer_rfm_segments, ORACLE_CUSTOMER_RFM_SEGMENTS, ("star", "agg", "quantile")
    ),
    "events_sliding_rates": Query(
        q_events_sliding_rates, ORACLE_EVENTS_SLIDING_RATES, ("events", "window-agg", "sliding")
    ),
    "revenue_pareto_customers": Query(
        q_revenue_pareto_customers,
        ORACLE_REVENUE_PARETO_CUSTOMERS,
        ("tpch", "window", "cume", "agg"),
    ),
    "events_retention_cohorts": Query(
        q_events_retention_cohorts, ORACLE_EVENTS_RETENTION_COHORTS, ("events", "agg")
    ),
    "events_funnel_conversion": Query(
        q_events_funnel_conversion, ORACLE_EVENTS_FUNNEL_CONVERSION, ("events", "join")
    ),
    "revenue_by_brand_month": Query(
        q_revenue_by_brand_month, ORACLE_REVENUE_BY_BRAND_MONTH, ("star", "flagship"), True
    ),
    "building_top_orders": Query(
        q_building_top_orders, ORACLE_BUILDING_TOP_ORDERS, ("tpch", "topn"), True
    ),
    "late_ship_priority": Query(
        q_late_ship_priority, ORACLE_LATE_SHIP_PRIORITY, ("tpch", "semijoin"), True
    ),
    "region_nation_revenue": Query(
        q_region_nation_revenue, ORACLE_REGION_NATION_REVENUE, ("tpch", "multijoin"), True
    ),
    "forecast_revenue": Query(
        q_forecast_revenue, ORACLE_FORECAST_REVENUE, ("tpch", "filter"), True
    ),
    "segment_acctbal": Query(q_segment_acctbal, ORACLE_SEGMENT_ACCTBAL, ("agg",)),
    "parts_by_type": Query(q_parts_by_type, ORACLE_PARTS_BY_TYPE, ("agg", "distinct")),
    "order_status_rollup": Query(
        q_order_status_rollup, ORACLE_ORDER_STATUS_ROLLUP, ("rollup",)
    ),
    "returned_top_customers": Query(
        q_returned_top_customers, ORACLE_RETURNED_TOP_CUSTOMERS, ("tpch", "topn")
    ),
    "supplier_nation_balance": Query(
        q_supplier_nation_balance, ORACLE_SUPPLIER_NATION_BALANCE, ("join",)
    ),
    "discount_band_revenue": Query(
        q_discount_band_revenue, ORACLE_DISCOUNT_BAND_REVENUE, ("case",)
    ),
    "order_count_distribution": Query(
        q_order_count_distribution, ORACLE_ORDER_COUNT_DISTRIBUTION, ("tpch", "leftjoin"), True
    ),
    "promo_revenue_pct": Query(q_promo_revenue_pct, ORACLE_PROMO_REVENUE_PCT, ("tpch",)),
    "top_suppliers": Query(q_top_suppliers, ORACLE_TOP_SUPPLIERS, ("window",)),
    "small_qty_revenue": Query(
        q_small_qty_revenue, ORACLE_SMALL_QTY_REVENUE, ("tpch", "aggjoin"), True
    ),
    "large_orders": Query(q_large_orders, ORACLE_LARGE_ORDERS, ("tpch", "having")),
    "customer_top2_orders": Query(
        q_customer_top2_orders, ORACLE_CUSTOMER_TOP2_ORDERS, ("window",), True
    ),
    "running_revenue": Query(q_running_revenue, ORACLE_RUNNING_REVENUE, ("window",)),
    "customers_without_orders": Query(
        q_customers_without_orders, ORACLE_CUSTOMERS_WITHOUT_ORDERS, ("antijoin",)
    ),
    "nation_set_ops": Query(q_nation_set_ops, ORACLE_NATION_SET_OPS, ("setops",)),
    "capitalize_names": Query(q_capitalize_names, ORACLE_CAPITALIZE_NAMES, ("scalar", "parity")),
    "derive_date_string": Query(
        q_derive_date_string, ORACLE_DERIVE_DATE_STRING, ("scalar", "parity")
    ),
    "null_fill_segment": Query(q_null_fill_segment, ORACLE_NULL_FILL_SEGMENT, ("scalar", "parity")),
    "order_value_quantiles": Query(
        q_order_value_quantiles, ORACLE_ORDER_VALUE_QUANTILES, ("agg", "quantile")
    ),
    "priority_year_pivot": Query(
        q_priority_year_pivot, ORACLE_PRIORITY_YEAR_PIVOT, ("pivot",)
    ),
    "lineitem_cube": Query(q_lineitem_cube, ORACLE_LINEITEM_CUBE, ("cube",)),
    "lineitem_grouping_sets": Query(
        q_lineitem_grouping_sets, ORACLE_LINEITEM_GROUPING_SETS, ("cube", "grouping-sets")
    ),
    "customer_fuzzy_match": Query(
        q_customer_fuzzy_match, ORACLE_CUSTOMER_FUZZY_MATCH, ("dedup", "fuzzy", "join")
    ),
    "events_dedup_windowed": Query(
        q_events_dedup_windowed, ORACLE_EVENTS_DEDUP_WINDOWED, ("events", "dedup", "window")
    ),
    "customer_spend_ntile": Query(
        q_customer_spend_ntile, ORACLE_CUSTOMER_SPEND_NTILE, ("window", "ntile", "agg")
    ),
    # Sketch entries carry NO oracle by design (engine-specific estimates);
    # the driver records rows-only checks and tests/test_sketches.py pins
    # error bounds + determinism.
    "events_distinct_users_sketch": Query(
        q_events_distinct_users_sketch, None, ("events", "sketch", "agg")
    ),
    "order_value_sketch_quantiles": Query(
        q_order_value_sketch_quantiles, None, ("sketch", "quantile", "agg")
    ),
    "skew_salted_revenue": Query(
        q_skew_salted_revenue, ORACLE_SKEW_SALTED_REVENUE, ("join", "skew")
    ),
    "dedup_distinct": Query(q_dedup_distinct, ORACLE_DEDUP_DISTINCT, ("dedup",)),
    "dedup_keep_first": Query(q_dedup_keep_first, ORACLE_DEDUP_KEEP_FIRST, ("dedup", "window")),
    "events_hourly": Query(q_events_hourly, ORACLE_EVENTS_HOURLY, ("events", "window-agg"), True),
    "events_retention_matrix": Query(
        q_events_retention_matrix,
        ORACLE_EVENTS_RETENTION_MATRIX,
        ("events", "cohort", "agg"),
    ),
    "events_json_extract": Query(
        q_events_json_extract, ORACLE_EVENTS_JSON_EXTRACT, ("events", "json")
    ),
    "event_sessionization": Query(
        q_event_sessionization, ORACLE_EVENT_SESSIONIZATION, ("events", "session"), True
    ),
}
