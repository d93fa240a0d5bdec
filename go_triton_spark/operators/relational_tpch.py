"""Remaining TPC-H suite, adapted to the driver's simplified schema.

The reference (postmates/go-triton) has no relational engine at all
(SURVEY section 2.2) — this completes the TPC-H-shaped query surface
our engine exposes over archived tables.  The driver's tables lack
``partsupp`` and several columns (shipmode, commitdate, supplycost,
container, phone, comment), so queries that depend on them are adapted
to equivalent *operator shapes* over the available columns; each
docstring notes the adaptation.  Everything follows the registry
determinism policy (exact decimal sums, total orders for top-k).

Scale notes (100 TB stance):
- BOUNDED dims (region=5 rows, nation=25, one-row aggregates) are
  explicit ``F.broadcast``; SF-SCALING dims (customer/supplier/part —
  terabytes at 100 TB) are deliberately UNHINTED via
  ``registry.scaling_dim`` so planner/AQE broadcasts them only while
  measured small and falls back to a key shuffle beyond that (a hard
  hint would be an unconditional driver collect at scale)
- fact-fact joins (orders x lineitem) shuffle once on the order key;
  AQE picks SMJ vs shuffled-hash at runtime
- correlated EXISTS / NOT EXISTS become left-semi / left-anti joins
  on the correlation key (shuffle on l_orderkey, no row explosion)
- per-group thresholds (q17) aggregate-then-broadcast-join rather than
  recompute per row
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, scaling_dim, tables


def _dsum(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(30,8))) as double)"


_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q2_min_unit_price_supplier",
    oracle="""
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 10 AND p.p_type = 'STANDARD'
      AND l.l_extendedprice / l.l_quantity =
          (SELECT min(l2.l_extendedprice / l2.l_quantity)
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp): cheapest-unit-price supplier per
    part, via a per-part min computed from lineitem.

    Shape: correlated scalar min -> aggregate-then-join; dims broadcast.
    """
    part, li, supp, nat = tables(spark, sf_dir, "part", "lineitem",
                                 "supplier", "nation")
    pf = part.where((F.col("p_size") == 10) & (F.col("p_type") == "STANDARD"))
    unit = li.withColumn("unit_price",
                         F.col("l_extendedprice") / F.col("l_quantity"))
    min_unit = (unit.groupBy("l_partkey")
                .agg(F.min("unit_price").alias("min_unit")))
    return (
        unit.join(scaling_dim(pf), unit.l_partkey == pf.p_partkey)
        .join(min_unit.withColumnRenamed("l_partkey", "mp_partkey"),
              (F.col("p_partkey") == F.col("mp_partkey"))
              & (F.col("unit_price") == F.col("min_unit")))
        .join(scaling_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {_dsum(_REV.replace('l_', 'l.l_'))} AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey  = l.l_orderkey
    JOIN customer c  ON c.c_custkey   = o.o_custkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, by year.

    Six-way join; all four dims broadcast so lineitem shuffles only for
    the orders join and the final 3-key aggregation.
    """
    li, orders, cust, supp, nat = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    ns = nat.select(F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"))
    nc = nat.select(F.col("n_nationkey").alias("c_nkey"),
                    F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(scaling_dim(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(scaling_dim(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .where(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(_dsum(_REV)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           cast(sum(cast(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END
                         as decimal(30,8))) as double)
           / cast(sum(cast(volume as decimal(30,8))) as double) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = (SELECT min(r_name) FROM region)
        AND p.p_type = 'ECONOMY'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue in a region,
    per order-year.  Eight-way join, conditional aggregation; the ratio
    is two exact decimal sums divided once (cross-engine stable).
    """
    li, part, orders, cust, supp, nat, reg = tables(
        spark, sf_dir, "lineitem", "part", "orders", "customer",
        "supplier", "nation", "region")
    r0 = reg.orderBy("r_name").limit(1)
    nc = nat.select(F.col("n_nationkey").alias("c_nkey"),
                    F.col("n_regionkey").alias("c_rkey"))
    ns = nat.select(F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(scaling_dim(part.where(F.col("p_type") == "ECONOMY")),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(scaling_dim(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r0), F.col("c_rkey") == r0.r_regionkey)
        .join(scaling_dim(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                F.expr(_REV).alias("volume"),
                "supp_nation")
    )
    return (
        vol.groupBy("o_year")
        .agg((F.expr("cast(sum(cast(CASE WHEN supp_nation = 'NATION_5' "
                     "THEN volume ELSE 0 END as decimal(30,8))) as double)")
              / F.expr("cast(sum(cast(volume as decimal(30,8))) as double)")
              ).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no ps_supplycost -> profit = discounted
    revenue): profit on parts whose name matches, by supplier nation
    and order year."""
    li, part, supp, nat, orders = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    return (
        li.join(scaling_dim(part.where(F.col("p_name").like("%gear%"))),
                li.l_partkey == part.p_partkey)
        .join(scaling_dim(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.expr(_dsum(_REV)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top 20 customers by revenue lost to returns in a
    quarter.  Aggregate lineitem x orders first, then broadcast-join
    the customer/nation dims onto 20-ish groups."""
    cust, orders, li, nat = tables(spark, sf_dir, "customer", "orders",
                                   "lineitem", "nation")
    of = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz")))
    rev = (li.where(F.col("l_returnflag") == "R")
           .join(of, li.l_orderkey == of.o_orderkey)
           .groupBy("o_custkey")
           .agg(F.expr(_dsum(_REV)).alias("revenue")))
    return (
        rev.join(scaling_dim(cust), rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
                "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q11_nation_supplier_value",
    oracle=f"""
    SELECT n.n_name, {_dsum('s.s_acctbal')} AS value
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    HAVING cast(sum(cast(s.s_acctbal as decimal(30,8))) as double) >
           (SELECT 0.02 * cast(sum(cast(s2.s_acctbal as decimal(30,8))) as double)
            FROM supplier s2)
    ORDER BY value DESC, n_name
    """,
    tags=("agg", "subquery", "tpch"),
)
def q11_nation_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp -> supplier account balances):
    nations holding > 2% of total supplier value.  Scalar-subquery
    threshold; the global sum is a 1-row broadcast cross join."""
    supp, nat = tables(spark, sf_dir, "supplier", "nation")
    total = supp.agg(
        (0.02 * F.expr("cast(sum(cast(s_acctbal as decimal(30,8))) as double)")
         ).alias("threshold"))
    per_nation = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.expr(_dsum("s_acctbal")).alias("value")))
    return (per_nation.crossJoin(F.broadcast(total))
            .where(F.col("value") > F.col("threshold"))
            .select("n_name", "value")
            .orderBy(F.desc("value"), "n_name"))


@query(
    "q12_shipping_delay",
    oracle="""
    SELECT l.l_linestatus,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS high_line_count,
           cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 90
    GROUP BY l.l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg", "tpch"),
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode/commitdate -> 90-day ship delay,
    grouped by linestatus): priority-split counts of late lines."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
                  .otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
                  .otherwise(0)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, with an
    extra join predicate on the outer join (not a post-filter)."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(orders.where(F.col("o_orderpriority") != "5-LOW"),
                  cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.
    Exact decimal sums make the equality-to-max stable cross-engine.

    Single-scan plan: the revenue view feeds both the max and the
    filter — a naive crossJoin-with-agg (the oracle's spelling)
    recomputes it, scanning lineitem twice. max(total_revenue) OVER ()
    on the aggregated rows reads lineitem once; the global window's
    single partition holds only per-supplier totals (cardinality =
    suppliers, not lineitems), so it is bounded at any data scale."""
    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.expr(_dsum(_REV)).alias("total_revenue")))
    return (
        revenue.withColumn(
            "max_rev", F.max("total_revenue").over(Window.partitionBy()))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(scaling_dim(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, cast(p.p_size as bigint) AS p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (lineitem stands in for partsupp): distinct
    supplier count per (brand, type, size), excluding negative-balance
    suppliers via an anti join."""
    li, part, supp = tables(spark, sf_dir, "lineitem", "part", "supplier")
    pf = part.where((F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(scaling_dim(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(scaling_dim(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT cast(sum(cast(l.l_extendedprice as decimal(30,8))) as double) / 7.0
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity <
          (SELECT 0.2 * (sum(l2.l_quantity) / count(*))
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would be lost by dropping small-quantity
    orders.  The correlated per-part average becomes aggregate-then-
    broadcast-join; quantities are small integers so sum/count is exact."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    per_part = (li.groupBy(F.col("l_partkey").alias("ap_partkey"))
                .agg((0.2 * (F.sum("l_quantity") / F.count("*")))
                     .alias("qty_threshold")))
    return (
        li.join(scaling_dim(part.where(F.col("p_brand") == "Brand#3")),
                li.l_partkey == part.p_partkey)
        .join(per_part, F.col("p_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.expr("cast(sum(cast(l_extendedprice as decimal(30,8))) as double)")
              / 7.0).alias("avg_yearly"))
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("join", "agg", "tpch"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (no container/shipmode): disjunctive
    brand/size/quantity predicates over a broadcast part join."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    j = li.join(scaling_dim(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return j.where(cond).agg(F.expr(_dsum(_REV)).alias("revenue"))


@query(
    "q20_heavy_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 300
    )
    ORDER BY s_suppkey
    """,
    tags=("join", "subquery", "tpch"),
)
def q20_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (lineitem stands in for partsupp/availqty):
    suppliers who shipped > 300 units of red parts in 1996.  HAVING on
    a grouped semi-join source; quantity sums are exact integers."""
    supp, li, part = tables(spark, sf_dir, "supplier", "lineitem", "part")
    heavy = (
        li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
        .join(scaling_dim(part.where(F.col("p_name").like("%red%"))),
              li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300))
    return (supp.join(scaling_dim(heavy),
                      supp.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "subquery", "topk", "tpch"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (shipdate stands in for receipt/commit dates):
    suppliers who shipped last in multi-supplier finalized orders.

    Instead of the literal EXISTS / NOT EXISTS self-joins (3 lineitem
    scans, per-order m^2 pair checks), the per-row predicates reduce
    to per-(order, supplier) statistics: with sd(s) = max shipdate of
    supplier s in the order, an l1 row (s, d) "waits" iff the order
    has >= 2 suppliers AND max over OTHER suppliers of sd <= d. That
    max-other is derivable from the top-2 per-order supplier maxes
    (mx1/s1/mx2): mx1 unless s IS the leader, else mx2. So: one
    combinable groupBy(l_orderkey, l_suppkey) aggregate, a per-order
    rollup of that (small sorted array instead of window sorts), and
    one join back — 2 lineitem scans, linear per-order work, same
    answer (the oracle keeps the EXISTS form, so the gate checks the
    rewrite against independent semantics).
    """
    supp, li, orders = tables(spark, sf_dir, "supplier", "lineitem", "orders")
    # One explicit hash repartition on l_orderkey feeds BOTH aggregates:
    # HashPartitioning on a subset of the group keys satisfies the
    # clustering requirement of groupBy(l_orderkey, l_suppkey) AND of
    # the per-order rollup, so neither adds an exchange. (A round-robin
    # spread() here satisfied neither — it paid its own shuffle plus
    # the agg shuffle.) Explicit count: AQE never byte-coalesces it, so
    # the single-file local scan still fans out to full parallelism.
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ps = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
          .repartition(nparts, F.col("l_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max("l_shipdate").alias("sd")))
    # per-order stats in ONE combinable aggregate (no window sorts):
    # top-2 (sd DESC, suppkey ASC) per-supplier maxes via a tiny
    # sorted array (orders have a handful of suppliers)
    cmp = ("(a, b) -> CASE WHEN a.sd > b.sd THEN -1 WHEN a.sd < b.sd THEN 1 "
           "WHEN a.l_suppkey < b.l_suppkey THEN -1 "
           "WHEN a.l_suppkey > b.l_suppkey THEN 1 ELSE 0 END")
    stats = (
        ps.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_supp"),
             F.expr(f"array_sort(collect_list(struct(sd, l_suppkey)), {cmp})")
             .alias("top"))
        .where(F.col("n_supp") >= 2)
        .select("l_orderkey", "n_supp",
                F.col("top")[0]["sd"].alias("mx1"),
                F.col("top")[0]["l_suppkey"].alias("s1"),
                F.col("top")[1]["sd"].alias("mx2")))
    waiting = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.where(F.col("o_orderstatus") == "F")
              .select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(stats, "l_orderkey")
        .where(F.col("l_shipdate")
               >= F.when(F.col("l_suppkey") == F.col("s1"), F.col("mx2"))
               .otherwise(F.col("mx1"))))
    return (
        waiting.join(scaling_dim(supp),
                     F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_idle_customers",
    oracle=f"""
    SELECT n.n_name, count(*) AS numcust, {_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal >
          (SELECT cast(sum(cast(c2.c_acctbal as decimal(30,8))) as double)
                  / count(*)
           FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n.n_name
    ORDER BY n_name
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (nation stands in for phone country code):
    rich customers with no recent orders, by nation.  Scalar-subquery
    threshold + anti join on recent orders."""
    cust, nat, orders = tables(spark, sf_dir, "customer", "nation", "orders")
    avg_pos = cust.where(F.col("c_acctbal") > 0).agg(
        (F.expr("cast(sum(cast(c_acctbal as decimal(30,8))) as double)")
         / F.count("*")).alias("avg_bal"))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"),
             F.expr(_dsum("c_acctbal")).alias("totacctbal"))
        .orderBy("n_name")
    )


@query(
    "customer_rfm",
    oracle=f"""
    WITH mx AS (SELECT max(o_orderdate) AS anchor FROM orders),
    per_cust AS (
      SELECT o_custkey AS custkey,
             cast(date_diff('day', max(o_orderdate), (SELECT anchor FROM mx))
                  AS bigint) AS recency_days,
             count(*) AS frequency,
             cast(sum(cast(round(o_totalprice * 100e0) as bigint)) as bigint)
               / 100e0 AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT custkey, recency_days, frequency, monetary,
             cast(CASE WHEN recency_days <= 180 THEN 3
                  WHEN recency_days <= 720 THEN 2 ELSE 1 END AS bigint) AS r_score,
             cast(CASE WHEN frequency >= 20 THEN 3
                  WHEN frequency >= 10 THEN 2 ELSE 1 END AS bigint) AS f_score,
             cast(CASE WHEN monetary >= 3000000 THEN 3
                  WHEN monetary >= 1000000 THEN 2 ELSE 1 END AS bigint) AS m_score
      FROM per_cust)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           cast(sum(cast(round(monetary * 100e0) as bigint)) as bigint)
             / 100e0 AS segment_revenue
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    tags=("agg", "analytics"),
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (classic retention analytics): per
    customer recency (days since last order, anchored to the corpus
    max date so the query is reproducible), frequency (order count),
    and monetary (exact-decimal revenue sum), bucketed into fixed
    1-3 scores and aggregated to segment sizes + revenue. Fixed
    thresholds, not ntile, so scores are corpus-order-independent and
    identical across engines. One combinable per-customer aggregate
    (the only shuffle that scales with data), then a 27-row segment
    rollup."""
    (o,) = tables(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = (o.groupBy(F.col("o_custkey").alias("custkey"))
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").alias("frequency"),
                     F.expr("cast(sum(cast(round(o_totalprice * 100e0) as "
                            "bigint)) as bigint) / 100e0").alias("monetary")))
    scored = (per_cust.crossJoin(F.broadcast(anchor))
              .withColumn("recency_days",
                          F.datediff(F.col("anchor"), F.col("last_order"))
                          .cast("long"))
              .select(
                  "custkey", "recency_days", "frequency", "monetary",
                  F.when(F.col("recency_days") <= 180, 3)
                  .when(F.col("recency_days") <= 720, 2)
                  .otherwise(1).alias("r_score"),
                  F.when(F.col("frequency") >= 20, 3)
                  .when(F.col("frequency") >= 10, 2)
                  .otherwise(1).alias("f_score"),
                  F.when(F.col("monetary") >= 3000000, 3)
                  .when(F.col("monetary") >= 1000000, 2)
                  .otherwise(1).alias("m_score")))
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").alias("n_customers"),
                 F.expr("cast(sum(cast(round(monetary * 100e0) as bigint)) "
                        "as bigint) / 100e0").alias("segment_revenue")))
