"""Relational operator surface (SURVEY section 2.2).

The reference implements NO relational operators (it is a stream
archiver; see SURVEY section 2.1-2.2) — this module is the engine's
query surface over ingested/archived tables, all built-in Catalyst:
joins every type, aggregations incl. rollup/cube/grouping-sets,
window functions, sort/limit/top-k, set operations.

Scale notes (100 TB design stance), per query family:
- fact-to-fact joins (orders x lineitem) shuffle-hash/SMJ on the join
  key — Spark picks via AQE; BOUNDED dims (region=5, nation=25 rows,
  literal band tables) are explicitly ``F.broadcast``; SF-SCALING dims
  (customer/supplier/part — terabytes at the 100 TB target) carry NO
  hint (``registry.scaling_dim``): planner/AQE broadcasts them from
  measured sizes while small and shuffles beyond that
- aggregations are partial (map-side combine) before the shuffle —
  automatic for all hash aggregates used here
- top-k per group uses window + filter (no global sort); global top-k
  uses orderBy+limit which Spark executes as per-partition top-k then
  merge (TakeOrderedAndProject)
- every decimal-sum is the registry's exact-sum pattern so results are
  reproducible at any partitioning/parallelism (float sums are not)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import (local_df, query, scaling_dim,
                                                tables)


def _dsum(expr: str) -> str:
    """Exact-sum fragment, valid in BOTH Spark SQL and DuckDB."""
    return f"cast(sum(cast({expr} as decimal(30,8))) as double)"


def _davg(expr: str) -> str:
    """Exact-sum-based average fragment (never engine avg over doubles)."""
    return f"cast(sum(cast({expr} as decimal(30,8))) as double) / count(*)"


def _isum(expr: str, scale: int = 2) -> str:
    """Scaled-integer exact sum, valid in BOTH Spark SQL and DuckDB.

    Per-row: round the double expression at 10^-scale (both engines round
    half away from zero for doubles) and cast to bigint — the cast is exact
    because the value is integral after round(). Sum in pure long math
    (fastest aggregation path in both engines; the outer cast collapses
    DuckDB's HUGEINT sum back to int64 so the pandas dtype matches Spark's).
    Final value = int64 -> double (correctly rounded, identical bits in
    JVM and DuckDB) / 10^scale (one IEEE division, identical bits).

    Overflow bound: |sum_scaled| < 2^63. At scale=2 over price-like values
    (~1e5 -> 1e7 scaled), that holds to ~9e11 rows per group (~sf 150k,
    beyond 100 TB). For wider values use the decimal _dsum path.
    """
    f = 10 ** scale
    return (f"cast(sum(cast(round(({expr}) * {f}e0) as bigint)) as bigint)"
            f" / {f}e0")


def _iavg(expr: str, scale: int = 4) -> str:
    """Scaled-integer average: exact long sum, two IEEE divisions."""
    return f"({_isum(expr, scale)}) / count(*)"


def _isum2(expr: str, scale: int) -> str:
    """Two-part scaled-integer exact sum for scales where a single
    int64 sum would overflow below the 100 TB target (scale>=4 money
    products: row values reach ~1e11 scaled; 1.5e11 rows/group at
    sf~100k would overflow a single sum at ~9e18).

    Per row (NONNEGATIVE values only — TPC-H money products are):
    v = round(expr * 10^scale) as bigint, split v = hi*1e6 + lo. The
    hi/lo split uses floor(v / 1e6): v <= ~1e11 < 2^53 so the double
    quotient's floor is exact (a misfloor would need the true quotient
    within half an ulp (~1e-11) of an integer; non-multiples sit 1e-6
    away). Both int sums stay in pure long math (hi <= 1e5, lo < 1e6:
    bounds ~1.5e16/1.5e17 at 1.5e11 rows — no overflow), and the
    reconstruction is two exact casts + fixed IEEE ops, identical in
    Spark and DuckDB. Zero per-row rounding drift (unlike a truncated
    scale) and no BigDecimal in the aggregation loop."""
    f = 10 ** scale
    v = f"cast(round(({expr}) * {f}e0) as bigint)"
    hi = f"cast(floor({v} / 1000000e0) as bigint)"
    lo = f"({v} - {hi} * 1000000)"
    return (f"(cast(sum({hi}) as double) * 1000000e0"
            f" + cast(sum({lo}) as double)) / {f}e0")


# =====================================================================
# TPC-H-adapted headline queries
# =====================================================================

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as bigint)) as bigint)       AS sum_qty,
           {_isum('l_extendedprice')}                            AS sum_base_price,
           {_isum2('l_extendedprice * (1 - l_discount)', 4)}      AS sum_disc_price,
           {_isum2('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
           {_iavg('l_quantity', 2)}                              AS avg_qty,
           {_iavg('l_extendedprice', 2)}                         AS avg_price,
           {_iavg('l_discount', 2)}                              AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary. Flagship scan->filter->agg.

    Plan shape we want at 100 TB: parquet scan with PushedFilters on
    l_shipdate + ReadSchema of only the 7 used columns, partial hash
    agg before a 6-group shuffle. Sum-precision policy (exact-answer,
    not just gate-consistent): sum_base_price and the averages are over
    2-decimal inputs, so the scaled-integer path at scale=2 is EXACT
    (pure long math in whole-stage codegen; overflow bound ~9e11 rows
    per group, beyond 100 TB). sum_disc_price / sum_charge are 4- and
    6-decimal PRODUCTS — a SINGLE scale=4/6 integer sum would overflow
    int64 at ~9e9 / ~9e7 rows per group (below the 100 TB target), and
    scale=2 would round per-row and drift from the true answer — so
    those two columns use the two-part hi/lo scaled-integer sum
    (_isum2): exact at full scale, overflow-safe past 100 TB, and
    still pure long math in the aggregation loop.
    DuckDB dtype note: the oracle casts sum_qty to bigint — DuckDB's
    sum(bigint) is HUGEINT, which lands in pandas as float64 and
    hash-diverges from Spark's int64 even when values are equal.
    """
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("sum(cast(l_quantity as bigint))").alias("sum_qty"),
            F.expr(_isum("l_extendedprice")).alias("sum_base_price"),
            F.expr(_isum2("l_extendedprice * (1 - l_discount)", 4)).alias("sum_disc_price"),
            F.expr(_isum2("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", 6)).alias("sum_charge"),
            F.expr(_iavg("l_quantity", 2)).alias("avg_qty"),
            F.expr(_iavg("l_extendedprice", 2)).alias("avg_price"),
            F.expr(_iavg("l_discount", 2)).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d')              AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: segment customers' unshipped-order revenue, top 10.

    customer scales with SF, so it carries no broadcast hint (see
    scaling_dim) — the planner/AQE broadcasts the filtered segment when
    it measures small; orders x lineitem co-shuffles on the order key
    once.
    """
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp_ntz"))
        .join(orders.where(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp_ntz")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaling_dim(cust.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .select(
            "o_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation for one region's customers.

    region/nation broadcast into customer (bounded dims); the
    customer-derived dims relation scales with SF so it is unhinted —
    planner/AQE broadcasts it only while it measures small. The big
    shuffle is orders x lineitem plus the final small agg.
    """
    r, n, c, o, li = tables(spark, sf_dir, "region", "nation", "customer",
                            "orders", "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              n.n_regionkey == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o.where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaling_dim(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, count(*) AS order_cnt,
           {_dsum('o.o_totalprice')} AS total_spent
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 15
    """,
    tags=("join", "agg", "topk"),
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top spenders: agg orders first, then join customer names
    (aggregate-before-join keeps the join input small at scale);
    customer scales with SF, so no broadcast hint — AQE picks."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    spend = (o.groupBy("o_custkey")
             .agg(F.count("*").alias("order_cnt"),
                  F.expr(_dsum("o_totalprice")).alias("total_spent")))
    return (
        spend.join(scaling_dim(c), spend.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "order_cnt", "total_spent")
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(15)
    )


# =====================================================================
# Join family
# =====================================================================

@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 250000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join against an SF-scaling dimension: no broadcast
    hint (customer is terabytes at the 100 TB target) — the planner
    broadcasts from measured sizes while small (plan test sees BHJ at
    test SF) and shuffles both sides on c_custkey beyond that."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    return (o.where(F.col("o_totalprice") > 250000)
            .join(scaling_dim(c), o.o_custkey == c.c_custkey)
            .select("o_orderkey", "o_orderstatus", "c_name", "c_mktsegment"))


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause,
    not a post-filter — different semantics, tested deliberately)."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    return c.join(o, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F"),
                  "left").select("c_custkey", "c_name", "o_orderkey")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): emits each left row at most once and
    ships only the join key of the right side — no row explosion, the
    scale-safe form of existence filtering."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    return c.join(o.where(F.col("o_orderpriority") == "1-URGENT"),
                  c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT cast(c_nationkey as bigint) AS nationkey,
                       count(*) AS customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT cast(s_nationkey as bigint) AS nationkey,
                       count(*) AS suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.customers, 0) AS customers,
           coalesce(sn.suppliers, 0) AS suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides: aggregating before
    joining shrinks both inputs to group cardinality first, so the
    join state is keys, not raw rows."""
    c, s = tables(spark, sf_dir, "customer", "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("customers"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("suppliers"))
    return (cn.join(sn, "nationkey", "full_outer")
            .select(F.col("nationkey"),
                    F.coalesce("customers", F.lit(0)).alias("customers"),
                    F.coalesce("suppliers", F.lit(0)).alias("suppliers")))


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, m.seg, count(*) AS combos
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) m
    GROUP BY r.r_name, m.seg
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (broadcast NLJ)."""
    r, c = tables(spark, sf_dir, "region", "customer")
    segs = c.select(F.col("c_mktsegment").alias("seg")).distinct()
    return (r.crossJoin(F.broadcast(segs))
            .groupBy("r_name", "seg").agg(F.count("*").alias("combos")))


@query(
    "join_range",
    oracle=f"""
    SELECT b.band, count(*) AS orders_in_band, {_dsum('o.o_totalprice')} AS band_value
    FROM orders o
    JOIN (VALUES ('tiny', 0.0, 50000.0), ('small', 50000.0, 120000.0),
                 ('mid', 120000.0, 220000.0), ('large', 220000.0, 350000.0),
                 ('huge', 350000.0, 1e9)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a banding dimension.

    The bands table is tiny -> broadcast nested-loop join; at 100 TB
    the fact side streams through without a shuffle.
    """
    (o,) = tables(spark, sf_dir, "orders")
    # LocalRelation, not createDataFrame: the Python-RDD scan the
    # latter plans cost 7.0 cpu_s PER ACTION at local[32] (r12 probe)
    bands = local_df(
        spark,
        [("tiny", 0.0, 50000.0), ("small", 50000.0, 120000.0),
         ("mid", 120000.0, 220000.0), ("large", 220000.0, 350000.0),
         ("huge", 350000.0, 1e9)],
        [("band", "string"), ("lo", "double"), ("hi", "double")])
    return (
        o.join(F.broadcast(bands),
               (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("orders_in_band"),
             F.expr(_dsum("o_totalprice")).alias("band_value"))
    )


# =====================================================================
# Aggregation family
# =====================================================================

@query(
    "agg_basic",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           {_isum('o_totalprice', 2)} AS total_value,
           min(o_totalprice) AS min_value,
           max(o_totalprice) AS max_value,
           {_iavg('o_totalprice', 2)} AS avg_value
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate: count/min/max/exact-sum/exact-avg/count-distinct.

    count(DISTINCT) triggers Spark's expand+two-phase distinct agg —
    partial aggregation still applies map-side."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.expr(_isum("o_totalprice", 2)).alias("total_value"),
        F.min("o_totalprice").alias("min_value"),
        F.max("o_totalprice").alias("max_value"),
        F.expr(_iavg("o_totalprice", 2)).alias("avg_value"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    HAVING count(*) > 0
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region -> nation -> grand total.

    Empty-input contract as agg_cube (oracle HAVING pins Spark-native
    rollup: no rows over empty input; no non-empty result changes)."""
    c, n, r = tables(spark, sf_dir, "customer", "nation", "region")
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("customers"))


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           {_isum('o_totalprice', 2)} AS value
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions: Spark expands grouping sets map-side
    (Expand operator) then runs one partial+final aggregate — 4 result
    granularities for a single shuffle.

    Empty-input contract (registry fuzz finding): ANSI CUBE emits the
    grand-total () row even over zero rows; Spark's Expand-based cube
    emits nothing. The engine keeps the Spark-native shape — a
    0-count grand total can ONLY arise from empty input, so the
    oracle's HAVING n>0 pins exactly that contract and changes no
    non-empty result."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.expr(_isum("o_totalprice", 2)).alias("value"))


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, {_isum('o_totalprice', 2)} AS value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (each dimension alone)."""
    (o,) = tables(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority, {_isum('o_totalprice', 2)} AS value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@query(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {_dsum('l_quantity')} AS s1,
           {_dsum('l_quantity * l_quantity')} AS s2,
           round(sqrt(({_dsum('l_quantity * l_quantity')} -
                 {_dsum('l_quantity')} * {_dsum('l_quantity')} / count(*))
                 / nullif(count(*) - 1, 0)), 6) + 0 AS stddev_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via exact sum-of-squares (deterministic at any
    parallelism, unlike streaming variance over doubles).

    Singleton groups have no sample stddev (n-1 = 0): both sides NULL
    it via nullif — stddev_samp parity. Found by the relational
    registry fuzz (ANSI Spark raised DIVIDE_BY_ZERO)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        SELECT l_returnflag,
               count(*) AS n,
               {_dsum('l_quantity')} AS s1,
               {_dsum('l_quantity * l_quantity')} AS s2,
               round(sqrt(({_dsum('l_quantity * l_quantity')} -
                     {_dsum('l_quantity')} * {_dsum('l_quantity')} / count(*))
                     / nullif(count(*) - 1, 0)), 6) + 0 AS stddev_qty
        FROM lineitem GROUP BY l_returnflag
    """)


@query(
    "agg_approx_distinct",
    fuzz_exclusion="true sketch (HLL): engine-specific estimate, tolerance-gated by its own tests, no exact cross-engine oracle",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE                      AS sketch_ok
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketch ESTIMATES are
    engine-specific by design, so the raw estimate can't be hashed
    against DuckDB; instead the query emits the exact count plus
    ``sketch_ok`` = |approx - exact| <= 5% of exact (5x the configured
    rsd=0.01 — far outside HLL++'s documented error at any size). The
    oracle asserts TRUE, so a misbehaving sketch hash-fails the gate
    while the comparison stays deterministic. At 100 TB this is THE
    distinct operator (bounded memory, one pass)."""
    (o,) = tables(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
                 F.countDistinct("o_custkey").alias("exact_customers"))
            .select("o_orderstatus", "exact_customers",
                    (F.abs(F.col("approx") - F.col("exact_customers"))
                     <= 0.05 * F.col("exact_customers")).alias("sketch_ok")))


# =====================================================================
# Window family
# =====================================================================

@query(
    "window_row_number",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the scalable top-k-per-group pattern
    (single shuffle on the partition key, no global sort)."""
    (o,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.select("o_custkey", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= 3))


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank (ties allowed — rank output identical under ties)
    + ntile with a total order."""
    (p,) = tables(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    wt = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select("p_brand", "p_partkey", "p_retailprice",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"),
                    F.ntile(4).over(wt).alias("quartile"))


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a per-customer event sequence."""
    (o,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_custkey", "o_orderkey",
                    F.lag("o_totalprice").over(w).alias("prev_price"),
                    F.lead("o_totalprice").over(w).alias("next_price"))


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           cast(sum(cast(o_totalprice as decimal(30,8)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                as double) AS running_spend,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (rowsBetween frame), exact decimal."""
    (o,) = tables(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).over(w)
         .cast("double").alias("running_spend"),
        F.count("*").over(w).alias("order_seq"))


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
    WHERE rn <= 2
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number over a partitioned window: one
    shuffle on the group key, per-key linear scan, never a global
    sort; ties broken by key for determinism."""
    (p,) = tables(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (p.select("p_brand", "p_partkey", "p_name", "p_retailprice",
                     F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= 2))


# =====================================================================
# Sort / limit & set operations
# =====================================================================

@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "topk"),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    (o,) = tables(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20))


@query(
    "set_union_all",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
    tags=("set",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (ordered-concat S16's unordered batch cousin)."""
    c, s = tables(spark, sf_dir, "customer", "supplier")
    return (c.select(F.col("c_name").alias("name"), F.lit("customer").alias("kind"))
            .unionByName(
                s.select(F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))))


@query(
    "set_union_distinct",
    oracle="""
    SELECT cast(c_nationkey as bigint) AS nationkey FROM customer
    UNION
    SELECT cast(s_nationkey as bigint) AS nationkey FROM supplier
    """,
    tags=("set",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: dedup runs as a hash aggregate on the union —
    partial map-side combine before the shuffle carries only distinct
    keys per partition."""
    c, s = tables(spark, sf_dir, "customer", "supplier")
    return (c.select(F.col("c_nationkey").alias("nationkey"))
            .union(s.select(F.col("s_nationkey").alias("nationkey"))).distinct())


@query(
    "set_intersect",
    oracle="""
    SELECT cast(c_nationkey as bigint) AS nationkey FROM customer
    INTERSECT
    SELECT cast(s_nationkey as bigint) AS nationkey FROM supplier
    """,
    tags=("set",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): compiles to a left-semi join of
    the distinct sides — set membership without materializing either
    side fully."""
    c, s = tables(spark, sf_dir, "customer", "supplier")
    return (c.select(F.col("c_nationkey").alias("nationkey"))
            .intersect(s.select(F.col("s_nationkey").alias("nationkey"))))


@query(
    "set_except",
    oracle="""
    SELECT cast(c_nationkey as bigint) AS nationkey FROM customer
    EXCEPT
    SELECT cast(s_nationkey as bigint) AS nationkey FROM supplier
    """,
    tags=("set",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no suppliers."""
    c, s = tables(spark, sf_dir, "customer", "supplier")
    return (c.select(F.col("c_nationkey").alias("nationkey"))
            .subtract(s.select(F.col("s_nationkey").alias("nationkey"))))
