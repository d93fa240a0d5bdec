"""Relational surface, part 2: more TPC-H adaptations, subqueries,
pivot, array/explode ops, deterministic sampling.

Same determinism policy as relational.py (registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, scaling_dim, tables


def _dsum(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(30,8))) as double)"


# =====================================================================
# More TPC-H adaptations
# =====================================================================

@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "join", "subquery"),
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late-shipping line
    (EXISTS -> left-semi join with a non-equi condition)."""
    o, li = tables(spark, sf_dir, "orders", "lineitem")
    o = o.where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz")))
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & \
           (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
    return (o.join(li, cond, "left_semi")
            .groupBy("o_orderpriority").agg(F.count("*").alias("order_count")))


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {_dsum('l_extendedprice * l_discount')} AS revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; at scale this is THE pushdown
    test (all four predicates must reach the parquet scan)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
                 & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
                 & (F.col("l_quantity") < 24))
        .agg(F.expr(_dsum("l_extendedprice * l_discount")).alias("revenue_delta"),
             F.count("*").alias("n_lines"))
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT {_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             AS promo_revenue,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("tpch", "join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: conditional aggregation over a broadcast
    dimension join (part is small)."""
    li, p = tables(spark, sf_dir, "lineitem", "part")
    return (
        li.where((F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
        .join(scaling_dim(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN "
                         "l_extendedprice * (1 - l_discount) ELSE 0.0 END"))
             .alias("promo_revenue"),
            F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("total_revenue"))
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, {_dsum('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(cast(l_quantity as bigint)) > 150)
    GROUP BY c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    """,
    tags=("tpch", "join", "subquery", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: HAVING-filtered IN subquery (semi join against
    an aggregate), then re-aggregate with customer names."""
    o, c, li = tables(spark, sf_dir, "orders", "customer", "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.expr("sum(cast(l_quantity as bigint))").alias("q"))
           .where(F.col("q") > 150).select("l_orderkey"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(scaling_dim(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey")
        .agg(F.expr(_dsum("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


# =====================================================================
# Subquery family
# =====================================================================

@query(
    "subquery_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT {_dsum('o_totalprice')} / count(*) FROM orders)
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above 1.5x the exact-decimal
    mean)."""
    (o,) = tables(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT {_dsum('o_totalprice')} / count(*) FROM orders)
    """)


@query(
    "subquery_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey)
          > 400000
    """,
    tags=("subquery",),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates into an
    aggregate + join — no per-row re-execution)."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE (SELECT max(o_totalprice) FROM orders o
               WHERE o.o_custkey = c.c_custkey) > 400000
    """)


# =====================================================================
# Pivot / explode / arrays / sampling
# =====================================================================

@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot", "agg"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) with pinned pivot values —
    pinning avoids the extra distinct-values job Spark otherwise runs."""
    (o,) = tables(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1)))
            .na.fill(0))


@query(
    "explode_token_counts",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    tags=("explode", "agg", "topk"),
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (lateral view) + global top-k tokens."""
    (d,) = tables(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("tok")).limit(20))


@query(
    "array_ops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
                                                                  AS first5_joined,
           list_contains(string_split(text, ' '), 'spark')        AS mentions_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '|')
                                                                  AS first3_joined
    FROM documents
    """,
    tags=("scalar", "array"),
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: sort/distinct/slice/contains/join."""
    (d,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    sorted_distinct = F.sort_array(F.array_distinct(ws))
    # NOTE: arrays are exercised internally but OUTPUT as joined strings —
    # array-typed result columns crash the driver's canonical sort
    # (unhashable list) and are not hash-stable across engines.
    return d.select(
        "doc_id",
        F.array_join(F.slice(sorted_distinct, 1, 5), "|").alias("first5_joined"),
        F.array_contains(ws, "spark").alias("mentions_spark"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("first3_joined"),
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ((event_id % 1000000007) * 2654435761) % 100 < 10
    """,
    tags=("sampling",),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via multiplicative hashing on the key
    (engine-portable integer math — the reproducible alternative to
    TABLESAMPLE/rand(), and re-runnable across engines and runs; at
    scale this is also partition-prunable if the key is the sort key)."""
    (e,) = tables(spark, sf_dir, "events")
    return (e.where(((F.col("event_id") % 1000000007) * 2654435761) % 100 < 10)
            .select("event_id", "user_id", "event_type"))


@query(
    "window_rank_suite",
    oracle="""
    SELECT c_custkey,
           ntile(4)       OVER w AS tile4,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family: ntile, percent_rank, cume_dist,
    nth_value (explicit ROWS frame — default frames differ between
    engines).  percent_rank/cume_dist are single IEEE divisions of
    integer counts, so doubles match exactly cross-engine."""
    from pyspark.sql import Window
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (c,) = tables(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("tile4"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_richest"))


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           cast(sum(cast(o_totalprice as decimal(30,8)))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                as double) AS spend_30d
    FROM orders
    """,
    tags=("window", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame: per customer, rolling 30-day spend —
    RANGE BETWEEN on the epoch-seconds order key (not ROWS: ties and
    gaps in event time are handled by value distance). One shuffle on
    the partition key; frame evaluation is a linear per-key scan."""
    from pyspark.sql import Window
    (o,) = tables(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.unix_timestamp("o_orderdate"))
         .rangeBetween(-2592000, 0))
    return (o.withColumn(
        "spend_30d",
        F.sum(F.expr("cast(o_totalprice as decimal(30,8))")).over(w)
         .cast("double"))
        .select("o_orderkey", "o_custkey", "spend_30d"))


@query(
    "agg_median_mode_listagg",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             median(o_totalprice) AS median_price,
             array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
               AS statuses_csv
      FROM orders GROUP BY o_orderpriority),
    freq AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
      QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY n DESC, o_orderstatus) = 1)
    SELECT m.o_orderpriority, m.median_price, m.statuses_csv,
           f.o_orderstatus AS mode_status
    FROM med m JOIN freq f USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
    tags=("agg", "ordered-set"),
)
def agg_median_mode_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: median (continuous interpolation — one
    (a+b)/2 op, portable), deterministic mode (count + window with an
    explicit tie-break, never the engine's mode() whose ties are
    arbitrary), and an ordered distinct list-agg."""
    from pyspark.sql import Window
    (o,) = tables(spark, sf_dir, "orders")
    med = (o.groupBy("o_orderpriority")
           .agg(F.median("o_totalprice").alias("median_price"),
                F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",")
                 .alias("statuses_csv")))
    freq = (o.groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n")))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), F.asc("o_orderstatus"))
    mode = (freq.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_orderpriority",
                    F.col("o_orderstatus").alias("mode_status")))
    return (med.join(mode, "o_orderpriority")
            .select("o_orderpriority", "median_price", "statuses_csv",
                    "mode_status")
            .orderBy("o_orderpriority"))


@query(
    "join_skew_aware",
    oracle="""
    SELECT d.lang,
           cast(count(*) as bigint)        AS n_docs,
           cast(sum(d.n_chars) as bigint)  AS total_chars,
           max(m.label)                    AS label
    FROM documents d
    JOIN (SELECT DISTINCT lang, 'lang-' || lang AS label
          FROM documents) m USING (lang)
    GROUP BY d.lang
    """,
    tags=("relational", "join"),
)
def join_skew_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The automatic narrow-key skew guard as a gated operator
    (operators.skew.skew_aware_join): documents join a per-language
    dim on ``lang`` — a NARROW, heavily skewed key (the testdata
    corpus is ~44% 'en'), i.e. exactly the shape AQE's byte-based
    skew detector cannot see (SCALE.md round-5/6). The guard probes
    the key distribution at plan-build and routes through the salted
    join here; result is route-invariant, so the DuckDB oracle is the
    plain join and the gate hash-checks that salting never changes
    the answer on the corpus that actually triggers it."""
    from go_triton_spark.operators.skew import skew_aware_join

    (d,) = tables(spark, sf_dir, "documents")
    dim = (d.select("lang").distinct()
           .select("lang", F.concat(F.lit("lang-"), "lang").alias("label")))
    j = skew_aware_join(d.select("doc_id", "lang", "n_chars"), dim, "lang")
    return (j.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.max("label").alias("label")))
