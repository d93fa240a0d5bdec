"""Relational surface, part 3: ordered-set aggregates, bit aggregates,
covariance/correlation via exact sums, regexp family, grouping IDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.dedup import _ORACLE_PAIR_CTES
from go_triton_spark.operators.registry import query, tables


def _dsum(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(30,8))) as double)"


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 6)  AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation
    at rank (n-1)*p over the sorted values — identical doubles in, same
    formula, rounded output). At 100 TB prefer approx_percentile (one
    pass, bounded memory); the exact form is the verifier."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_approx_percentile",
    fuzz_exclusion="true sketch (KLL/GK): engine-specific estimate, tolerance-gated by its own tests, no exact cross-engine oracle",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS exact_median,
           TRUE                                       AS sketch_ok
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the one-pass bounded-memory scale path for
    quantiles. Sketch values are engine-specific (GK vs t-digest), so
    the query emits the exact median plus ``sketch_ok`` = every approx
    percentile (p in {0.5, 0.9, 0.99} at accuracy 10000, rank error
    1e-4) lies within the exact [p-0.01, p+0.01] quantile envelope —
    100x the guaranteed rank error. The oracle asserts TRUE: a
    misbehaving sketch hash-fails the gate deterministically; the
    exact counterpart query is agg_percentiles."""
    (o,) = tables(spark, sf_dir, "orders")
    pcts = F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)")
    lo = F.expr("percentile(o_totalprice, array(0.49, 0.89, 0.98))")
    hi = F.expr("percentile(o_totalprice, array(0.51, 0.91, 1.0))")
    return (o.groupBy("o_orderstatus")
            .agg(pcts.alias("ap"), lo.alias("lo"), hi.alias("hi"),
                 F.round(F.expr("percentile(o_totalprice, 0.5)"), 6)
                  .alias("exact_median"))
            .select(
                "o_orderstatus", "exact_median",
                F.expr("forall(sequence(0, 2), "
                       "i -> ap[i] >= lo[i] AND ap[i] <= hi[i])")
                 .alias("sketch_ok")))


@query(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(event_id) AS band,
           bit_or(event_id)  AS bor,
           bit_xor(event_id) AS bxor
    FROM events GROUP BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (order-insensitive integer ops — trivially
    deterministic at any parallelism)."""
    (e,) = tables(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("bit_and(event_id)").alias("band"),
        F.expr("bit_or(event_id)").alias("bor"),
        F.expr("bit_xor(event_id)").alias("bxor"),
    )


@query(
    "agg_covariance",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           round(({_dsum('l_quantity * l_extendedprice')}
                  - {_dsum('l_quantity')} * {_dsum('l_extendedprice')} / count(*))
                 / count(*), 6) + 0 AS covar_pop_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance via exact decimal sums (the engines'
    covar_pop over doubles is summation-order-dependent; this form is
    reproducible at any parallelism — same trick as agg_stats)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        SELECT l_returnflag,
               count(*) AS n,
               round(({_dsum('l_quantity * l_extendedprice')}
                      - {_dsum('l_quantity')} * {_dsum('l_extendedprice')} / count(*))
                     / count(*), 6) + 0 AS covar_pop_qty_price
        FROM lineitem GROUP BY l_returnflag
    """)


@query(
    "scalar_regexp",
    oracle="""
    SELECT event_id,
           regexp_extract(props, '"k": ([0-9]+)', 1)      AS k_str,
           regexp_matches(props, '[0-9][0-9]')            AS has_2digit,
           regexp_replace(props, '[0-9]+', '#', 'g')      AS masked,
           length(regexp_replace(props, '[^0-9]', '', 'g')) AS n_digits
    FROM events WHERE event_id < 500
    """,
    tags=("scalar", "regexp"),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family (extract with group, match test, replace, strip).
    Patterns restricted to the Java-regex/RE2 common subset."""
    (e,) = tables(spark, sf_dir, "events")
    return (e.where(F.col("event_id") < 500).select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_str"),
        F.col("props").rlike("[0-9][0-9]").alias("has_2digit"),
        F.regexp_replace("props", "[0-9]+", "#").alias("masked"),
        F.length(F.regexp_replace("props", "[^0-9]", "")).alias("n_digits"),
    ))


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    """,
    tags=("agg", "cube"),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguish 'NULL because rolled up' from
    data nulls in cube output.

    Empty-input contract as agg_cube: Spark-native cube emits no rows
    over empty input where ANSI emits the () row; the oracle's
    HAVING n>0 pins the engine contract (no non-empty result changes
    — every real group has n>=1)."""
    (o,) = tables(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg((F.grouping("o_orderstatus") * 2
                  + F.grouping("o_orderpriority")).alias("gid"),
                 F.count("*").alias("n")))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH {_ORACLE_PAIR_CTES},
    e AS (SELECT id_a AS a, id_b AS b FROM p WHERE inter * 10 >= uni * 7
          UNION SELECT id_b, id_a FROM p WHERE inter * 10 >= uni * 7),
    r AS (
      WITH RECURSIVE reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a)
      SELECT * FROM reach)
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM r GROUP BY a
    """,
    tags=("llm", "dedup", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the Jaccard>=0.7
    pair graph (label propagation to fixpoint — the iterative-algorithm
    pattern; oracle is a recursive CTE).

    Each iteration: label(v) <- min(label(v), min over neighbors) —
    converges in O(component diameter) joins. At 100 TB this runs on
    the candidate-pair graph (tiny relative to the corpus) and
    checkpoint-truncates lineage every few rounds.
    """
    from go_triton_spark.operators.dedup import dedup_minhash_lsh

    # Materialize the candidate-pair graph ONCE and truncate the whole
    # MinHash-LSH lineage out of the loop (production: checkpoint() to a
    # reliable dir; localCheckpoint is the single-JVM equivalent).
    pairs = dedup_minhash_lsh(spark, sf_dir).localCheckpoint(eager=True)
    edges = (pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
             .union(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
             .localCheckpoint(eager=True))
    labels = edges.groupBy("a").agg(F.min("b").alias("lbl")) \
                  .select("a", F.least("a", "lbl").alias("lbl"))
    # Self-loop-fused min-label iteration (r13, verdict ask #2): the
    # old loop ran TWO joins per round (edges x labels to collect
    # neighbor labels, then labels x prop to fold them back in). A
    # tagged self-loop row per vertex — (a, b2=a) with is_self=1 —
    # folds the vertex's own label through the SAME join, so one
    # join + one aggregate per round computes
    #   new_lbl(a) = min(lbl(a), min over neighbors lbl(b))
    # exactly as before: min over {lbl(a)} u {lbl(b): b in N(a)}
    # equals least(lbl, coalesce(min_nbr, lbl)), and every labeled
    # vertex appears via its self-loop (old left-join semantics).
    # max(case is_self) recovers the vertex's own label for the
    # convergence compare — one row per vertex is tagged, so max is
    # exact. Halves the joins and the stages per round; eager
    # localCheckpoint + count convergence action unchanged.
    aug = edges.select("a", F.col("b").alias("b2"),
                       F.lit(0).alias("is_self"))
    for _ in range(10):  # diameter bound for near-dup components
        incoming = aug.union(
            labels.select("a", F.col("a").alias("b2"),
                          F.lit(1).alias("is_self")))
        step = (incoming.join(labels.select(F.col("a").alias("b2"),
                                            F.col("lbl")), "b2")
                .groupBy("a")
                .agg(F.min("lbl").alias("new_lbl"),
                     F.max(F.when(F.col("is_self") == 1, F.col("lbl")))
                     .alias("lbl"))
                .localCheckpoint(eager=True))
        changed = step.where(F.col("new_lbl") < F.col("lbl")).count()
        labels = step.select("a", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select(F.col("a").alias("doc_id"), F.col("lbl").alias("cluster_id"))


@query(
    "unpivot_metrics",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, 'order_epoch_day', cast(epoch(o_orderdate) // 86400 as double)
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("unpivot",),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide numeric columns -> long (key, metric, value)
    rows via DataFrame.unpivot — the inverse of pivot, a narrow op (no
    shuffle). Oracle expresses the same reshape as UNION ALL."""
    (o,) = tables(spark, sf_dir, "orders")
    wide = (o.where(F.col("o_orderkey") < 2000)
            .select("o_orderkey",
                    F.col("o_totalprice").alias("totalprice"),
                    (F.floor(F.unix_timestamp("o_orderdate") / 86400)
                     .cast("double")).alias("order_epoch_day")))
    return wide.unpivot("o_orderkey", ["totalprice", "order_epoch_day"],
                        "metric", "value")


@query(
    "set_multiset_ops",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'intersect_all' AS op, o_custkey, count(*) AS n FROM (
      SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b) GROUP BY 2
    UNION ALL
    SELECT 'except_all', o_custkey, count(*) FROM (
      SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b) GROUP BY 2
    """,
    tags=("setop",),
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (bag semantics): intersectAll keeps
    duplicate multiplicity min(a,b), exceptAll subtracts multiplicity —
    distinct-based set ops lose these counts."""
    (o,) = tables(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    ia = (a.intersectAll(b).groupBy("o_custkey").agg(F.count("*").alias("n"))
          .select(F.lit("intersect_all").alias("op"), "o_custkey", "n"))
    ea = (a.exceptAll(b).groupBy("o_custkey").agg(F.count("*").alias("n"))
          .select(F.lit("except_all").alias("op"), "o_custkey", "n"))
    return ia.unionAll(ea)


@query(
    "sql_cte_interface",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, c_custkey FROM customer),
    spend AS (
      SELECT o_custkey, cast(sum(cast(round(o_totalprice * 100e0) as bigint)) as bigint) / 100e0
               AS total
      FROM orders GROUP BY o_custkey)
    SELECT seg.c_mktsegment,
           count(*) AS n_customers,
           cast(sum(cast(round(coalesce(spend.total, 0.0) * 100e0) as bigint)) as bigint) / 100e0
             AS segment_spend
    FROM seg LEFT JOIN spend ON spend.o_custkey = seg.c_custkey
    GROUP BY seg.c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql", "cte"),
)
def sql_cte_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string interface (engine.sql path): multi-CTE query over
    registered views — proves the catalog/text route produces plans
    identical in semantics to the DataFrame route."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    c.createOrReplaceTempView("_cte_customer")
    o.createOrReplaceTempView("_cte_orders")
    return spark.sql("""
        WITH seg AS (
          SELECT c_mktsegment, c_custkey FROM _cte_customer),
        spend AS (
          SELECT o_custkey,
                 cast(sum(cast(round(o_totalprice * 100e0) as bigint)) as bigint) / 100e0 AS total
          FROM _cte_orders GROUP BY o_custkey)
        SELECT seg.c_mktsegment,
               count(*) AS n_customers,
               cast(sum(cast(round(coalesce(spend.total, 0.0) * 100e0) as bigint)) as bigint) / 100e0
                 AS segment_spend
        FROM seg LEFT JOIN spend ON spend.o_custkey = seg.c_custkey
        GROUP BY seg.c_mktsegment
        ORDER BY c_mktsegment
    """)
