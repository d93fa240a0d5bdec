"""Scalar function families (SURVEY section 2.2 row 'Scalar fns').

One query per family, exercising functions whose semantics are
identical across Spark and DuckDB (the oracle is the proof). Families:
string, date/time, math, conditional, JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_triton_spark.operators.registry import query, spread, tables


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS up_name,
           lower(c_mktsegment)                    AS lo_seg,
           substr(c_name, 1, 8)                   AS prefix8,
           concat(c_name, ':', c_mktsegment)      AS tagged,
           length(c_name)                         AS name_len,
           replace(c_name, 'Customer', 'Cust')    AS short_name,
           trim(concat(' ', c_name, ' '))         AS trimmed,
           lpad(cast(c_custkey as varchar), 8, '0') AS padded_key,
           reverse(c_mktsegment)                  AS rev_seg,
           strpos(c_name, '0')                    AS zero_pos,
           starts_with(c_name, 'Customer')        AS is_cust
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (upper/lower/substr/trim/concat/length
    and friends) restricted to constructs with identical semantics in
    Spark and DuckDB; all codegen'd row-local expressions — zero
    shuffle, scan-fused at any scale."""
    (c,) = tables(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("tagged"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
        F.instr("c_name", "0").alias("zero_pos"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                             AS yr,
           month(o_orderdate)                            AS mo,
           day(o_orderdate)                              AS dom,
           quarter(o_orderdate)                          AS qtr,
           strftime(o_orderdate, '%Y-%m')                AS ym,
           strftime(o_orderdate, '%Y-%m-%d')             AS ymd,
           date_diff('day', o_orderdate, TIMESTAMP '1999-01-01') AS days_to_1999,
           weekofyear(o_orderdate)                       AS wk
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (formatted output, never raw ts)."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
        F.datediff(F.lit("1999-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_1999"),
        F.weekofyear("o_orderdate").alias("wk"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, cast(l_linenumber as bigint) AS l_linenumber,
           abs(l_discount - 0.05)                         AS abs_disc_delta,
           cast(ceil(l_extendedprice) as bigint)          AS ceil_price,
           cast(floor(l_extendedprice) as bigint)         AS floor_price,
           cast(round(cast(l_extendedprice as decimal(18,2)) * 0.01, 2) as double)
                                                          AS price_hundreds,
           cast(l_quantity as bigint) % 7                 AS qty_mod7,
           power(cast(l_quantity as double), 2)           AS qty_sq,
           sqrt(cast(l_quantity as double))               AS qty_sqrt,
           cast(sign(l_discount - 0.05) as bigint)        AS disc_sign,
           greatest(l_tax, l_discount)                    AS max_rate,
           least(l_tax, l_discount)                       AS min_rate
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (IEEE-deterministic ops only: no libm
    transcendentals whose ULPs differ between JVM and C)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_price"),
        F.floor("l_extendedprice").cast("long").alias("floor_price"),
        # decimal multiply (never divide: DuckDB decimal '/' yields double;
        # round() over raw doubles disagrees between engines on x.xx5 ties)
        F.expr("cast(round(cast(l_extendedprice as decimal(18,2)) * 0.01, 2) as double)")
         .alias("price_hundreds"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.pow(F.col("l_quantity").cast("double"), 2).alias("qty_sq"),
        F.sqrt(F.col("l_quantity").cast("double")).alias("qty_sqrt"),
        # cast: Spark signum yields double, DuckDB sign yields tinyint —
        # land both on bigint so the pandas dtypes (and driver hash) agree
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >=  50000 THEN 'medium'
                ELSE 'small' END                     AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN TRUE
                ELSE FALSE END                       AS is_hot,
           if(o_orderstatus = 'F', 'done', 'pending') AS done_flag
    FROM orders
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/IN/if family: null-propagation and
    branching semantics proven against the oracle; row-local, fused
    into the scan by codegen."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
         .when(F.col("o_totalprice") >= 150000, "large")
         .when(F.col("o_totalprice") >= 50000, "medium")
         .otherwise("small").alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
         .alias("status_or_open"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_hot"),
        F.when(F.col("o_orderstatus") == "F", "done").otherwise("pending")
         .alias("done_flag"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') as bigint) AS k_value,
           event_type
    FROM events
    WHERE cast(json_extract_string(props, '$.k') as bigint) > 50
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (the
    reference's records are schemaless maps; JSON-typed columns are the
    batch equivalent, S17's inverse)."""
    (e,) = tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_id", k.alias("k_value"), "event_type")
            .where(k > 50))


@query(
    "map_ops",
    oracle="""
    SELECT event_id,
           event_type                    AS type_val,
           cast(user_id as varchar)      AS uid_val,
           cast(2 as bigint)             AS n_keys,
           'type,uid'                    AS keys_csv,
           cast(1 as bigint)             AS n_after_filter
    FROM events
    WHERE event_id < 500
    """,
    tags=("scalar", "map"),
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function family: map_from_arrays, element_at, size,
    map_keys, map_filter (lambda on entries). The oracle computes the
    expected outputs directly from the base columns — what is checked
    is the VALUES flowing through Spark's map operators, since map
    cells themselves are not portably hashable across engines."""
    (e,) = tables(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")))
    return (e.where(F.col("event_id") < 500)
            .select(
                "event_id",
                F.element_at(m, "type").alias("type_val"),
                F.element_at(m, "uid").alias("uid_val"),
                F.size(m).alias("n_keys"),
                F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
                F.size(F.expr(
                    "map_filter(map('type', event_type, 'uid', cast(user_id as string)), "
                    "(k, v) -> k = 'type')")).alias("n_after_filter")))


@query(
    "hof_ops",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> len(w) > 5))
             AS n_long_tokens,
           len(list_filter(string_split(text, ' '),
                           w -> regexp_matches(w, '[0-9]'))) > 0
             AS has_digit_token,
           cast(list_sum(list_transform(string_split(text, ' '), w -> len(w)))
                as bigint) AS total_token_chars
    FROM documents
    """,
    tags=("scalar", "hof"),
)
def hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function family: filter / exists / transform +
    aggregate lambdas over token arrays — all JVM-evaluated, no UDF.
    Integer/boolean outputs only (portable across engines).

    HOF lambdas are INTERPRETED (no whole-stage codegen), so the full
    table is spread() first — same rule as _shingle_df; no-op at
    cluster scale."""
    (d,) = tables(spark, sf_dir, "documents")
    return spread(d, spark).select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> length(w) > 5))")
         .alias("n_long_tokens"),
        F.expr("exists(split(text, ' '), w -> w rlike '[0-9]')")
         .alias("has_digit_token"),
        F.expr("aggregate(transform(split(text, ' '), w -> length(w)), "
               "0L, (acc, x) -> acc + x)")
         .alias("total_token_chars"))
